"""Poseidon252 channel + FieldElement252 suite.

Port of reference test/channel/poseidon.test.ts (47 cases), whose expected
digests mirror Rust stwo's poseidon252 channel tests.  TS-isms (private
constructor, undefined handling) are not ported.
"""
import pytest

from tstwo_tpu.channel.poseidon import (FieldElement252, Poseidon252Channel,
                                        poseidon_hash, poseidon_hash_many)
from tstwo_tpu.fields import M31, QM31

PRIME_252 = (1 << 251) + 17 * (1 << 192) + 1


# ---------------------------------------------------------------------------
# FieldElement252
# ---------------------------------------------------------------------------

def test_fe252_construct():
    assert FieldElement252.from_int(5).value == 5
    assert FieldElement252.from_int(0).value == 0


def test_fe252_zero():
    assert FieldElement252.zero().value == 0


def test_fe252_reduces_mod_prime():
    assert FieldElement252.from_int(PRIME_252).value == 0
    assert FieldElement252.from_int(PRIME_252 + 7).value == 7


def test_fe252_add():
    a = FieldElement252.from_int(10)
    b = FieldElement252.from_int(20)
    assert (a + b).value == 30


def test_fe252_add_wraps():
    a = FieldElement252.from_int(PRIME_252 - 1)
    assert (a + FieldElement252.from_int(2)).value == 1


def test_fe252_sub():
    a = FieldElement252.from_int(30)
    b = FieldElement252.from_int(20)
    assert (a - b).value == 10


def test_fe252_sub_wraps():
    a = FieldElement252.from_int(0)
    assert (a - FieldElement252.from_int(1)).value == PRIME_252 - 1


def test_fe252_mul():
    a = FieldElement252.from_int(6)
    b = FieldElement252.from_int(7)
    assert (a * b).value == 42


def test_fe252_floor_div():
    a = FieldElement252.from_int(42)
    b = FieldElement252.from_int(5)
    assert a.floor_div(b).value == 8


def test_fe252_to_bytes_be():
    b = FieldElement252.from_int(1).to_bytes_be()
    assert len(b) == 32
    assert b[-1] == 1
    assert all(x == 0 for x in b[:-1])


def test_fe252_try_into_u32():
    assert FieldElement252.from_int(12345).try_into_u32() == 12345
    assert FieldElement252.from_int(1 << 40).try_into_u32() is None


def test_fe252_equality():
    assert FieldElement252.from_int(5) == FieldElement252.from_int(5)
    assert FieldElement252.from_int(5) != FieldElement252.from_int(6)


# ---------------------------------------------------------------------------
# Poseidon hash primitives
# ---------------------------------------------------------------------------

def test_poseidon_hash_deterministic():
    assert poseidon_hash(1, 2) == poseidon_hash(1, 2)
    assert poseidon_hash(1, 2) != poseidon_hash(2, 1)


def test_poseidon_hash_many_deterministic():
    assert poseidon_hash_many([1, 2, 3]) == poseidon_hash_many([1, 2, 3])
    assert poseidon_hash_many([1, 2, 3]) != poseidon_hash_many([1, 2, 4])


def test_poseidon_hash_many_length_sensitive():
    assert poseidon_hash_many([1, 2]) != poseidon_hash_many([1, 2, 0])


# ---------------------------------------------------------------------------
# Poseidon252Channel
# ---------------------------------------------------------------------------

def test_channel_initial_state():
    ch = Poseidon252Channel()
    assert ch.digest == FieldElement252.zero()
    assert ch.channel_time.n_challenges == 0
    assert ch.channel_time.n_sent == 0


def test_channel_constants():
    assert Poseidon252Channel.BYTES_PER_HASH == 31


def test_channel_clone():
    ch = Poseidon252Channel()
    ch.mix_u64(42)
    clone = ch.clone()
    assert clone.digest == ch.digest
    assert clone.channel_time.n_challenges == ch.channel_time.n_challenges
    clone.mix_u64(1)
    assert clone.digest != ch.digest  # independent after clone


def test_update_digest_increments_challenges():
    ch = Poseidon252Channel()
    before = ch.channel_time.n_challenges
    ch.mix_u64(7)
    assert ch.channel_time.n_challenges == before + 1
    assert ch.channel_time.n_sent == 0


def test_trailing_zeros_all_zero_digest():
    ch = Poseidon252Channel()
    assert ch.trailing_zeros() == 128


def test_channel_time_tracking():
    ch = Poseidon252Channel()
    ch.draw_felt()
    assert ch.channel_time.n_sent > 0
    n_sent_before = ch.channel_time.n_sent
    ch.mix_u64(1)
    assert ch.channel_time.n_sent == 0  # mixing resets sent counter
    assert ch.channel_time.n_challenges == 1
    assert n_sent_before > 0


def test_draw_random_bytes_differ():
    ch = Poseidon252Channel()
    assert ch.draw_random_bytes() != ch.draw_random_bytes()


def test_draw_random_bytes_increments_n_sent():
    ch = Poseidon252Channel()
    before = ch.channel_time.n_sent
    ch.draw_random_bytes()
    assert ch.channel_time.n_sent == before + 1


def test_draw_random_bytes_valid():
    b = Poseidon252Channel().draw_random_bytes()
    assert isinstance(b, bytes)
    assert len(b) == 31
    assert all(0 <= x < 256 for x in b)


def test_draw_felt_differ():
    ch = Poseidon252Channel()
    assert ch.draw_felt() != ch.draw_felt()


def test_draw_felt_valid_qm31():
    f = Poseidon252Channel().draw_felt()
    assert isinstance(f, QM31)


def test_draw_felts_count():
    for n in (1, 5, 8, 17):
        assert len(Poseidon252Channel().draw_felts(n)) == n


def test_draw_felts_unique():
    felts = Poseidon252Channel().draw_felts(20)
    keys = {tuple(x.value for x in f.to_m31_array()) for f in felts}
    assert len(keys) == 20


def test_draw_felts_zero():
    assert Poseidon252Channel().draw_felts(0) == []


def test_draw_felts_large():
    assert len(Poseidon252Channel().draw_felts(100)) == 100


def test_mix_felts_changes_digest():
    ch = Poseidon252Channel()
    before = ch.digest
    ch.mix_felts([QM31.from_u32_unchecked(1, 2, 3, 4)])
    assert ch.digest != before


def test_mix_felts_increments_challenges():
    ch = Poseidon252Channel()
    ch.mix_felts([QM31.from_u32_unchecked(1, 2, 3, 4)])
    assert ch.channel_time.n_challenges == 1


def test_mix_felts_empty():
    ch = Poseidon252Channel()
    before = ch.digest
    ch.mix_felts([])
    assert ch.digest != before  # still hashes (length-domain-separated)


def test_mix_felts_odd_count():
    ch = Poseidon252Channel()
    ch.mix_felts([QM31.from_u32_unchecked(i, 0, 0, 0) for i in range(3)])
    assert ch.channel_time.n_challenges == 1


def test_mix_u32s_changes_digest():
    ch = Poseidon252Channel()
    before = ch.digest
    ch.mix_u32s([1, 2, 3, 4])
    assert ch.digest != before


def test_mix_u32s_known_digest():
    """Exact Rust digest pin (poseidon.test.ts:311-318 <- Rust stwo)."""
    ch = Poseidon252Channel()
    ch.mix_u32s([1, 2, 3, 4, 5, 6, 7, 8, 9])
    expected = int("078f5cf6a2e7362b75fc1f94daeae7ebddd64e6b2db77171"
                   "7519af7193dfa80b", 16)
    assert ch.digest.value == expected


def test_mix_u32s_padding_lengths():
    ch1, ch2 = Poseidon252Channel(), Poseidon252Channel()
    ch1.mix_u32s([1, 2, 3])
    ch2.mix_u32s([1, 2, 3, 4, 5, 6, 7])
    assert ch1.digest != FieldElement252.zero()
    assert ch2.digest != FieldElement252.zero()
    assert ch1.digest != ch2.digest


def test_mix_u64_equivalent_to_split_u32s():
    """mix_u64(v) == mix_u32s([hi, lo]) per reference poseidon channel
    (poseidon.test.ts:345-354)."""
    v = 0x1111222233334444
    ch1, ch2 = Poseidon252Channel(), Poseidon252Channel()
    ch1.mix_u64(v)
    ch2.mix_u32s([0, 0, 0, 0, 0, 0x11112222, 0x33334444])
    assert ch1.digest == ch2.digest


def test_mix_u64_increments_challenges():
    ch = Poseidon252Channel()
    ch.mix_u64(999)
    assert ch.channel_time.n_challenges == 1


def test_channel_consistency_across_instances():
    ch1, ch2 = Poseidon252Channel(), Poseidon252Channel()
    for ch in (ch1, ch2):
        ch.mix_u64(42)
        ch.mix_felts([QM31.from_u32_unchecked(1, 2, 3, 4)])
    assert ch1.digest == ch2.digest
    assert ch1.draw_felt() == ch2.draw_felt()


def test_channel_deterministic_sequence():
    ch = Poseidon252Channel()
    ch.mix_u64(7)
    a = [ch.draw_felt() for _ in range(3)]
    ch2 = Poseidon252Channel()
    ch2.mix_u64(7)
    b = [ch2.draw_felt() for _ in range(3)]
    assert a == b


def test_mix_max_u32_values():
    ch = Poseidon252Channel()
    ch.mix_u32s([0xFFFFFFFF] * 9)
    assert ch.digest != FieldElement252.zero()


def test_mix_max_u64():
    ch = Poseidon252Channel()
    ch.mix_u64(0xFFFFFFFFFFFFFFFF)
    assert ch.digest != FieldElement252.zero()


def test_mix_large_array():
    ch = Poseidon252Channel()
    ch.mix_u32s(list(range(100)))
    assert ch.digest != FieldElement252.zero()


def test_draw_many_felts_after_mixing():
    ch = Poseidon252Channel()
    ch.mix_u64(123)
    felts = ch.draw_felts(50)
    assert len(felts) == 50
    assert len({tuple(x.value for x in f.to_m31_array())
                for f in felts}) == 50
