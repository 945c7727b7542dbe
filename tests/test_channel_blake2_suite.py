"""Port of reference test/channel/blake2.test.ts (32 cases; the two
exact-Rust digest pins already live in test_channel.py and are not
duplicated here).  Behavior pinned: channel-time bookkeeping, draw
uniqueness/validity, mix semantics, u64/u32 endianness equivalence,
determinism, trailing zeros.
"""
import pytest

from tstwo_tpu.channel.blake2s import (BLAKE_BYTES_PER_HASH, FELTS_PER_HASH,
                                       Blake2sChannel)
from tstwo_tpu.fields import M31, QM31

P = (1 << 31) - 1


@pytest.fixture
def channel():
    return Blake2sChannel()


# -- initialization ---------------------------------------------------------

def test_initial_channel_time(channel):
    assert channel.channel_time.n_challenges == 0
    assert channel.channel_time.n_sent == 0


def test_constants(channel):
    assert channel.BYTES_PER_HASH == BLAKE_BYTES_PER_HASH == 32
    assert FELTS_PER_HASH == 8


def test_digest_bytes(channel):
    assert isinstance(channel.digest, bytes)
    assert len(channel.digest) == 32


def test_default_digest_all_zero(channel):
    assert channel.digest == b"\x00" * 32


# -- trailing zeros ---------------------------------------------------------

def test_trailing_zeros_all_zero_digest(channel):
    assert channel.trailing_zeros() == 128


def test_trailing_zeros_bounded_after_mix(channel):
    channel.mix_u64(0x0001000000000000)
    tz = channel.trailing_zeros()
    assert 0 <= tz <= 128


# -- channel time tracking --------------------------------------------------

def test_channel_time_tracking(channel):
    channel.draw_random_bytes()
    assert channel.channel_time.n_challenges == 0
    assert channel.channel_time.n_sent == 1
    channel.mix_u64(123)
    assert channel.channel_time.n_challenges == 1
    assert channel.channel_time.n_sent == 0


def test_n_sent_increments(channel):
    channel.draw_random_bytes()
    channel.draw_random_bytes()
    assert channel.channel_time.n_sent == 2


# -- draws ------------------------------------------------------------------

def test_draw_random_bytes_differ(channel):
    a = channel.draw_random_bytes()
    b = channel.draw_random_bytes()
    assert a != b and len(a) == 32 and len(b) == 32


def test_draw_felt_differ(channel):
    assert channel.draw_felt() != channel.draw_felt()


def test_draw_felt_valid_secure_field(channel):
    felt = channel.draw_felt()
    assert isinstance(felt, QM31)
    assert all(0 <= v < P for v in felt.to_ints())


def test_draw_felts_count(channel):
    felts = channel.draw_felts(5)
    assert len(felts) == 5
    assert all(isinstance(f, QM31) for f in felts)


def test_draw_felts_unique(channel):
    felts = channel.draw_felts(10)
    assert len({f.to_ints() for f in felts}) == 10


def test_draw_felts_zero(channel):
    assert channel.draw_felts(0) == []


def test_draw_felts_large(channel):
    assert len(channel.draw_felts(100)) == 100


# -- mixes ------------------------------------------------------------------

def test_mix_felts_changes_digest(channel):
    before = channel.digest
    channel.mix_felts([QM31.from_base(M31(123)), QM31.from_base(M31(456))])
    assert channel.digest != before


def test_mix_felts_increments_challenges(channel):
    channel.mix_felts([QM31.from_base(M31(123))])
    assert channel.channel_time.n_challenges == 1


def test_mix_felts_empty_still_advances(channel):
    before = channel.digest
    channel.mix_felts([])
    assert channel.digest != before


def test_mix_u32s_changes_digest(channel):
    before = channel.digest
    channel.mix_u32s([1, 2, 3, 4])
    assert channel.digest != before


def test_mix_u32s_empty_still_advances(channel):
    before = channel.digest
    channel.mix_u32s([])
    assert channel.digest != before


def test_mix_u32s_increments_challenges(channel):
    channel.mix_u32s([1, 2, 3])
    assert channel.channel_time.n_challenges == 1


def test_mix_u64_equals_two_u32s_le():
    c1, c2 = Blake2sChannel(), Blake2sChannel()
    c1.mix_u64(0x1111222233334444)
    c2.mix_u32s([0x33334444, 0x11112222])
    assert c1.digest == c2.digest


def test_mix_u64_max_and_zero(channel):
    before = channel.digest
    channel.mix_u64(0xFFFFFFFFFFFFFFFF)
    mid = channel.digest
    assert mid != before
    channel.mix_u64(0)
    assert channel.digest != mid


# -- edge cases -------------------------------------------------------------

def test_many_consecutive_operations(channel):
    for i in range(100):
        channel.mix_u32s([i])
        channel.draw_felt()
    assert channel.channel_time.n_challenges == 100


def test_deterministic_across_instances():
    c1, c2 = Blake2sChannel(), Blake2sChannel()
    c1.mix_u64(12345)
    c2.mix_u64(12345)
    assert c1.draw_felt() == c2.draw_felt()


def test_mix_large_u32_array(channel):
    channel.mix_u32s([i % 0xFFFFFFFF for i in range(1000)])
    assert len(channel.digest) == 32


def test_draw_felt_consistently_valid(channel):
    for _ in range(10):
        felt = channel.draw_felt()
        assert isinstance(felt, QM31)


def test_clone_is_independent(channel):
    channel.mix_u64(7)
    cp = channel.clone()
    assert cp == channel
    cp.draw_felt()
    assert cp != channel
    assert channel.channel_time.n_sent == 0
