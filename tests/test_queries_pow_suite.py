"""Query-generation and proof-of-work suites.

Port of reference test/queries/queries.test.ts (34 cases) and
test/proof_of_work.test.ts (33 cases), restricted to the behavior the Rust
spec defines; TypeScript-isms (private-constructor guards, `isQueryChannel`
duck-type checks, undefined/null handling) are intentionally not ported.
"""
import pytest

from tstwo_tpu.channel.blake2s import Blake2sChannel
from tstwo_tpu.proof_of_work import grind, grind_host
from tstwo_tpu.queries import (UPPER_BOUND_QUERY_BYTES, Queries,
                               get_query_positions_by_log_size)


class TestQueryChannel:
    """Deterministic counter-byte channel (queries.test.ts:16-23)."""

    def __init__(self):
        self.counter = 0

    def draw_random_bytes(self) -> bytes:
        out = bytes((self.counter + i) % 256 for i in range(8))
        self.counter += 8
        return out


# ---------------------------------------------------------------------------
# queries.test.ts
# ---------------------------------------------------------------------------

def test_upper_bound_query_bytes_constant():
    assert UPPER_BOUND_QUERY_BYTES == 4


def test_generate_factory():
    q = Queries.generate(TestQueryChannel(), 4, 3)
    assert isinstance(q, Queries)
    assert len(q) == 3


def test_from_positions_factory():
    q = Queries.from_positions([0, 1, 2], 4)
    assert len(q) == 3
    assert list(q.positions) == [0, 1, 2]


def test_generate_unique_sorted_within_domain():
    q = Queries.generate(Blake2sChannel(), 8, 10)
    pos = list(q.positions)
    assert len(pos) == 10
    assert pos == sorted(pos)
    assert len(set(pos)) == 10
    assert max(pos) < (1 << 8)
    assert min(pos) >= 0


def test_generate_small():
    q = Queries.generate(TestQueryChannel(), 3, 2)
    assert len(q) == 2
    pos = list(q.positions)
    assert pos == sorted(pos)
    assert len(set(pos)) == 2
    assert max(pos) < 8


def test_generate_single_query():
    assert len(Queries.generate(TestQueryChannel(), 2, 1)) == 1


def test_generate_zero_queries():
    assert len(Queries.generate(TestQueryChannel(), 2, 0)) == 0


@pytest.mark.parametrize("log_size", [1, 4, 16, 31])
def test_generate_valid_log_domain_sizes(log_size):
    q = Queries.generate(Blake2sChannel(), log_size, 2)
    assert len(q) == 2
    assert q.log_domain_size == log_size


def test_fold_queries_correctly():
    """Folding halves positions: p >> n, deduped, sorted
    (queries.test.ts:133-147)."""
    q = Queries.from_positions([0, 1, 4, 5, 6, 7], 3)
    f = q.fold(1)
    assert list(f.positions) == [0, 2, 3]
    assert f.log_domain_size == 2


def test_fold_to_zero_domain():
    q = Queries.from_positions([0, 3, 7], 3)
    f = q.fold(3)
    assert list(f.positions) == [0]
    assert f.log_domain_size == 0


def test_fold_validates_n_folds():
    q = Queries.from_positions([0, 1], 2)
    with pytest.raises(ValueError):
        q.fold(3)


def test_fold_zero_is_identity():
    q = Queries.from_positions([1, 2, 3], 3)
    f = q.fold(0)
    assert list(f.positions) == [1, 2, 3]
    assert f.log_domain_size == 3


def test_from_positions_rejects_unsorted():
    with pytest.raises(ValueError):
        Queries.from_positions([2, 1], 4)


def test_from_positions_rejects_out_of_domain():
    with pytest.raises(ValueError):
        Queries.from_positions([0, 16], 4)


def test_positions_length_iterable():
    q = Queries.from_positions([1, 3, 5], 4)
    assert len(q) == 3
    assert list(iter(q)) == [1, 3, 5]


def test_queries_equality():
    a = Queries.from_positions([1, 2], 4)
    b = Queries.from_positions([1, 2], 4)
    c = Queries.from_positions([1, 3], 4)
    assert a == b
    assert a != c


def test_generate_deterministic_per_channel_state():
    """Same channel digest -> same queries (queries.test.ts:219-233)."""
    a = Queries.generate(Blake2sChannel(), 10, 5)
    b = Queries.generate(Blake2sChannel(), 10, 5)
    assert a == b
    ch = Blake2sChannel()
    ch.mix_u64(7)
    c = Queries.generate(ch, 10, 5)
    assert a != c


def test_generate_with_real_blake2s_channel():
    q = Queries.generate(Blake2sChannel(), 6, 4)
    assert len(q) == 4
    assert all(0 <= p < 64 for p in q.positions)


def test_query_positions_by_log_size():
    """fri.ts:470-482: per-size folded positions."""
    q = Queries.from_positions([0, 5, 10, 15], 4)
    by_log = get_query_positions_by_log_size(q, {4, 3, 2})
    assert by_log[4] == [0, 5, 10, 15]
    assert by_log[3] == [0, 2, 5, 7]
    assert by_log[2] == [0, 1, 2, 3]


def test_query_positions_by_log_size_dedupes():
    q = Queries.from_positions([8, 9, 10, 11], 4)
    by_log = get_query_positions_by_log_size(q, {1})
    assert by_log[1] == [1]


# ---------------------------------------------------------------------------
# proof_of_work.test.ts
# ---------------------------------------------------------------------------

def test_grind_finds_nonce_small_pow_bits():
    ch = Blake2sChannel()
    nonce = grind(ch, 3)
    check = Blake2sChannel()
    check.mix_u64(nonce)
    assert check.trailing_zeros() >= 3


def test_grind_zero_pow_bits():
    ch = Blake2sChannel()
    nonce = grind(ch, 0)
    assert nonce >= 0


@pytest.mark.parametrize("bits", [1, 2, 4, 6])
def test_grind_valid_pow_bits(bits):
    ch = Blake2sChannel()
    ch.mix_u64(bits)  # vary start state
    nonce = grind(ch, bits)
    check = ch.clone()
    check.mix_u64(nonce)
    assert check.trailing_zeros() >= bits


def test_grind_host_device_agree():
    """The device batched grind must return the SAME (smallest) nonce as
    the sequential host loop."""
    for seed in (0, 1, 2):
        ch = Blake2sChannel()
        ch.mix_u64(seed)
        assert grind(ch.clone(), 5) == grind_host(ch.clone(), 5)


def test_grind_does_not_mutate_channel():
    ch = Blake2sChannel()
    before = ch.digest
    grind(ch, 2)
    assert ch.digest == before


def test_grind_deterministic():
    a = grind(Blake2sChannel(), 4)
    b = grind(Blake2sChannel(), 4)
    assert a == b


def test_grind_different_states_different_nonces():
    ch1 = Blake2sChannel()
    ch2 = Blake2sChannel()
    ch2.mix_u64(1234)
    n1, n2 = grind(ch1, 6), grind(ch2, 6)
    # overwhelmingly likely to differ; equality would indicate the state
    # is being ignored
    assert (n1 != n2) or ch1.digest == ch2.digest


def test_grind_multiple_sequential():
    ch = Blake2sChannel()
    for bits in (1, 2, 3):
        nonce = grind(ch, bits)
        ch.mix_u64(nonce)
    assert ch.channel_time.n_challenges >= 3


def test_trailing_zeros_semantics():
    """channel/blake2.ts:95-113: trailing zeros of first 16 digest bytes
    as LE u128."""
    ch = Blake2sChannel(digest=b"\x01" + b"\x00" * 31)
    assert ch.trailing_zeros() == 0
    ch = Blake2sChannel(digest=b"\x02" + b"\x00" * 31)
    assert ch.trailing_zeros() == 1
    ch = Blake2sChannel(digest=b"\x00" * 32)
    assert ch.trailing_zeros() == 128
    ch = Blake2sChannel(digest=b"\x00\x01" + b"\x00" * 30)
    assert ch.trailing_zeros() == 8
