"""Index-utility + test-helper + GkrMask suites.

Port of reference test/utils.test.ts (10 cases), test/test_utils.test.ts
(19 cases, behavioral subset — TS type-safety cases are meaningless here),
and the GkrMask / error cases of test/gkr_verifier.test.ts:225-280.
"""
import numpy as np
import pytest

from tstwo_tpu.fields import M31, QM31
from tstwo_tpu.utils import (bit_reverse_index, bit_reverse_list,
                             bit_reverse_permutation,
                             circle_domain_index_to_coset_index,
                             coset_index_to_circle_domain_index,
                             offset_bit_reversed_circle_domain_index,
                             previous_bit_reversed_circle_domain_index)

P = (1 << 31) - 1


def q(v):
    return QM31.from_base(M31(v % P))


# ---------------------------------------------------------------------------
# utils.test.ts
# ---------------------------------------------------------------------------

def test_bit_reverse_index_log3_table():
    expected = [0, 4, 2, 6, 1, 5, 3, 7]
    for i, want in enumerate(expected):
        assert bit_reverse_index(i, 3) == want


def test_bit_reverse_index_zero_log_size():
    assert bit_reverse_index(5, 0) == 5


def test_bit_reverse_index_involution():
    for log in (1, 2, 5, 8):
        for i in range(1 << log):
            assert bit_reverse_index(bit_reverse_index(i, log), log) == i


def test_circle_domain_coset_index_roundtrip():
    log_size = 3
    for i in range(1 << log_size):
        coset_idx = circle_domain_index_to_coset_index(i, log_size)
        assert coset_index_to_circle_domain_index(coset_idx, log_size) == i


def test_coset_index_to_circle_domain_index_halves():
    """First half of the coset maps to even circle-domain slots, second
    half to the reversed odd slots (reference utils.ts)."""
    log_size = 3
    got = [coset_index_to_circle_domain_index(i, log_size)
           for i in range(1 << log_size)]
    assert sorted(got) == list(range(1 << log_size))


def test_offset_equals_iterated_previous():
    """offset(-2) == previous(previous(.)) (utils.test.ts:50-73)."""
    domain_log, eval_log, idx = 3, 6, 5
    actual = offset_bit_reversed_circle_domain_index(idx, domain_log,
                                                     eval_log, -2)
    prev = previous_bit_reversed_circle_domain_index(idx, domain_log,
                                                     eval_log)
    prev2 = previous_bit_reversed_circle_domain_index(prev, domain_log,
                                                      eval_log)
    assert actual == prev2


def test_offset_zero_is_identity():
    assert offset_bit_reversed_circle_domain_index(5, 3, 6, 0) == 5


def test_bit_reverse_coset_to_circle_domain_order():
    """Composite permutation fixed vector (utils.test.ts:85-91)."""
    arr = [0, 1, 2, 3, 4, 5, 6, 7]
    n = len(arr)
    log_size = n.bit_length() - 1
    out = [None] * n
    for i in range(n):
        j = bit_reverse_index(coset_index_to_circle_domain_index(i, log_size),
                              log_size)
        out[j] = arr[i]
    assert out == [0, 7, 4, 3, 2, 5, 6, 1]


def test_bit_reverse_list_matches_permutation():
    vals = list(range(16))
    perm = bit_reverse_permutation(4)
    assert bit_reverse_list(vals) == [vals[p] for p in perm]


def test_bit_reverse_list_rejects_non_power_of_two():
    with pytest.raises((ValueError, AssertionError)):
        bit_reverse_list([1, 2, 3])


# ---------------------------------------------------------------------------
# test_utils.test.ts — secure_eval_to_base_eval behavioral equivalent
# ---------------------------------------------------------------------------

def _secure_eval(log_size, rows):
    import jax.numpy as jnp

    from tstwo_tpu.circle import CanonicCoset
    from tstwo_tpu.poly.circle_poly import SecureEvaluation

    domain = CanonicCoset.new(log_size).circle_domain()
    return SecureEvaluation(domain, jnp.asarray(
        np.asarray(rows, dtype=np.uint32)))


def test_secure_eval_first_coordinate_extraction():
    """Rust secure_eval_to_base_eval keeps coordinate 0 of each value."""
    rows = [[1, 2, 3, 4], [5, 6, 7, 8], [9, 10, 11, 12], [13, 14, 15, 16]]
    se = _secure_eval(2, rows)
    base = np.asarray(se.columns()[0])
    np.testing.assert_array_equal(base, np.asarray(rows[0]))


def test_secure_eval_preserves_domain():
    se = _secure_eval(3, np.zeros((4, 8)))
    assert se.domain.log_size() == 3


def test_secure_eval_zero_values():
    se = _secure_eval(2, np.zeros((4, 4)))
    assert all(int(x) == 0 for x in np.asarray(se.columns()[0]))


def test_secure_eval_max_m31_values():
    rows = np.full((4, 4), P - 1, dtype=np.uint32)
    se = _secure_eval(2, rows)
    np.testing.assert_array_equal(np.asarray(se.columns()[3]),
                                  np.full(4, P - 1))


def test_test_channel_defaults():
    """Rust test_channel(): fresh default Blake2sChannel each call."""
    from tstwo_tpu.channel.blake2s import Blake2sChannel

    a, b = Blake2sChannel(), Blake2sChannel()
    assert a.digest == b"\x00" * 32
    assert a.channel_time.n_challenges == 0
    assert a.channel_time.n_sent == 0
    a.mix_u64(1)
    assert b.digest == b"\x00" * 32  # independent instances


def test_test_channel_supports_crypto_ops():
    from tstwo_tpu.channel.blake2s import Blake2sChannel

    ch = Blake2sChannel()
    ch.mix_u64(7)
    ch.mix_felts([q(1)])
    felt = ch.draw_felt()
    assert isinstance(felt, QM31)
    assert len(ch.draw_random_bytes()) == 32


# ---------------------------------------------------------------------------
# gkr_verifier.test.ts:225-280 — GkrMask + error types
# ---------------------------------------------------------------------------

def test_gkr_mask_columns_and_rows():
    from tstwo_tpu.lookups.gkr import GkrMask

    mask = GkrMask([(q(1), q(2)), (q(3), q(4))])
    assert len(mask.columns()) == 2
    row0, row1 = mask.to_rows()
    assert row0 == [q(1), q(3)]
    assert row1 == [q(2), q(4)]


def test_gkr_mask_reduce_at_point():
    from tstwo_tpu.lookups.gkr import GkrMask
    from tstwo_tpu.lookups.utils import fold_mle_evals

    mask = GkrMask([(q(1), q(2)), (q(3), q(4))])
    point = q(5)
    reduced = mask.reduce_at_point(point)
    assert len(reduced) == 2
    assert reduced[0] == fold_mle_evals(point, q(1), q(2))
    assert reduced[1] == fold_mle_evals(point, q(3), q(4))


def test_gkr_mask_single_column():
    from tstwo_tpu.lookups.gkr import GkrMask

    mask = GkrMask([(q(2), q(3))])
    assert len(mask.columns()) == 1


def test_gkr_error_surface():
    from tstwo_tpu.lookups.gkr import GkrError

    err = GkrError("proof data is invalid")
    assert "invalid" in str(err)


def test_partially_verify_batch_rejects_malformed():
    """Mismatched per-instance array lengths must fail, not crash
    (gkr_verifier.test.ts:279+)."""
    import jax.numpy as jnp

    from tstwo_tpu.channel.blake2s import Blake2sChannel
    from tstwo_tpu.lookups.gkr import (GRAND_PRODUCT, GkrError, Layer,
                                       partially_verify_batch, prove_batch)
    from tstwo_tpu.lookups.mle import Mle

    rng = np.random.default_rng(0)
    evals = jnp.asarray(rng.integers(0, P, size=(4, 8), dtype=np.uint32))
    proof, _ = prove_batch(Blake2sChannel(), [Layer(GRAND_PRODUCT,
                                                    data=Mle(evals))])
    with pytest.raises((GkrError, ValueError, IndexError)):
        partially_verify_batch([GRAND_PRODUCT, GRAND_PRODUCT], proof,
                               Blake2sChannel())
