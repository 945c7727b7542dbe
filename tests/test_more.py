"""Additional component tests: proof-of-work, line polys, accumulators,
prefix sums, wide-Fibonacci e2e, assert evaluator."""
import numpy as np
import pytest

from tstwo_tpu.channel.blake2s import Blake2sChannel
from tstwo_tpu.circle import CanonicCoset, Coset
from tstwo_tpu.fields import M31, QM31
from tstwo_tpu.ops import m31 as m31_ops
from tstwo_tpu.ops.prefix_sum import (exclusive_prefix_sum,
                                      inclusive_prefix_sum)
from tstwo_tpu.proof_of_work import grind_device, grind_host
from tstwo_tpu.poly.line import LineDomain, LineEvaluation, LinePoly


def test_grind_device_matches_host():
    ch = Blake2sChannel()
    ch.mix_u64(42)
    for bits in [4, 8, 12]:
        assert grind_host(ch, bits) == grind_device(ch, bits, batch=1 << 12)


def test_grind_validates():
    ch = Blake2sChannel()
    nonce = grind_host(ch, 10)
    ch2 = ch.clone()
    ch2.mix_u64(nonce)
    assert ch2.trailing_zeros() >= 10


def test_line_poly_eval_and_interpolate_roundtrip():
    rng = np.random.default_rng(0)
    domain = LineDomain.new(Coset.half_odds(3))
    vals = [QM31.from_ints([int(x) for x in rng.integers(0, (1 << 31) - 1, 4)])
            for _ in range(8)]
    import jax.numpy as jnp

    arr = np.array([v.to_ints() for v in vals], dtype=np.uint32).T
    ev = LineEvaluation(domain, jnp.asarray(arr))
    poly = ev.interpolate()
    # bit-reversed evals: ev[i] = poly(x at bitrev index)
    from tstwo_tpu.utils import bit_reverse_index

    for i in range(8):
        x = domain.at(bit_reverse_index(i, 3))
        assert poly.eval_at_point(QM31.from_base(x)) == vals[i], i


def test_line_poly_ordered_coefficients_roundtrip():
    rng = np.random.default_rng(1)
    coeffs = [QM31.from_ints([int(x) for x in rng.integers(0, 100, 4)])
              for _ in range(4)]
    poly = LinePoly.from_ordered_coefficients(coeffs)
    assert poly.into_ordered_coefficients() == coeffs


def test_prefix_sums():
    rng = np.random.default_rng(2)
    x = rng.integers(0, (1 << 31) - 1, size=64, dtype=np.uint32)
    inc = np.asarray(inclusive_prefix_sum(m31_ops.asarray(x)))
    exc = np.asarray(exclusive_prefix_sum(m31_ops.asarray(x)))
    P = (1 << 31) - 1
    expected = np.cumsum(x.astype(np.uint64)) % P
    np.testing.assert_array_equal(inc, expected.astype(np.uint32))
    np.testing.assert_array_equal(exc[1:], expected[:-1].astype(np.uint32))
    assert exc[0] == 0


def test_generate_secure_powers():
    from tstwo_tpu.air.accumulator import generate_secure_powers

    felt = QM31.from_u32_unchecked(1, 2, 3, 4)
    powers = generate_secure_powers(felt, 5)
    assert powers[0] == QM31.one()
    for i in range(1, 5):
        assert powers[i] == powers[i - 1] * felt


def test_point_evaluation_accumulator_horner():
    from tstwo_tpu.air.accumulator import PointEvaluationAccumulator

    alpha = QM31.from_u32_unchecked(2, 0, 0, 0)
    acc = PointEvaluationAccumulator(alpha)
    vals = [QM31.from_u32_unchecked(v, 0, 0, 0) for v in (3, 5, 7)]
    for v in vals:
        acc.accumulate(v)
    # 3*alpha^2 + 5*alpha + 7
    expected = vals[0] * alpha * alpha + vals[1] * alpha + vals[2]
    assert acc.finalize() == expected


def test_assert_evaluator_passes_on_valid_trace():
    from tstwo_tpu.constraint_framework import assert_constraints
    from tstwo_tpu.examples.basic_air import TestEval, generate_trace
    from tstwo_tpu.pcs.utils import TreeVec

    cols = generate_trace(4)
    assert_constraints(TreeVec([[], cols]), 4, TestEval(4))


def test_assert_evaluator_rejects_invalid_trace():
    import jax.numpy as jnp

    from tstwo_tpu.constraint_framework import assert_constraints
    from tstwo_tpu.examples.basic_air import TestEval, generate_trace
    from tstwo_tpu.pcs.utils import TreeVec

    cols = generate_trace(4)
    bad = cols[2].at[0].set(jnp.uint32(12345))
    with pytest.raises(AssertionError):
        assert_constraints(TreeVec([[], [cols[0], cols[1], bad]]), 4, TestEval(4))


def test_wide_fibonacci_prove_verify():
    from tstwo_tpu.examples.wide_fibonacci import (prove_wide_fibonacci,
                                                  verify_wide_fibonacci)

    proof, component, config = prove_wide_fibonacci(
        log_n_rows=4, sequence_length=8)
    verify_wide_fibonacci(proof, component, config, log_n_rows=4)


def test_queries_fold_and_generate():
    from tstwo_tpu.queries import Queries

    ch = Blake2sChannel()
    q = Queries.generate(ch, 10, 7)
    assert len(q) == 7
    assert list(q.positions) == sorted(set(q.positions))
    folded = q.fold(3)
    assert folded.log_domain_size == 7
    assert list(folded.positions) == sorted({p >> 3 for p in q.positions})


def test_offset_bit_reversed_index():
    from tstwo_tpu.utils import (offset_bit_reversed_circle_domain_index,
                                 previous_bit_reversed_circle_domain_index)

    # previous of offset +1 round-trips
    for i in range(16):
        j = offset_bit_reversed_circle_domain_index(i, 3, 4, 1)
        k = previous_bit_reversed_circle_domain_index(j, 3, 4)
        assert k == i
