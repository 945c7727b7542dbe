"""Quotient low-degree test (port of the embedded Rust
pcs/quotients.rs test_quotients_are_low_degree)."""
import numpy as np

from tstwo_tpu.circle import SECURE_FIELD_CIRCLE_GEN, CanonicCoset
from tstwo_tpu.fields import M31, QM31
from tstwo_tpu.ops import m31 as m31_ops
from tstwo_tpu.pcs.quotients import (PointSample, accumulate_row_quotients,
                                     ColumnSampleBatch, compute_fri_quotients,
                                     quotient_constants)
from tstwo_tpu.poly.circle_poly import CircleEvaluation, CirclePoly
from tstwo_tpu.utils import bit_reverse_index


def test_quotients_are_low_degree():
    LOG_SIZE = 5
    LOG_BLOWUP = 1
    poly = CirclePoly(m31_ops.asarray(
        np.arange(1 << LOG_SIZE, dtype=np.uint32)))
    eval_domain = CanonicCoset.new(LOG_SIZE + 1).circle_domain()
    ev = poly.evaluate(eval_domain)
    point = SECURE_FIELD_CIRCLE_GEN
    value = poly.eval_at_point(point)
    coeff = QM31.from_u32_unchecked(1, 2, 3, 4)
    quot = compute_fri_quotients(
        [ev], [[PointSample(point, value)]], coeff, LOG_BLOWUP)[0]
    # each coordinate interpolates to a poly of degree < 2^LOG_SIZE (+1 fri)
    sp = quot.interpolate()
    for cp in sp.coordinate_polys():
        assert cp.is_in_fri_space(LOG_SIZE), (
            np.asarray(cp.coeffs)[(1 << LOG_SIZE):].nonzero())


def test_device_quotients_match_host_rows():
    LOG_SIZE = 4
    rng = np.random.default_rng(0)
    cols = [m31_ops.asarray(rng.integers(0, (1 << 31) - 1, size=1 << LOG_SIZE,
                                         dtype=np.uint32)) for _ in range(2)]
    domain = CanonicCoset.new(LOG_SIZE).circle_domain()
    evs = [CircleEvaluation(domain, c) for c in cols]
    point = SECURE_FIELD_CIRCLE_GEN
    samples = [[PointSample(point, QM31.from_u32_unchecked(5, 6, 7, 8))],
               [PointSample(point, QM31.from_u32_unchecked(9, 1, 2, 3))]]
    coeff = QM31.from_u32_unchecked(11, 22, 33, 44)
    quot = compute_fri_quotients(evs, samples, coeff, 1)[0]
    batches = ColumnSampleBatch.new_vec(samples)
    consts = quotient_constants(batches, coeff)
    cols_np = [np.asarray(c) for c in cols]
    for row in [0, 1, 7, 15]:
        p = domain.at(bit_reverse_index(row, LOG_SIZE))
        expected = accumulate_row_quotients(
            batches, [M31(int(c[row])) for c in cols_np], consts, p)
        assert quot.at(row) == expected, row


def test_fri_answers_device_matches_host_scalar():
    """Batched device fri_answers == per-query host recomputation."""
    import numpy as np

    from tstwo_tpu.circle import CanonicCoset, SECURE_FIELD_CIRCLE_GEN
    from tstwo_tpu.fields import QM31
    from tstwo_tpu.pcs.quotients import (ColumnSampleBatch, PointSample,
                                         _fri_answers_for_log_size,
                                         quotient_constants)

    rng = np.random.default_rng(42)
    log_size = 7
    n_cols = 5
    n_queries = 9
    point = SECURE_FIELD_CIRCLE_GEN
    point2 = point + point
    samples = []
    for i in range(n_cols):
        s = [PointSample(point, QM31.from_u32_unchecked(
            *rng.integers(0, (1 << 31) - 1, size=4).tolist()))]
        if i % 2 == 0:
            s.append(PointSample(point2, QM31.from_u32_unchecked(
                *rng.integers(0, (1 << 31) - 1, size=4).tolist())))
        samples.append(s)
    coeff = QM31.from_u32_unchecked(5, 6, 7, 8)
    queries = sorted(rng.choice(1 << log_size, size=n_queries,
                                replace=False).tolist())
    qvals = [M31(int(v)) for v in rng.integers(
        0, (1 << 31) - 1, size=n_queries * n_cols)]

    def run(device):
        iters = [iter(list(qvals))]
        return _fri_answers_for_log_size(
            log_size, samples, coeff, queries, iters, [n_cols],
            device=device)

    got = run(True)
    want = run(False)
    assert got == want


def test_accumulate_quotients_usable_under_jit():
    """Regression for the r3 tracer leak: the first call happening inside a
    jax.jit trace must not poison the domain-point cache for later
    un-jitted calls (pcs/quotients.py domain_points_bitrev)."""
    import jax
    import jax.numpy as jnp

    from tstwo_tpu.circle import SECURE_FIELD_CIRCLE_GEN, CanonicCoset
    from tstwo_tpu.pcs import quotients as q

    # fresh cache state for the domain under test
    log_size = 6
    domain = CanonicCoset.new(log_size).circle_domain()
    key = (domain.half_coset.initial_index.value, domain.half_coset.log_size)
    q._DEV_POINTS_CACHE.pop(key, None)
    q._domain_points_bitrev_np.cache_clear()

    rng = np.random.default_rng(11)
    n = 1 << log_size
    cols = jnp.asarray(
        rng.integers(0, (1 << 31) - 1, size=(4, n), dtype=np.uint32))
    samples = [[PointSample(SECURE_FIELD_CIRCLE_GEN,
                            QM31.from_u32_unchecked(i + 1, 2, 3, 4))]
               for i in range(4)]
    batches = ColumnSampleBatch.new_vec(samples)
    coeff = QM31.from_u32_unchecked(5, 6, 7, 8)

    @jax.jit
    def jitted(stack):
        return q.accumulate_quotients(
            domain, [stack[i] for i in range(4)], coeff, batches, 1).values

    first = np.asarray(jitted(cols))          # first call INSIDE a trace
    second = np.asarray(q.accumulate_quotients(   # then un-jitted
        domain, [cols[i] for i in range(4)], coeff, batches, 1).values)
    assert np.array_equal(first, second)
    # and the jitted wrapper stays callable (r3: raised UnexpectedTracerError)
    third = np.asarray(jitted(cols))
    assert np.array_equal(first, third)
