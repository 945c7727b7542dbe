"""Air aggregation + accumulator suite.

Port of reference test/air/accumulator.test.ts (22 cases),
test/air/components.test.ts (28 cases), and the accumulation /
generate_secure_powers cases of test/backend/simd.test.ts:1501-1671,
restricted to Rust-defined behavior (the TS null/type-guard cases are not
ported).  Mock components mirror the reference's test fixtures.
"""
import numpy as np
import pytest

from tstwo_tpu.air import PREPROCESSED_TRACE_IDX
from tstwo_tpu.air.accumulator import (ColumnAccumulator,
                                       DomainEvaluationAccumulator,
                                       PointEvaluationAccumulator,
                                       generate_secure_powers)
from tstwo_tpu.air.components import ComponentProvers, Components
from tstwo_tpu.air.mask import fixed_mask_points, shifted_mask_points
from tstwo_tpu.circle import CanonicCoset, CirclePoint
from tstwo_tpu.fields import M31, QM31
from tstwo_tpu.ops import qm31 as qm31_ops
from tstwo_tpu.pcs.utils import TreeVec

P = (1 << 31) - 1
RANDOM_COEFF = QM31.from_u32_unchecked(1, 2, 3, 4)


def q(v):
    return QM31.from_base(M31(v % P))


# ---------------------------------------------------------------------------
# PointEvaluationAccumulator (accumulator.test.ts:28-92)
# ---------------------------------------------------------------------------

def test_point_accumulator_starts_at_zero():
    acc = PointEvaluationAccumulator(RANDOM_COEFF)
    assert acc.accumulation == QM31.zero()


def test_point_accumulator_accumulates():
    acc = PointEvaluationAccumulator(RANDOM_COEFF)
    e1 = QM31.from_u32_unchecked(1, 0, 0, 0)
    e2 = QM31.from_u32_unchecked(0, 1, 0, 0)
    acc.accumulate(e1)
    assert acc.accumulation == e1
    acc.accumulate(e2)
    assert acc.accumulation == e1 * RANDOM_COEFF + e2


def test_point_accumulator_finalize():
    acc = PointEvaluationAccumulator(RANDOM_COEFF)
    e = QM31.from_u32_unchecked(1, 1, 0, 0)
    acc.accumulate(e)
    assert acc.finalize() == e


def test_point_accumulator_reverse_order_formula():
    acc = PointEvaluationAccumulator(RANDOM_COEFF)
    evals = [QM31.from_u32_unchecked(1, 0, 0, 0),
             QM31.from_u32_unchecked(0, 1, 0, 0),
             QM31.from_u32_unchecked(0, 0, 1, 0)]
    for e in evals:
        acc.accumulate(e)
    expected = QM31.zero()
    for e in evals:
        expected = expected * RANDOM_COEFF + e
    assert acc.finalize() == expected


# ---------------------------------------------------------------------------
# generate_secure_powers (accumulator.ts:258-268 + simd.test.ts:1539-1652)
# ---------------------------------------------------------------------------

def test_secure_powers_zero_powers():
    assert generate_secure_powers(q(7), 0) == []


def test_secure_powers_single():
    assert generate_secure_powers(q(7), 1) == [QM31.one()]


def test_secure_powers_within_lane():
    felt = q(3)
    powers = generate_secure_powers(felt, 5)
    assert powers[0] == QM31.one()
    assert powers[1] == felt
    assert powers[2] == felt * felt
    assert powers[4] == felt * felt * felt * felt


def test_secure_powers_exceeding_lane():
    """More than N_LANES(=16) powers stay consistent."""
    felt = QM31.from_u32_unchecked(5, 1, 0, 2)
    powers = generate_secure_powers(felt, 40)
    assert len(powers) == 40
    for i in range(1, 40):
        assert powers[i] == powers[i - 1] * felt


def test_secure_powers_exact_lane_boundary():
    felt = QM31.from_u32_unchecked(9, 8, 7, 6)
    powers = generate_secure_powers(felt, 16)
    assert len(powers) == 16
    assert powers[15] == powers[14] * felt


def test_secure_powers_felt_zero():
    powers = generate_secure_powers(QM31.zero(), 4)
    assert powers == [QM31.one(), QM31.zero(), QM31.zero(), QM31.zero()]


def test_secure_powers_felt_one():
    assert generate_secure_powers(QM31.one(), 4) == [QM31.one()] * 4


def test_secure_powers_large_values():
    felt = QM31.from_u32_unchecked(P - 1, P - 2, P - 3, P - 4)
    powers = generate_secure_powers(felt, 8)
    for i in range(1, 8):
        assert powers[i] == powers[i - 1] * felt


# ---------------------------------------------------------------------------
# DomainEvaluationAccumulator (accumulator.test.ts:94-230)
# ---------------------------------------------------------------------------

def test_domain_accumulator_init():
    acc = DomainEvaluationAccumulator(RANDOM_COEFF, 4, 8)
    assert acc.log_size() == 4
    assert len(acc.random_coeff_powers) == 8


def test_domain_accumulator_powers_are_alpha_powers():
    acc = DomainEvaluationAccumulator(RANDOM_COEFF, 4, 4)
    assert acc.random_coeff_powers == generate_secure_powers(RANDOM_COEFF, 4)


def test_domain_accumulator_columns_for_sizes():
    acc = DomainEvaluationAccumulator(RANDOM_COEFF, 4, 8)
    cols = acc.columns([(4, 3), (3, 2)])
    assert len(cols) == 2
    # the coeff list is consumed from the END: first request gets the
    # 3 highest powers, second the next 2
    assert len(cols[0].random_coeff_powers) == 3
    assert len(cols[1].random_coeff_powers) == 2
    assert len(acc.random_coeff_powers) == 3


def test_domain_accumulator_rejects_duplicate_log_sizes():
    acc = DomainEvaluationAccumulator(RANDOM_COEFF, 4, 8)
    with pytest.raises(ValueError):
        acc.columns([(3, 2), (3, 2)])


def test_domain_accumulator_rejects_insufficient_coeffs():
    acc = DomainEvaluationAccumulator(RANDOM_COEFF, 4, 2)
    with pytest.raises(ValueError):
        acc.columns([(4, 5)])


def test_domain_accumulator_empty_column_spec():
    acc = DomainEvaluationAccumulator(RANDOM_COEFF, 4, 0)
    assert acc.columns([]) == []


def test_domain_accumulator_finalize_requires_all_coeffs_used():
    acc = DomainEvaluationAccumulator(RANDOM_COEFF, 4, 3)
    acc.columns([(4, 1)])
    with pytest.raises(ValueError):
        acc.finalize()


def test_domain_accumulator_zero_total_columns_finalizes():
    acc = DomainEvaluationAccumulator(RANDOM_COEFF, 3, 0)
    poly = acc.finalize()
    assert poly is not None


# ---------------------------------------------------------------------------
# ColumnAccumulator (accumulator.test.ts:232-300)
# ---------------------------------------------------------------------------

def test_column_accumulator_create_and_accumulate():
    acc = DomainEvaluationAccumulator(RANDOM_COEFF, 3, 2)
    (col,) = acc.columns([(3, 2)])
    assert col.col.shape == (4, 8)
    values = qm31_ops.zeros((8,))
    col.accumulate_column(values)
    np.testing.assert_array_equal(np.asarray(col.col),
                                  np.zeros((4, 8), np.uint32))


def test_column_accumulator_accumulates_values():
    acc = DomainEvaluationAccumulator(RANDOM_COEFF, 2, 1)
    (col,) = acc.columns([(2, 1)])
    import jax.numpy as jnp
    ones = jnp.ones((4, 4), dtype=jnp.uint32)
    col.accumulate_column(ones)
    np.testing.assert_array_equal(np.asarray(col.col), np.ones((4, 4)))
    col.accumulate_column(ones)
    np.testing.assert_array_equal(np.asarray(col.col), 2 * np.ones((4, 4)))


# ---------------------------------------------------------------------------
# Mock components (components.test.ts fixtures)
# ---------------------------------------------------------------------------

class MockComponent:
    def __init__(self, log_size=4, n_constraints_=2, preprocessed_idx=()):
        self._log = log_size
        self._n = n_constraints_
        self._pre = list(preprocessed_idx)

    def n_constraints(self):
        return self._n

    def max_constraint_log_degree_bound(self):
        return self._log + 1

    def trace_log_degree_bounds(self):
        return TreeVec([[self._log] * len(self._pre), [self._log, self._log]])

    def mask_points(self, point):
        return TreeVec([[[] for _ in self._pre],
                        [[point], [point]]])

    def preprocessed_column_indices(self):
        return self._pre

    def evaluate_constraint_quotients_at_point(self, point, mask_values, acc):
        for _ in range(self._n):
            acc.accumulate(QM31.one())


def test_components_create():
    comps = Components([MockComponent()], 0)
    assert len(comps.components) == 1


def test_components_clones_list():
    lst = [MockComponent()]
    comps = Components(lst, 0)
    lst.append(MockComponent())
    assert len(comps.components) == 1


def test_composition_log_degree_bound_is_max():
    comps = Components(
        [MockComponent(log_size=4), MockComponent(log_size=6)], 0)
    assert comps.composition_log_degree_bound() == 7


def test_composition_log_degree_bound_empty_raises():
    comps = Components([], 0)
    with pytest.raises(ValueError):
        comps.composition_log_degree_bound()


def test_mask_points_concat_all_components():
    comps = Components([MockComponent(), MockComponent()], 0)
    point = CanonicCoset.new(4).at(1).into_ef(QM31.from_base)
    pts = comps.mask_points(point)
    assert len(pts[1]) == 4  # 2 trace columns per component


def test_mask_points_preprocessed_columns_get_point():
    comps = Components([MockComponent(preprocessed_idx=[0])], 1)
    point = CanonicCoset.new(4).at(1).into_ef(QM31.from_base)
    pts = comps.mask_points(point)
    assert pts[PREPROCESSED_TRACE_IDX] == [[point]]


def test_eval_composition_polynomial_at_point():
    comps = Components([MockComponent(n_constraints_=2)], 0)
    point = CanonicCoset.new(4).at(1).into_ef(QM31.from_base)
    got = comps.eval_composition_polynomial_at_point(point, None,
                                                     RANDOM_COEFF)
    # two accumulated ones: 1 * alpha + 1
    assert got == RANDOM_COEFF + QM31.one()


def test_column_log_sizes():
    comps = Components([MockComponent(log_size=5, preprocessed_idx=[0])], 1)
    sizes = comps.column_log_sizes()
    assert sizes[PREPROCESSED_TRACE_IDX] == [5]
    assert sizes[1] == [5, 5]


def test_column_log_sizes_mismatched_preprocessed_rejected():
    comps = Components(
        [MockComponent(log_size=5, preprocessed_idx=[0]),
         MockComponent(log_size=6, preprocessed_idx=[0])], 1)
    with pytest.raises(ValueError):
        comps.column_log_sizes()


def test_column_log_sizes_unset_preprocessed_rejected():
    comps = Components([MockComponent(log_size=5)], 2)
    with pytest.raises(ValueError):
        comps.column_log_sizes()


def test_component_provers_total_constraints():
    comps = ComponentProvers(
        [MockComponent(n_constraints_=2), MockComponent(n_constraints_=3)], 0)
    assert sum(c.n_constraints() for c in comps.components) == 5


def test_component_provers_components_view():
    comps = ComponentProvers([MockComponent()], 0)
    assert comps.composition_log_degree_bound() == 5


def test_many_components():
    comps = Components([MockComponent(log_size=4 + (i % 3))
                        for i in range(50)], 0)
    assert comps.composition_log_degree_bound() == 7
    assert len(comps.components) == 50


def test_zero_constraint_component():
    comps = Components([MockComponent(n_constraints_=0)], 0)
    point = CanonicCoset.new(4).at(1).into_ef(QM31.from_base)
    got = comps.eval_composition_polynomial_at_point(point, None,
                                                     RANDOM_COEFF)
    assert got == QM31.zero()


# ---------------------------------------------------------------------------
# mask helpers (air/mask.ts)
# ---------------------------------------------------------------------------

def test_fixed_mask_points_all_zero_offsets():
    point = CanonicCoset.new(4).at(3).into_ef(QM31.from_base)
    pts = fixed_mask_points([[0], [0], [0]], point)
    assert pts == [[point], [point], [point]]


def test_fixed_mask_points_empty_columns():
    point = CanonicCoset.new(4).at(3).into_ef(QM31.from_base)
    assert fixed_mask_points([[], []], point) == [[], []]


def test_fixed_mask_points_rejects_nonzero_offsets():
    point = CanonicCoset.new(4).at(3).into_ef(QM31.from_base)
    with pytest.raises(ValueError):
        fixed_mask_points([[0, 1]], point)


def test_shifted_mask_points_shifts_by_trace_step():
    domain = CanonicCoset.new(4)
    point = domain.at(3).into_ef(QM31.from_base)
    pts = shifted_mask_points([[0, 1]], [domain], point)
    assert len(pts) == 1 and len(pts[0]) == 2
    assert pts[0][0] == point + domain.at(0).into_ef(QM31.from_base)
    assert pts[0][1] == point + domain.at(1).into_ef(QM31.from_base)


def test_shifted_mask_points_length_mismatch():
    domain = CanonicCoset.new(4)
    point = domain.at(3).into_ef(QM31.from_base)
    with pytest.raises(ValueError):
        shifted_mask_points([[0], [0]], [domain], point)
