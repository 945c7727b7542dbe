"""Port of the reference test/air/mask.test.ts cases beyond
test_air_suite.py (error messages, bounds validation, boundary items,
mixed/extreme masks) and test/air/index.test.ts Trace structure
validation (~20 cases).  The TS files test against mock points; these
run the real circle geometry.
"""
import pytest

from tstwo_tpu.air import Trace
from tstwo_tpu.air.mask import fixed_mask_points, shifted_mask_points
from tstwo_tpu.circle import CanonicCoset, CirclePoint
from tstwo_tpu.fields import QM31
from tstwo_tpu.pcs.utils import TreeVec

POINT = CirclePoint.get_point(999999)


# -- fixedMaskPoints --------------------------------------------------------

def test_fixed_mask_same_point_for_all_items():
    result = fixed_mask_points([[0, 0], [0], []], POINT)
    assert [len(c) for c in result] == [2, 1, 0]
    assert all(p is POINT for col in result for p in col)


def test_fixed_mask_empty_mask():
    assert fixed_mask_points([], POINT) == []


def test_fixed_mask_all_empty_columns():
    result = fixed_mask_points([[], [], []], POINT)
    assert result == [[], [], []]


def test_fixed_mask_rejects_nonzero():
    with pytest.raises(ValueError, match="0"):
        fixed_mask_points([[0, 1]], POINT)


def test_fixed_mask_rejects_only_nonzero():
    with pytest.raises(ValueError):
        fixed_mask_points([[2], [3]], POINT)


def test_fixed_mask_error_lists_sorted_unique_items():
    with pytest.raises(ValueError, match=r"\[0, 1, 2, 5\]"):
        fixed_mask_points([[5, 1], [2, 1, 0]], POINT)


# -- shiftedMaskPoints ------------------------------------------------------

def test_shifted_mask_shifts_by_domain_points():
    domain = CanonicCoset.new(3)
    mask = [[0, 1, 2]]
    result = shifted_mask_points(mask, [domain], POINT)
    assert len(result) == 1 and len(result[0]) == 3
    for item, got in zip(mask[0], result[0]):
        want = POINT + domain.at(item).into_ef(QM31.from_base)
        assert got.x == want.x and got.y == want.y


def test_shifted_mask_offset_zero_is_identity_shift():
    domain = CanonicCoset.new(2)
    [got] = shifted_mask_points([[0]], [domain], POINT)[0:1]
    want = POINT + domain.at(0).into_ef(QM31.from_base)
    assert got[0].x == want.x


def test_shifted_mask_empty_columns():
    domains = [CanonicCoset.new(2), CanonicCoset.new(3)]
    result = shifted_mask_points([[], []], domains, POINT)
    assert result == [[], []]


def test_shifted_mask_length_mismatch():
    with pytest.raises(ValueError, match="mismatch"):
        shifted_mask_points([[0], [0]], [CanonicCoset.new(2)], POINT)


def test_shifted_mask_out_of_bounds_item():
    domain = CanonicCoset.new(2)  # size 4
    with pytest.raises(ValueError, match="out of domain bounds"):
        shifted_mask_points([[4]], [domain], POINT)


def test_shifted_mask_negative_item():
    with pytest.raises(ValueError, match="out of domain bounds"):
        shifted_mask_points([[-1]], [CanonicCoset.new(2)], POINT)


def test_shifted_mask_boundary_items():
    domain = CanonicCoset.new(2)  # size 4: items 0..3 legal
    result = shifted_mask_points([[0, 3]], [domain], POINT)
    assert len(result[0]) == 2
    assert result[0][0].x != result[0][1].x


def test_shifted_mask_mixed_empty_and_nonempty():
    domains = [CanonicCoset.new(2)] * 3
    result = shifted_mask_points([[1], [], [0, 2]], domains, POINT)
    assert [len(c) for c in result] == [1, 0, 2]


def test_shifted_mask_extreme_sizes():
    domain = CanonicCoset.new(10)
    items = list(range(0, 1 << 10, 37))
    result = shifted_mask_points([items], [domain], POINT)
    assert len(result[0]) == len(items)
    assert len({(p.x.to_ints(), p.y.to_ints()) for p in result[0]}) \
        == len(items)


# -- air/index.test.ts Trace ------------------------------------------------

def test_trace_valid_structure():
    polys = TreeVec([["p0", "p1"], ["p2"]])
    evals = TreeVec([["e0", "e1"], ["e2"]])
    t = Trace(polys, evals)
    assert len(t.polys) == 2 and len(t.evals) == 2


def test_trace_tree_structure_mismatch():
    with pytest.raises(ValueError, match="tree structure"):
        Trace(TreeVec([["p"]]), TreeVec([["e"], ["x"]]))


def test_trace_column_structure_mismatch():
    with pytest.raises(ValueError, match="column structure.*tree 1"):
        Trace(TreeVec([["a"], ["b", "c"]]), TreeVec([["a"], ["b"]]))


def test_trace_empty_trees():
    t = Trace(TreeVec([]), TreeVec([]))
    assert len(t.polys) == 0


def test_trace_multiple_trees_various_columns():
    polys = TreeVec([[], ["a"], ["b", "c", "d"]])
    evals = TreeVec([[], ["x"], ["y", "z", "w"]])
    t = Trace(polys, evals)
    assert [len(c) for c in t.polys] == [0, 1, 3]


def test_trace_large_structure():
    n_trees, n_cols = 8, 64
    polys = TreeVec([[f"p{t}_{c}" for c in range(n_cols)]
                     for t in range(n_trees)])
    evals = TreeVec([[f"e{t}_{c}" for c in range(n_cols)]
                     for t in range(n_trees)])
    t = Trace(polys, evals)
    assert len(t.polys) == n_trees
