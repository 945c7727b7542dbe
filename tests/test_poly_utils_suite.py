"""Port of reference test/poly/{utils,domainLineTwiddles,ops}.test.ts
(~10 cases): repeat_value, recursive fold, flat-buffer twiddle slicing.
"""
import pytest

from tstwo_tpu.circle import Coset
from tstwo_tpu.fields import CM31, M31, QM31
from tstwo_tpu.poly.line import LineDomain
from tstwo_tpu.poly.utils import (domain_line_twiddles_from_tree, fold,
                                  repeat_value)


def test_repeat_zero_times():
    assert repeat_value([1, 2, 3], 0) == []


def test_repeat_two_times():
    assert repeat_value([1, 2, 3], 2) == [1, 1, 2, 2, 3, 3]


def test_repeat_three_times():
    assert repeat_value([1, 2], 3) == [1, 1, 1, 2, 2, 2]


def test_fold_recursive_exact():
    vals = [CM31(1, 0), CM31(2, 0), CM31(3, 0), CM31(4, 0)]
    z, y = CM31(5, 0), CM31(6, 0)
    res = fold(vals, [y, z])
    expected = vals[0] + vals[1] * z + (vals[2] + vals[3] * z) * y
    assert res == expected


def test_fold_single_value():
    assert fold([M31(7)], []) == M31(7)


def test_fold_length_mismatch():
    with pytest.raises(ValueError, match="invalid input lengths"):
        fold([M31(1), M31(2), M31(3)], [M31(4)])


def test_fold_matches_eval_mappings():
    """fold over [y, x] equals the CirclePoly basis evaluation."""
    import numpy as np

    import jax.numpy as jnp

    from tstwo_tpu.circle import CirclePoint
    from tstwo_tpu.poly.circle_poly import CirclePoly

    coeffs = [3, 1, 4, 1]
    pt = CirclePoint.get_point(271828)
    vals = [QM31.from_ints([c, 0, 0, 0]) for c in coeffs]
    got = fold(vals, [pt.x, pt.y])
    poly = CirclePoly(jnp.asarray(np.array(coeffs, dtype=np.uint32)))
    assert got == poly.eval_at_point(pt)


def test_twiddle_slices_for_each_level():
    domain = LineDomain(Coset.subgroup(3))
    res = domain_line_twiddles_from_tree(domain, [0, 1, 2, 3, 4, 5, 6, 7])
    assert res == [[0, 1, 2, 3], [4, 5], [6]]


def test_twiddle_slices_buffer_too_small():
    domain = LineDomain(Coset.subgroup(3))
    with pytest.raises(ValueError, match="twiddles"):
        domain_line_twiddles_from_tree(domain, [1, 2])


def test_twiddle_slices_circle_domain():
    from tstwo_tpu.circle import CanonicCoset

    domain = CanonicCoset.new(3).circle_domain()  # line coset size 4
    res = domain_line_twiddles_from_tree(domain, [0, 1, 2, 3])
    assert res == [[0, 1], [2]]
