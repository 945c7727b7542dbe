"""Vanishing-polynomial tests (ports of reference test/constraints.test.ts)."""
import pytest

from tstwo_tpu.circle import CirclePointIndex, Coset
from tstwo_tpu.constraints import (coset_vanishing, pair_vanishing,
                                   point_excluder, point_vanishing)
from tstwo_tpu.fields import M31


def test_coset_vanishing():
    cosets = [
        Coset.half_odds(5),
        Coset.odds(5),
        Coset.new(CirclePointIndex.zero(), 5),
        Coset.half_odds(5).conjugate(),
    ]
    for i, c0 in enumerate(cosets):
        for el in c0.iter():
            assert coset_vanishing(c0, el).is_zero()
            for j, c1 in enumerate(cosets):
                if i == j:
                    continue
                assert not coset_vanishing(c1, el).is_zero()


def test_point_excluder():
    excluded = Coset.half_odds(5).at(10)
    point = CirclePointIndex.generator().scale(4).to_point()
    num = point_excluder(excluded, point) * point_excluder(
        excluded.conjugate(), point)
    denom = (point.x - excluded.x).pow(2)
    assert num == denom


def test_pair_vanishing():
    e0 = Coset.half_odds(5).at(10)
    e1 = Coset.half_odds(5).at(13)
    point = CirclePointIndex.generator().scale(4).to_point()
    assert not pair_vanishing(e0, e1, point).is_zero()
    assert pair_vanishing(e0, e1, e0).is_zero()
    assert pair_vanishing(e0, e1, e1).is_zero()


def test_point_vanishing():
    coset = Coset.odds(5)
    vanish = coset.at(2)
    one = M31.one()
    for el in coset.iter():
        if el == vanish:
            assert point_vanishing(vanish, el, lambda x: x, one).is_zero()
        elif el == vanish.antipode():
            with pytest.raises(ZeroDivisionError):
                point_vanishing(vanish, el, lambda x: x, one)
        else:
            assert not point_vanishing(vanish, el, lambda x: x, one).is_zero()
