"""Replay the Rust-generated field test vectors (tests/vectors/*.json).

Every add/sub/mul/neg/inverse/... case is checked against BOTH the host
scalar classes (tstwo_tpu.fields) and the device array ops (tstwo_tpu.ops),
so the two implementations are pinned to the same Rust ground truth.
"""
import json
import os

import numpy as np
import pytest

from tstwo_tpu.fields import CM31, M31, P, QM31, batch_inverse
from tstwo_tpu.ops import cm31 as cm31_ops
from tstwo_tpu.ops import m31 as m31_ops
from tstwo_tpu.ops import qm31 as qm31_ops

VEC_DIR = os.path.join(os.path.dirname(__file__), "vectors")


def load(name):
    with open(os.path.join(VEC_DIR, name)) as f:
        d = json.load(f)
    return d["test_vectors"] if isinstance(d, dict) else d


M31_VECTORS = load("m31-test-vectors.json")
CM31_VECTORS = load("cm31-test-vectors.json")
QM31_VECTORS = load("qm31-test-vectors.json")


# ---------------------------------------------------------------------------
# M31
# ---------------------------------------------------------------------------

def _m31_binops(op_name):
    return [(v["inputs"]["a"], v["inputs"]["b"], v["output"])
            for v in M31_VECTORS if v["operation"] == op_name]


@pytest.mark.parametrize("op", ["add", "mul", "sub"])
def test_m31_binops_host(op):
    import operator

    fn = {"add": operator.add, "mul": operator.mul, "sub": operator.sub}[op]
    cases = _m31_binops(op)
    assert len(cases) == 100
    for a, b, out in cases:
        assert fn(M31(a), M31(b)).value == out


@pytest.mark.parametrize("op", ["add", "mul", "sub"])
def test_m31_binops_device(op):
    fn = {"add": m31_ops.add, "mul": m31_ops.mul, "sub": m31_ops.sub}[op]
    cases = _m31_binops(op)
    a = m31_ops.asarray([c[0] for c in cases])
    b = m31_ops.asarray([c[1] for c in cases])
    expected = np.array([c[2] for c in cases], dtype=np.uint32)
    np.testing.assert_array_equal(np.asarray(fn(a, b)), expected)


def test_m31_neg():
    cases = [(v["inputs"]["a"], v["output"]) for v in M31_VECTORS
             if v["operation"] == "neg"]
    for a, out in cases:
        assert (-M31(a)).value == out
    arr = m31_ops.asarray([c[0] for c in cases])
    np.testing.assert_array_equal(
        np.asarray(m31_ops.neg(arr)),
        np.array([c[1] for c in cases], dtype=np.uint32))


def test_m31_unary_and_constructors():
    inv_cases = []
    for v in M31_VECTORS:
        op, ins, out = v["operation"], v["inputs"], v["output"]
        if op in ("inverse", "pow2147483645"):
            assert M31(ins["value"]).inverse().value == out
            inv_cases.append((ins["value"], out))
        elif op == "partial_reduce":
            assert M31.partial_reduce(int(ins["value"])).value == out
        elif op == "reduce":
            assert M31.reduce(int(ins["value"])).value == out
        elif op in ("from_u32", "from_i32"):
            assert M31.from_int(int(ins["value"])).value == out
        elif op == "from_u32_unchecked":
            assert M31.from_u32_unchecked(ins["value"]).value == out
        elif op == "is_zero":
            assert M31(ins["value"]).is_zero() == out
        elif op == "complex_conjugate":
            assert M31(ins["value"]).complex_conjugate().value == out
        elif op == "zero":
            assert M31.zero().value == out
        elif op == "one":
            assert M31.one().value == out
        elif op == "into_slice":
            data = M31.into_slice([M31(x) for x in ins["elements"]])
            assert list(data) == out
    # batched device inverse against the same oracle
    arr = m31_ops.asarray([c[0] for c in inv_cases])
    np.testing.assert_array_equal(
        np.asarray(m31_ops.inv(arr)),
        np.array([c[1] for c in inv_cases], dtype=np.uint32))


# ---------------------------------------------------------------------------
# CM31
# ---------------------------------------------------------------------------

def _cm31(v, prefix):
    return CM31(v[f"{prefix}_real"], v[f"{prefix}_imag"])


def _cm31_out(out):
    return (out["real"], out["imag"])


@pytest.mark.parametrize("op", ["add", "mul", "sub"])
def test_cm31_binops(op):
    import operator

    fn = {"add": operator.add, "mul": operator.mul, "sub": operator.sub}[op]
    dfn = {"add": cm31_ops.add, "mul": cm31_ops.mul, "sub": cm31_ops.sub}[op]
    cases = [v for v in CM31_VECTORS if v["operation"] == op]
    assert len(cases) == 50
    a_arr, b_arr, out_arr = [], [], []
    for v in cases:
        a, b = _cm31(v["inputs"], "a"), _cm31(v["inputs"], "b")
        r = fn(a, b)
        assert (r.a, r.b) == _cm31_out(v["output"])
        a_arr.append([a.a, a.b])
        b_arr.append([b.a, b.b])
        out_arr.append(list(_cm31_out(v["output"])))
    a_dev = m31_ops.asarray(np.array(a_arr).T)
    b_dev = m31_ops.asarray(np.array(b_arr).T)
    np.testing.assert_array_equal(
        np.asarray(dfn(a_dev, b_dev)), np.array(out_arr, dtype=np.uint32).T)


def test_cm31_rest():
    inv_cases = []
    for v in CM31_VECTORS:
        op, ins, out = v["operation"], v["inputs"], v["output"]
        if op == "neg":
            r = -CM31(ins["real"], ins["imag"])
            assert (r.a, r.b) == _cm31_out(out)
        elif op == "inverse":
            a = CM31(ins["real"], ins["imag"])
            r = a.inverse()
            assert (r.a, r.b) == _cm31_out(out)
            inv_cases.append((a, out))
        elif op == "complex_conjugate":
            r = CM31(ins["real"], ins["imag"]).complex_conjugate()
            assert (r.a, r.b) == _cm31_out(out)
        elif op == "from_u32_unchecked":
            r = CM31.from_u32_unchecked(ins["real"], ins["imag"])
            assert (r.a, r.b) == _cm31_out(out)
        elif op == "into_slice":
            elems = [CM31(e["real"], e["imag"]) for e in ins["elements"]]
            assert list(CM31.into_slice(elems)) == out
        elif op == "zero":
            assert (CM31.zero().a, CM31.zero().b) == _cm31_out(out)
        elif op == "one":
            assert (CM31.one().a, CM31.one().b) == _cm31_out(out)
    arr = m31_ops.asarray(np.array([[a.a, a.b] for a, _ in inv_cases]).T)
    dev = np.asarray(cm31_ops.inv(arr))
    np.testing.assert_array_equal(
        dev, np.array([list(_cm31_out(o)) for _, o in inv_cases],
                      dtype=np.uint32).T)


# ---------------------------------------------------------------------------
# QM31
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("op", ["add", "mul", "sub"])
def test_qm31_binops(op):
    import operator

    fn = {"add": operator.add, "mul": operator.mul, "sub": operator.sub}[op]
    dfn = {"add": qm31_ops.add, "mul": qm31_ops.mul, "sub": qm31_ops.sub}[op]
    cases = [v for v in QM31_VECTORS if v["operation"] == op]
    assert len(cases) == 30
    a_arr, b_arr, out_arr = [], [], []
    for v in cases:
        a = QM31.from_ints(v["inputs"]["a"])
        b = QM31.from_ints(v["inputs"]["b"])
        assert list(fn(a, b).to_ints()) == v["output"]
        a_arr.append(v["inputs"]["a"])
        b_arr.append(v["inputs"]["b"])
        out_arr.append(v["output"])
    a_dev = m31_ops.asarray(np.array(a_arr).T)
    b_dev = m31_ops.asarray(np.array(b_arr).T)
    np.testing.assert_array_equal(
        np.asarray(dfn(a_dev, b_dev)), np.array(out_arr, dtype=np.uint32).T)


def test_qm31_rest():
    for v in QM31_VECTORS:
        op, ins, out = v["operation"], v["inputs"], v["output"]
        if op == "neg":
            assert list((-QM31.from_ints(ins["value"])).to_ints()) == out
        elif op == "inverse":
            a = QM31.from_ints(ins["value"])
            assert list(a.inverse().to_ints()) == out
            dev = qm31_ops.inv(m31_ops.asarray(np.array(ins["value"])[:, None]))
            assert [int(dev[i, 0]) for i in range(4)] == out
        elif op == "from_u32_unchecked":
            assert list(QM31.from_u32_unchecked(*ins["values"]).to_ints()) == out
        elif op == "from_partial_evals":
            evals = [QM31.from_ints(e) for e in ins["evals"]]
            assert list(QM31.from_partial_evals(evals).to_ints()) == out
        elif op == "mul_cm31":
            a = QM31.from_ints(ins["qm31"])
            b = CM31(*ins["cm31"])
            assert list(a.mul_cm31(b).to_ints()) == out
        elif op == "into_slice":
            elems = [QM31.from_ints(e) for e in ins["elements"]]
            assert list(QM31.into_slice(elems)) == out
        elif op == "zero":
            assert list(QM31.zero().to_ints()) == out
        elif op == "one":
            assert list(QM31.one().to_ints()) == out


# ---------------------------------------------------------------------------
# Cross checks
# ---------------------------------------------------------------------------

def test_batch_inverse_matches_scalar():
    rng = np.random.default_rng(0)
    vals = [M31(int(x)) for x in rng.integers(1, P, size=37)]
    for v, iv in zip(vals, batch_inverse(vals)):
        assert (v * iv).value == 1


def test_device_mul_random_against_host():
    rng = np.random.default_rng(1)
    a = rng.integers(0, P, size=4096, dtype=np.uint32)
    b = rng.integers(0, P, size=4096, dtype=np.uint32)
    expected = ((a.astype(np.uint64) * b.astype(np.uint64)) % P).astype(np.uint32)
    got = np.asarray(m31_ops.mul(m31_ops.asarray(a), m31_ops.asarray(b)))
    np.testing.assert_array_equal(got, expected)
    # edge values
    edge = np.array([0, 1, 2, P - 1, P - 2, 1 << 30, (1 << 30) + 1, 0xFFFF,
                     0x10000, 0x7FFF0000 % P], dtype=np.uint32)
    ee = ((edge.astype(np.uint64)[:, None] * edge.astype(np.uint64)[None, :]) % P)
    got = np.asarray(m31_ops.mul(m31_ops.asarray(edge)[:, None],
                                 m31_ops.asarray(edge)[None, :]))
    np.testing.assert_array_equal(got, ee.astype(np.uint32))


def test_device_inv_random():
    rng = np.random.default_rng(2)
    a = rng.integers(1, P, size=1024, dtype=np.uint32)
    ia = np.asarray(m31_ops.inv(m31_ops.asarray(a)))
    prod = np.asarray(m31_ops.mul(m31_ops.asarray(a), m31_ops.asarray(ia)))
    np.testing.assert_array_equal(prod, np.ones_like(a))
