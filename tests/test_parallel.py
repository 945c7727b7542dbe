"""Multi-chip sharding tests on the virtual 8-device CPU mesh: the sharded
CFFT (explicit all-to-all factorization) must be bit-equal to single-device."""
import numpy as np
import pytest

import jax

from tstwo_tpu.circle import CanonicCoset
from tstwo_tpu.ops import fft as fft_ops
from tstwo_tpu.ops import m31 as m31_ops
from tstwo_tpu.parallel.fft import make_sharded_fft, shard_column
from tstwo_tpu.parallel.mesh import make_mesh
from tstwo_tpu.poly.twiddles import (circle_layer_twiddles,
                                     domain_line_twiddles, precompute_twiddles)


def _twiddles(log_n, inverse=False):
    domain = CanonicCoset.new(log_n).circle_domain()
    tree = precompute_twiddles(domain.half_coset)
    line = domain_line_twiddles(log_n, tree, inverse)
    circ = circle_layer_twiddles(line[0])
    return line, circ


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_sharded_fft_matches_single_device(n_dev):
    if len(jax.devices()) < n_dev:
        pytest.skip("not enough devices")
    log_n = 9
    mesh = make_mesh(n_dev)
    line, circ = _twiddles(log_n)
    fwd = make_sharded_fft(mesh, log_n, line, circ, inverse=False)
    rng = np.random.default_rng(n_dev)
    coeffs = m31_ops.asarray(
        rng.integers(0, (1 << 31) - 1, size=1 << log_n, dtype=np.uint32))
    sharded = np.asarray(fwd(shard_column(coeffs, mesh)))
    single = np.asarray(fft_ops.fft_natural_to_bitrev(coeffs, line, circ))
    np.testing.assert_array_equal(sharded, single)


def test_sharded_ifft_roundtrip():
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    log_n = 8
    mesh = make_mesh(4)
    line, circ = _twiddles(log_n)
    line_i, _ = _twiddles(log_n, inverse=True)
    circ_i = circle_layer_twiddles(line_i[0])
    fwd = make_sharded_fft(mesh, log_n, line, circ, inverse=False)
    inv = make_sharded_fft(mesh, log_n, line_i, circ_i, inverse=True)
    rng = np.random.default_rng(0)
    coeffs = m31_ops.asarray(
        rng.integers(0, (1 << 31) - 1, size=1 << log_n, dtype=np.uint32))
    out = np.asarray(inv(fwd(shard_column(coeffs, mesh))))
    np.testing.assert_array_equal(out, np.asarray(coeffs))


def test_sharded_quotients_match_unsharded():
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    from tstwo_tpu.circle import SECURE_FIELD_CIRCLE_GEN, CanonicCoset
    from tstwo_tpu.fields import QM31
    from tstwo_tpu.parallel.ops import sharded_accumulate_quotients
    from tstwo_tpu.pcs.quotients import (ColumnSampleBatch, PointSample,
                                         accumulate_quotients)

    mesh = make_mesh(4)
    rng = np.random.default_rng(0)
    log_n = 8
    domain = CanonicCoset.new(log_n).circle_domain()
    cols = [m31_ops.asarray(rng.integers(0, (1 << 31) - 1, size=1 << log_n,
                                         dtype=np.uint32)) for _ in range(3)]
    point = SECURE_FIELD_CIRCLE_GEN
    samples = [[PointSample(point, QM31.from_u32_unchecked(i + 1, 2, 3, 4))]
               for i in range(3)]
    batches = ColumnSampleBatch.new_vec(samples)
    coeff = QM31.from_u32_unchecked(9, 8, 7, 6)
    ref = accumulate_quotients(domain, cols, coeff, batches, 1)
    out = sharded_accumulate_quotients(mesh, domain, cols, coeff, batches, 1)
    np.testing.assert_array_equal(np.asarray(out.values),
                                  np.asarray(ref.values))


def test_sharded_fold_and_merkle_match():
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    import jax.numpy as jnp

    from tstwo_tpu.ops import fri_ops
    from tstwo_tpu.ops import qm31 as qm31_ops
    from tstwo_tpu.fields import QM31
    from tstwo_tpu.parallel.ops import (sharded_fold_line,
                                        sharded_merkle_leaf_layer)
    from tstwo_tpu.vcs.blake2s_merkle import commit_on_layer

    mesh = make_mesh(4)
    rng = np.random.default_rng(1)
    vals = m31_ops.asarray(rng.integers(0, (1 << 31) - 1, size=(4, 256),
                                        dtype=np.uint32))
    itw = m31_ops.asarray(rng.integers(1, (1 << 31) - 1, size=128,
                                       dtype=np.uint32))
    alpha = qm31_ops.scalar(QM31.from_u32_unchecked(1, 2, 3, 4))
    ref = np.asarray(fri_ops.fold_line(vals, itw, alpha))
    out = np.asarray(sharded_fold_line(mesh, vals, itw, alpha))
    np.testing.assert_array_equal(out, ref)

    cols = [m31_ops.asarray(rng.integers(0, (1 << 31) - 1, size=64,
                                         dtype=np.uint32)) for _ in range(2)]
    ref_h = commit_on_layer(6, None, cols)
    out_h = sharded_merkle_leaf_layer(mesh, cols, 6)
    np.testing.assert_array_equal(np.asarray(out_h), np.asarray(ref_h))


def test_sharded_full_merkle_commit_matches():
    if len(jax.devices()) < 8:
        pytest.skip("not enough devices")
    from tstwo_tpu.parallel.ops import shard_points
    from tstwo_tpu.vcs import MerkleProver

    mesh = make_mesh(8)
    rng = np.random.default_rng(5)
    cols = [m31_ops.asarray(rng.integers(0, (1 << 31) - 1, size=1 << 10,
                                         dtype=np.uint32)) for _ in range(3)]
    ref = MerkleProver.commit(cols)
    sharded = MerkleProver.commit([shard_points(mesh, c) for c in cols])
    assert ref.root() == sharded.root()


def test_batched_sharded_fft_matches_single_column():
    """leading_dims=1 batched sharded FFT == per-column sharded FFT."""
    log_n = 8
    mesh = make_mesh(8)
    line, circ = _twiddles(log_n)
    rng = np.random.default_rng(11)
    coeffs = rng.integers(0, (1 << 31) - 1, size=(3, 1 << log_n),
                          dtype=np.uint32)
    batched = make_sharded_fft(mesh, log_n, line, circ, leading_dims=1)
    single = make_sharded_fft(mesh, log_n, line, circ)
    out_b = np.asarray(batched(shard_column(jax.numpy.asarray(coeffs), mesh)))
    for i in range(3):
        ref = np.asarray(
            single(shard_column(jax.numpy.asarray(coeffs[i]), mesh)))
        np.testing.assert_array_equal(out_b[i], ref)


def test_sharded_production_prove_bit_equal():
    """The REAL prove() pipeline (not a demo) over an 8-device mesh must
    produce byte-identical proofs to the single-device run: all field math
    is exact uint32, so partitioning must not change a single bit."""
    import json

    from tstwo_tpu.examples.basic_air import (prove_basic_air,
                                              verify_basic_air)
    from tstwo_tpu.parallel.mesh import make_mesh
    from tstwo_tpu.serialize import proof_to_dict

    mesh = make_mesh(8)
    p_single, comp, cfg = prove_basic_air(log_num_rows=6)
    p_sharded, comp_s, _ = prove_basic_air(log_num_rows=6, mesh=mesh)
    a = json.dumps(proof_to_dict(p_single), sort_keys=True)
    b = json.dumps(proof_to_dict(p_sharded), sort_keys=True)
    assert a == b
    verify_basic_air(p_sharded, comp_s, cfg, log_num_rows=6)


def test_sharded_production_prove_wide_fib_bit_equal():
    """Same bit-equality gate on the wider multi-column AIR at 2^8 rows
    (exercises the all-to-all CFFT boundary log_n = 2*log2(D) + blowups)."""
    import json

    from tstwo_tpu.examples.wide_fibonacci import (prove_wide_fibonacci,
                                                   verify_wide_fibonacci)
    from tstwo_tpu.parallel.mesh import make_mesh
    from tstwo_tpu.serialize import proof_to_dict

    mesh = make_mesh(8)
    p1, comp, cfg = prove_wide_fibonacci(log_n_rows=8, sequence_length=8)
    p2, comp_s, _ = prove_wide_fibonacci(log_n_rows=8, sequence_length=8,
                                         mesh=mesh)
    a = json.dumps(proof_to_dict(p1), sort_keys=True)
    b = json.dumps(proof_to_dict(p2), sort_keys=True)
    assert a == b
    verify_wide_fibonacci(p2, comp_s, cfg, log_n_rows=8)
