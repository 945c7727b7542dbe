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
