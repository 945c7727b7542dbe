"""Interpret-mode parity tests for the Pallas kernels.

Every kernel is checked against its jnp twin (ops/m31.py, ops/fft.py) in
Pallas interpreter mode, so the kernel *logic* is verified on CPU; the
bench exercises the compiled kernels on TPU and picks the faster path
(see PERF.md).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from tstwo_tpu.ops import fft as fft_ops
from tstwo_tpu.ops import m31 as m31_ops
from tstwo_tpu.ops.pallas import fft_kernels, m31_kernels

P = (1 << 31) - 1


@pytest.mark.parametrize("log_n", [10, 12, 14])
def test_pallas_mul_matches_jnp(log_n):
    rng = np.random.default_rng(log_n)
    a = rng.integers(0, P, size=1 << log_n, dtype=np.uint32)
    b = rng.integers(0, P, size=1 << log_n, dtype=np.uint32)
    got = np.asarray(m31_kernels.mul(jnp.asarray(a), jnp.asarray(b),
                                     interpret=True))
    want = np.asarray(m31_ops.mul(jnp.asarray(a), jnp.asarray(b)))
    assert np.array_equal(got, want)


def test_pallas_mul_edge_values():
    edge = np.array([0, 1, 2, P - 1, P - 2, 1 << 16, (1 << 16) - 1,
                     (1 << 30) + 12345], dtype=np.uint32)
    a = np.tile(edge, 1024 // len(edge) * 8)[: 1024]
    b = a[::-1].copy()
    got = np.asarray(m31_kernels.mul(jnp.asarray(a), jnp.asarray(b),
                                     interpret=True))
    want = (a.astype(np.uint64) * b.astype(np.uint64) % P).astype(np.uint32)
    assert np.array_equal(got, want)


def test_pallas_mul_chain_matches_host():
    rng = np.random.default_rng(7)
    n = 1 << 12
    a = rng.integers(0, P, size=n, dtype=np.uint32)
    b = rng.integers(0, P, size=n, dtype=np.uint32)
    got = np.asarray(m31_kernels.mul_chain(jnp.asarray(a), jnp.asarray(b),
                                           reps=5, interpret=True))
    want = a.astype(np.uint64)
    for _ in range(5):
        want = want * b % P
    assert np.array_equal(got, want.astype(np.uint32))


def _twiddles_for(log_n):
    from tstwo_tpu.circle import CanonicCoset
    from tstwo_tpu.poly.twiddles import (circle_layer_twiddles,
                                         domain_line_twiddles,
                                         precompute_twiddles)

    domain = CanonicCoset.new(log_n).circle_domain()
    tree = precompute_twiddles(domain.half_coset)
    line = domain_line_twiddles(log_n, tree)
    circ = circle_layer_twiddles(line[0])
    line_i = domain_line_twiddles(log_n, tree, inverse=True)
    circ_i = circle_layer_twiddles(line_i[0])
    return line, circ, line_i, circ_i


@pytest.mark.parametrize("log_n", [9, 10, 12])
def test_pallas_fft_fused_matches_jnp(log_n):
    line, circ, _, _ = _twiddles_for(log_n)
    rng = np.random.default_rng(log_n + 100)
    vals = jnp.asarray(rng.integers(0, P, size=1 << log_n, dtype=np.uint32))
    got = np.asarray(fft_kernels.fft_fused(vals, tuple(line), circ, log_n,
                                           interpret=True))
    want = np.asarray(fft_ops.fft_natural_to_bitrev(vals, line, circ))
    assert np.array_equal(got, want)


@pytest.mark.parametrize("log_n", [9, 11])
def test_pallas_ifft_fused_matches_jnp(log_n):
    _, _, line_i, circ_i = _twiddles_for(log_n)
    rng = np.random.default_rng(log_n + 200)
    vals = jnp.asarray(rng.integers(0, P, size=1 << log_n, dtype=np.uint32))
    got = np.asarray(fft_kernels.fft_fused(vals, tuple(line_i), circ_i,
                                           log_n, inverse=True,
                                           interpret=True))
    # fft_fused's inverse includes the 1/N scaling; the jnp twin does not.
    n_inv = jnp.uint32(pow(1 << log_n, P - 2, P))
    want = np.asarray(m31_ops.mul(
        fft_ops.ifft_bitrev_to_natural(vals, line_i, circ_i), n_inv))
    assert np.array_equal(got, want)


@pytest.mark.parametrize("log_n", [9, 11])
def test_pallas_fft_roundtrip(log_n):
    line, circ, line_i, circ_i = _twiddles_for(log_n)
    rng = np.random.default_rng(log_n + 300)
    vals = jnp.asarray(rng.integers(0, P, size=1 << log_n, dtype=np.uint32))
    ev = fft_kernels.fft_fused(vals, tuple(line), circ, log_n, interpret=True)
    back = fft_kernels.fft_fused(ev, tuple(line_i), circ_i, log_n,
                                 inverse=True, interpret=True)
    assert np.array_equal(np.asarray(back), np.asarray(vals))


@pytest.mark.parametrize("log_n,chunk_log", [(15, 14), (16, 14)])
def test_pallas_fft_large_matches_jnp(log_n, chunk_log):
    line, circ, _, _ = _twiddles_for(log_n)
    rng = np.random.default_rng(log_n + 400)
    vals = jnp.asarray(rng.integers(0, P, size=1 << log_n, dtype=np.uint32))
    got = np.asarray(fft_kernels.fft_large(vals, tuple(line), circ, log_n,
                                           chunk_log=chunk_log,
                                           interpret=True))
    want = np.asarray(fft_ops.fft_natural_to_bitrev(vals, line, circ))
    assert np.array_equal(got, want)


@pytest.mark.parametrize("log_n,chunk_log", [(15, 14), (16, 14)])
def test_pallas_ifft_large_matches_jnp(log_n, chunk_log):
    _, _, line_i, circ_i = _twiddles_for(log_n)
    rng = np.random.default_rng(log_n + 500)
    vals = jnp.asarray(rng.integers(0, P, size=1 << log_n, dtype=np.uint32))
    got = np.asarray(fft_kernels.fft_large(vals, tuple(line_i), circ_i,
                                           log_n, chunk_log=chunk_log,
                                           inverse=True, interpret=True))
    n_inv = jnp.uint32(pow(1 << log_n, P - 2, P))
    want = np.asarray(m31_ops.mul(
        fft_ops.ifft_bitrev_to_natural(vals, line_i, circ_i), n_inv))
    assert np.array_equal(got, want)


def test_pallas_fft_large_roundtrip():
    log_n, chunk_log = 15, 14
    line, circ, line_i, circ_i = _twiddles_for(log_n)
    rng = np.random.default_rng(777)
    vals = jnp.asarray(rng.integers(0, P, size=1 << log_n, dtype=np.uint32))
    ev = fft_kernels.fft_large(vals, tuple(line), circ, log_n,
                               chunk_log=chunk_log, interpret=True)
    back = fft_kernels.fft_large(ev, tuple(line_i), circ_i, log_n,
                                 chunk_log=chunk_log, inverse=True,
                                 interpret=True)
    assert np.array_equal(np.asarray(back), np.asarray(vals))


@pytest.mark.parametrize("batch", [2, 4])
def test_pallas_fft_large_batched_matches_jnp(batch):
    """The native batch grid axis must be bit-identical to per-column."""
    log_n, chunk_log = 15, 14
    line, circ, _, _ = _twiddles_for(log_n)
    rng = np.random.default_rng(batch + 600)
    vals = jnp.asarray(rng.integers(0, P, size=(batch, 1 << log_n),
                                    dtype=np.uint32))
    got = np.asarray(fft_kernels.fft_large(vals, tuple(line), circ, log_n,
                                           chunk_log=chunk_log,
                                           interpret=True))
    for b in range(batch):
        want = np.asarray(fft_ops.fft_natural_to_bitrev(vals[b], line, circ))
        assert np.array_equal(got[b], want)


def test_pallas_fft_large_layout_cache_hits():
    from tstwo_tpu.ops.pallas.fft_kernels import _LAYOUT_CACHE, cached_layouts
    log_n = 15
    line, circ, _, _ = _twiddles_for(log_n)
    l1 = cached_layouts(tuple(line), circ, log_n, 14)
    l2 = cached_layouts(tuple(line), circ, log_n, 14)
    assert l1 is l2  # second call must be a cache hit (same arrays)


# ---------------------------------------------------------------------------
# Blake2s word-major Pallas kernel (ADVICE r3: the path that produces every
# Merkle root / PoW digest on real TPU had no test at all)
# ---------------------------------------------------------------------------

import hashlib


@pytest.mark.parametrize("n,byte_len", [(1024, 64), (2048, 72)])
def test_blake2s_pallas_interpret_matches_hashlib(n, byte_len):
    from tstwo_tpu.ops import blake2s

    rng = np.random.default_rng(n + byte_len)
    n_blocks = max(1, -(-byte_len // 64))
    total = n_blocks * 16
    words = rng.integers(0, 1 << 32, size=(total, n), dtype=np.uint64)
    words = words.astype(np.uint32)
    # zero the words beyond byte_len (API contract)
    n_words = byte_len // 4
    words[n_words:] = 0
    jw = jnp.asarray(words)
    got = np.asarray(
        blake2s._hash_words_major_pallas(jw, byte_len, interpret=True))
    want_xla = np.asarray(blake2s._hash_words_major_xla(jw, byte_len))
    assert np.array_equal(got, want_xla)
    # spot-check a few columns against hashlib
    for c in (0, 1, n // 2, n - 1):
        msg = words[:n_words, c].astype("<u4").tobytes()
        want = hashlib.blake2s(msg).digest()
        assert blake2s.digest_words_to_bytes(np.asarray(got[:, c])) == want


def test_blake2s_pallas_grid_covers_non_pow2_rows():
    """r = n/128 not a power of two (e.g. 96): every digest must still be
    produced (the r3 grid bug left the tail uninitialized)."""
    from tstwo_tpu.ops import blake2s

    n = 24 * 128  # r = 24 -> rows must divide 24
    rng = np.random.default_rng(5)
    words = rng.integers(0, 1 << 32, size=(16, n), dtype=np.uint64)
    words = words.astype(np.uint32)
    jw = jnp.asarray(words)
    got = np.asarray(
        blake2s._hash_words_major_pallas(jw, 64, interpret=True))
    want = np.asarray(blake2s._hash_words_major_xla(jw, 64))
    assert np.array_equal(got, want)


def test_blake2s_pallas_rows_divisor():
    from tstwo_tpu.ops.blake2s import _pallas_rows

    for r in (16, 24, 64, 96, 128, 8192, 96 * 4):
        rows = _pallas_rows(16, r)
        assert r % rows == 0 and rows >= 8
