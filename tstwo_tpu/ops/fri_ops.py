"""Device kernels for FRI folding and decomposition.

fold_line / fold_circle_into_line are inverse butterflies with precomputed
inverse twiddles plus an alpha-linear combination (reference fri.ts:120-192,
backend/cpu/fri.ts:23-92).  Values are QM31 SoA arrays [4, n], bit-reversed
order; adjacent pairs are (p, -p) cosets.

Twiddle sources:
  * fold_line: 1/x at bit-reversed half-coset positions == an inverse
    twiddle-tree layer (the half_odds tower is closed under doubling).
  * fold_circle_into_line: 1/y over the domain's half coset, bit-reversed
    (precomputed per-domain on host, cached).
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from . import m31, qm31


_PALLAS_DEINT_MIN = 1 << 13


def _deint_on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _deinterleave(x: jnp.ndarray):
    """(x[..., 0::2], x[..., 1::2]) without the strided-lane gather.

    A direct stride-2 slice on the minor (128-lane) axis lowers to a ~3 GB/s
    gather on TPU (measured 21.6 ms on [4, 2^22]); routing the pair bit
    through a [128, 2] minor transpose is 3.5x faster and the op XLA lowers
    to vector shuffles.  (The reference SIMD backend does the same with
    in-register interleaves, simd/m31.ts:72-105.)  On TPU, large columns
    dispatch the Pallas kernel (ops/pallas/interleave.py) instead: the pair
    bit rides the sublane axis entirely in VMEM -- measured 10.5x the XLA
    mini-transpose at [4, 2^22] (1.5 vs 16 ms, round 4).
    """
    n = x.shape[-1]
    if n < 256 or n % 256 != 0:
        # strided-slice fallback; the fast path needs n % 256 == 0
        # (ADVICE r3: every current caller is power-of-two-sized, but the
        # helper is shared by five modules -- guard rather than document)
        return x[..., 0::2], x[..., 1::2]
    if n >= _PALLAS_DEINT_MIN and _deint_on_tpu():
        from .pallas.interleave import deinterleave_pallas

        return deinterleave_pallas(x)
    lead = x.shape[:-1]
    v = x.reshape(*lead, n // 256, 128, 2)
    v = jnp.swapaxes(v, -1, -2)  # [..., q, 2, 128]
    return (v[..., 0, :].reshape(*lead, n // 2),
            v[..., 1, :].reshape(*lead, n // 2))


@jax.jit
def fold_line(values: jnp.ndarray, itwiddles: jnp.ndarray,
              alpha: jnp.ndarray) -> jnp.ndarray:
    """[4, n] -> [4, n/2]: f' = f0 + alpha*f1 with (f0, f1) = ibutterfly pairs."""
    v0, v1 = _deinterleave(values)
    f0 = qm31.add(v0, v1)
    f1 = m31.mul(m31.sub(v0, v1), itwiddles[None, :])
    return qm31.add(f0, qm31.mul(f1, alpha[:, None]))


@jax.jit
def fold_circle_into_line(dst: jnp.ndarray, src: jnp.ndarray,
                          y_itwiddles: jnp.ndarray,
                          alpha: jnp.ndarray) -> jnp.ndarray:
    """dst <- dst * alpha^2 + (alpha*f1 + f0) (reference fri.ts:162-192)."""
    v0, v1 = _deinterleave(src)
    f0 = qm31.add(v0, v1)
    f1 = m31.mul(m31.sub(v0, v1), y_itwiddles[None, :])
    f_prime = qm31.add(qm31.mul(f1, alpha[:, None]), f0)
    alpha_sq = qm31.mul(alpha, alpha)
    return qm31.add(qm31.mul(dst, alpha_sq[:, None]), f_prime)


@jax.jit
def decompose(values: jnp.ndarray):
    """Split a FRI-space secure eval into fft-space part + lambda.

    lambda = (sum(first half) - sum(second half)) / N; g = v -/+ lambda
    (reference backend/cpu/fri.ts:96-163).
    """
    n = values.shape[-1]
    half = n // 2

    def tree_sum(x):
        # log-depth pairwise reduction keeps every add a partial reduce
        while x.shape[-1] > 1:
            x0, x1 = _deinterleave(x)
            x = m31.add(x0, x1)
        return x[..., 0]

    a_sum = tree_sum(values[:, :half])
    b_sum = tree_sum(values[:, half:])
    n_inv = m31.inv(jnp.full((), n % ((1 << 31) - 1), dtype=jnp.uint32))
    lam = m31.mul(m31.sub(a_sum, b_sum), n_inv)  # [4]
    g_first = qm31.sub(values[:, :half], lam[:, None])
    g_second = qm31.add(values[:, half:], lam[:, None])
    return jnp.concatenate([g_first, g_second], axis=1), lam


def domain_y_itwiddles(domain) -> jnp.ndarray:
    """1/y over the half coset in bit-reversed order (for circle->line fold)."""
    return _domain_y_itwiddles_cached(
        domain.half_coset.initial_index.value, domain.half_coset.log_size)


@lru_cache(maxsize=None)
def _domain_y_itwiddles_cached(initial_index: int, log_size: int) -> jnp.ndarray:
    from ..circle import CirclePointIndex, Coset
    from ..poly.twiddles import _coset_halves_xy
    from ..utils import bit_reverse_permutation

    coset = Coset(CirclePointIndex(initial_index), log_size)
    # need ALL points of the half coset, i.e. first half of the doubled-size
    # view: build from the full coset directly
    half = coset.size()
    init = coset.initial
    P = (1 << 31) - 1
    xs = np.array([init.x.value], dtype=np.uint64)
    ys = np.array([init.y.value], dtype=np.uint64)
    j = 0
    while len(xs) < half:
        sp = coset.step_size.scale(1 << j).to_point()
        sx, sy = np.uint64(sp.x.value), np.uint64(sp.y.value)
        nx = (xs * sx + np.uint64(P) * P - ys * sy) % P
        ny = (xs * sy + ys * sx) % P
        xs = np.concatenate([xs, nx])
        ys = np.concatenate([ys, ny])
        j += 1
    perm = bit_reverse_permutation(log_size)
    return jnp.asarray(m31.np_inv(ys[perm].astype(np.uint32)))
