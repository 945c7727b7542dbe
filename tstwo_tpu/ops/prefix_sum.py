"""Inclusive prefix sum over M31/QM31 columns.

The reference's simd/prefix_sum.ts is an empty placeholder; Rust stwo uses
prefix sums for LogUp interaction columns.  Implemented as a log-depth
Hillis-Steele scan of exact modular adds (XLA-friendly static shifts); an
exclusive variant and a bit-reversed-circle-domain variant are provided for
interaction-trace generation.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from . import m31


@jax.jit
def inclusive_prefix_sum(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive scan along the last axis (values in [0, P))."""
    n = x.shape[-1]
    shift = 1
    while shift < n:
        shifted = jnp.pad(x[..., :-shift], [(0, 0)] * (x.ndim - 1) + [(shift, 0)])
        x = m31.add(x, shifted)
        shift *= 2
    return x


@jax.jit
def exclusive_prefix_sum(x: jnp.ndarray) -> jnp.ndarray:
    inc = inclusive_prefix_sum(x)
    return m31.sub(inc, x)


@lru_cache(maxsize=None)
def _coset_order_perms(log_size: int):
    """(committed->coset gather perm, its inverse) as jnp index arrays.

    Committed columns are in bit-reversed circle-domain order; the LogUp
    cumulative column telescopes along the *coset* order p, p+step, ...
    (Rust stwo simd prefix_sum.rs operates on the same layout)."""
    from ..utils import bit_reverse_index, coset_index_to_circle_domain_index

    n = 1 << log_size
    perm = np.fromiter(
        (bit_reverse_index(
            coset_index_to_circle_domain_index(k, log_size), log_size)
         for k in range(n)), dtype=np.int32, count=n)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(n, dtype=np.int32)
    # keep as host numpy (see constraint_framework._offset_perm note)
    return perm, inv


def inclusive_prefix_sum_bit_rev_circle(x: jnp.ndarray,
                                        log_size: int) -> jnp.ndarray:
    """Inclusive prefix sum *in coset order* of a column stored in
    bit-reversed circle-domain order (any leading dims; last axis = rows)."""
    perm, inv = _coset_order_perms(log_size)
    coset_vals = jnp.take(x, perm, axis=-1)
    summed = inclusive_prefix_sum(coset_vals)
    return jnp.take(summed, inv, axis=-1)
