"""Vectorized M31 (GF(2^31-1)) arithmetic on uint32 arrays.

This is the device-side core of the framework: every column op, FFT
butterfly, quotient and fold reduces to these primitives.  Values are
`jnp.uint32` in [0, P).  Multiplication computes the exact 31x31->62-bit
product via 16-bit limb decomposition (TPU has no 64-bit integer units),
then folds with 2^31 === 1 (mod P).

Semantics match the reference scalar ops (reference m31.ts:39-101) and the
16-lane SIMD spec (reference backend/simd/m31.ts) which this generalizes to
full arrays; validated against test-vectors/m31-test-vectors.json.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

P = (1 << 31) - 1
# Plain python ints (not jnp scalars): weak typing promotes them to uint32
# in-op, and -- critically -- they are not traced constants, so every m31/
# cm31/qm31 op can run INSIDE a Pallas kernel body (a module-level jnp
# scalar would be a captured constant, which pallas_call rejects).
_P32 = P
_MASK16 = 0xFFFF
_MASK15 = 0x7FFF

uint32 = jnp.uint32


def _partial_reduce(x):
    """x in [0, 2P) -> x mod P."""
    return jnp.where(x >= _P32, x - _P32, x)


def _reduce_u32(x):
    """x any uint32 -> x mod P in [0, P)."""
    y = (x >> 31) + (x & _P32)
    return jnp.where(y >= _P32, y - _P32, y)


def add(a, b):
    return _partial_reduce(a + b)


def sub(a, b):
    return _partial_reduce(a + _P32 - b)


def neg(a):
    return jnp.where(a == 0, a, _P32 - a)


def mul(a, b):
    """Exact modular product via 16-bit limbs.

    a = ah*2^16 + al, b = bh*2^16 + bl  (ah,bh < 2^15; al,bl < 2^16)
    a*b = hh*2^32 + mid*2^16 + ll, with 2^31 === 1:
      hh*2^32 === 2*hh;  mid*2^16 === (mid>>15) + (mid&0x7fff)*2^16;
      ll === (ll>>31) + (ll&P).
    Regrouped into ONE partial reduction + one full reduction (the naive
    grouping needs two full ones): with a, b < P,
      u = 2*hh + (mid>>15)                 <= 2^31 - 2   (coupled bound:
          ah=bh=2^15-1, al=bl=2^16-2 maximizes u at exactly 2^31-2)
      v = (ll&P) + ((mid&0x7fff)<<16) + (ll>>31)  < 2^32, one fold -> <= 2^31
    so u + fold(v) < 2^32 exactly.  ~10% fewer VPU ops per butterfly than
    the double-reduction form (PERF.md section 2 op audit).
    """
    al = a & _MASK16
    ah = a >> 16
    bl = b & _MASK16
    bh = b >> 16
    ll = al * bl                      # < 2^32, exact in uint32
    mid = al * bh + ah * bl           # < 2^32, exact
    hh = ah * bh                      # < 2^30
    u = hh + hh + (mid >> 15)
    v = (ll & _P32) + ((mid & _MASK15) << 16) + (ll >> 31)
    v = (v >> 31) + (v & _P32)        # <= 2^31
    return _reduce_u32(u + v)


def square(a):
    return mul(a, a)


def double(a):
    return add(a, a)


def _sqn(v, n):
    for _ in range(n):
        v = mul(v, v)
    return v


@jax.jit
def inv(v):
    """v^(P-2) via the 37-multiplication addition chain (reference m31.ts:305-315).

    inv(0) = 0 by convention (callers must ensure nonzero where it matters).
    """
    t0 = mul(_sqn(v, 2), v)
    t1 = mul(_sqn(t0, 1), t0)
    t2 = mul(_sqn(t1, 3), t0)
    t3 = mul(_sqn(t2, 1), t0)
    t4 = mul(_sqn(t3, 8), t3)
    t5 = mul(_sqn(t4, 8), t3)
    return mul(_sqn(t5, 7), t2)


def pow_const(v, e: int):
    """v**e for a static exponent."""
    r = jnp.ones_like(v)
    base = v
    while e:
        if e & 1:
            r = mul(r, base)
        base = mul(base, base)
        e >>= 1
    return r


def asarray(x) -> jnp.ndarray:
    return jnp.asarray(x, dtype=jnp.uint32)


# ---------------------------------------------------------------------------
# Host (numpy, uint64) twins -- used for twiddle precompute and oracles.
# ---------------------------------------------------------------------------

def np_mul(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return ((a.astype(np.uint64) * b.astype(np.uint64)) % P).astype(np.uint32)


def np_add(a, b):
    return ((a.astype(np.uint64) + b) % P).astype(np.uint32)


def np_sub(a, b):
    return ((a.astype(np.uint64) + P - b) % P).astype(np.uint32)


def np_neg(a):
    return np.where(a == 0, a, (P - a.astype(np.uint64)).astype(np.uint32))


def np_inv(a: np.ndarray) -> np.ndarray:
    """Batch inverse via pow chain on u64 (exact)."""
    r = np.ones_like(a, dtype=np.uint64)
    base = a.astype(np.uint64)
    e = P - 2
    while e:
        if e & 1:
            r = (r * base) % P
        base = (base * base) % P
        e >>= 1
    return r.astype(np.uint32)
