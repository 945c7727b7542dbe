"""Batched Poseidon252 (Starknet Hades) permutation on device.

The reference's simd/poseidon252.ts is an empty placeholder; Rust stwo has a
real SIMD Poseidon252 backend.  252-bit field arithmetic has no native TPU
form, so elements are 21 x 12-bit limbs in uint32 lanes: limb products are
<= 2^24 and every CIOS accumulation stays < 2^25, far below the uint32
ceiling, so the whole multiplier is exact int32 VPU work (no 64-bit
emulation).  Field multiplication is Montgomery (R = 2^252, limb-aligned --
chosen over pseudo-Mersenne folding because p = 2^251 + 17*2^192 + 1 has a
192-bit tail that never converges under high-bit folding).

Layout: a felt252 is uint32[..., 21], least-significant limb first; batch in
the leading dims.  The permutation state is a list of 3 such arrays.

Parity: bit-exact vs channel/poseidon.py `hades_permutation` /
`poseidon_hash_many` (themselves pinned to stwo's test values).
"""
from __future__ import annotations

from functools import lru_cache
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..channel.poseidon import _ARK, _N_ROUNDS, _R_F, _R_P, P252

B = 12                      # limb bits
N_LIMBS = 21                # 21 * 12 = 252
MASK = (1 << B) - 1
R = 1 << (B * N_LIMBS)      # Montgomery radix 2^252
R_MOD_P = R % P252
R2_MOD_P = (R * R) % P252
# -p^-1 mod 2^B (CIOS per-limb Montgomery factor)
P_INV_NEG = (-pow(P252, -1, 1 << B)) % (1 << B)


def int_to_limbs(v: int) -> np.ndarray:
    out = np.empty(N_LIMBS, dtype=np.uint32)
    for i in range(N_LIMBS):
        out[i] = v & MASK
        v >>= B
    return out


def limbs_to_int(limbs) -> int:
    arr = np.asarray(limbs, dtype=np.uint64)
    return sum(int(arr[i]) << (B * i) for i in range(N_LIMBS))


def ints_to_limb_array(vals: Sequence[int]) -> np.ndarray:
    """[n] python ints -> uint32[n, 21]."""
    return np.stack([int_to_limbs(v) for v in vals])


def limb_array_to_ints(arr) -> List[int]:
    host = np.asarray(arr, dtype=np.uint64)
    return [sum(int(row[i]) << (B * i) for i in range(N_LIMBS))
            for row in host.reshape(-1, N_LIMBS)]


_P_LIMBS = tuple(int(x) for x in int_to_limbs(P252))


def _cond_sub_p(limbs: jnp.ndarray) -> jnp.ndarray:
    """x - p if x >= p else x, for x < 2p (one pass)."""
    borrow = jnp.zeros(limbs.shape[:-1], dtype=jnp.uint32)
    diff = []
    for i in range(N_LIMBS):
        s = limbs[..., i] - jnp.uint32(_P_LIMBS[i]) - borrow
        diff.append(s & MASK)
        borrow = (s >> 31) & 1  # underflow wrapped: top bit set
    keep = borrow.astype(bool)  # borrow out => x < p, keep x
    diff = jnp.stack(diff, axis=-1)
    return jnp.where(keep[..., None], limbs, diff)


def add(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a + b) mod p for a, b < p."""
    carry = jnp.zeros(a.shape[:-1], dtype=jnp.uint32)
    out = []
    for i in range(N_LIMBS):
        s = a[..., i] + b[..., i] + carry
        out.append(s & MASK)
        carry = s >> B
    return _cond_sub_p(jnp.stack(out, axis=-1))


def sub(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a - b) mod p for a, b < p: a + (p - b) with borrow-free limbs."""
    # p - b: p limbs are fixed; b < p so no final borrow
    borrow = jnp.zeros(a.shape[:-1], dtype=jnp.uint32)
    pb = []
    for i in range(N_LIMBS):
        s = jnp.uint32(_P_LIMBS[i]) - b[..., i] - borrow
        pb.append(s & MASK)
        borrow = (s >> 31) & 1
    return add(a, jnp.stack(pb, axis=-1))


_P_NONZERO_REST = tuple(j for j in range(1, N_LIMBS) if _P_LIMBS[j])

# 0/1 tensor S[i, j, i+j] = 1: contracts the outer product into the 42-limb
# convolution in one dot (uint32 sums stay < 21 * 2^24 < 2^29); built lazily
# so importing this module does not initialize a jax backend
_CONV_SELECT_NP = np.zeros((N_LIMBS, N_LIMBS, 2 * N_LIMBS), dtype=np.uint32)
for _i in range(N_LIMBS):
    for _j in range(N_LIMBS):
        _CONV_SELECT_NP[_i, _j, _i + _j] = 1


def mont_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Montgomery product a*b*R^-1 mod p (inputs < p, output < p), separated
    operand scanning: full 42-limb schoolbook product (every coefficient
    <= 21*2^24 < 2^29), then 21 Montgomery reduction steps with lazy limb
    accumulation (each limb gains <= 20 * 2^24 more, staying < 2^30), one
    final carry ripple, and an extended conditional subtract (the reduced
    value is < 2p which exceeds R = 2^252 by one bit)."""
    shape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    # The schoolbook product lattice is ONE outer product contracted with a
    # constant 0/1 anti-diagonal tensor (compile-friendly: the original
    # .at[].add dynamic-update-slice loops made the jitted Hades graph take
    # ~7 minutes of XLA time; this form compiles in seconds).
    prod = (a[..., :, None].astype(jnp.uint32)
            * b[..., None, :])  # [..., 21, 21], each < 2^24
    t_arr = jnp.einsum("...ij,ijk->...k", prod,
                       jnp.asarray(_CONV_SELECT_NP),
                       preferred_element_type=jnp.uint32)  # [..., 42]
    t = [t_arr[..., k] for k in range(2 * N_LIMBS)]
    zero = jnp.zeros(shape, dtype=jnp.uint32)
    c = zero
    # Montgomery reduction; p = 2^251 + 17*2^192 + 1 has only three nonzero
    # limbs ({0: 1, 16: 17, 20: 2^11}), so each step touches two positions
    # beyond the carry instead of twenty.
    for i in range(N_LIMBS):
        v = t[i] + c
        m = (v * jnp.uint32(P_INV_NEG)) & MASK
        c = (v + m * jnp.uint32(_P_LIMBS[0])) >> B
        for j in _P_NONZERO_REST:
            t[i + j] = t[i + j] + m * jnp.uint32(_P_LIMBS[j])
    # result = limbs N..2N-1 plus carry c entering at the bottom
    out = []
    carry = c
    for k in range(N_LIMBS, 2 * N_LIMBS):
        s = t[k] + carry
        out.append(s & MASK)
        carry = s >> B
    out.append(carry)  # 22nd limb: result < 2p can exceed R by one bit
    # conditional subtract over 22 limbs
    borrow = zero
    p22 = list(_P_LIMBS) + [0]
    diff = []
    for i in range(N_LIMBS + 1):
        s = out[i] - jnp.uint32(p22[i]) - borrow
        diff.append(s & MASK)
        borrow = (s >> 31) & 1
    keep = borrow.astype(bool)  # borrow out => value < p
    res = jnp.stack(out[:N_LIMBS], axis=-1)
    diff = jnp.stack(diff[:N_LIMBS], axis=-1)
    return jnp.where(keep[..., None], res, diff)


@lru_cache(maxsize=None)
def _mont_constants():
    one_mont = ints_to_limb_array([R_MOD_P])[0]
    r2 = ints_to_limb_array([R2_MOD_P])[0]
    # round constants in Montgomery form
    ark = np.stack([
        np.stack([int_to_limbs((c * R_MOD_P) % P252) for c in row])
        for row in _ARK])  # [91, 3, 21]
    return one_mont, r2, ark


def to_mont(x: jnp.ndarray) -> jnp.ndarray:
    _, r2, _ = _mont_constants()
    return mont_mul(x, jnp.asarray(r2))


def from_mont(x: jnp.ndarray) -> jnp.ndarray:
    one = jnp.zeros(N_LIMBS, dtype=jnp.uint32).at[0].set(1)
    return mont_mul(x, one)


def _cube(x):
    return mont_mul(mont_mul(x, x), x)


def _mds(s0, s1, s2):
    """MDS [[3,1,1],[1,-1,1],[1,1,-2]]: t = s0+s1+s2; rows are t+2*s0,
    t-2*s1, t-3*s2 (cairo-lang poseidon small_params)."""
    t = add(add(s0, s1), s2)
    return (add(t, add(s0, s0)),
            sub(t, add(s1, s1)),
            sub(t, add(s2, add(s2, s2))))


def hades_permutation(state: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Batched Hades permutation; state = 3 arrays uint32[..., 21] of
    field elements < p (standard form).  8 full + 83 partial rounds, each
    phase a lax.scan over its round constants (keeps the traced graph at
    one round body per phase -- a fully unrolled permutation is ~100k
    primitive ops and minutes of XLA compile)."""
    _, _, ark = _mont_constants()
    ark = jnp.asarray(ark)
    s = tuple(to_mont(v) for v in state)

    def full_round(carry, a):
        t = [_cube(add(carry[k], a[k])) for k in range(3)]
        return tuple(_mds(*t)), None

    def partial_round(carry, a):
        s0 = add(carry[0], a[0])
        s1 = add(carry[1], a[1])
        s2 = _cube(add(carry[2], a[2]))
        return tuple(_mds(s0, s1, s2)), None

    half = _R_F // 2
    s, _ = jax.lax.scan(full_round, s, ark[:half])
    s, _ = jax.lax.scan(partial_round, s, ark[half:half + _R_P])
    s, _ = jax.lax.scan(full_round, s, ark[half + _R_P:_N_ROUNDS])
    return [from_mont(v) for v in s]


def poseidon_hash_many(felt_cols: List[jnp.ndarray]) -> jnp.ndarray:
    """Batched starknet poseidon_hash_many over fixed-width inputs:
    felt_cols = k arrays uint32[..., 21]; every batch row hashes the same
    number of felts.  Returns uint32[..., 21]."""
    if not felt_cols:
        raise ValueError("need at least one input felt column")
    batch_shape = felt_cols[0].shape[:-1]
    one = jnp.zeros(N_LIMBS, dtype=jnp.uint32).at[0].set(1)
    vals = list(felt_cols) + [jnp.broadcast_to(one, batch_shape + (N_LIMBS,))]
    if len(vals) % 2:
        zero = jnp.zeros(batch_shape + (N_LIMBS,), dtype=jnp.uint32)
        vals.append(zero)
    zero = jnp.zeros(batch_shape + (N_LIMBS,), dtype=jnp.uint32)
    state = [zero, zero, zero]
    for i in range(0, len(vals), 2):
        state = hades_permutation(
            [add(state[0], vals[i]), add(state[1], vals[i + 1]), state[2]])
    return state[0]


def pack_m31_columns(cols: jnp.ndarray) -> jnp.ndarray:
    """Pack 8 M31 values per felt252 (first element highest, 31 bits each,
    248 bits total < p so no reduction): cols uint32[8, n] -> uint32[n, 21]
    (vcs/poseidon252_merkle.ts packing)."""
    if cols.shape[0] != 8:
        raise ValueError("expected exactly 8 M31 rows")
    n = cols.shape[1]
    limbs = []
    for q in range(N_LIMBS):
        limb = jnp.zeros(n, dtype=jnp.uint32)
        for j in range(8):
            v = cols[j]                    # word[j] at bit offset 31*(7-j)
            o = 31 * (7 - j)
            # limb q holds bits [12q, 12q+12) of v << o
            if B * q >= o:
                sh = B * q - o
                if sh < 31:
                    limb = limb + ((v >> sh) & MASK)
            elif o - B * q < B:            # v's low bits land mid-limb
                limb = limb + ((v << (o - B * q)) & MASK)
        limbs.append(limb)
    return jnp.stack(limbs, axis=-1)
