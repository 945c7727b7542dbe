"""Twiddle precomputation for the circle FFT.

A TwiddleTree for a root coset of log size L holds, for each doubling layer
j = 0..L-1, the bit-reversed x-coordinates of the first half of
root.repeated_double(j) -- plus their modular inverses.  This is the layout
produced by the reference slow_precompute_twiddles
(reference backend/cpu/circle.ts:210-239), stored per-layer instead of as a
flat buffer so device kernels can slice by size without host gathers.

Host precompute runs in numpy uint64 (exact); results are uploaded once and
cached per (initial_index, log_size).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

from ..circle import Coset
from ..ops import m31
from ..utils import bit_reverse_permutation

P = (1 << 31) - 1


def _coset_halves_xy(coset: Coset) -> Tuple[np.ndarray, np.ndarray]:
    """(x, y) coords of the first half of `coset`, natural order (numpy u64)."""
    half = coset.size() // 2
    init = coset.initial
    xs = np.array([init.x.value], dtype=np.uint64)
    ys = np.array([init.y.value], dtype=np.uint64)
    j = 0
    while len(xs) < half:
        sp = coset.step_size.scale(1 << j).to_point()
        sx, sy = np.uint64(sp.x.value), np.uint64(sp.y.value)
        nx = (xs * sx + P * P - ys * sy) % P
        ny = (xs * sy + ys * sx) % P
        xs = np.concatenate([xs, nx])
        ys = np.concatenate([ys, ny])
        j += 1
    return xs[:half], ys[:half]


def _double_x(x: np.ndarray) -> np.ndarray:
    return (2 * x * x + (P - 1)) % P


@dataclass
class TwiddleTree:
    """Per-layer twiddles for a coset-doubling tower (reference poly/twiddles.ts:15)."""

    root_coset: Coset
    # layers[j]: bit-reversed x-coords of first half of root.double^j;
    # sizes 2^(L-1), 2^(L-2), ..., 1
    layers: List[jnp.ndarray]
    ilayers: List[jnp.ndarray]
    layers_np: List[np.ndarray]
    ilayers_np: List[np.ndarray]

    def layer_of_size(self, size: int, inverse: bool = False) -> jnp.ndarray:
        src = self.ilayers if inverse else self.layers
        for arr in src:
            if arr.shape[-1] == size:
                return arr
        raise ValueError(f"no twiddle layer of size {size}")

    def flat_buffer(self, inverse: bool = False) -> np.ndarray:
        """Reference-compatible flat layout: layers concatenated + trailing 1."""
        src = self.ilayers_np if inverse else self.layers_np
        return np.concatenate([*src, np.ones(1, dtype=np.uint32)])


_CACHE: Dict[Tuple[int, int], TwiddleTree] = {}


def precompute_twiddles(coset: Coset) -> TwiddleTree:
    key = (coset.initial_index.value, coset.log_size)
    if key in _CACHE:
        return _CACHE[key]
    layers_np: List[np.ndarray] = []
    xs, _ = _coset_halves_xy(coset)
    cur = xs
    for _ in range(coset.log_size):
        perm = bit_reverse_permutation(int(np.log2(len(cur))) if len(cur) > 1 else 0)
        layers_np.append(cur[perm].astype(np.uint32) if len(cur) > 1
                         else cur.astype(np.uint32))
        cur = _double_x(cur[: len(cur) // 2]) if len(cur) > 1 else cur[:0]
    ilayers_np = [m31.np_inv(a) for a in layers_np]
    tree = TwiddleTree(
        root_coset=coset,
        layers=[jnp.asarray(a) for a in layers_np],
        ilayers=[jnp.asarray(a) for a in ilayers_np],
        layers_np=layers_np,
        ilayers_np=ilayers_np,
    )
    _CACHE[key] = tree
    return tree


def domain_line_twiddles(domain_log_size: int, tree: TwiddleTree,
                         inverse: bool = False) -> List[jnp.ndarray]:
    """Line-layer twiddles for a circle domain of log size n.

    Returns [t_1, t_2, ..., t_{n-1}] where t_l (size 2^(n-1-l)) drives fft
    layer l (stride 2^l butterflies).  Mirrors domain_line_twiddles_from_tree
    (reference poly/utils.ts:78-99) without the flat-buffer slicing.
    """
    return [tree.layer_of_size(1 << (domain_log_size - 1 - l), inverse)
            for l in range(1, domain_log_size)]


# id-keyed memo: the layer-1 arrays are stable (cached on the TwiddleTree),
# and a STABLE circle-twiddle array identity is what lets the Pallas layout
# caches (ops/pallas/fft_kernels cached_layouts / cached_inv_layouts, also
# id-keyed) hit.  Without this, every interpolate/evaluate call built a
# fresh circle array -> layout-cache miss -> ~25 tables re-prepared,
# re-uploaded and block_until_ready'd per call (~400 ms of the wide-fib
# extension span, round 4).  Values kept alive by the ref to the source.
_CIRCLE_MEMO: Dict[int, Tuple[jnp.ndarray, jnp.ndarray]] = {}


def circle_layer_twiddles(line_layer1, neg=None) -> jnp.ndarray:
    """Layer-0 (circle-layer) twiddles from layer-1 line twiddles.

    Consecutive bit-reversed groups of 4 domain points are
    [(x,y), (-x,-y), (y,-x), (-y,x)]; their butterfly twiddles are
    [y, -y, -x, x] where [x, y] are the layer-1 pair
    (reference backend/cpu/circle.ts:270-278).
    """
    import jax as _jax

    cacheable = not isinstance(line_layer1, _jax.core.Tracer)
    if cacheable:
        hit = _CIRCLE_MEMO.get(id(line_layer1))
        if hit is not None:
            _CIRCLE_MEMO[id(line_layer1)] = _CIRCLE_MEMO.pop(
                id(line_layer1))  # true LRU: move-to-end on hit (ADVICE r4)
            return hit[0]
    x = line_layer1[0::2]
    y = line_layer1[1::2]
    out = jnp.stack([y, m31.neg(y), m31.neg(x), x], axis=-1).reshape(-1)
    if cacheable and not isinstance(out, _jax.core.Tracer):
        _CIRCLE_MEMO[id(line_layer1)] = (out, line_layer1)
        while len(_CIRCLE_MEMO) > 32:
            _CIRCLE_MEMO.pop(next(iter(_CIRCLE_MEMO)))
    return out
