"""FetchBatch: deferred device->host transfers (one RTT for any number
of registered arrays) + bucketed deferred gathers.

Split from utils.py for readability; re-exported there.

The TPU tunnel charges a full round trip per *blocking* transfer, so N
small decommit gathers cost N RTTs when fetched one by one; deferring
them and pulling one concatenated uint32 buffer costs one.  Dispatch
COUNT is cut by GatherPool: all trees' gathers coalesce into one eager
concatenate + one bucketed take per array kind.  (Fusing the gathers
into one jitted materialize does NOT work -- tried round 4: the fused
program's pytree structure varies per proof and its ~10 s tunnel
recompile dwarfed the saved dispatch floors.  Eager pooled ops keep a
stable shape vocabulary instead.)
"""
from __future__ import annotations

from functools import partial
from typing import List, Optional

import numpy as np


def _to_host(x) -> np.ndarray:
    from .utils import to_host

    return to_host(x)


def _pack_flat(arrays):
    """Ravel + concat a list of device arrays in ONE jitted dispatch.
    Compiled once per shape-tuple (bucketed shapes keep that bounded)."""
    import jax
    import jax.numpy as jnp

    global _PACK_JIT
    if _PACK_JIT is None:
        _PACK_JIT = jax.jit(lambda arrs: jnp.concatenate(
            [jnp.ravel(a).astype(jnp.uint32) for a in arrs]))
    return _PACK_JIT(list(arrays))


_PACK_JIT = None


class FetchBatch:
    """Defer device->host transfers; materialize with ONE fetch."""

    def __init__(self):
        self._plain = []   # arrays to fetch, registration order
        self._order = []   # ("plain", index, shape)
        self._values: Optional[List[np.ndarray]] = None

    def _check_open(self):
        if self._values is not None:
            raise RuntimeError("FetchBatch already materialized")

    def _handle(self, slot):
        batch = self

        class _Handle:
            def get(self):
                if batch._values is None:
                    raise RuntimeError("materialize() not called")
                return batch._values[slot]

        return _Handle()

    def defer(self, arr):
        """Register a device uint32 array; returns a handle whose .get()
        yields the numpy value after materialize()."""
        self._check_open()
        slot = len(self._order)
        self._plain.append(arr)
        self._order.append(("plain", len(self._plain) - 1, arr.shape))
        return self._handle(slot)

    def defer_take(self, arr, idx: np.ndarray):
        """Register a LAST-AXIS gather arr[..., idx].

        The gather DISPATCHES eagerly (async) but its result is fetched
        with the batch.  (A round-4 experiment executed all gathers
        inside one jitted materialize program instead -- one dispatch
        total -- but the program's pytree structure varies with the
        proof's bucket multiset and the ~10 s tunnel recompile per fresh
        structure dwarfed the ~2.3 ms/dispatch it saved.  Dispatch-count
        reduction comes from gathering per-tree HEAPS instead: see
        vcs/prover.decommit_deferred.)"""
        self._check_open()
        import jax.numpy as jnp

        return self.defer(jnp.take(jnp.asarray(arr), jnp.asarray(idx),
                                   axis=-1))

    def materialize(self) -> None:
        import jax.numpy as jnp

        if self._values is not None:
            return
        if not self._order:
            self._values = []
            return
        if len(self._plain) > 1:
            # ONE jitted pack replaces len(plain) eager ravel dispatches +
            # one concat (~2.3 ms/dispatch through the tunnel; a wide-fib
            # decommit batch holds ~17 arrays = ~40 ms of pure dispatch
            # floor).  Shapes are bucketed power-of-two (padded_take /
            # GatherPool), so the compiled pack is reused across proofs
            # of the same circuit.
            host = _to_host(_pack_flat(self._plain))
        else:
            host = _to_host(jnp.ravel(self._plain[0]).astype(jnp.uint32))
        values: List[np.ndarray] = []
        off = 0
        for _, _, shape in self._order:
            n = int(np.prod(shape)) if shape else 1
            values.append(host[off:off + n].reshape(shape))
            off += n
        self._values = values


class GatherPool:
    """Pools MANY last-axis (or axis-0) gathers — across trees, layers, and
    hash flavors — into ONE eager concatenate + ONE bucketed take per
    distinct leading-shape group.

    Rationale: a full decommitment touches ~20 Merkle trees (4 commitment
    trees + ~16 FRI layer trees); per-tree gathers cost ~2-3 eager
    dispatches each at the ~2.3 ms tunnel dispatch floor (~0.35-0.6 s of
    the wide-fib prove, round 4).  Registration is pure host bookkeeping;
    seal() concatenates each group's arrays once and issues one take whose
    index count is padded to the next power of two, so the executable
    shapes stay proof-independent (same reasoning as padded_take).
    Groups are keyed by (leading shape, axis): Blake2s hash witnesses
    [8, n], QM31 witness values [4, n], per-tree column stacks [C, n], and
    Poseidon252 limb layers [n, 21] (axis=0) each coalesce with their own
    kind.
    """

    def __init__(self, batch: FetchBatch):
        self.batch = batch
        self._groups = {}

    def take(self, arr, positions, axis: int = -1):
        """Register gather arr[..., positions] (axis=-1) or
        arr[positions, ...] (axis=0); returns a thunk yielding the numpy
        result after seal() + batch.materialize()."""
        import jax.numpy as jnp

        if not len(positions):
            raise ValueError("GatherPool.take: empty position list")
        a = jnp.asarray(arr)
        if axis not in (-1, 0, a.ndim - 1):
            raise ValueError("GatherPool supports last-axis/axis-0 gathers")
        ax = 0 if (axis == 0 and a.ndim > 1) else -1
        key = ((a.shape[1:], 0) if ax == 0 else (a.shape[:-1], -1))
        g = self._groups.setdefault(
            key, {"arrays": [], "total": 0, "positions": [], "handle": None,
                  "n": 0})
        if g["handle"] is not None:
            raise RuntimeError("GatherPool already sealed")
        off = g["total"]
        g["arrays"].append(a)
        g["total"] += int(a.shape[0] if ax == 0 else a.shape[-1])
        start = len(g["positions"])
        count = len(positions)
        g["positions"].extend(off + int(p) for p in positions)

        def get() -> np.ndarray:
            if g["handle"] is None:
                raise RuntimeError("GatherPool not sealed")
            full = g["handle"].get()
            return (full[start:start + count]
                    if ax == 0 else full[..., start:start + count])

        return get

    def seal(self) -> None:
        """Dispatch one concatenate + one padded take per group."""
        import jax.numpy as jnp

        for (_, ax), g in self._groups.items():
            if g["handle"] is not None:
                continue
            cat = (jnp.concatenate(g["arrays"], axis=ax)
                   if len(g["arrays"]) > 1 else g["arrays"][0])
            n = len(g["positions"])
            cap = 1 << max(0, (n - 1).bit_length())
            idx = np.asarray(
                g["positions"] + [g["positions"][-1]] * (cap - n),
                dtype=np.int64)
            gathered = jnp.take(cat, jnp.asarray(idx), axis=ax)
            g["handle"] = self.batch.defer(gathered)
            g["n"] = n


def padded_take(arr, positions, axis: int, batch: FetchBatch):
    """Deferred gather with the index count padded to the next power of
    two (edge-repeated), returning a thunk for the UNpadded numpy result
    after batch.materialize().

    Why: decommitment gather lengths depend on the (channel-drawn) query
    structure, so every new proof produced fresh gather shapes and an XLA
    recompile -- ~10 s of the 12 s logup prove through the tunnel
    (measured round 4).  Bucketing makes the shapes proof-independent.
    Only last-axis gathers are supported (every decommit site is one).
    """
    if axis not in (-1, arr.ndim - 1):
        raise ValueError("padded_take supports last-axis gathers only")
    if not len(positions):  # non-local caller invariant made local (ADVICE r4)
        raise ValueError("padded_take: empty position list")
    n = len(positions)
    cap = 1 << max(0, (n - 1).bit_length())
    idx = np.asarray(list(positions) + [positions[-1]] * (cap - n),
                     dtype=np.int64)
    handle = batch.defer_take(arr, idx)

    def get() -> np.ndarray:
        return handle.get()[..., :n]

    return get
