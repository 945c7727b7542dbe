"""Poseidon252 Merkle hasher: packs 8 M31 per felt252
(reference vcs/poseidon252_merkle.ts)."""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

from ..channel.poseidon import (FieldElement252, Poseidon252Channel,
                                poseidon_hash_many)
from ..fields import M31

ELEMENTS_IN_BLOCK = 8


def construct_felt252_from_m31s(word: Sequence[M31]) -> int:
    """Pack 8 M31 limbs into one felt252 (31 bits each, first limb highest)."""
    if len(word) != 8:
        raise ValueError("expected exactly 8 M31 elements")
    acc = 0
    for limb in word:
        acc = (acc << 31) | limb.value
    return acc % ((1 << 251) + 17 * (1 << 192) + 1)


def hash_node(children: Optional[Tuple[FieldElement252, FieldElement252]],
              column_values: Sequence[M31]) -> FieldElement252:
    n_blocks = -(-len(column_values) // ELEMENTS_IN_BLOCK) if column_values else 0
    values = []
    if children is not None:
        values.append(children[0].value)
        values.append(children[1].value)
    padded = list(column_values) + [M31.zero()] * (
        ELEMENTS_IN_BLOCK * n_blocks - len(column_values))
    for i in range(0, len(padded), ELEMENTS_IN_BLOCK):
        values.append(construct_felt252_from_m31s(padded[i: i + 8]))
    return FieldElement252(poseidon_hash_many(values))


class Poseidon252MerkleChannel:
    @staticmethod
    def mix_root(channel: Poseidon252Channel, root: FieldElement252) -> None:
        channel.mix_root(root)


# ---------------------------------------------------------------------------
# Device-batched Merkle prover (HOT LOOP #3 for the Poseidon flavor):
# each layer is ONE batched Hades sweep via ops/poseidon252 (21x12-bit-limb
# Montgomery kernel) instead of a host scalar loop.
# ---------------------------------------------------------------------------

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _commit_layer_device(prev, cols):
    """prev: uint32[2n, 21] | None; cols: tuple of uint32[n] M31 columns.
    Returns uint32[n, 21] (one poseidon_hash_many per node, batched)."""
    from ..ops import poseidon252 as pos

    if prev is not None:
        n = prev.shape[0] // 2
    else:
        n = cols[0].shape[0]
    felts = []
    if prev is not None:
        pl = prev.reshape(n, 2, pos.N_LIMBS)
        felts.append(pl[:, 0])
        felts.append(pl[:, 1])
    if cols:
        n_blocks = -(-len(cols) // ELEMENTS_IN_BLOCK)
        padded = list(cols) + [jnp.zeros_like(cols[0])] * (
            ELEMENTS_IN_BLOCK * n_blocks - len(cols))
        stacked = jnp.stack(padded)  # [8*n_blocks, n]
        for b in range(n_blocks):
            felts.append(pos.pack_m31_columns(
                stacked[8 * b: 8 * (b + 1)]))
    return pos.poseidon_hash_many(felts)


class Poseidon252MerkleProver:
    """Mixed-size-column Merkle tree over felt252 nodes; layer hashing runs
    batched on device (layers are uint32[2^log, 21] limb arrays).

    reference vcs/poseidon252_merkle.ts:19-56 + vcs/prover.ts:13-109; the
    Rust SIMD backend's poseidon252 commit_on_layer is the spec the batched
    kernel replaces (the reference TS simd/poseidon252.ts is an empty stub).
    """

    def __init__(self, layers):
        self.layers = layers  # index == log size
        self._root = None

    # Layers smaller than this are padded up to it so every small layer of
    # every tree shares ONE compiled shape per structure -- the jitted Hades
    # graph costs ~1 min of XLA CPU compile, so shapes must be contained
    # (large layers compile once per power-of-two size).  64 rather than
    # 512: the padded Hades EXECUTES in proportion to PAD on CPU (~48 s
    # per small tree at 512, round-4 profile) and 64 still fills half a
    # TPU vreg row.
    PAD = 64

    @staticmethod
    def _layer(prev, layer_cols):
        from ..ops import poseidon252 as pos

        n = (prev.shape[0] // 2 if prev is not None
             else layer_cols[0].shape[-1])
        pad = Poseidon252MerkleProver.PAD
        if n >= pad:
            return _commit_layer_device(prev, tuple(layer_cols))
        pc = None
        if prev is not None:
            pc = jnp.concatenate([
                prev, jnp.zeros((2 * pad - prev.shape[0], pos.N_LIMBS),
                                dtype=jnp.uint32)])
        cc = tuple(jnp.pad(c, (0, pad - n)) for c in layer_cols)
        return _commit_layer_device(pc, cc)[:n]

    # Layers smaller than HOST_N are hashed on the HOST by scalar Hades:
    # XLA:CPU executes the PAD-padded device sweep in time proportional to
    # PAD (~seconds per tiny layer -- the Poseidon e2e test alone spent
    # 254 s in them, round-5 profile) while scalar host Hades costs
    # ~0.5 ms/node.  On TPU the device sweep is cheap, but every tree's
    # top levels are below HOST_N anyway and finishing them host-side
    # costs one small fetch instead of ~log2(HOST_N) tiny dispatches.
    # Host/device value equality is pinned by tests/test_poseidon.py::
    # test_device_merkle_root_matches_host_hash_node (which forces the
    # device path via min_device_n=0).
    #
    # The threshold is platform-dependent: scalar host Hades is ~1 ms/node
    # and an XLA:CPU padded sweep ~20 s, so CPU prefers the host for
    # anything small.  On TPU the host path is a net LOSS: taking over a
    # tree costs one blocking ~25 ms tunnel fetch of the previous layer
    # (x ~20 trees per proof) plus ~1 ms/node of host hashing, while the
    # device finishes the top levels asynchronously at ~2.3 ms/dispatch —
    # measured 1.14 s vs 0.56 s e2e (round 5), so TPU keeps the pure
    # device path.
    HOST_N_TPU = 0
    HOST_N_CPU = 256

    @staticmethod
    def _host_n() -> int:
        try:
            tpu = jax.devices()[0].platform in ("tpu", "axon")
        except Exception:  # pragma: no cover
            tpu = False
        return (Poseidon252MerkleProver.HOST_N_TPU if tpu
                else Poseidon252MerkleProver.HOST_N_CPU)

    @staticmethod
    def commit(columns, min_device_n=None) -> "Poseidon252MerkleProver":
        from ..ops import poseidon252 as pos

        host_below = (Poseidon252MerkleProver._host_n()
                      if min_device_n is None else min_device_n)
        expanded = []  # 2-D [C, n] entries = C same-size columns, in order
        for c in columns:
            if getattr(c, "ndim", 1) == 2:
                expanded.extend(c[i] for i in range(c.shape[0]))
            else:
                expanded.append(c)
        cols = sorted(expanded, key=lambda c: -c.shape[-1])
        if not cols:
            root = hash_node(None, [])
            return Poseidon252MerkleProver(
                [jnp.asarray(pos.ints_to_limb_array([root.value]))])
        max_log = int(cols[0].shape[-1]).bit_length() - 1
        prev = None
        host_prev = None  # list of ints once the host path takes over
        layers = {}
        for log in range(max_log, -1, -1):
            n = 1 << log
            layer_cols = tuple(c for c in cols if c.shape[-1] == n)
            if n >= host_below:
                prev = Poseidon252MerkleProver._layer(prev, layer_cols)
                layers[log] = prev
                continue
            if host_prev is None and prev is not None:
                host_prev = pos.limb_array_to_ints(np.asarray(prev))
            cols_np = [np.asarray(c) for c in layer_cols]
            nodes = []
            for i in range(n):
                children = None
                if host_prev is not None:
                    children = (FieldElement252(host_prev[2 * i]),
                                FieldElement252(host_prev[2 * i + 1]))
                values = [M31(int(c[i])) for c in cols_np]
                nodes.append(hash_node(children, values).value)
            layers[log] = np.asarray(pos.ints_to_limb_array(nodes))
            host_prev = nodes
        return Poseidon252MerkleProver(
            [layers[i] for i in range(max_log + 1)])

    def root(self) -> FieldElement252:
        if self._root is None:
            from ..ops import poseidon252 as pos

            self._root = FieldElement252(
                pos.limb_array_to_ints(np.asarray(self.layers[0][0]))[0])
        return self._root

    def root_deferred(self, batch):
        """Defer the root fetch into `batch`; returns a thunk yielding the
        FieldElement252 root after materialize() (same protocol as
        MerkleProver.root_deferred)."""
        from ..ops import poseidon252 as pos

        if self._root is not None:
            root = self._root
            return lambda: root
        handle = batch.defer(self.layers[0][0])

        def get() -> FieldElement252:
            if self._root is None:
                self._root = FieldElement252(
                    pos.limb_array_to_ints(handle.get()[None, :])[0])
            return self._root

        return get

    def decommit(self, queries_per_log_size, columns):
        """Witness assembly; shares the index-only plan with the Blake2s
        prover, gathers hashes/values per layer with one device take each."""
        from ..utils import FetchBatch

        batch = FetchBatch()
        finish = self.decommit_deferred(queries_per_log_size, columns, batch)
        batch.materialize()
        return finish()

    def decommit_deferred(self, queries_per_log_size, columns, batch,
                          pool=None):
        """Register all witness gathers into a utils.GatherPool (shared via
        `pool` with every other tree/FRI layer of the proof — axis-0 limb
        gathers and value gathers each coalesce into one take) and pull
        them through `batch` in one device->host transfer; finish()
        assembles the (queried_values, MerkleDecommitment) pair after
        materialize()."""
        from ..ops import poseidon252 as pos
        from ..utils import GatherPool
        from .prover import (MerkleDecommitment, plan_decommitment,
                             stack_column_groups)

        layer_plans = plan_decommitment(queries_per_log_size,
                                        len(self.layers), columns)
        local_pool = pool if pool is not None else GatherPool(batch)
        deferred = []
        for plan in layer_plans:
            log = plan["log"]
            hash_thunk = None
            if plan["hash_idxs"]:
                hash_thunk = local_pool.take(self.layers[log + 1],
                                             plan["hash_idxs"], axis=0)
            value_thunk = None
            if plan["node_idxs"] and plan["cols"]:
                value_thunk = local_pool.take(
                    stack_column_groups(plan["cols"]), plan["node_idxs"])
            deferred.append((plan, hash_thunk, value_thunk))
        if pool is None:
            local_pool.seal()

        def finish():
            queried: list = []
            dec = MerkleDecommitment()
            for plan, hash_thunk, value_thunk in deferred:
                hashes = None
                if hash_thunk is not None:
                    hashes = [FieldElement252(v) for v in
                              pos.limb_array_to_ints(hash_thunk())]
                values = []
                if value_thunk is not None:
                    g = value_thunk()
                    values = [g[k] for k in range(g.shape[0])]
                hi = 0
                for si, (node, witness_children, was_queried) in enumerate(
                        plan["steps"]):
                    for _ in witness_children:
                        dec.hash_witness.append(hashes[hi])
                        hi += 1
                    node_values = [M31(int(vals[si])) for vals in values]
                    if was_queried:
                        queried.extend(node_values)
                    else:
                        dec.column_witness.extend(node_values)
            return queried, dec

        return finish
