"""VCS decommitment-traversal + verifier-error + GatherPool suite.

Port of reference test/vcs/utils.test.ts (5 cases) and the
test/vcs/verifier.test.ts error matrix (7 cases; three were already in
tests/test_vcs.py — the witness-too-long / column-length-mismatch /
too-many-queried rows land here), plus direct unit coverage of the
round-5 GatherPool (cross-tree coalesced decommit gathers).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from tstwo_tpu.fields import M31
from tstwo_tpu.utils import FetchBatch, GatherPool, padded_take
from tstwo_tpu.vcs.prover import MerkleProver, stack_column_groups
from tstwo_tpu.vcs.utils import Peekable, next_decommitment_node
from tstwo_tpu.vcs.verifier import MerkleVerificationError, MerkleVerifier

P = (1 << 31) - 1


# ---------------------------------------------------------------------------
# vcs/utils.test.ts
# ---------------------------------------------------------------------------

def test_peekable_empty():
    p = Peekable([])
    assert p.peek() is None
    assert not p


def test_peekable_iterates():
    p = Peekable([1, 2, 3])
    assert p.peek() == 1
    assert p.next() == 1
    assert p.next_if_eq(2)
    assert not p.next_if_eq(99)
    assert p.next() == 3
    assert not p


def test_next_decommitment_node_smallest_candidate():
    # prev child query 6 -> parent 3; direct query 5 -> min is 3
    assert next_decommitment_node(Peekable([6]), Peekable([5])) == 3


def test_next_decommitment_node_empty_prev():
    assert next_decommitment_node(Peekable([]), Peekable([4])) == 4


def test_next_decommitment_node_both_empty():
    assert next_decommitment_node(Peekable([]), Peekable([])) is None


def test_next_decommitment_node_prev_only():
    assert next_decommitment_node(Peekable([9]), Peekable([])) == 4


# ---------------------------------------------------------------------------
# vcs/verifier.test.ts error matrix (rows not in tests/test_vcs.py)
# ---------------------------------------------------------------------------

def _committed_tree(log=3, n_cols=2, seed=7):
    rng = np.random.default_rng(seed)
    cols = [jnp.asarray(rng.integers(0, P, size=1 << log, dtype=np.uint32))
            for _ in range(n_cols)]
    prover = MerkleProver.commit(cols)
    return prover, cols


def _decommit(prover, cols, positions, log=3):
    queries = {log: list(positions)}
    queried, dec = prover.decommit(queries, cols)
    return queries, queried, dec


def test_verify_valid_decommitment():
    prover, cols = _committed_tree()
    queries, queried, dec = _decommit(prover, cols, [1, 5])
    MerkleVerifier(prover.root(), [3, 3]).verify(queries, queried, dec)


def test_verify_rejects_witness_too_long():
    prover, cols = _committed_tree()
    queries, queried, dec = _decommit(prover, cols, [2])
    dec.hash_witness.append(b"\x00" * 32)
    with pytest.raises(MerkleVerificationError) as e:
        MerkleVerifier(prover.root(), [3, 3]).verify(queries, queried, dec)
    assert "long" in str(e.value)


def test_verify_rejects_extra_queried_values():
    prover, cols = _committed_tree()
    queries, queried, dec = _decommit(prover, cols, [2])
    with pytest.raises(MerkleVerificationError) as e:
        MerkleVerifier(prover.root(), [3, 3]).verify(
            queries, list(queried) + [M31(1)], dec)
    assert "many" in str(e.value)


def test_verify_rejects_missing_queried_values():
    prover, cols = _committed_tree()
    queries, queried, dec = _decommit(prover, cols, [2])
    with pytest.raises(MerkleVerificationError):
        MerkleVerifier(prover.root(), [3, 3]).verify(queries, queried[:-1],
                                                     dec)


def test_verify_rejects_invalid_witness_hash():
    prover, cols = _committed_tree()
    queries, queried, dec = _decommit(prover, cols, [3])
    if dec.hash_witness:
        h = bytearray(dec.hash_witness[0])
        h[0] ^= 1
        dec.hash_witness[0] = bytes(h)
        with pytest.raises(MerkleVerificationError) as e:
            MerkleVerifier(prover.root(), [3, 3]).verify(queries, queried,
                                                         dec)
        assert "Root" in str(e.value)


def test_verify_rejects_tampered_column_witness():
    prover, cols = _committed_tree()
    queries, queried, dec = _decommit(prover, cols, [3])
    if dec.column_witness:
        dec.column_witness[0] = M31((dec.column_witness[0].value + 1) % P)
        with pytest.raises(MerkleVerificationError):
            MerkleVerifier(prover.root(), [3, 3]).verify(queries, queried,
                                                         dec)


# ---------------------------------------------------------------------------
# GatherPool unit coverage (round-5 cross-tree decommit coalescing)
# ---------------------------------------------------------------------------

def test_gather_pool_last_axis_groups():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, P, size=(8, 16), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, P, size=(8, 32), dtype=np.uint32))
    batch = FetchBatch()
    pool = GatherPool(batch)
    ta = pool.take(a, [0, 5, 15])
    tb = pool.take(b, [7, 31])
    pool.seal()
    batch.materialize()
    np.testing.assert_array_equal(ta(), np.asarray(a)[:, [0, 5, 15]])
    np.testing.assert_array_equal(tb(), np.asarray(b)[:, [7, 31]])


def test_gather_pool_axis0():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.integers(0, P, size=(16, 21), dtype=np.uint32))
    batch = FetchBatch()
    pool = GatherPool(batch)
    t = pool.take(a, [3, 9], axis=0)
    pool.seal()
    batch.materialize()
    np.testing.assert_array_equal(t(), np.asarray(a)[[3, 9], :])


def test_gather_pool_mixed_leading_shapes_segregate():
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.integers(0, P, size=(4, 8), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, P, size=(2, 8), dtype=np.uint32))
    batch = FetchBatch()
    pool = GatherPool(batch)
    ta = pool.take(a, [1, 2])
    tb = pool.take(b, [0, 7])
    pool.seal()
    batch.materialize()
    assert ta().shape == (4, 2)
    assert tb().shape == (2, 2)
    np.testing.assert_array_equal(ta(), np.asarray(a)[:, [1, 2]])
    np.testing.assert_array_equal(tb(), np.asarray(b)[:, [0, 7]])


def test_gather_pool_rejects_empty_positions():
    pool = GatherPool(FetchBatch())
    with pytest.raises(ValueError):
        pool.take(jnp.zeros((4, 8), dtype=jnp.uint32), [])


def test_gather_pool_rejects_take_after_seal():
    a = jnp.zeros((4, 8), dtype=jnp.uint32)
    batch = FetchBatch()
    pool = GatherPool(batch)
    pool.take(a, [0])
    pool.seal()
    with pytest.raises(RuntimeError):
        pool.take(a, [1])


def test_padded_take_rejects_empty_positions():
    with pytest.raises(ValueError):
        padded_take(jnp.zeros((4, 8), dtype=jnp.uint32), [], -1, FetchBatch())


def test_stack_column_groups_mixed():
    a = jnp.arange(8, dtype=jnp.uint32)
    b = jnp.arange(16, dtype=jnp.uint32).reshape(2, 8)
    out = stack_column_groups([a, b])
    assert out.shape == (3, 8)
    np.testing.assert_array_equal(np.asarray(out)[0], np.arange(8))
    np.testing.assert_array_equal(np.asarray(out)[1:], np.asarray(b))


def test_merkle_commit_2d_entry_matches_1d_columns():
    """A [C, n] stacked entry commits to the SAME root as the C separate
    columns (the jit expands rows internally)."""
    rng = np.random.default_rng(5)
    stack = jnp.asarray(rng.integers(0, P, size=(3, 16), dtype=np.uint32))
    as_rows = [stack[i] for i in range(3)]
    assert (MerkleProver.commit([stack]).root()
            == MerkleProver.commit(as_rows).root())
