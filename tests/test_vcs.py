"""Merkle tree tests: device hashing vs hashlib, commit/decommit/verify with
mixed column sizes and error cases (ports of reference test/vcs/*)."""
import hashlib

import numpy as np
import pytest

from tstwo_tpu.fields import M31, P
from tstwo_tpu.ops import m31 as m31_ops
from tstwo_tpu.ops.blake2s import (digest_words_to_bytes, hash_u32_batch)
from tstwo_tpu.vcs import (MerkleProver, MerkleVerificationError,
                           MerkleVerifier, hash_node)


def test_device_blake2s_matches_hashlib():
    rng = np.random.default_rng(0)
    for n_words in [1, 8, 15, 16, 17, 20, 32, 33]:
        words = rng.integers(0, 1 << 32, size=(5, n_words), dtype=np.uint32)
        out = np.asarray(hash_u32_batch(m31_ops.asarray(words), 4 * n_words))
        for i in range(5):
            msg = b"".join(int(w).to_bytes(4, "little") for w in words[i])
            expected = hashlib.blake2s(msg, digest_size=32).digest()
            assert digest_words_to_bytes(out[i]) == expected


def test_device_blake2s_empty():
    out = np.asarray(hash_u32_batch(np.zeros((1, 0), dtype=np.uint32), 0))
    assert digest_words_to_bytes(out[0]) == hashlib.blake2s(
        b"", digest_size=32).digest()


def _random_columns(rng, log_sizes):
    return [m31_ops.asarray(rng.integers(0, P, size=1 << ls, dtype=np.uint32))
            for ls in log_sizes]


def _queries(rng, log_sizes, n=4):
    out = {}
    for ls in set(log_sizes):
        qs = sorted(set(int(q) for q in rng.integers(0, 1 << ls, size=n)))
        out[ls] = qs
    return out


@pytest.mark.parametrize("log_sizes", [[3], [5, 5, 3], [6, 4, 4, 2]])
def test_commit_decommit_verify(log_sizes):
    rng = np.random.default_rng(sum(log_sizes))
    cols = _random_columns(rng, log_sizes)
    prover = MerkleProver.commit(cols)
    queries = _queries(rng, log_sizes)
    values, dec = prover.decommit(queries, cols)
    verifier = MerkleVerifier(prover.root(), sorted(log_sizes, reverse=True))
    verifier.verify(queries, values, dec)  # should not raise


def test_root_matches_host_reference():
    # 2-leaf tree with one size-2 column: root = H(H(v0) || H(v1))
    col = m31_ops.asarray(np.array([7, 9], dtype=np.uint32))
    prover = MerkleProver.commit([col])
    leaf0 = hash_node(None, [M31(7)])
    leaf1 = hash_node(None, [M31(9)])
    root = hash_node((leaf0, leaf1), [])
    assert prover.root() == root


def test_verify_fails_on_tampered_value():
    rng = np.random.default_rng(1)
    cols = _random_columns(rng, [4, 4])
    prover = MerkleProver.commit(cols)
    queries = _queries(rng, [4])
    values, dec = prover.decommit(queries, cols)
    verifier = MerkleVerifier(prover.root(), [4, 4])
    bad = list(values)
    bad[0] = bad[0] + M31(1)
    with pytest.raises(MerkleVerificationError):
        verifier.verify(queries, bad, dec)


def test_verify_fails_on_short_witness():
    rng = np.random.default_rng(2)
    cols = _random_columns(rng, [4, 4])
    prover = MerkleProver.commit(cols)
    queries = _queries(rng, [4])
    values, dec = prover.decommit(queries, cols)
    verifier = MerkleVerifier(prover.root(), [4, 4])
    if dec.hash_witness:
        dec.hash_witness.pop()
        with pytest.raises(MerkleVerificationError):
            verifier.verify(queries, values, dec)


def test_verify_fails_on_wrong_root():
    rng = np.random.default_rng(3)
    cols = _random_columns(rng, [3])
    prover = MerkleProver.commit(cols)
    queries = _queries(rng, [3])
    values, dec = prover.decommit(queries, cols)
    verifier = MerkleVerifier(b"\x01" * 32, [3])
    with pytest.raises(MerkleVerificationError, match="Root mismatch"):
        verifier.verify(queries, values, dec)


def test_empty_tree_root():
    prover = MerkleProver.commit([])
    assert prover.root() == hashlib.blake2s(b"", digest_size=32).digest()
