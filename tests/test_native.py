"""Native C++ Blake2s component tests (vs hashlib / python grind)."""
import hashlib

import numpy as np
import pytest

from tstwo_tpu import native
from tstwo_tpu.channel.blake2s import Blake2sChannel
from tstwo_tpu.proof_of_work import grind_host

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_native_hash_matches_hashlib():
    rng = np.random.default_rng(0)
    for n_words in [1, 10, 16, 17, 40]:
        words = rng.integers(0, 1 << 32, size=(7, n_words), dtype=np.uint32)
        out = native.hash_u32_batch(words, 4 * n_words)
        for i in range(7):
            msg = words[i].astype("<u4").tobytes()
            expected = hashlib.blake2s(msg, digest_size=32).digest()
            assert out[i].astype("<u4").tobytes() == expected


def test_native_merkle_layer_matches_hash_node():
    from tstwo_tpu.fields import M31
    from tstwo_tpu.vcs.blake2s_merkle import hash_node

    rng = np.random.default_rng(1)
    prev = rng.integers(0, 1 << 32, size=(8, 8), dtype=np.uint32)
    col = rng.integers(0, (1 << 31) - 1, size=4, dtype=np.uint32)
    out = native.merkle_layer(prev, [col], 2)
    for i in range(4):
        left = prev[2 * i].astype("<u4").tobytes()
        right = prev[2 * i + 1].astype("<u4").tobytes()
        expected = hash_node((left, right), [M31(int(col[i]))])
        assert out[i].astype("<u4").tobytes() == expected


def test_native_leaf_layer():
    rng = np.random.default_rng(2)
    cols = [rng.integers(0, (1 << 31) - 1, size=8, dtype=np.uint32)
            for _ in range(3)]
    out = native.merkle_layer(None, cols, 3)
    from tstwo_tpu.fields import M31
    from tstwo_tpu.vcs.blake2s_merkle import hash_node

    for i in range(8):
        expected = hash_node(None, [M31(int(c[i])) for c in cols])
        assert out[i].astype("<u4").tobytes() == expected


def test_native_grind_matches_host():
    ch = Blake2sChannel()
    ch.mix_u64(123)
    for bits in [4, 10, 14]:
        assert native.grind(ch.digest, bits) == grind_host(ch, bits)
