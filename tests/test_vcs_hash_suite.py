"""Port of reference test/vcs/{blake2_hash,blake3_hash,blake2s_ref}.test.ts
(19 + 25 + 13 cases).  The TS Hash wrapper classes (constructor length
checks, equals, toString) carry no behavior beyond `bytes` here; what is
ported is every pinned digest value, the streaming/finalize semantics
(via incremental hashing), concat-and-hash, and the raw compress
function's constants and flag behavior.
"""
import hashlib

import numpy as np
import pytest

import jax.numpy as jnp

from tstwo_tpu.ops.blake2s import (H0, IV, SIGMA, compress,
                                   digest_bytes_to_words,
                                   digest_words_to_bytes, hash_u32_batch)
from tstwo_tpu.vcs.blake3 import blake3, concat_and_hash

BLAKE2_A_HEX = "4a0d129873403037c2cd9b9048203687f6233fb6738956e0349bd4320fec3e90"
BLAKE2_B_HEX = "04449e92c9a7657ef2d677b8ef9da46c088f13575ea887e4818fc455a2bca500"
BLAKE2_EMPTY_HEX = ("69217a3079908094e11121d042354a7c"
                    "1f55b6482ca1a51e1b250dfd1ed0eef9")

BLAKE3_A_HEX = "17762fddd969a453925d65717ac3eea21320b66b54342fde15128d6caf21215f"
BLAKE3_B_HEX = "10e5cf3d3c8a4f9f3468c8cc58eea84892a22fdadbc1acb22410190044c1d553"
BLAKE3_EMPTY_HEX = ("af1349b9f5f9a1a6a0404dea36dcc949"
                    "9bcb25c9adc112b7cc9a93cae41f3262")
BLAKE3_AB_HEX = "2dc99999a6aaef3f20349d2ed4057a2b54419545dabb809e6381de1bad8337e2"
BLAKE3_CONCAT_AB_HEX = (
    "8912f1e49d6c94830787bc8765e92f409d6db9041739884a42e59f16388756b1")


def _blake2s(data: bytes) -> bytes:
    return hashlib.blake2s(data).digest()


# ---------------------------------------------------------------------------
# blake2_hash.test.ts — Blake2sHasher
# ---------------------------------------------------------------------------

def test_blake2s_single_hash_exact():
    assert _blake2s(b"a").hex() == BLAKE2_A_HEX
    assert _blake2s(b"b").hex() == BLAKE2_B_HEX


def test_blake2s_empty_hash_exact():
    assert _blake2s(b"").hex() == BLAKE2_EMPTY_HEX


def test_blake2s_streaming_matches_one_shot():
    state = hashlib.blake2s()
    state.update(b"a")
    state.update(b"b")
    assert state.digest() == _blake2s(b"ab")


def test_blake2s_concat_and_hash():
    a, b = _blake2s(b"a"), _blake2s(b"b")
    assert _blake2s(a + b) == hashlib.blake2s(a + b).digest()
    assert len(_blake2s(a + b)) == 32


def test_blake2s_default_hash_is_32_zero_bytes_convention():
    """The channel's initial digest is 32 zero bytes (NOT a hash)."""
    from tstwo_tpu.channel.blake2s import Blake2sChannel

    assert Blake2sChannel().digest == b"\x00" * 32


def test_blake2s_digest_word_conversions_roundtrip():
    d = _blake2s(b"roundtrip")
    words = digest_bytes_to_words(d)
    assert words.shape == (8,) and words.dtype == np.uint32
    assert digest_words_to_bytes(words) == d


def test_device_blake2s_matches_hashlib_exact_values():
    """The device kernel reproduces the pinned reference digests for
    word-aligned messages (device path hashes u32-word messages)."""
    for msg in (b"abcd", b"a" * 64, b"ab" * 34):
        words = np.frombuffer(msg, dtype="<u4").astype(np.uint32)
        got = np.asarray(hash_u32_batch(
            jnp.asarray(words[None, :]), len(msg)))[0]
        assert digest_words_to_bytes(got) == _blake2s(msg)


# ---------------------------------------------------------------------------
# blake3_hash.test.ts — Blake3Hasher (from-scratch implementation)
# ---------------------------------------------------------------------------

def test_blake3_single_hash_exact():
    assert blake3(b"a").hex() == BLAKE3_A_HEX
    assert blake3(b"b").hex() == BLAKE3_B_HEX


def test_blake3_empty_hash_exact():
    assert blake3(b"").hex() == BLAKE3_EMPTY_HEX


def test_blake3_ab_hash_exact():
    assert blake3(b"ab").hex() == BLAKE3_AB_HEX


def test_blake3_concat_and_hash_exact():
    a, b = blake3(b"a"), blake3(b"b")
    got = concat_and_hash(a, b)
    assert got == blake3(a + b)
    assert got.hex() == BLAKE3_CONCAT_AB_HEX


def test_blake3_consistent_results():
    data = b"some consistent data string"
    assert blake3(data) == blake3(data)


def test_blake3_different_data_differ():
    assert blake3(b"data1") != blake3(b"data2")


def test_blake3_output_length():
    assert len(blake3(b"hello world")) == 32


@pytest.mark.parametrize("n", [63, 64, 65, 1023, 1024, 1025, 2048, 3000])
def test_blake3_chunk_boundaries(n):
    """Block (64 B) and chunk (1024 B) boundary handling: the digest is
    deterministic and distinct across adjacent sizes."""
    data = bytes(range(256)) * ((n // 256) + 1)
    d1 = blake3(data[:n])
    d2 = blake3(data[:n])
    assert d1 == d2 and len(d1) == 32
    assert blake3(data[:n]) != blake3(data[:n - 1])


# ---------------------------------------------------------------------------
# blake2s_ref.test.ts — raw compress
# ---------------------------------------------------------------------------

def test_iv_values_exact():
    assert IV.tolist() == [
        0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
        0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19,
    ]


def test_sigma_table():
    assert len(SIGMA) == 10
    assert SIGMA[0] == list(range(16))
    assert SIGMA[1] == [14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3]
    for row in SIGMA:
        assert sorted(row) == list(range(16))


def test_h0_param_block():
    assert H0[0] == IV[0] ^ 0x01010020
    assert np.array_equal(H0[1:], IV[1:])


def _comp(h, m, t=0, final=False):
    return np.asarray(compress(jnp.asarray(np.array(h, dtype=np.uint32)),
                               jnp.asarray(np.array(m, dtype=np.uint32)),
                               t, final))


def test_compress_basic_shape():
    out = _comp([0] * 8, [0] * 16)
    assert out.shape == (8,) and out.dtype == np.uint32


def test_compress_different_messages_differ():
    a = _comp([0] * 8, [0] * 16)
    b = _comp([0] * 8, [1] + [0] * 15)
    assert not np.array_equal(a, b)


def test_compress_nonzero_state():
    a = _comp(list(range(8)), list(range(16)))
    b = _comp([0] * 8, list(range(16)))
    assert not np.array_equal(a, b)


def test_compress_max_u32_values():
    out = _comp([0xFFFFFFFF] * 8, [0xFFFFFFFF] * 16)
    assert out.shape == (8,)
    assert all(0 <= int(v) <= 0xFFFFFFFF for v in out)


def test_compress_deterministic():
    h, m = list(range(8)), list(range(16))
    assert np.array_equal(_comp(h, m, 7), _comp(h, m, 7))


def test_compress_count_values_differ():
    h, m = [0] * 8, [0] * 16
    assert not np.array_equal(_comp(h, m, 0), _comp(h, m, 64))
    # and the high counter word matters too
    assert not np.array_equal(_comp(h, m, 0), _comp(h, m, 1 << 32))


def test_compress_final_flag_differs():
    h, m = [0] * 8, [0] * 16
    assert not np.array_equal(_comp(h, m, 0, False), _comp(h, m, 0, True))


def test_compress_matches_full_hash_single_block():
    """compress(H0, padded 'abc' block, t=3, final) == hashlib blake2s."""
    msg = b"abc"
    block = np.frombuffer(msg + b"\x00" * (64 - len(msg)), dtype="<u4")
    out = _comp(H0.tolist(), block.tolist(), t=len(msg), final=True)
    assert digest_words_to_bytes(out.astype(np.uint32)) == _blake2s(msg)


def test_compress_batched_leading_axes():
    h = np.tile(H0, (4, 1)).astype(np.uint32)
    m = np.zeros((4, 16), dtype=np.uint32)
    m[:, 0] = np.arange(4)
    out = np.asarray(compress(jnp.asarray(h), jnp.asarray(m), 64, False))
    assert out.shape == (4, 8)
    for k in range(4):
        single = _comp(H0.tolist(), m[k].tolist(), 64, False)
        assert np.array_equal(out[k], single)
