"""BLAKE3 tests against the exact digests in the reference test suite
(reference test/vcs/blake3_hash.test.ts)."""
from tstwo_tpu.vcs.blake3 import blake3, concat_and_hash


def test_known_vectors():
    assert blake3(b"").hex() == (
        "af1349b9f5f9a1a6a0404dea36dcc9499bcb25c9adc112b7cc9a93cae41f3262")
    assert blake3(b"a").hex() == (
        "17762fddd969a453925d65717ac3eea21320b66b54342fde15128d6caf21215f")
    assert blake3(b"b").hex() == (
        "10e5cf3d3c8a4f9f3468c8cc58eea84892a22fdadbc1acb22410190044c1d553")
    assert blake3(b"ab").hex() == (
        "2dc99999a6aaef3f20349d2ed4057a2b54419545dabb809e6381de1bad8337e2")


def test_concat_and_hash():
    assert concat_and_hash(b"a", b"b") == blake3(b"ab")


def test_long_inputs_stable():
    # exercise multi-block and multi-chunk paths (incl. non-power-of-2 trees)
    for n in [63, 64, 65, 1023, 1024, 1025, 3 * 1024 + 7, 5 * 1024]:
        d = blake3(bytes(i & 0xFF for i in range(n)))
        assert len(d) == 32
