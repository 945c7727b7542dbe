"""Poseidon252 tests against exact Rust stwo oracles
(reference test/vcs/poseidon252_merkle.test.ts, test/channel/poseidon.test.ts)."""
from tstwo_tpu.channel.poseidon import (FieldElement252, Poseidon252Channel,
                                        poseidon_hash, poseidon_hash_many)
from tstwo_tpu.fields import M31, QM31
from tstwo_tpu.vcs.poseidon252_merkle import hash_node


def test_hash_node_no_children_exact():
    result = hash_node(None, [M31(0), M31(1)])
    assert result.value == 2552053700073128806553921687214114320458351061521275103654266875084493044716


def test_hash_node_with_children_exact():
    result = hash_node((FieldElement252(1), FieldElement252(2)), [M31(3)])
    assert result.value == 159358216886023795422515519110998391754567506678525778721401012606792642769


def test_channel_mix_u32s_exact():
    ch = Poseidon252Channel()
    ch.mix_u32s([1, 2, 3, 4, 5, 6, 7, 8, 9])
    assert ch.digest.value == int(
        "0x078f5cf6a2e7362b75fc1f94daeae7ebddd64e6b2db771717519af7193dfa80b", 16)


def test_channel_time_semantics():
    ch = Poseidon252Channel()
    assert (ch.channel_time.n_challenges, ch.channel_time.n_sent) == (0, 0)
    ch.draw_random_bytes()
    assert (ch.channel_time.n_challenges, ch.channel_time.n_sent) == (0, 1)
    ch.draw_felts(9)
    assert (ch.channel_time.n_challenges, ch.channel_time.n_sent) == (0, 6)


def test_mix_u64_equals_padded_u32s():
    ch1 = Poseidon252Channel()
    ch1.mix_u64(0x1111222233334444)
    ch2 = Poseidon252Channel()
    ch2.mix_u32s([0, 0, 0, 0, 0, 0x11112222, 0x33334444])
    assert ch1.digest == ch2.digest


def test_draws_differ():
    ch = Poseidon252Channel()
    assert ch.draw_felt() != ch.draw_felt()
    assert ch.draw_random_bytes() != ch.draw_random_bytes()


def test_device_merkle_root_matches_host_hash_node():
    """Device-batched Poseidon Merkle commit == host scalar hash_node tree."""
    import numpy as np
    import jax.numpy as jnp

    from tstwo_tpu.fields import M31
    from tstwo_tpu.vcs.poseidon252_merkle import (Poseidon252MerkleProver,
                                                  hash_node)

    rng = np.random.default_rng(3)
    P = (1 << 31) - 1
    log = 2
    cols = [jnp.asarray(rng.integers(0, P, size=1 << log, dtype=np.uint32))
            for _ in range(3)]
    # min_device_n=0 forces the padded device Hades sweep on every layer:
    # this test IS the device-vs-host pin that lets commit() route tiny
    # layers to host Hades everywhere else.  PAD is shrunk and the tree
    # kept at log 2 so exactly TWO program structures exist (padded leaf
    # sweep, padded internal sweep): the compiled Hades executable costs
    # ~17 s PER STRUCTURE PER PROCESS just to deserialize from the
    # persistent cache, so structure count — not tree size — is the wall
    # time here.  Kernel correctness is PAD- and size-independent.
    old_pad = Poseidon252MerkleProver.PAD
    Poseidon252MerkleProver.PAD = 8
    try:
        prover = Poseidon252MerkleProver.commit(cols, min_device_n=0)
    finally:
        Poseidon252MerkleProver.PAD = old_pad

    # host oracle
    host_cols = [np.asarray(c) for c in cols]
    layer = [hash_node(None, [M31(int(c[i])) for c in host_cols])
             for i in range(1 << log)]
    while len(layer) > 1:
        layer = [hash_node((layer[2 * i], layer[2 * i + 1]), [])
                 for i in range(len(layer) // 2)]
    assert prover.root() == layer[0]


def test_device_merkle_mixed_sizes_decommit_verify():
    import numpy as np
    import jax.numpy as jnp

    from tstwo_tpu.vcs.poseidon252_merkle import (Poseidon252MerkleProver,
                                                  hash_node)
    from tstwo_tpu.vcs.verifier import MerkleVerifier

    rng = np.random.default_rng(5)
    P = (1 << 31) - 1
    cols = [jnp.asarray(rng.integers(0, P, size=1 << 5, dtype=np.uint32)),
            jnp.asarray(rng.integers(0, P, size=1 << 3, dtype=np.uint32)),
            jnp.asarray(rng.integers(0, P, size=1 << 5, dtype=np.uint32))]
    prover = Poseidon252MerkleProver.commit(cols)
    queries = {5: [0, 9, 31], 3: [4]}
    vals, dec = prover.decommit(queries, cols)
    verifier = MerkleVerifier(prover.root(), [5, 3, 5], hasher=hash_node)
    verifier.verify(queries, vals, dec)  # no raise

    # tamper: flip a queried value
    from tstwo_tpu.fields import M31
    from tstwo_tpu.vcs.verifier import MerkleVerificationError
    import pytest

    bad = [M31((vals[0].value + 1) % P)] + list(vals[1:])
    with pytest.raises(MerkleVerificationError):
        verifier.verify(queries, bad, dec)


def test_poseidon_e2e_prove_verify():
    """Production prove()/verify() with the Poseidon252 MerkleChannel flavor:
    device-batched Hades Merkle layers (ops/poseidon252.py), host transcript.
    reference vcs/poseidon252_merkle.ts:19-56 + channel/poseidon.ts."""
    from tstwo_tpu.examples.basic_air import (prove_basic_air,
                                              verify_basic_air)

    proof, comp, cfg = prove_basic_air(log_num_rows=4, flavor="poseidon252")
    verify_basic_air(proof, comp, cfg, log_num_rows=4, flavor="poseidon252")


def test_poseidon_e2e_tamper_rejected():
    import copy

    from tstwo_tpu.examples.basic_air import (prove_basic_air,
                                              verify_basic_air)
    from tstwo_tpu.fields import M31
    from tstwo_tpu.pcs.verifier import VerificationError

    proof, comp, cfg = prove_basic_air(log_num_rows=4, flavor="poseidon252")
    bad = copy.deepcopy(proof)
    v = bad.commitment_scheme_proof.queried_values[1][0]
    bad.commitment_scheme_proof.queried_values[1][0] = M31(
        (v.value + 1) % ((1 << 31) - 1))
    try:
        verify_basic_air(bad, comp, cfg, log_num_rows=4, flavor="poseidon252")
        assert False, "tampered proof accepted"
    except VerificationError:
        pass


def test_poseidon_flavor_channels_differ_from_blake2s():
    """The two flavors must produce structurally equal but byte-distinct
    transcripts (different hash, different roots, different queries)."""
    from tstwo_tpu.examples.basic_air import prove_basic_air

    p_b, _, _ = prove_basic_air(log_num_rows=4)
    p_p, _, _ = prove_basic_air(log_num_rows=4, flavor="poseidon252")
    assert len(p_b.commitments) == len(p_p.commitments)
    assert p_b.commitments[1] != p_p.commitments[1]
