"""Proof serialization round trip: serialized proof must re-verify."""
import json

from tstwo_tpu.examples.basic_air import prove_basic_air, verify_basic_air
from tstwo_tpu.serialize import (channel_state_from_dict,
                                 channel_state_to_dict, proof_from_dict,
                                 proof_to_dict)
from tstwo_tpu.channel.blake2s import Blake2sChannel


def test_proof_json_roundtrip_verifies():
    proof, component, config = prove_basic_air(log_num_rows=4)
    blob = json.dumps(proof_to_dict(proof))
    restored = proof_from_dict(json.loads(blob))
    verify_basic_air(restored, component, config, log_num_rows=4)


def test_channel_state_roundtrip():
    ch = Blake2sChannel()
    ch.mix_u64(7)
    ch.draw_felt()
    d = channel_state_to_dict(ch)
    ch2 = channel_state_from_dict(d)
    assert ch2.draw_felt() == ch.draw_felt()


def test_mid_prove_checkpoint_resume(tmp_path):
    """Kill-after-commit-phase resume: checkpoint the scheme + channel
    after the trace commits, restore from disk, and finish the prove --
    proof bytes must be identical (SURVEY section 5 checkpoint/resume)."""
    import json

    from tstwo_tpu.channel.blake2s import Blake2sChannel
    from tstwo_tpu.circle import CanonicCoset
    from tstwo_tpu.constraint_framework import (FrameworkComponent,
                                                TraceLocationAllocator)
    from tstwo_tpu.examples.basic_air import (CONSTRAINT_EVAL_BLOWUP_FACTOR,
                                              TestEval, generate_trace)
    from tstwo_tpu.fields import QM31
    from tstwo_tpu.pcs import PcsConfig
    from tstwo_tpu.pcs.prover import CommitmentSchemeProver
    from tstwo_tpu.poly.circle_poly import CircleEvaluation
    from tstwo_tpu.poly.twiddles import precompute_twiddles
    from tstwo_tpu.prover import prove
    from tstwo_tpu.serialize import (load_prover_checkpoint, proof_to_dict,
                                     save_prover_checkpoint)

    log_num_rows = 4
    config = PcsConfig()
    columns = generate_trace(log_num_rows)
    domain = CanonicCoset.new(log_num_rows).circle_domain()
    trace = [CircleEvaluation(domain, col) for col in columns]
    twiddles = precompute_twiddles(
        CanonicCoset.new(log_num_rows + CONSTRAINT_EVAL_BLOWUP_FACTOR
                         + config.fri_config.log_blowup_factor
                         ).circle_domain().half_coset)

    def committed_scheme():
        channel = Blake2sChannel()
        scheme = CommitmentSchemeProver(config, twiddles)
        tb = scheme.tree_builder()
        tb.extend_evals([])
        tb.commit(channel)
        channel.mix_u64(log_num_rows)
        tb = scheme.tree_builder()
        tb.extend_evals(trace)
        tb.commit(channel)
        return scheme, channel

    component = FrameworkComponent(TraceLocationAllocator(),
                                   TestEval(log_num_rows), QM31.zero())

    # reference: prove straight through
    scheme_a, ch_a = committed_scheme()
    proof_a = prove([component], ch_a, scheme_a)

    # checkpointed: snapshot after commit phase, reload, then finish
    scheme_b, ch_b = committed_scheme()
    path = str(tmp_path / "ckpt.npz")
    save_prover_checkpoint(path, scheme_b, ch_b)
    del scheme_b, ch_b  # "crash"
    scheme_c, ch_c = load_prover_checkpoint(path, twiddles)
    component_c = FrameworkComponent(TraceLocationAllocator(),
                                     TestEval(log_num_rows), QM31.zero())
    proof_c = prove([component_c], ch_c, scheme_c)

    a = json.dumps(proof_to_dict(proof_a), sort_keys=True)
    c = json.dumps(proof_to_dict(proof_c), sort_keys=True)
    assert a == c
