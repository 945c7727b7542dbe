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
