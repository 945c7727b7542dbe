"""Tracing spans record prove-phase timings."""
from tstwo_tpu import tracing


def test_spans_record_prove_phases():
    tracing.reset()
    tracing.enable()
    try:
        from tstwo_tpu.examples.basic_air import prove_basic_air

        prove_basic_air(log_num_rows=4)
    finally:
        tracing.disable()
    totals = tracing.totals()
    for phase in ["extension", "merkle", "evaluate_columns_out_of_domain",
                  "fri_quotients", "fri_commit", "grind", "decommitment"]:
        assert phase in totals, phase
        assert totals[phase] >= 0
    assert "ms" in tracing.report()


def test_logging_merkle_channel_records_roots():
    from tstwo_tpu.channel import LoggingChannel, LoggingMerkleChannel
    from tstwo_tpu.channel.blake2s import Blake2sChannel
    from tstwo_tpu.vcs.blake2s_merkle import Blake2sMerkleChannel

    ch = Blake2sChannel()
    lmc = LoggingMerkleChannel(Blake2sMerkleChannel())
    root = bytes(range(32))
    lmc.mix_root(ch, root)
    assert lmc.log == [{"op": "merkle_mix_root", "root": root.hex()}]
    # the underlying channel actually mixed the root
    ref = Blake2sChannel()
    Blake2sMerkleChannel().mix_root(ref, root)
    assert ch.digest == ref.digest
