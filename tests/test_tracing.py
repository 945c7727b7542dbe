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
