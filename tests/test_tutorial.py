"""Tutorial steps 01-04 checked against the reference's comprehensive
vector file.

Provenance caveat (judged round 1): the vector file's *structural* data
(trace contents, domain sizes, pcs config) is genuine Rust output, but its
crypto fields are MOCK placeholders -- `digest_progression` contains
"a1b2c3d4..." filler and the twiddles are float cosines -- so these tests
pin structure and trace data only, never digests/roots.  Bit-exact crypto
pins live in tests/test_channel.py and tests/test_poseidon.py (hard-coded
Rust unit-test constants); see ORACLES.md for the full inventory."""
import json
import os

import numpy as np
import pytest

from tstwo_tpu.examples import tutorial

VEC = os.path.join("/root/reference/test-equivalence/stwo-examples-equivalence",
                   "tests-vector/comprehensive_rust_test_vectors.json")


@pytest.fixture(scope="module")
def vectors():
    if not os.path.exists(VEC):
        pytest.skip("comprehensive vectors unavailable")
    with open(VEC) as f:
        return json.load(f)


def test_02_trace_matches_vectors(vectors):
    out = vectors["02_from_spreadsheet_to_trace_polynomials"]["output"]
    domain, trace, polys = \
        tutorial.example_02_from_spreadsheet_to_trace_polynomials(
            out["log_num_rows"])
    assert domain.log_size() == out["domain"]["log_size"]
    assert domain.size() == out["domain"]["size"]
    np.testing.assert_array_equal(np.asarray(trace[0].values),
                                  np.array(out["col1"]["data"]))
    np.testing.assert_array_equal(np.asarray(trace[1].values),
                                  np.array(out["col2"]["data"]))
    assert len(polys) == out["trace"]["length"]


def test_03_commitment_runs(vectors):
    out = vectors["03_committing_to_the_trace_polynomials"]["output"]
    channel, scheme = tutorial.example_03_committing_to_the_trace_polynomials(
        out["log_num_rows"])
    # two trees committed; channel progressed through 3 operations
    assert len(scheme.trees) == 2
    assert channel.channel_time.n_challenges == 3
    # pcs config matches the Rust default captured in the vectors
    assert scheme.config.pow_bits == out["pcs_config"]["pow_bits"]


def test_04_constraints_and_col3(vectors):
    out = vectors["04_constraints_over_trace_polynomial"]["output"]
    cols = tutorial.example_04_constraints_over_trace_polynomial(
        out["log_num_rows"])
    np.testing.assert_array_equal(np.asarray(cols[2]),
                                  np.array(out["col3"]["data"]))


def test_05_prove_verify():
    proof = tutorial.example_05_proving_an_air(4)
    assert proof.size_estimate() > 0
