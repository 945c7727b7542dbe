"""Ports of the reference's error/edge-case suites.

Sources (semantics only, no code):
  - packages/core/test/queries/queries.test.ts        (query generation/fold)
  - packages/core/test/vcs/verifier.test.ts            (Merkle error matrix)
  - packages/core/test/prover/index.test.ts            (size estimates, OODS
    structure errors, verify error paths)
  - packages/core/test/poly/lineDomain.test.ts, lineEvaluation.test.ts
"""
import numpy as np
import pytest

import jax.numpy as jnp

from tstwo_tpu.channel.blake2s import Blake2sChannel
from tstwo_tpu.circle import CanonicCoset, Coset
from tstwo_tpu.fields import M31, QM31
from tstwo_tpu.queries import (UPPER_BOUND_QUERY_BYTES, Queries,
                               get_query_positions_by_log_size)
from tstwo_tpu.vcs.prover import MerkleDecommitment, MerkleProver
from tstwo_tpu.vcs.verifier import MerkleVerificationError, MerkleVerifier

P = (1 << 31) - 1


# ---------------------------------------------------------------------------
# Queries (queries.test.ts)
# ---------------------------------------------------------------------------

class CountingChannel:
    """Deterministic byte source (queries.test.ts TestQueryChannel)."""

    def __init__(self):
        self.counter = 0

    def draw_random_bytes(self):
        out = bytes((self.counter + i) % 256 for i in range(8))
        self.counter += 8
        return out


def test_upper_bound_query_bytes():
    assert UPPER_BOUND_QUERY_BYTES == 4


def test_generate_sorted_unique_in_domain():
    ch = Blake2sChannel()
    q = Queries.generate(ch, 8, 10)
    pos = list(q.positions)
    assert len(pos) == 10
    assert pos == sorted(pos)
    assert len(set(pos)) == 10
    assert max(pos) < (1 << 8) and min(pos) >= 0


def test_generate_small_and_edge_cases():
    ch = CountingChannel()
    q = Queries.generate(ch, 3, 2)
    assert len(q) == 2
    assert list(q.positions) == sorted(set(q.positions))
    assert max(q.positions) < 8

    assert len(Queries.generate(CountingChannel(), 2, 1)) == 1
    assert len(Queries.generate(CountingChannel(), 2, 0)) == 0


def test_fold_dedups_and_shifts():
    q = Queries.from_positions([0, 1, 2, 3], 2)
    f = q.fold(1)
    assert f.log_domain_size == 1
    assert list(f.positions) == [0, 1]


def test_fold_edges():
    q = Queries.from_positions([0, 1, 2, 3], 4)
    assert q.fold(0).positions == q.positions
    assert q.fold(0).log_domain_size == 4
    mx = q.fold(4)
    assert mx.log_domain_size == 0
    assert list(mx.positions) == [0]
    with pytest.raises(ValueError):
        q.fold(5)


def test_from_positions_validation():
    q = Queries.from_positions([0, 2, 4, 6], 4)
    assert len(q) == 4 and list(q) == [0, 2, 4, 6]
    with pytest.raises(ValueError):
        Queries.from_positions([2, 1, 3], 4)
    with pytest.raises(ValueError):
        Queries.from_positions([0, 1, 16], 4)


def test_query_positions_by_log_size():
    q = Queries.from_positions([1, 5, 10], 4)
    by_log = get_query_positions_by_log_size(q, [4, 3, 2])
    assert by_log[4] == [1, 5, 10]
    assert by_log[3] == [0, 2, 5]
    assert by_log[2] == [0, 1, 2]


def test_generate_matches_rejection_free_draw():
    """Positions come 4 LE bytes at a time masked to the domain
    (reference queries.ts:52-85): replay the channel by hand."""
    ch = Blake2sChannel()
    q = Queries.generate(ch, 6, 5)
    ch2 = Blake2sChannel()
    seen = []
    while len(set(seen)) < 5:
        data = ch2.draw_random_bytes()
        for i in range(0, len(data) - 3, 4):
            v = int.from_bytes(data[i:i + 4], "little") & 63
            seen.append(v)
            if len(set(seen)) == 5:
                break
    assert sorted(set(seen)) == list(q.positions)


# ---------------------------------------------------------------------------
# Merkle verifier error matrix (vcs/verifier.test.ts)
# ---------------------------------------------------------------------------

def _merkle_fixture(log_size=4):
    rng = np.random.default_rng(11)
    col = jnp.asarray(rng.integers(0, P, size=1 << log_size, dtype=np.uint32))
    prover = MerkleProver.commit([col])
    queries = {log_size: [1, 5]}
    vals, dec = prover.decommit(queries, [col])
    verifier = MerkleVerifier(prover.root(), [log_size])
    return verifier, queries, vals, dec


def test_merkle_valid_decommitment():
    verifier, queries, vals, dec = _merkle_fixture()
    verifier.verify(queries, vals, dec)  # no raise


def test_merkle_invalid_witness_root_mismatch():
    verifier, queries, vals, dec = _merkle_fixture()
    dec = MerkleDecommitment([b"\0" * 32] + dec.hash_witness[1:],
                             dec.column_witness)
    with pytest.raises(MerkleVerificationError,
                       match=MerkleVerificationError.ROOT_MISMATCH):
        verifier.verify(queries, vals, dec)


def test_merkle_invalid_value_root_mismatch():
    verifier, queries, vals, dec = _merkle_fixture()
    vals = [M31(0)] + list(vals[1:])
    with pytest.raises(MerkleVerificationError,
                       match=MerkleVerificationError.ROOT_MISMATCH):
        verifier.verify(queries, vals, dec)


def test_merkle_witness_too_short():
    verifier, queries, vals, dec = _merkle_fixture()
    dec = MerkleDecommitment(dec.hash_witness[:-1], dec.column_witness)
    with pytest.raises(MerkleVerificationError,
                       match=MerkleVerificationError.WITNESS_TOO_SHORT):
        verifier.verify(queries, vals, dec)


def test_merkle_witness_too_long():
    verifier, queries, vals, dec = _merkle_fixture()
    dec = MerkleDecommitment(dec.hash_witness + [dec.hash_witness[-1]],
                             dec.column_witness)
    with pytest.raises(MerkleVerificationError,
                       match="too long"):
        verifier.verify(queries, vals, dec)


def test_merkle_too_many_queried_values():
    verifier, queries, vals, dec = _merkle_fixture()
    vals = list(vals) + [M31(0)]
    with pytest.raises(MerkleVerificationError,
                       match="too many"):
        verifier.verify(queries, vals, dec)


def test_merkle_too_few_queried_values():
    verifier, queries, vals, dec = _merkle_fixture()
    vals = list(vals)[:-1]
    with pytest.raises(MerkleVerificationError,
                       match="too few"):
        verifier.verify(queries, vals, dec)


def test_merkle_mixed_size_error_matrix():
    """Same matrix on a mixed-size tree (two log sizes, multiple columns)."""
    rng = np.random.default_rng(13)
    cols = [jnp.asarray(rng.integers(0, P, size=1 << 5, dtype=np.uint32)),
            jnp.asarray(rng.integers(0, P, size=1 << 3, dtype=np.uint32)),
            jnp.asarray(rng.integers(0, P, size=1 << 5, dtype=np.uint32))]
    prover = MerkleProver.commit(cols)
    queries = {5: [0, 7, 31], 3: [2]}
    vals, dec = prover.decommit(queries, cols)
    verifier = MerkleVerifier(prover.root(), [5, 3, 5])
    verifier.verify(queries, vals, dec)
    with pytest.raises(MerkleVerificationError):
        verifier.verify(queries, vals,
                        MerkleDecommitment(dec.hash_witness[:-1],
                                           dec.column_witness))
    with pytest.raises(MerkleVerificationError):
        bad_cw = [M31((v.value + 1) % P) for v in dec.column_witness]
        verifier.verify(queries, vals,
                        MerkleDecommitment(dec.hash_witness, bad_cw))


# ---------------------------------------------------------------------------
# Size estimates (prover/index.test.ts, mirrors Rust size-estimate tests)
# ---------------------------------------------------------------------------

def test_merkle_decommitment_size_estimate():
    # Rust: 32 bytes per hash witness entry + 4 per column witness value.
    dec = MerkleDecommitment([b"\0" * 32] * 2, [M31(1), M31(2), M31(3)])
    assert dec.size_estimate() == 2 * 32 + 3 * 4


def test_proof_size_breakdown_sums_to_estimate():
    from tstwo_tpu.examples.basic_air import prove_basic_air

    proof, _, _ = prove_basic_air(log_num_rows=4)
    breakdown = proof.size_breakdown_estimate()
    assert all(v >= 0 for v in breakdown.values())
    assert breakdown["oods_samples"] == 16 * len(
        proof.commitment_scheme_proof.sampled_values.flatten_cols())
    # total estimate is at least the sum of the structural parts it counts
    assert proof.size_estimate() > 0


def test_extract_composition_oods_eval_errors():
    from tstwo_tpu.examples.basic_air import prove_basic_air
    from tstwo_tpu.prover import InvalidOodsSampleStructure, StarkProof

    proof, _, _ = prove_basic_air(log_num_rows=4)
    csp = proof.commitment_scheme_proof

    # wrong number of composition columns
    import copy

    bad = copy.copy(csp)
    bad.sampled_values = type(csp.sampled_values)(
        list(csp.sampled_values[:-1]) + [csp.sampled_values[-1][:3]])
    with pytest.raises(InvalidOodsSampleStructure):
        StarkProof(bad).extract_composition_oods_eval()

    # more than one eval per composition column
    bad2 = copy.copy(csp)
    last = [col + col for col in csp.sampled_values[-1]]
    bad2.sampled_values = type(csp.sampled_values)(
        list(csp.sampled_values[:-1]) + [last])
    with pytest.raises(InvalidOodsSampleStructure):
        StarkProof(bad2).extract_composition_oods_eval()


# ---------------------------------------------------------------------------
# Line layer (poly/lineDomain.test.ts, lineEvaluation.test.ts)
# ---------------------------------------------------------------------------

def test_line_domain_size_and_double():
    from tstwo_tpu.poly.line import LineDomain

    coset = Coset.half_odds(5)
    domain = LineDomain.new(coset)
    assert domain.size() == 1 << 5
    assert domain.log_size() == 5
    d2 = domain.double()
    assert d2.size() == 1 << 4


def test_line_domain_iter_yields_x_coordinates():
    from tstwo_tpu.poly.line import LineDomain

    coset = Coset.half_odds(3)
    domain = LineDomain.new(coset)
    xs = domain.xs()
    assert len(xs) == 8
    # each x must be the x-coordinate of some coset point
    coset_xs = {coset.at(i).x.value for i in range(coset.size())}
    assert all(x.value in coset_xs for x in xs)


def test_line_domain_rejects_non_unique_x():
    """A coset whose points are not distinct under x -> x has repeated x
    coordinates (reference poly/line.ts:34-56 uniqueness check)."""
    from tstwo_tpu.poly.line import LineDomain

    # the full subgroup of size 8 contains P and -P: duplicate x
    with pytest.raises(ValueError):
        LineDomain.new(Coset.subgroup(3))


def test_line_constant_polynomial():
    from tstwo_tpu.poly.line import LineDomain, LinePoly

    poly = LinePoly.new([QM31.from_u32_unchecked(7, 0, 0, 0)])
    domain = LineDomain.new(Coset.half_odds(3))
    for i in range(domain.size()):
        x = QM31.from_base(domain.at(i))
        assert poly.eval_at_point(x) == QM31.from_u32_unchecked(7, 0, 0, 0)


def test_line_interpolate_round_trip():
    from tstwo_tpu.poly.line import LineDomain, LineEvaluation, LinePoly

    rng = np.random.default_rng(5)
    log = 4
    domain = LineDomain.new(Coset.half_odds(log))
    coeffs = [QM31.from_u32_unchecked(*rng.integers(0, P, size=4).tolist())
              for _ in range(1 << log)]
    poly = LinePoly.new(coeffs)
    evals = [poly.eval_at_point(QM31.from_base(domain.at(i)))
             for i in range(domain.size())]
    from tstwo_tpu.utils import bit_reverse_list

    evals = bit_reverse_list(evals)  # LineEvaluation stores bit-reversed
    arr = np.array([e.to_ints() for e in evals], dtype=np.uint32).T
    ev = LineEvaluation(domain, jnp.asarray(arr))
    back = ev.interpolate()
    assert list(back.coeffs) == list(poly.coeffs)


def test_line_poly_ordered_coefficients_round_trip():
    from tstwo_tpu.poly.line import LinePoly

    rng = np.random.default_rng(6)
    coeffs = [QM31.from_u32_unchecked(*rng.integers(0, P, size=4).tolist())
              for _ in range(8)]
    poly = LinePoly.from_ordered_coefficients(coeffs)
    assert poly.into_ordered_coefficients() == coeffs


# ---------------------------------------------------------------------------
# fold util (poly/utils.test.ts)
# ---------------------------------------------------------------------------

def test_fold_recursive_semantics():
    """fold(values, [f_inner, f_outer]) == recursive pairwise fold."""
    from tstwo_tpu.ops import fft as fft_ops
    from tstwo_tpu.ops import m31 as m31_ops

    rng = np.random.default_rng(7)
    vals = jnp.asarray(rng.integers(0, P, size=8, dtype=np.uint32))
    f = [jnp.uint32(3), jnp.uint32(5), jnp.uint32(7)]
    got = int(fft_ops.fold(vals, f, m31_ops.mul, m31_ops.add))

    def ref_fold(v, fs):
        if not fs:
            return int(v[0])
        nxt = [(int(v[2 * i]) + fs[0] * int(v[2 * i + 1])) % P
               for i in range(len(v) // 2)]
        return ref_fold(nxt, fs[1:])

    assert got == ref_fold([int(x) for x in np.asarray(vals)], [3, 5, 7])
