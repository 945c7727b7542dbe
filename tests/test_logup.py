"""LogUp constraint-framework tests (Rust stwo constraint_framework/logup.rs
semantics; the reference TS repo has no logup implementation -- symbols
pinned by roadmap/deps_map.json `stwo_prover::constraint_framework::logup`).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from tstwo_tpu.channel.blake2s import Blake2sChannel
from tstwo_tpu.circle import CanonicCoset
from tstwo_tpu.constraint_framework import (FrameworkComponent,
                                            TraceLocationAllocator,
                                            assert_constraints)
from tstwo_tpu.constraint_framework.logup import (LogupTraceGenerator,
                                                  LookupElements,
                                                  RelationEntry)
from tstwo_tpu.constraint_framework.preprocessed import IsFirst, Seq
from tstwo_tpu.examples.logup_lookup import (LookupEval,
                                             generate_interaction_trace,
                                             generate_trace,
                                             prove_logup_lookup,
                                             verify_logup_lookup)
from tstwo_tpu.fields import M31, QM31
from tstwo_tpu.ops import m31 as m31_ops
from tstwo_tpu.ops.prefix_sum import inclusive_prefix_sum_bit_rev_circle
from tstwo_tpu.pcs.utils import TreeVec
from tstwo_tpu.pcs.verifier import VerificationError
from tstwo_tpu.prover import ProvingError
from tstwo_tpu.utils import (bit_reverse_index,
                             coset_index_to_circle_domain_index)

P = (1 << 31) - 1
LOG = 5


def test_lookup_elements_combine_matches_host():
    ch = Blake2sChannel()
    rel = LookupElements.draw(ch, 3)
    assert rel.alpha_powers[0] == QM31.one()
    assert rel.alpha_powers[2] == rel.alpha * rel.alpha
    vals = [QM31.from_u32_unchecked(7, 0, 0, 0),
            QM31.from_u32_unchecked(11, 1, 0, 0),
            QM31.from_u32_unchecked(13, 0, 2, 0)]
    expect = (vals[0] + vals[1] * rel.alpha_powers[1]
              + vals[2] * rel.alpha_powers[2] - rel.z)
    assert rel.combine(vals) == expect
    # device columns (base field) against per-row host evaluation
    cols = [jnp.asarray(np.array([7, 5], dtype=np.uint32)),
            jnp.asarray(np.array([11, 6], dtype=np.uint32)),
            jnp.asarray(np.array([13, 9], dtype=np.uint32))]
    dev = np.asarray(rel.combine_cols(cols))
    for row in range(2):
        host = rel.combine([QM31.from_u32_unchecked(int(c[row]), 0, 0, 0)
                            for c in cols])
        assert tuple(int(dev[c, row]) for c in range(4)) == host.to_ints()


def test_prefix_sum_coset_order():
    log = 4
    n = 1 << log
    rng = np.random.default_rng(0)
    x = rng.integers(0, P, size=n, dtype=np.uint32)
    out = np.asarray(inclusive_prefix_sum_bit_rev_circle(jnp.asarray(x), log))
    # reference: walk coset order, accumulate, compare at committed indices
    acc = 0
    for k in range(n):
        committed = bit_reverse_index(
            coset_index_to_circle_domain_index(k, log), log)
        acc = (acc + int(x[committed])) % P
        assert int(out[committed]) == acc


def test_preprocessed_columns():
    assert Seq(6).id().id == "preprocessed_seq_6"
    assert IsFirst(6).id().id == "preprocessed_is_first_6"
    seq = np.asarray(Seq(4).gen_column().values)
    assert list(seq) == list(range(16))
    isf = np.asarray(IsFirst(4).gen_column().values)
    assert isf[0] == 1 and isf[1:].sum() == 0


def _trace_tree(log_size, pairs, seed=0):
    val_col, mult_col = generate_trace(log_size, seed)
    rel = LookupElements.draw(Blake2sChannel(), 1)
    cols, claimed = generate_interaction_trace(
        log_size, val_col, mult_col, rel, pairs)
    trace_evals = TreeVec([
        [Seq(log_size).gen_column().values],
        [val_col, mult_col],
        [c.values for c in cols],
    ])
    return trace_evals, rel, claimed


@pytest.mark.parametrize("pairs", [True, False])
def test_logup_constraints_vanish_on_trace(pairs):
    trace_evals, rel, claimed = _trace_tree(LOG, pairs)
    assert claimed.is_zero()
    assert_constraints(trace_evals, LOG, LookupEval(LOG, rel, pairs), claimed)


def test_logup_constraints_fail_on_bad_multiplicities():
    val_col, mult_col = generate_trace(LOG)
    bad_mult = m31_ops.add(mult_col, jnp.uint32(1))
    rel = LookupElements.draw(Blake2sChannel(), 1)
    cols, claimed = generate_interaction_trace(LOG, val_col, bad_mult, rel)
    assert not claimed.is_zero()  # unbalanced lookup is visible in the sum
    # an inconsistent interaction trace (right cols, wrong claimed sum)
    # must break the cumulative constraints
    trace_evals = TreeVec([
        [Seq(LOG).gen_column().values],
        [val_col, mult_col],
        [c.values for c in cols],
    ])
    with pytest.raises(AssertionError):
        assert_constraints(trace_evals, LOG, LookupEval(LOG, rel), claimed)


def test_unfinalized_logup_raises():
    class Unfinalized(LookupEval):
        def evaluate(self, ev):
            val = ev.next_trace_mask()
            ev.add_to_relation(
                RelationEntry(self.lookup_elements, QM31.one(), [val]))
            return ev  # never finalizes

    rel = LookupElements.dummy(1)
    with pytest.raises(ValueError, match="never finalized"):
        FrameworkComponent(TraceLocationAllocator(),
                           Unfinalized(LOG, rel), QM31.zero())


def test_static_allocator_rejects_unknown_preprocessed():
    rel = LookupElements.dummy(1)
    alloc = TraceLocationAllocator.new_with_preprocessed_columns(
        [IsFirst(LOG).id()])
    with pytest.raises(ValueError, match="not declared"):
        FrameworkComponent(alloc, LookupEval(LOG, rel), QM31.zero())


@pytest.mark.parametrize("pairs", [True, False])
def test_logup_lookup_e2e(pairs):
    proof, config, claimed = prove_logup_lookup(log_size=LOG, pairs=pairs)
    assert claimed.is_zero()
    verify_logup_lookup(proof, config, LOG, claimed, pairs)


def test_logup_lookup_rejects_tampered_proof():
    proof, config, claimed = prove_logup_lookup(log_size=LOG)
    # tamper one sampled interaction value
    tree = proof.commitment_scheme_proof.sampled_values[2]
    orig = tree[0][0]
    tree[0][0] = orig + QM31.one()
    with pytest.raises(VerificationError):
        verify_logup_lookup(proof, config, LOG, claimed)
    tree[0][0] = orig
    verify_logup_lookup(proof, config, LOG, claimed)  # restored -> accepts


def test_logup_domain_kernel_shared_across_proofs():
    """Fresh channel randomness (z, alpha) must not force a re-trace: the
    randomness is a traced kernel argument via the secure_param hook."""
    from tstwo_tpu.constraint_framework import _DOMAIN_KERNEL_CACHE
    proof1, config1, claimed1 = prove_logup_lookup(log_size=LOG, seed=1)
    snapshot = dict(_DOMAIN_KERNEL_CACHE)
    proof2, config2, claimed2 = prove_logup_lookup(log_size=LOG, seed=2)
    assert set(_DOMAIN_KERNEL_CACHE) == set(snapshot)  # no new kernel traced
    assert all(_DOMAIN_KERNEL_CACHE[k] is v for k, v in snapshot.items())
    verify_logup_lookup(proof1, config1, LOG, claimed1)
    verify_logup_lookup(proof2, config2, LOG, claimed2)


def test_logup_lookup_prove_rejects_unsound_trace():
    # multiplicities that don't match the values: prove() must fail its
    # OODS sanity check (constraints not satisfied) when forced through
    # with a zero claimed sum it can't actually reach
    val_col, mult_col = generate_trace(LOG)
    bad_mult = m31_ops.add(mult_col, jnp.uint32(1))
    with pytest.raises((ProvingError, ValueError)):
        proof, config, claimed = prove_logup_lookup(
            log_size=LOG, trace=(val_col, bad_mult))
        verify_logup_lookup(proof, config, LOG, claimed)
