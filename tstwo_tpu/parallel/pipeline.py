"""Full sharded prove step: one jitted device pipeline over a mesh.

This is the multi-chip form of the prove() hot path (SURVEY.md §3.1,
reference prover/index.ts:582 / rust-examples/05_proving_an_air.rs:52-133):

  trace  -> iCFFT (all-to-all)            interpolation for commitment
         -> zero-pad + CFFT (all-to-all)  extension to the blowup domain
         -> Blake2s Merkle tree           trace commitment (GSPMD halo at top)
         -> constraint eval + alpha-accumulation / vanishing-denominator
            division                      composition polynomial
         -> iCFFT + pad + CFFT            composition commitment evals
         -> Blake2s Merkle tree           composition commitment
         -> DEEP quotient accumulation    (per log size, fused kernel)
         -> decompose + FRI circle->line and line folds

Everything between the host Fiat-Shamir draws runs as ONE jit: the CFFT
stages move data with explicit all-to-alls inside shard_map; all other
stages are point-local so GSPMD partitions them with no communication
(Merkle upper levels and the decompose sums reduce across shards
automatically).  Channel state itself stays on the host (SURVEY.md §5:
replicated deterministic Fiat-Shamir needs no communication).
"""
from __future__ import annotations

from typing import List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..circle import CanonicCoset, CirclePoint
from ..constraints import coset_vanishing_denominator_inverses_bitrev
from ..ops import fri_ops, m31, qm31
from ..pcs.quotients import (ColumnSampleBatch, PointSample,
                             _accumulate_quotients_kernel,
                             domain_points_bitrev, pack_quotient_inputs)
from ..poly.twiddles import (circle_layer_twiddles, domain_line_twiddles,
                             precompute_twiddles)
from ..vcs.blake2s_merkle import commit_on_layer
from .fft import make_sharded_fft, shard_column


class ProveStepOutputs(NamedTuple):
    trace_root: jnp.ndarray        # uint32[8, 1] digest words (word-major)
    composition_root: jnp.ndarray  # uint32[8, 1]
    fri_line: jnp.ndarray          # uint32[4, N/2] folded line evaluation
    lambdas: jnp.ndarray           # uint32[2, 4] decompose lambdas


def _merkle_root(leaf_log: int, columns) -> jnp.ndarray:
    layer = commit_on_layer(leaf_log, None, columns)
    for log in range(leaf_log - 1, -1, -1):
        layer = commit_on_layer(log, layer, [])
    return layer


def make_sharded_prove_step(mesh: Mesh, log_rows: int, n_cols: int,
                            axis_name: str = "chips"):
    """Build the jitted full prove step for a wide-Fibonacci style AIR
    (constraint col[i] = col[i-2]^2 + col[i-1]^2) over `mesh`.

    Returns (step, shard_inputs) where step(trace, alpha, fri_alpha) runs the
    whole device pipeline on a point-sharded trace [n_cols, 2^log_rows].
    """
    d = mesh.devices.size
    k = d.bit_length() - 1
    if log_rows < k + 1:
        raise ValueError("log_rows too small for this mesh")
    eval_log = log_rows + 1       # constraint-eval / trace-commit domain
    comp_log = log_rows + 2       # composition-commit domain
    n = 1 << log_rows

    big_domain = CanonicCoset.new(comp_log).circle_domain()
    eval_domain = CanonicCoset.new(eval_log).circle_domain()
    tree = precompute_twiddles(big_domain.half_coset)

    def fft_pair(log, leading_dims):
        line_f = domain_line_twiddles(log, tree)
        line_i = domain_line_twiddles(log, tree, inverse=True)
        fwd = make_sharded_fft(mesh, log, line_f,
                               circle_layer_twiddles(line_f[0]),
                               inverse=False, axis_name=axis_name,
                               leading_dims=leading_dims)
        inv = make_sharded_fft(mesh, log, line_i,
                               circle_layer_twiddles(line_i[0]),
                               inverse=True, axis_name=axis_name,
                               leading_dims=leading_dims)
        return fwd, inv

    _, ifft_trace = fft_pair(log_rows, 1)
    fft_eval, ifft_eval = fft_pair(eval_log, 1)
    fft_comp, _ = fft_pair(comp_log, 1)

    def shard(arr, leading=0):
        spec = P(*([None] * leading), axis_name)
        return jax.device_put(jnp.asarray(arr), NamedSharding(mesh, spec))

    denom_inv = shard(coset_vanishing_denominator_inverses_bitrev(
        log_rows, eval_log))
    xs_ev, ys_ev = (shard(a) for a in domain_points_bitrev(eval_domain))
    xs_co, ys_co = (shard(a) for a in domain_points_bitrev(big_domain))
    y_itw_co = shard(fri_ops.domain_y_itwiddles(big_domain))
    y_itw_ev = shard(fri_ops.domain_y_itwiddles(eval_domain))
    # line-fold x-itwiddles: fold 2N -> N then (after eval-quotient merge)
    # N -> N/2, exactly the FriProver._commit_inner_layers ladder
    x_itw_hi = shard(tree.layer_of_size(1 << log_rows, inverse=True))
    x_itw_lo = shard(tree.layer_of_size(1 << (log_rows - 1), inverse=True))

    # deterministic OODS point + sampled values (host Fiat-Shamir stand-in;
    # in prove() these come from the live channel between dispatches)
    from ..channel.blake2s import Blake2sChannel
    ch = Blake2sChannel()
    ch.mix_u64(log_rows)
    oods = CirclePoint.get_random_point(ch)
    random_coeff = ch.draw_felt()
    comp_samples = [[PointSample(oods, ch.draw_felt())] for _ in range(4)]
    trace_samples = [[PointSample(oods, ch.draw_felt())]
                     for _ in range(n_cols)]
    packed_co = pack_quotient_inputs(
        ColumnSampleBatch.new_vec(comp_samples), random_coeff)
    packed_ev = pack_quotient_inputs(
        ColumnSampleBatch.new_vec(trace_samples), random_coeff)

    def step(trace, alpha, fri_alpha):
        # 1. interpolation for commitment (iCFFT, includes 1/N)
        coeffs = ifft_trace(trace)
        # 2. extension: zero-pad + forward CFFT on the blowup domain
        ext = fft_eval(jnp.pad(coeffs, ((0, 0), (0, n))))
        # 3. trace tree Merkle commit
        trace_root = _merkle_root(eval_log, list(ext))
        # 4. composition: constraint eval, alpha-horner, /vanishing
        acc = jnp.zeros((4, 2 * n), dtype=jnp.uint32)
        for i in range(2, n_cols):
            c = m31.sub(ext[i], m31.add(m31.mul(ext[i - 2], ext[i - 2]),
                                        m31.mul(ext[i - 1], ext[i - 1])))
            acc = qm31.add(qm31.mul(acc, alpha[:, None]), qm31.from_m31(c))
        comp = m31.mul(acc, denom_inv[None, :])
        # 5. composition commitment evals (iCFFT + pad + CFFT at +1 blowup)
        comp_coeffs = ifft_eval(comp)
        comp_ext = fft_comp(jnp.pad(comp_coeffs, ((0, 0), (0, 2 * n))))
        comp_root = _merkle_root(comp_log, list(comp_ext))
        # 6. DEEP quotients per log size (descending)
        q_hi = _accumulate_quotients_kernel(comp_ext, xs_co, ys_co,
                                            *packed_co)
        q_lo = _accumulate_quotients_kernel(ext, xs_ev, ys_ev, *packed_ev)
        # 7. FRI: decompose to fft-space, then the fold ladder
        g_hi, lam_hi = fri_ops.decompose(q_hi)
        g_lo, lam_lo = fri_ops.decompose(q_lo)
        line = fri_ops.fold_circle_into_line(
            jnp.zeros((4, 2 * n), dtype=jnp.uint32), g_hi, y_itw_co,
            fri_alpha)
        line = fri_ops.fold_line(line, x_itw_hi, fri_alpha)
        line = fri_ops.fold_circle_into_line(line, g_lo, y_itw_ev, fri_alpha)
        line = fri_ops.fold_line(line, x_itw_lo, fri_alpha)
        return ProveStepOutputs(trace_root, comp_root, line,
                                jnp.stack([lam_hi, lam_lo]))

    def shard_inputs(trace):
        return shard_column(jnp.asarray(trace), mesh, axis_name)

    return jax.jit(step), shard_inputs
