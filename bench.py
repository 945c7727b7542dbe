"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline: M31 modular-multiply throughput per chip (the reference's only
published number is 8.37e6 scalar muls/s on its CI host -- BASELINE.md).
The aux dict carries the five BASELINE.json benchmark configs:
  1. field-op batch throughput (m31 / qm31 multiply)
  2. CFFT round trip at 2^20 and 2^24 (incl. bit-reverse)
  3. SecureColumn DEEP-quotient accumulation at 2^20 / 2^22
  4. FRI commit + Blake2s Merkle on a 2^22 column; Merkle tree throughput
  5. end-to-end AIR prove+verify (basic, wide-Fibonacci at real sizes,
     LogUp)

Methodology (see PERF.md section "Measuring through the tunnel"): the axon
tunnel result-caches identical (executable, args) pairs, block_until_ready
can return before execution completes, and a device->host fetch costs
~25 ms.  Kernel benches therefore run a serially-dependent K-iteration
chain inside ONE jit, force a real (tiny) fetch, and report
(t(K2) - t(K1)) / (K2 - K1) so every constant cost cancels.  End-to-end
proves vary the trace seed per iteration so no run can be served from any
cache.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

import numpy as np

BASELINE_M31_MUL_OPS = 8_373_829.24  # reference bench/results.json
P = (1 << 31) - 1


def _fetch(y):
    """Force true completion: pull a few words to the host."""
    leaf = jax.tree_util.tree_leaves(y)[0]
    return np.asarray(leaf.reshape(-1)[:4])


def delta_time(make_chain, x, k1=4, min_delta=0.25, reps=4, max_k=8192,
               k2=None):
    """make_chain(k) -> jitted fn mapping x -> same-structured x applying
    the op k times serially.  Returns marginal seconds per op as
    (t(k2) - t(k1)) / (k2 - k1), with k2 widened until the marginal work
    is >= min_delta seconds -- far above tunnel dispatch jitter.  (The r03
    fixed k-spread put ~0.3-4 ms of marginal work under ~ms-scale jitter
    and produced a 16x-inflated headline; VERDICT r3 weak #1.)  Raises on
    a non-positive delta instead of clamping."""
    def measure(k):
        chain = make_chain(k)
        x2 = chain(x)
        _fetch(x2)  # compile + settle
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            x2 = chain(x2)  # feed output back: args differ every rep,
            _fetch(x2)      # so no result cache can serve the call
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best
    t1 = measure(k1)
    if k2 is None:
        # one-shot estimate: t1/k1 upper-bounds the marginal per-op time
        # (constant dispatch overhead included), so this k2 guarantees
        # >= min_delta of marginal work without a recompile loop (each
        # extra chain costs a tunnel compile)
        k2 = min(max_k, k1 + max(2 * k1, int(min_delta / (t1 / k1)) + 1))
    t2 = measure(k2)
    if t2 - t1 < min_delta / 2 and k2 < max_k:  # estimate undershot: widen
        k2 = min(max_k, k2 * 4)
        t2 = measure(k2)
    dt = (t2 - t1) / (k2 - k1)
    if dt <= 0:
        raise RuntimeError(
            f"non-positive marginal time ({t2:.4f}s @k={k2} vs "
            f"{t1:.4f}s @k={k1}): measurement invalid")
    print(f"  delta_time: k1={k1} ({t1:.4f}s) k2={k2} ({t2:.4f}s)",
          file=sys.stderr)
    return dt


def bench_m31_mul():
    import jax.numpy as jnp

    from tstwo_tpu.ops import m31

    n = 1 << 24
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, P, size=n, dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, P, size=n, dtype=np.uint32))

    def make(k):
        @jax.jit
        def chain(x):
            return jax.lax.fori_loop(0, k, lambda i, v: m31.mul(v, b), x)
        return chain

    dt = delta_time(make, a)
    return n / dt


def bench_qm31_mul():
    import jax.numpy as jnp

    from tstwo_tpu.ops import qm31

    n = 1 << 22
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, P, size=(4, n), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, P, size=(4, n), dtype=np.uint32))

    def make(k):
        @jax.jit
        def chain(x):
            return jax.lax.fori_loop(0, k, lambda i, v: qm31.mul(v, b), x)
        return chain

    dt = delta_time(make, a)
    return n / dt


def bench_cfft_roundtrip(log_n=20):
    import jax.numpy as jnp

    from tstwo_tpu.circle import CanonicCoset
    from tstwo_tpu.ops import fft as fft_ops
    from tstwo_tpu.ops import m31
    from tstwo_tpu.poly.twiddles import (circle_layer_twiddles,
                                         domain_line_twiddles,
                                         precompute_twiddles)

    n = 1 << log_n
    domain = CanonicCoset.new(log_n).circle_domain()
    tree = precompute_twiddles(domain.half_coset)
    line = tuple(domain_line_twiddles(log_n, tree))
    circ = circle_layer_twiddles(line[0])
    line_i = tuple(domain_line_twiddles(log_n, tree, inverse=True))
    circ_i = circle_layer_twiddles(line_i[0])
    n_inv = jnp.uint32(pow(n, P - 2, P))
    rng = np.random.default_rng(1)
    vals = jnp.asarray(rng.integers(0, P, size=n, dtype=np.uint32))

    def body(i, v):
        ev = fft_ops.fft_natural_to_bitrev(v, line, circ)
        nat = fft_ops.bit_reverse(ev, log_n)   # natural-order view
        ev2 = fft_ops.bit_reverse(nat, log_n)  # back to bit-reversed
        back = fft_ops.ifft_bitrev_to_natural(ev2, line_i, circ_i)
        return m31.mul(back, n_inv)

    def make(k):
        @jax.jit
        def chain(v):
            return jax.lax.fori_loop(0, k, body, v)
        return chain

    dt = delta_time(make, vals, k1=2)
    return n / dt


def bench_quotients(log_n=20):
    from tstwo_tpu.circle import SECURE_FIELD_CIRCLE_GEN, CanonicCoset
    from tstwo_tpu.fields import QM31
    from tstwo_tpu.ops import m31 as m31_ops
    from tstwo_tpu.pcs.quotients import (ColumnSampleBatch, PointSample,
                                         accumulate_quotients)

    rng = np.random.default_rng(2)
    n = 1 << log_n
    domain = CanonicCoset.new(log_n).circle_domain()
    cols = [m31_ops.asarray(rng.integers(0, P, size=n, dtype=np.uint32))
            for _ in range(4)]
    point = SECURE_FIELD_CIRCLE_GEN
    samples = [[PointSample(point, QM31.from_u32_unchecked(i + 1, 2, 3, 4))]
               for i in range(4)]
    batches = ColumnSampleBatch.new_vec(samples)
    coeff = QM31.from_u32_unchecked(5, 6, 7, 8)

    # quotients map 4 base columns -> one secure column; chain by feeding
    # the 4 output coordinate rows back as the 4 input columns
    import jax.numpy as jnp

    def body(i, stack):
        return accumulate_quotients(
            domain, [stack[i] for i in range(4)], coeff, batches, 1).values

    def make(k):
        @jax.jit
        def chain(stack):
            return jax.lax.fori_loop(0, k, body, stack)
        return chain

    stack0 = jnp.stack(cols)
    dt = delta_time(make, stack0, k1=2)
    return 4 * n / dt


def bench_merkle(log_n=22):
    import jax.numpy as jnp

    from tstwo_tpu.vcs.prover import _commit_all_layers

    rng = np.random.default_rng(7)
    n = 1 << log_n
    cols0 = jnp.asarray(rng.integers(0, P, size=(4, n), dtype=np.uint32))

    def body(i, cols):
        layers = _commit_all_layers(log_n, tuple(cols[i] for i in range(4)))
        return cols.at[0, :8].set(layers[0][:, 0])

    def make(k):
        @jax.jit
        def chain(cols):
            return jax.lax.fori_loop(0, k, body, cols)
        return chain

    dt = delta_time(make, cols0, k1=2)
    return 2 * n / dt  # tree nodes (leaf hashes + internal) per second


def bench_fri_commit(log_n=22):
    """Wall-clock FRI commit (device transcript + final fetch + host
    last-layer).  Cache-busting is done ON DEVICE: one scalar seed is
    XOR-ed into the device-resident coefficient array, so each run has
    fresh inputs without re-uploading 33.5 MB through the tunnel (the r4
    harness artifact: the host->device upload dominated the timed region
    ~10x over the actual commit; VERDICT r4 weak #1)."""
    import jax.numpy as jnp

    from tstwo_tpu.channel.blake2s import Blake2sChannel
    from tstwo_tpu.circle import CanonicCoset
    from tstwo_tpu.fri import FriConfig, FriProver
    from tstwo_tpu.ops import m31 as m31_ops
    from tstwo_tpu.poly.circle_poly import SecureCirclePoly
    from tstwo_tpu.poly.twiddles import precompute_twiddles

    rng = np.random.default_rng(3)
    config = FriConfig(0, 1, 10)
    domain = CanonicCoset.new(log_n).circle_domain()
    tree = precompute_twiddles(domain.half_coset)
    base = m31_ops.asarray(rng.integers(
        0, P, size=(4, 1 << (log_n - 1)), dtype=np.uint32))

    @jax.jit
    def perturb(c, seed):
        return c.at[0, 0].set(jnp.bitwise_xor(c[0, 0], seed) & jnp.uint32(P))

    def one(seed):
        coeffs = perturb(base, jnp.uint32(seed))
        _fetch(coeffs)  # device-resident, settled before the clock starts
        sp = SecureCirclePoly(coeffs)
        ch = Blake2sChannel()
        t0 = time.perf_counter()
        ev = sp.evaluate(domain)
        FriProver.commit(ch, config, [ev], tree)
        return time.perf_counter() - t0

    one(0)  # warm / compile
    best = min(one(i + 1) for i in range(3))
    return (1 << log_n) / best


SPANS = {}
SPAN_WALLS = {}

# Top-level, non-overlapping phase spans: their sum should close to the
# prove wall within ~10% (the remainder is reported as "(rest)").  The
# fri_* children of fri_commit are nested and excluded from the sum.
TOP_LEVEL_SPANS = [
    "trace_gen", "twiddle_precompute", "interpolation", "extension",
    "merkle", "channel_sync", "composition",
    "evaluate_columns_out_of_domain", "fri_quotients", "fri_commit",
    "grind", "decommitment", "oods_sanity_check", "component_setup",
]
# nested child spans: excluded from the top-level sum, rendered indented
# under their parent
NESTED_SPANS = {
    "fri_fused_dispatch": "fri_commit",
    "fri_state_fetch": "fri_commit",
    "fri_last_layer": "fri_commit",
    "decommit_build": "decommitment",
    "decommit_transfer": "decommitment",
    "decommit_finish": "decommitment",
}


def _spanned(tag):
    """Start a fresh tracing window; returns a closer that records the
    per-phase totals into SPANS[tag] (surfaced in the bench JSON and
    emitted as the SPANS.md tables -- the single provenance for PERF.md
    section 5)."""
    from tstwo_tpu import tracing

    tracing.reset()
    tracing.enable()

    def close(wall=None):
        SPANS[tag] = {k: round(v, 4) for k, v in tracing.totals().items()}
        tracing.disable()
        if wall is not None:
            SPAN_WALLS[tag] = round(wall, 4)

    return close


def emit_spans_markdown(path="SPANS.md"):
    """One table per spanned prove, generated from THE run whose numbers
    land in the bench JSON (VERDICT r4 weak #2: hand-copied PERF.md span
    tables contradicted the bench's own spans dict)."""
    lines = ["# SPANS — per-phase prove breakdowns (generated by bench.py)",
             "",
             "Auto-generated from the same run as the committed bench JSON;",
             "do not edit by hand.  PERF.md section 5 points here.", ""]
    for tag, spans in SPANS.items():
        wall = SPAN_WALLS.get(tag)
        lines.append(f"## {tag}" + (f" — wall {wall:.4f} s" if wall else ""))
        lines.append("")
        lines.append("| phase | seconds |")
        lines.append("|---|---|")
        total = 0.0
        for k in TOP_LEVEL_SPANS:
            if k in spans:
                lines.append(f"| {k} | {spans[k]:.4f} |")
                total += spans[k]
        for k, v in spans.items():
            if k not in TOP_LEVEL_SPANS and k not in NESTED_SPANS:
                lines.append(f"| {k} (unclassified) | {v:.4f} |")
                total += v
        for k in sorted(set(NESTED_SPANS) & set(spans)):
            lines.append(f"| &nbsp;&nbsp;{k} (within {NESTED_SPANS[k]}) "
                         f"| {spans[k]:.4f} |")
        if wall:
            rest = wall - total
            lines.append(f"| (rest) | {rest:.4f} |")
            lines.append("")
            lines.append(f"Spans sum {total:.4f} s of {wall:.4f} s wall "
                         f"({100 * total / wall:.1f}%).")
        lines.append("")
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           path), "w") as f:
        f.write("\n".join(lines))


def bench_prove():
    from tstwo_tpu.examples.basic_air import (prove_basic_air,
                                              verify_basic_air)

    prove_basic_air(log_num_rows=4)  # warm (trace + compile cache)
    prove_basic_air(log_num_rows=4)  # second warm (gather buckets)
    close = _spanned("basic_air_log4")
    t0 = time.perf_counter()
    proof, component, config = prove_basic_air(log_num_rows=4)
    prove_s = time.perf_counter() - t0
    close(prove_s)
    verify_basic_air(proof, component, config, log_num_rows=4)
    return prove_s


def bench_prove_poseidon():
    """Poseidon252-flavor e2e prove (device-batched Hades Merkle, host
    transcript) -- the second Merkle flavor had exact-value tests but no
    committed perf number, so it could silently regress (VERDICT r4 #9)."""
    from tstwo_tpu.examples.basic_air import (prove_basic_air,
                                              verify_basic_air)

    prove_basic_air(log_num_rows=4, flavor="poseidon252")  # warm
    prove_basic_air(log_num_rows=4, flavor="poseidon252")
    t0 = time.perf_counter()
    proof, component, config = prove_basic_air(log_num_rows=4,
                                               flavor="poseidon252")
    prove_s = time.perf_counter() - t0
    verify_basic_air(proof, component, config, log_num_rows=4,
                     flavor="poseidon252")
    return prove_s


def bench_prove_wide_fib(log_n_rows=8, seq=32):
    from tstwo_tpu.examples.wide_fibonacci import (prove_wide_fibonacci,
                                                  verify_wide_fibonacci)

    prove_wide_fibonacci(log_n_rows=log_n_rows, sequence_length=seq)  # warm
    # second warm with a fresh seed: decommit gather BUCKET shapes
    # (utils_fetch.padded_take) compile on first contact
    prove_wide_fibonacci(log_n_rows=log_n_rows, sequence_length=seq, seed=3)
    best = None
    for seed in (1, 2):
        close = _spanned(f"wide_fib_log{log_n_rows}x{seq}")
        t0 = time.perf_counter()
        proof, component, config = prove_wide_fibonacci(
            log_n_rows=log_n_rows, sequence_length=seq, seed=seed)
        dt = time.perf_counter() - t0
        close(dt)
        best = dt if best is None else min(best, dt)
    verify_wide_fibonacci(proof, component, config, log_n_rows=log_n_rows)
    return best


def bench_prove_logup(log_size=16):
    from tstwo_tpu.examples.logup_lookup import (prove_logup_lookup,
                                                 verify_logup_lookup)

    prove_logup_lookup(log_size=log_size)  # warm
    prove_logup_lookup(log_size=log_size, seed=3)  # warm gather buckets
    best = None
    for seed in (1, 2):
        close = _spanned(f"logup_log{log_size}")
        t0 = time.perf_counter()
        proof, config, claimed = prove_logup_lookup(log_size=log_size,
                                                    seed=seed)
        dt = time.perf_counter() - t0
        close(dt)
        best = dt if best is None else min(best, dt)
    verify_logup_lookup(proof, config, log_size, claimed)
    return best


def bench_gkr_layers(log_n=20):
    """Device GKR grand-product layer generation over a 2^log_n hypercube:
    full layer tower (log_n halvings), layers per second.

    Marginal-time like every other kernel bench: k towers chain serially
    inside one jit (each tower's input depends on the previous tower's
    output root, so nothing can be elided or cache-served), and the
    constant dispatch + ~25 ms tunnel-fetch cost cancels in the delta.
    The r4 form timed dispatch+fetch per tower and measured the tunnel
    RTT, not the device (VERDICT r4 weak #4)."""
    import jax.numpy as jnp

    from tstwo_tpu.lookups.gkr import _gp_tower_body
    from tstwo_tpu.ops import qm31 as qm31_ops

    rng = np.random.default_rng(9)
    evals = jnp.asarray(
        rng.integers(0, P, size=(4, 1 << log_n), dtype=np.uint32))
    n_layers = log_n  # halvings down to one point

    def make(k):
        @jax.jit
        def chain(x):
            def body(i, v):
                outs = _gp_tower_body(v)
                root = outs[-1]  # [4, 1] grand product
                return qm31_ops.add(v, jnp.broadcast_to(root, v.shape))
            return jax.lax.fori_loop(0, k, body, x)
        return chain

    dt = delta_time(make, evals, k1=2)
    return n_layers / dt


def _try(fn, *a, **k):
    try:
        return fn(*a, **k)
    except Exception:
        import traceback
        traceback.print_exc(file=sys.stderr)  # a null metric is never silent
        return None


def main():
    budget_t0 = time.time()
    deadline = float(os.environ.get("TSTWO_BENCH_DEADLINE", "1800"))
    m31_ops_per_s = bench_m31_mul()

    plan = [
        ("qm31_mul_ops_per_s", bench_qm31_mul, ()),
        ("cfft_roundtrip_points_per_s_log20", bench_cfft_roundtrip, ()),
        ("cfft_roundtrip_points_per_s_log24", bench_cfft_roundtrip, (24,)),
        ("quotient_cells_per_s_log20", bench_quotients, ()),
        ("quotient_cells_per_s_log22", bench_quotients, (22,)),
        ("merkle_nodes_per_s_log22", bench_merkle, ()),
        ("fri_commit_points_per_s_log22", bench_fri_commit, ()),
        ("prove_basic_air_seconds_log4", bench_prove, ()),
        ("prove_basic_air_poseidon_seconds_log4", bench_prove_poseidon, ()),
        ("prove_wide_fib_seconds_log8x32", bench_prove_wide_fib, ()),
        ("prove_wide_fib_seconds_log16x32", bench_prove_wide_fib, (16,)),
        ("prove_wide_fib_seconds_log18x64", bench_prove_wide_fib, (18, 64)),
        ("prove_logup_seconds_log16", bench_prove_logup, ()),
        ("gkr_layers_per_s_log20", bench_gkr_layers, ()),
    ]
    aux = {}
    for name, fn, args in plan:
        if time.time() - budget_t0 > deadline:
            print(f"bench deadline hit; skipping {name}", file=sys.stderr)
            aux[name] = None  # deadline hit: report partial rather than die
            continue
        print(f"[bench] {name} ...", file=sys.stderr)
        aux[name] = _try(fn, *args)
        print(f"[bench] {name} = {aux[name]}", file=sys.stderr)
    aux["spans"] = SPANS
    aux["span_walls"] = SPAN_WALLS
    aux["bench_wall_seconds"] = round(time.time() - budget_t0, 1)
    _try(emit_spans_markdown)
    print(json.dumps({
        "metric": "m31_mul_ops_per_s",
        "value": m31_ops_per_s,
        "unit": "ops/s",
        "vs_baseline": m31_ops_per_s / BASELINE_M31_MUL_OPS,
        "aux": aux,
    }))


if __name__ == "__main__":
    main()
