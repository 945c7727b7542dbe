"""Per-phase span tables on the TPU: FRI commit at 2^22 and a realistic
prove at 2^16 rows x 8 columns (wide-Fibonacci).  Feeds PERF.md."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np

from tstwo_tpu import tracing

P = (1 << 31) - 1


def fri_commit_spans(log_n=22):
    from tstwo_tpu.channel.blake2s import Blake2sChannel
    from tstwo_tpu.circle import CanonicCoset
    from tstwo_tpu.fri import FriConfig, FriProver
    from tstwo_tpu.ops import m31 as m31_ops
    from tstwo_tpu.poly.circle_poly import SecureCirclePoly
    from tstwo_tpu.poly.twiddles import precompute_twiddles

    rng = np.random.default_rng(3)
    config = FriConfig(0, 1, 10)
    coeffs = rng.integers(0, P, size=(4, 1 << (log_n - 1)), dtype=np.uint32)
    sp = SecureCirclePoly(m31_ops.asarray(coeffs))
    domain = CanonicCoset.new(log_n).circle_domain()
    ev = sp.evaluate(domain)
    tree = precompute_twiddles(domain.half_coset)

    def run():
        ch = Blake2sChannel()
        return FriProver.commit(ch, config, [ev], tree)

    run()  # warm
    run()
    tracing.enable()
    tracing.reset()
    t0 = time.perf_counter()
    run()
    total = time.perf_counter() - t0
    tracing.disable()
    print(f"== FRI commit 2^{log_n}: {total*1e3:.1f} ms total ==")
    print(tracing.report(), flush=True)


def prove_spans(log_rows=16, seq=8):
    from tstwo_tpu.examples.wide_fibonacci import (prove_wide_fibonacci,
                                                   verify_wide_fibonacci)

    prove_wide_fibonacci(log_n_rows=log_rows, sequence_length=seq)  # warm
    # second warm with a different seed: decommit gather BUCKETS (padded
    # shapes) compile on first contact with a fresh query structure
    prove_wide_fibonacci(log_n_rows=log_rows, sequence_length=seq, seed=3)
    tracing.enable()
    tracing.reset()
    t0 = time.perf_counter()
    # fresh seed: the tunnel result-caches identical (executable, args)
    proof, comp, cfg = prove_wide_fibonacci(log_n_rows=log_rows,
                                            sequence_length=seq, seed=5)
    total = time.perf_counter() - t0
    tracing.disable()
    print(f"== prove wide-fib 2^{log_rows} x {seq} cols: "
          f"{total*1e3:.1f} ms total ==")
    print(tracing.report(), flush=True)
    t0 = time.perf_counter()
    verify_wide_fibonacci(proof, comp, cfg, log_n_rows=log_rows)
    print(f"verify: {(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)


def basic_spans(log_rows=4):
    from tstwo_tpu.examples.basic_air import prove_basic_air

    prove_basic_air(log_num_rows=log_rows)  # warm
    tracing.enable()
    tracing.reset()
    t0 = time.perf_counter()
    prove_basic_air(log_num_rows=log_rows)
    total = time.perf_counter() - t0
    tracing.disable()
    print(f"== prove basic-air 2^{log_rows}: {total*1e3:.1f} ms total ==")
    print(tracing.report(), flush=True)


def logup_spans(log_size=16):
    from tstwo_tpu.examples.logup_lookup import prove_logup_lookup

    prove_logup_lookup(log_size=log_size)  # warm
    prove_logup_lookup(log_size=log_size, seed=3)  # warm gather buckets
    tracing.enable()
    tracing.reset()
    t0 = time.perf_counter()
    prove_logup_lookup(log_size=log_size, seed=5)
    total = time.perf_counter() - t0
    tracing.disable()
    print(f"== prove logup 2^{log_size}: {total*1e3:.1f} ms total ==")
    print(tracing.report(), flush=True)


if __name__ == "__main__":
    import sys as _sys

    which = _sys.argv[1] if len(_sys.argv) > 1 else "all"
    if which in ("all", "fri"):
        fri_commit_spans()
    if which in ("all", "wide"):
        prove_spans(16, 32)
    if which in ("all", "basic"):
        basic_spans()
    if which in ("all", "logup"):
        logup_spans()
