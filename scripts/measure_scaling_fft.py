"""Stage-level scaling: the sharded CFFT (the prove pipeline's dominant
kernel) at growing per-shard sizes, 1 device vs the 8-device virtual CPU
mesh.

Run:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
    python scripts/measure_scaling_fft.py [log_sizes...]

On virtual devices all shards share the host's cores, so the mesh can
never be FASTER; what the ratio shows is the sharded program's overhead
(all-to-all collectives + partitioning) shrinking as per-shard work
grows — the amortization the real pod relies on.  Outputs are asserted
bit-equal to the single-device transform at every size.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "xla_force_host_platform_device_count" in os.environ.get("XLA_FLAGS", ""):
    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass

import numpy as np
import jax.numpy as jnp

P = (1 << 31) - 1


def main():
    logs = [int(a) for a in sys.argv[1:]] or [15, 18, 21]

    from tstwo_tpu.circle import CanonicCoset
    from tstwo_tpu.ops import fft as fft_ops
    from tstwo_tpu.parallel.fft import make_sharded_fft, shard_column
    from tstwo_tpu.parallel.mesh import make_mesh
    from tstwo_tpu.poly.twiddles import (circle_layer_twiddles,
                                         domain_line_twiddles,
                                         precompute_twiddles)

    mesh = make_mesh(len(jax.devices()))
    n_dev = len(jax.devices())
    print(f"devices: {n_dev}", flush=True)
    for log_n in logs:
        domain = CanonicCoset.new(log_n).circle_domain()
        tree = precompute_twiddles(domain.half_coset)
        line = tuple(domain_line_twiddles(log_n, tree))
        circ = circle_layer_twiddles(line[0])
        rng = np.random.default_rng(0)
        vals = jnp.asarray(rng.integers(0, P, size=1 << log_n,
                                        dtype=np.uint32))

        def time_best(fn, arg, reps=3):
            fn(arg).block_until_ready()  # compile + settle
            best = None
            for _ in range(reps):
                t0 = time.perf_counter()
                fn(arg).block_until_ready()
                dt = time.perf_counter() - t0
                best = dt if best is None or dt < best else best
            return best

        single = jax.jit(
            lambda v: fft_ops.fft_natural_to_bitrev(v, line, circ))
        t1 = time_best(single, vals)

        sharded = make_sharded_fft(mesh, log_n, line, circ)
        sv = shard_column(vals, mesh)
        tn = time_best(sharded, sv)

        got = np.asarray(sharded(sv))
        want = np.asarray(single(vals))
        assert np.array_equal(got, want), f"mismatch at log {log_n}"

        print(f"log {log_n}: single {t1 * 1e3:8.2f} ms | "
              f"{n_dev}-dev sharded {tn * 1e3:8.2f} ms | "
              f"overhead {tn / t1:5.2f}x | per-shard 2^{log_n} / {n_dev} "
              f"pts | bit-equal OK", flush=True)


if __name__ == "__main__":
    main()
