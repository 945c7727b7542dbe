"""Scaling-efficiency harness: the production prove over 1/2/4/8-shard
meshes (and the 2x4 hosts-x-chips topology).

Run on the virtual CPU backend:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
    python scripts/measure_scaling.py [log_rows] [seq] [mesh_filter]

mesh_filter is a comma list of mesh names to run (e.g. "1,8x1") -- used
for the large amortizing-size row (per-shard work >= 2^18 points), where
running every mesh size would take too long on the virtual backend.

On virtual devices all shards share the host's cores, so wall-clock does
NOT speed up with mesh size -- the table measures the OVERHEAD of the
sharded program (collectives inserted, partitioning bookkeeping) relative
to single-device, i.e. the fixed cost a real pod must amortize.  Proof
bytes are asserted identical across every mesh size.
"""
import json
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


def main():
    log_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    seq = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from tstwo_tpu.examples.wide_fibonacci import prove_wide_fibonacci
    from tstwo_tpu.parallel.mesh import make_mesh, make_mesh2d
    from tstwo_tpu.serialize import proof_to_dict

    n_dev = len(jax.devices())
    meshes = [("1 (single)", None)]
    d = 2
    while d <= n_dev:
        meshes.append((f"{d}x1", make_mesh(d)))
        d *= 2
    if n_dev >= 8:
        meshes.append(("2x4 (hosts x chips)", make_mesh2d(2, 4)))
    if len(sys.argv) > 3:
        keep = sys.argv[3].split(",")
        meshes = [(n, m) for n, m in meshes
                  if any(n.startswith(k) for k in keep)]

    ref_bytes = None
    rows = []
    for name, mesh in meshes:
        # warm (compile)
        prove_wide_fibonacci(log_n_rows=log_rows, sequence_length=seq,
                             mesh=mesh)
        best = None
        for seed in (1, 2):
            t0 = time.perf_counter()
            proof, _, _ = prove_wide_fibonacci(
                log_n_rows=log_rows, sequence_length=seq, mesh=mesh,
                seed=seed)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        blob = json.dumps(proof_to_dict(proof), sort_keys=True)
        if ref_bytes is None:
            ref_bytes = blob
        assert blob == ref_bytes, f"proof mismatch on mesh {name}"
        rows.append((name, best))
        print(f"mesh {name:>22}: {best:7.3f} s  "
              f"(overhead {best / rows[0][1]:5.2f}x vs single)", flush=True)
    print("proofs byte-identical across all meshes: OK")


if __name__ == "__main__":
    main()
