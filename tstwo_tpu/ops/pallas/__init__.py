"""Pallas TPU kernels for the hot compute paths.

These fuse work that XLA would otherwise stream through HBM layer by
layer.  Each kernel has a jnp twin in tstwo_tpu.ops used as the
correctness oracle; tests/test_pallas.py runs every kernel in interpreter
mode against its twin.

Dispatch status (measured on TPU v5e, scripts/measure_fft_large.py,
results in PERF.md):
  * fft_kernels.fft_large (two-stage blocked CFFT) IS on the hot path --
    ops/fft.py dispatches to it for single columns >= 2^22 on TPU, where
    it measures 2478 Mpts/s vs 1513 for the XLA path at 2^24.
  * fft_kernels.fft_fused (single-residency CFFT) is kept as a reference
    kernel: XLA matches it everywhere it fits in VMEM (<= 2^16, all
    dispatch-latency-bound at ~2.3 ms on the tunneled chip), so it is NOT
    dispatched.
  * m31_kernels.mul/mul_chain are measurement kernels for the roofline
    study (PERF.md); the jnp m31 ops compile to the same VPU code, so
    they are NOT dispatched either.
"""
from __future__ import annotations

import jax


def on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False
