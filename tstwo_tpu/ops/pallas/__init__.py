"""Pallas TPU kernels for the hot compute paths.

These fuse work that XLA would otherwise stream through HBM layer by
layer.  Each kernel has a jnp twin in tstwo_tpu.ops used as the
correctness oracle; tests run the kernels in interpreter mode on CPU and
the bench exercises them compiled on TPU.
"""
from __future__ import annotations

import jax


def on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False
