"""tstwo_tpu: a TPU-native Circle-STARK proving framework.

A from-scratch JAX/XLA/Pallas implementation of the Circle-STARK stack
(Mersenne-31 field towers, circle FFT, FRI, Merkle commitments, Fiat-Shamir,
AIR constraint evaluation, GKR/LogUp lookups) with the capability surface of
the reference TypeScript port of StarkWare's stwo prover.

Layers:
  fields / circle          host scalar spine (exact Python ints)
  ops                      device array kernels (jnp uint32 + Pallas)
  poly                     circle/line polynomials, twiddles, CFFT
  channel / vcs            Fiat-Shamir + Merkle commitments
  fri / pcs                low-degree test + polynomial commitment scheme
  air / constraint_framework  AIR components and constraint evaluation
  prover                   prove() / verify() orchestration
  parallel                 multi-chip sharding (mesh, sharded CFFT)
"""

from .fields import M31, CM31, QM31, P, SECURE_EXTENSION_DEGREE  # noqa: F401

__version__ = "0.1.0"
