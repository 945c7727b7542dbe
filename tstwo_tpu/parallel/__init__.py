"""Multi-chip distribution: device mesh + sharded CFFT/column kernels.

The reference is single-threaded; its cached-FFT split
(reference backend/simd/fft/index.ts:39-66 transposeVecs) is the structural
hook that generalizes to the cross-chip all-to-all here (SURVEY.md section
2.12).  Columns are sharded on the point axis over a 1-D 'chips' mesh
(ICI); Fiat-Shamir state is replicated host-side (deterministic, no comm).
"""

from .mesh import make_mesh  # noqa: F401
