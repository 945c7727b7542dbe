"""Device-side array kernels (jnp uint32; Pallas variants in ops.pallas)."""

import os

import jax

# XLA compiles are expensive; persist them across processes.  Harmless on
# fast boxes, essential on small CI hosts.  Disable with TSTWO_NO_COMP_CACHE=1.
if not os.environ.get("TSTWO_NO_COMP_CACHE"):
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("TSTWO_COMP_CACHE_DIR",
                       os.path.expanduser("~/.cache/jax_comp_cache")),
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from . import m31, cm31, qm31  # noqa: F401,E402
