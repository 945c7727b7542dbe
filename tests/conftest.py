"""Test configuration: run JAX on CPU with a virtual 8-device mesh.

This environment force-registers the 'axon' (remote TPU tunnel) platform
regardless of JAX_PLATFORMS in the environment, so we must override the
config value after import -- otherwise every test compiles and executes
over the TPU tunnel (~45-90s per compile).  Real-TPU execution is
exercised by bench.py and __graft_entry__.py.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
