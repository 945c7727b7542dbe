"""Test configuration: run JAX on CPU with a virtual 8-device mesh.

Real-TPU execution is exercised by bench.py and __graft_entry__.py; unit
tests validate semantics on the CPU backend (identical XLA programs).
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
