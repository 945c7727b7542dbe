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
# MUST be set before jax import, not just config.update after: once the
# axon plugin initializes, even XLA:CPU programs compile through the
# REMOTE compile helper (the "compile machine features don't match host"
# warnings), where some programs (e.g. the unrolled blake2s compress in
# pallas interpret mode) hang for minutes; with the env var set first the
# plugin stays dormant and CPU compiles run locally (~2 s for the same
# program).  Discovered round 4 after two suite runs "hung" at 54%.
# The driver environment exports JAX_PLATFORMS=axon, so a plain setdefault
# would silently tunnel the whole suite to the TPU; instead the override
# is gated on an explicit opt-out so deliberate on-device suite runs stay
# possible: TSTWO_TEST_PLATFORM=axon pytest ...  (ADVICE r4).
os.environ["JAX_PLATFORMS"] = os.environ.get("TSTWO_TEST_PLATFORM", "cpu")

import jax

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

# Persistent compilation cache: the jitted Poseidon252 Hades permutation
# takes ~1 min of XLA CPU compile; cache it (and everything else slow)
# across test runs.  The default jax_compilation_cache_dir is None (there
# is no out-of-the-box cache), so set it explicitly -- BUT this
# environment's axon sitecustomize re-points the cache to
# ~/.cache/jax_comp_cache at plugin load (discovered round 4: entries
# land there regardless of this config; that is why r2's conftest
# concluded the override "did not take effect").  Either location is
# fine -- the global one even persists across rounds -- so configure
# ours and accept both in the sanity check below.
_cache_dirs = [
    os.path.expanduser("~/.cache/jax_comp_cache"),
]
# Use the SAME directory the axon sitecustomize uses for every non-pytest
# run: pointing pytest at a repo-local dir forked the cache, so programs
# long since compiled elsewhere (e.g. the pathological XLA:CPU compile of
# the unrolled blake2s compress, minutes long) recompiled inside the
# suite and looked like hangs.
jax.config.update("jax_compilation_cache_dir", _cache_dirs[0])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def pytest_sessionfinish(session, exitstatus):
    # The cache silently not populating cost entire rounds of recompiles;
    # FAIL (not warn) if it regresses.  (VERDICT r3 next-round #7.)  Small
    # selections may legitimately compile nothing in-process, so only
    # enforce on substantial runs.
    populated = any(os.path.isdir(d) and os.listdir(d) for d in _cache_dirs)
    if session.testscollected >= 50 and not populated:
        print("ERROR: jax compilation cache is empty after the session",
              file=sys.stderr)
        session.exitstatus = 1


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
