"""Phase-scoped tracing for the prover pipeline.

The Rust reference wraps each prove phase in `tracing` spans ("Commitment",
"Evaluate columns out of domain", "Grind", ... -- embedded in reference
pcs/prover.ts:44-226); the TS port only has console.info.  Here spans are a
lightweight context manager collecting wall time per phase, with an
optional hook into jax.profiler.TraceAnnotation so phases show up in TPU
profiles.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, List, Optional

_enabled = False
_records: List[dict] = []
_totals: Dict[str, float] = defaultdict(float)
_use_jax_profiler = False


def enable(use_jax_profiler: bool = False) -> None:
    global _enabled, _use_jax_profiler
    _enabled = True
    _use_jax_profiler = use_jax_profiler


def disable() -> None:
    global _enabled
    _enabled = False


def reset() -> None:
    _records.clear()
    _totals.clear()


def records() -> List[dict]:
    return list(_records)


def totals() -> Dict[str, float]:
    return dict(_totals)


@contextlib.contextmanager
def span(name: str):
    """Phase span; no-op unless tracing is enabled."""
    if not _enabled:
        yield
        return
    ctx = contextlib.nullcontext()
    if _use_jax_profiler:
        import jax.profiler

        ctx = jax.profiler.TraceAnnotation(name)
    t0 = time.perf_counter()
    with ctx:
        yield
    dt = time.perf_counter() - t0
    _records.append({"name": name, "seconds": dt, "t0": t0})
    _totals[name] += dt


def report() -> str:
    lines = ["phase timings:"]
    for name, total in sorted(_totals.items(), key=lambda kv: -kv[1]):
        lines.append(f"  {name:<40s} {total * 1e3:10.2f} ms")
    return "\n".join(lines)
