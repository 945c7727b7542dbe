"""Index permutation helpers shared across the stack (host side).

reference: packages/core/src/utils.ts
"""
from __future__ import annotations

from typing import List, Sequence

import numpy as np


def bit_reverse_index(i: int, log_size: int) -> int:
    """Reverse the low `log_size` bits of i (reference utils.ts:15-22)."""
    if log_size == 0:
        return i
    return int(format(i, f"0{log_size}b")[::-1], 2)


def bit_reverse_permutation(log_size: int) -> np.ndarray:
    """perm[j] = bitrev(j); out = in[perm] converts natural <-> bit-reversed."""
    n = 1 << log_size
    idx = np.arange(n, dtype=np.int64)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(log_size):
        rev |= ((idx >> b) & 1) << (log_size - 1 - b)
    return rev


def bit_reverse_list(values: list) -> list:
    """Return values permuted into bit-reversed order."""
    n = len(values)
    if n & (n - 1):
        raise ValueError("length must be a power of two")
    log = n.bit_length() - 1
    perm = bit_reverse_permutation(log)
    return [values[int(p)] for p in perm]


def offset_bit_reversed_circle_domain_index(
    i: int, domain_log_size: int, eval_log_size: int, offset: int
) -> int:
    """reference utils.ts:109-126."""
    prev_index = bit_reverse_index(i, eval_log_size)
    half_size = 1 << (eval_log_size - 1)
    step_size = offset * (1 << (eval_log_size - domain_log_size - 1))
    if prev_index < half_size:
        prev_index = (prev_index + step_size) % half_size
    else:
        prev_index = (prev_index - step_size) % half_size + half_size
    return bit_reverse_index(prev_index, eval_log_size)


def previous_bit_reversed_circle_domain_index(
    i: int, domain_log_size: int, eval_log_size: int
) -> int:
    return offset_bit_reversed_circle_domain_index(i, domain_log_size, eval_log_size, -1)


def coset_index_to_circle_domain_index(coset_index: int, log_domain_size: int) -> int:
    """reference utils.ts:175-183."""
    if coset_index % 2 == 0:
        return coset_index // 2
    return ((2 << log_domain_size) - coset_index) >> 1


def circle_domain_index_to_coset_index(circle_index: int, log_domain_size: int) -> int:
    n = 1 << log_domain_size
    if circle_index < n // 2:
        return circle_index * 2
    return (n - 1 - circle_index) * 2 + 1


def to_host(x) -> np.ndarray:
    """Device->host fetch that also works under jax.distributed.

    In a multi-process (multi-controller) run, arrays produced by GSPMD
    programs over a global mesh may not be fully addressable from this
    process; np.asarray on them raises.  Every process runs the identical
    deterministic prove, so an all-gather is safe and gives every host the
    full value (SURVEY §5: Fiat-Shamir state replicated on all hosts)."""
    import jax

    if (isinstance(x, jax.Array) and not x.is_fully_addressable
            and not x.is_fully_replicated):
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


# FetchBatch + padded_take live in utils_fetch.py (deferred transfers AND
# deferred gathers, fused into one dispatch + one fetch at materialize).
from .utils_fetch import (FetchBatch, GatherPool,  # noqa: E402,F401
                          padded_take)
