"""Deterministic HyperLogLog core shared by the batch and streaming
windowed approx-distinct operators (SURVEY §2.65 / §2.3).

Why hand-rolled when ``approx_count_distinct`` exists: the built-in's
sketch lives inside the JVM aggregate and can't be (a) carried as
explicit *state* in ``applyInPandasWithState`` or (b) reproduced
bit-for-bit by a second path. This implementation hashes with a fixed
SplitMix64 mixer over numpy uint64 arrays, so a batch pass and a
streaming pass over the same rows produce the SAME register array and
the SAME estimate — which is what lets ``tests/test_streaming.py``
assert exact batch/stream parity instead of "both are roughly right".

Scale design: one ``2**P``-byte register array per group key (4 KiB at
P=12, ~0.8% typical error) — fixed-size mergeable state, the property
that makes distinct-counting feasible at 100 TB where exact
``COUNT(DISTINCT)`` needs a cardinality-sized shuffle. Updates are
vectorized numpy over Arrow batches; no per-row Python.

Reference parity: the reference repo has no sketch/streaming surface
(delta-rs + Polars health toolkit); this is part of the
beyond-reference pipeline surface the brief requires.
"""

from __future__ import annotations

import numpy as np

P = 12  # register index bits
M = 1 << P  # number of registers
_ALPHA = 0.7213 / (1 + 1.079 / M)  # bias constant for m >= 128


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Fixed 64-bit mixer (SplitMix64 finalizer) — deterministic,
    vectorized, avalanche-quality hashing of integer keys."""
    z = x.astype(np.uint64, copy=True)
    z += np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _bit_length(v: np.ndarray) -> np.ndarray:
    """Vectorized exact bit_length for uint64 (binary-search shifts —
    no float log2, whose rounding misbehaves above 2**52)."""
    v = v.copy()
    out = np.zeros(v.shape, np.uint64)
    for s in (32, 16, 8, 4, 2, 1):
        big = v >= (np.uint64(1) << np.uint64(s))
        out[big] += np.uint64(s)
        v[big] >>= np.uint64(s)
    out[v > 0] += np.uint64(1)
    return out


def update_registers(registers: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Fold integer ``keys`` into a ``(M,)`` uint8 register array
    (max-merge). Returns the same array, mutated."""
    h = _splitmix64(np.asarray(keys, dtype=np.uint64))
    idx = (h >> np.uint64(64 - P)).astype(np.int64)
    rest = (h << np.uint64(P)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    # rank = leading zeros of the remaining 64-P bits + 1
    rank = (np.uint64(64 - P) - _bit_length(rest >> np.uint64(P))
            + np.uint64(1)).astype(np.uint8)
    # per-index max: sort by (idx, rank) then keep the last per idx
    order = np.lexsort((rank, idx))
    idx_s, rank_s = idx[order], rank[order]
    last = np.r_[idx_s[1:] != idx_s[:-1], True]
    ui, ur = idx_s[last], rank_s[last]
    registers[ui] = np.maximum(registers[ui], ur)
    return registers


def merge_registers(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Mergeable-state property: max of two register arrays is the
    sketch of the union."""
    return np.maximum(a, b)


def estimate(registers: np.ndarray) -> int:
    """Classic HLL estimator with the small-range linear-counting
    correction (deterministic given the registers)."""
    r = registers.astype(np.float64)
    e = _ALPHA * M * M / np.sum(np.exp2(-r))
    zeros = int(np.count_nonzero(registers == 0))
    if e <= 2.5 * M and zeros > 0:
        e = M * np.log(M / zeros)
    return int(round(e))


def empty_registers() -> np.ndarray:
    return np.zeros(M, dtype=np.uint8)
