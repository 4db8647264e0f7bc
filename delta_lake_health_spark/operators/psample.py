"""Deterministic bottom-k-by-hash quantile sketch (SURVEY §2.65 K6).

Reference family: bottom-k / priority sampling (Duffield, Lund, Thorup
2007 — "Priority sampling for estimation of arbitrary subset sums";
here the uniform-weight case, where priority sampling degenerates to a
bottom-k-by-hash uniform row sample) applied to quantile estimation.

Why another quantile sketch when GK (``percentile_approx``) exists: GK
and t-digest are both INSERTION-ORDER-SENSITIVE — two partitionings of
the same rows produce different digests, so batch and stream disagree
and cross-run results drift. The bottom-k-by-hash sample is
ORDER-INVARIANT and EXACTLY mergeable: the k globally smallest row
hashes are a deterministic set, and each is some partition's local
bottom-k member, so merging per-partition bottom-ks reconstructs the
global sketch bit-for-bit under ANY partitioning (the KMV covering
argument). Below k rows the sketch IS the data and quantiles are exact.

State: k (hash, value) pairs sorted by hash. Rank error of a quantile
from a uniform n-sample ~ 1/(2·sqrt(n)): K=2048 → ~1.1% expected, ~3%
at 3 sigma.

Determinism: SplitMix64 over the row key (no RNG) — the same rows give
the same sketch on any engine, any partitioning, any pass count.
"""

from __future__ import annotations

import numpy as np

from delta_lake_health_spark.operators.cms import _splitmix64

K = 2048


def hash_keys(keys) -> np.ndarray:
    """int64 row keys -> uniform uint64 priorities (SplitMix64)."""
    return _splitmix64(np.asarray(keys, dtype=np.int64).view(np.uint64))


def _bottom_k(h: np.ndarray, v: np.ndarray, k: int):
    """Dedupe equal hashes (smallest value wins — a DETERMINISTIC
    tie-break, so merge order can never matter) and keep the k smallest."""
    order = np.lexsort((v, h))
    h, v = h[order], v[order]
    hu, idx = np.unique(h, return_index=True)
    take = min(k, len(hu))
    return hu[:take], v[idx[:take]]


def sketch(keys, values, k: int = K) -> tuple[np.ndarray, np.ndarray]:
    """Bottom-k rows by hashed key → (hashes sorted asc, aligned
    values). Duplicate keys keep one row (idempotent under replay);
    ties on hash keep the smallest value."""
    return _bottom_k(
        hash_keys(keys), np.asarray(values, dtype=np.float64), k
    )


def union(
    a: tuple[np.ndarray, np.ndarray],
    b: tuple[np.ndarray, np.ndarray],
    k: int = K,
) -> tuple[np.ndarray, np.ndarray]:
    """Sketch of the union stream: merge by hash, keep the k smallest.
    Associative, commutative, idempotent — order-invariant merges (the
    min-value tie-break makes equal-hash conflicts operand-order-free)."""
    return _bottom_k(
        np.concatenate([a[0], b[0]]),
        np.concatenate([a[1], b[1]]),
        k,
    )


def quantiles(sk: tuple[np.ndarray, np.ndarray], qs) -> list[float]:
    """Nearest-rank quantiles of the sampled values (exact when the
    stream had <= k rows, ~1/(2*sqrt(k)) rank error otherwise)."""
    vals = np.sort(sk[1])
    if len(vals) == 0:
        return [float("nan") for _ in qs]
    out = []
    for q in qs:
        r = min(len(vals) - 1, max(0, int(np.ceil(q * len(vals))) - 1))
        out.append(float(vals[r]))
    return out
