"""Deterministic KMV (k-minimum-values / bottom-k) distinct sketch
(Bar-Yossef et al. 2002; the theta-sketch family of Apache DataSketches)
for SET-OPERATION cardinality estimates (SURVEY §2.65).

Why another distinct sketch when HLL (operators/hll.py) exists: HLL
registers support union only — there is no sound HLL intersection, and
inclusion-exclusion error explodes with small overlaps. A KMV sketch is
the set of the K smallest distinct hash values; because that set is a
uniform sample of the hashed universe below a known threshold, two
sketches support union, INTERSECTION, and Jaccard estimates directly —
"how many users do these two segments share" at 100 TB without a
distinct-distinct join.

State: a sorted uint64 array, ≤ K entries. ``union`` (merge-unique,
keep K smallest) is associative, commutative, idempotent — so
per-partition sketches combine order-invariantly into exactly the
sketch of the whole stream; below K distinct values the sketch IS the
exact distinct set.

Determinism: SplitMix64 over the raw int64 key (operators/cms.py), no
RNG — two engines or two passes produce identical sketches.

Estimators (k-th smallest hash = threshold t, universe U = 2^64):
- distinct(A)  = (K - 1) / (t / U)           (exact when |A| < K)
- jaccard(A,B) = |A∩B restricted to the K smallest of A∪B| / K
- inter(A,B)   = jaccard * distinct(A∪B)
Relative error ~ 1/sqrt(K) (K=1024 → ~3%).
"""

from __future__ import annotations

import numpy as np

from delta_lake_health_spark.operators.cms import _splitmix64

K = 1024
_U = float(2**64)


def hash_i64(values) -> np.ndarray:
    """int64 keys -> uniform uint64 hashes (bit-pattern view, SplitMix64)."""
    return _splitmix64(np.asarray(values, dtype=np.int64).view(np.uint64))


def sketch(hashes_u64, k: int = K) -> np.ndarray:
    """The k smallest DISTINCT hash values, sorted ascending."""
    u = np.unique(np.asarray(hashes_u64, dtype=np.uint64))  # sorts
    return u[:k]


def union(a: np.ndarray, b: np.ndarray, k: int = K) -> np.ndarray:
    """Sketch of the union stream: merge-unique, keep the k smallest."""
    return np.unique(np.concatenate([a, b]))[:k]


def estimate(sk: np.ndarray, k: int = K) -> float:
    """Estimated distinct count (exact below k)."""
    if len(sk) < k:
        return float(len(sk))
    t = float(sk[k - 1]) + 1.0  # threshold: values strictly below count
    return (k - 1) / (t / _U)


def intersect_estimate(
    a: np.ndarray, b: np.ndarray, k: int = K
) -> tuple[float, float]:
    """(estimated |A∩B|, estimated Jaccard). Theta-style: restrict both
    sketches to the union sketch's threshold, count common values among
    the union's k smallest."""
    u = union(a, b, k)
    if len(u) == 0:
        return 0.0, 0.0
    common = np.intersect1d(a, b, assume_unique=True)
    in_window = common[common <= u[-1]]
    jac = len(in_window) / float(len(u))
    return jac * estimate(u, k), jac
