"""Deterministic Bloom filter (Bloom 1970) for incremental-dedup
prefiltering (SURVEY §2.65).

Why a Bloom filter when a semi-join exists: checking a new batch against
a 100 TB historical corpus with a join shuffles the corpus (or at best
scans it per batch). A Bloom filter built ONCE over the corpus is a
fixed-size bitmap (default 1 MiB) that broadcasts to every executor;
probing it is a local vectorized lookup with **zero false negatives** —
so it can only over-approximate the candidate set, and a cheap exact
verification join on the (tiny) surviving candidates restores exactness.
The corpus itself never shuffles.

State is a uint64 word array; ``merge`` is bitwise OR, so per-partition
filters combine order-invariantly into exactly the filter of the whole
corpus — the same additive-state property the CMS (operators/cms.py) and
HLL (operators/hll.py) sketches rely on.

Determinism: K index hashes via SplitMix64 over fixed seeds on uint64
keys (strings first folded with the byte-wise FNV-1a from
operators/cms.py); no RNG, no platform dependence.

False-positive rate for n keys in m bits with k hashes:
(1 - e^(-kn/m))^k — defaults m=2^23, k=6 give ~7e-4 at n=500k.
"""

from __future__ import annotations

import numpy as np

from delta_lake_health_spark.operators.cms import _splitmix64, hash_strings

__all__ = ["new_filter", "add", "merge", "contains", "hash_strings", "M_BITS", "K"]

M_BITS = 1 << 23  # filter size in bits (1 MiB)
K = 6  # hash functions
_SEEDS = np.array(
    [0x452821E638D01377, 0xBE5466CF34E90C6C, 0xC0AC29B7C97C50DD,
     0x3F84D5B5B5470917, 0x9216D5D98979FB1B, 0xD1310BA698DFB5AC],
    dtype=np.uint64,
)


def new_filter(m_bits: int = M_BITS) -> np.ndarray:
    """Empty filter: m_bits bits as uint64 words."""
    return np.zeros(m_bits // 64, dtype=np.uint64)


def _positions(keys_u64: np.ndarray, m_bits: int) -> np.ndarray:
    """(K, n) bit positions for each key."""
    keys = np.asarray(keys_u64, dtype=np.uint64)
    return np.stack(
        [
            (_splitmix64(keys ^ _SEEDS[j]) % np.uint64(m_bits)).astype(np.int64)
            for j in range(K)
        ]
    )


def add(filt: np.ndarray, keys_u64: np.ndarray) -> np.ndarray:
    if len(keys_u64) == 0:
        return filt
    pos = _positions(keys_u64, len(filt) * 64)
    words, bits = pos >> 6, pos & 63
    np.bitwise_or.at(filt, words, np.uint64(1) << bits.astype(np.uint64))
    return filt


def merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """OR-state: the merge of two filters is the filter of the
    concatenated key streams (order-invariant, idempotent)."""
    return a | b


def contains(filt: np.ndarray, keys_u64: np.ndarray) -> np.ndarray:
    """Vectorized membership probe: True iff every one of the K bits is
    set. Guaranteed True for every added key (no false negatives);
    spuriously True with probability ~(1-e^(-kn/m))^k."""
    if len(keys_u64) == 0:
        return np.zeros(0, dtype=bool)
    pos = _positions(keys_u64, len(filt) * 64)
    words, bits = pos >> 6, pos & 63
    hit = (filt[words] >> bits.astype(np.uint64)) & np.uint64(1)
    return hit.all(axis=0).astype(bool)
