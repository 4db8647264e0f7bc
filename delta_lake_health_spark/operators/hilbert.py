"""Hilbert-curve space-filling index (SURVEY §2.1 D73 — the OPTIMIZE
clustering alternative to Z-order).

Z-order (bit interleave) is cheap but its curve JUMPS: adjacent z-values
can be far apart in space at every power-of-two boundary, so per-file
min/max bounding boxes are looser than they need to be. The Hilbert
curve visits every cell of the grid while moving ONE grid step at a
time (the defining adjacency property, asserted exhaustively in
tests/test_hilbert.py), which is why Delta/Databricks moved liquid
clustering onto it: tighter per-file bounding boxes => more files
pruned per range predicate.

``hilbert_index`` implements Skilling's transpose algorithm
("Programming the Hilbert curve", AIP Conf. Proc. 707, 2004 — public
domain) VECTORIZED over numpy arrays: the per-bit exchange/invert
steps become boolean-mask array ops, so a million rows cost a few
hundred array operations, no per-row Python. The Spark integration
(``operators/maintenance.hilbert_cluster``) scales each cluster column
to a ``bits``-wide integer (same min/max affine coding as the Z-order
path) and computes the key inside Arrow-batched ``mapInPandas`` — the
one place a pandas stage is justified: the data-dependent per-bit
swaps have no Column-expression form that Catalyst could hold (the
expression tree doubles per step), and a clustering REWRITE is
IO-bound anyway.
"""

from __future__ import annotations

import numpy as np


def hilbert_index(codes: np.ndarray, bits: int) -> np.ndarray:
    """Hilbert curve index for each row of ``codes`` (shape (n_rows,
    n_dims), integer grid coordinates in [0, 2^bits)). Returns uint64
    indexes in [0, 2^(bits*n_dims)). Vectorized Skilling transform:
    axes -> transposed Gray representation -> interleaved index."""
    x = codes.astype(np.uint64).copy()
    n_rows, n = x.shape
    if bits * n > 63:
        raise ValueError(f"bits*dims = {bits * n} exceeds the 63-bit key")

    # --- AxestoTranspose (Skilling), mask-vectorized -------------------
    q = np.uint64(1) << np.uint64(bits - 1)
    one = np.uint64(1)
    while q > one:
        p = q - one
        for i in range(n):
            inv = (x[:, i] & q) != 0
            # invert low bits of x[:, 0] where the q-bit is set ...
            x[inv, 0] ^= p
            # ... otherwise exchange the low bits of x[:, 0] and x[:, i]
            t = (x[~inv, 0] ^ x[~inv, i]) & p
            x[~inv, 0] ^= t
            x[~inv, i] ^= t
        q >>= one

    # --- Gray encode ----------------------------------------------------
    for i in range(1, n):
        x[:, i] ^= x[:, i - 1]
    t = np.zeros(n_rows, dtype=np.uint64)
    q = np.uint64(1) << np.uint64(bits - 1)
    while q > one:
        hit = (x[:, n - 1] & q) != 0
        t[hit] ^= q - one
        q >>= one
    for i in range(n):
        x[:, i] ^= t

    # --- interleave the transposed bits into one index -------------------
    # Transpose convention: X[0] carries the MOST significant bit of each
    # group of n output bits.
    out = np.zeros(n_rows, dtype=np.uint64)
    for b in range(bits - 1, -1, -1):
        for i in range(n):
            out = (out << one) | ((x[:, i] >> np.uint64(b)) & one)
    return out


def hilbert_index_reference(coords: list[int], bits: int) -> int:
    """Per-row pure-Python reference (straight transcription of
    Skilling's scalar loops) — the independent ground truth the
    vectorized form is tested against."""
    x = list(coords)
    n = len(x)
    q = 1 << (bits - 1)
    while q > 1:
        p = q - 1
        for i in range(n):
            if x[i] & q:
                x[0] ^= p
            else:
                t = (x[0] ^ x[i]) & p
                x[0] ^= t
                x[i] ^= t
        q >>= 1
    for i in range(1, n):
        x[i] ^= x[i - 1]
    t = 0
    q = 1 << (bits - 1)
    while q > 1:
        if x[n - 1] & q:
            t ^= q - 1
        q >>= 1
    for i in range(n):
        x[i] ^= t
    out = 0
    for b in range(bits - 1, -1, -1):
        for i in range(n):
            out = (out << 1) | ((x[i] >> b) & 1)
    return out
