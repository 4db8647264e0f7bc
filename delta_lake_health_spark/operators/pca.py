"""Distributed PCA over an embedding column (SURVEY §2.5 S11).

Why this shape at 100 TB: the covariance of N vectors of dimension d is
an N-independent d x d matrix (d=64 here → 32 KiB), so the scalable fit
is ONE ``mapInPandas`` pass that accumulates per-partition
(count, sum, X^T X) with numpy, a driver-side combine of the tiny
per-partition moments, and one ``numpy.linalg.eigh`` on the d x d
covariance — no iteration over the data, no shuffle of vectors.
Projection then broadcasts the (d x k) component matrix and maps each
partition with a single matmul. This is the standard whitening /
dimensionality-reduction front end for embedding dedup (SemDeDup-style
clustering converges faster in decorrelated space) and for the IVF/PQ
indexes, whose codebooks train better on decorrelated residuals.

Determinism: moments accumulate in float64; the combine is a sum over
per-partition matrices whose addition order follows the sorted partition
id, and ``eigh`` is deterministic for a given input — so fit results are
stable run-to-run on the same data. Signs of eigenvectors are fixed by
forcing the largest-magnitude entry of each component non-negative.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class PCAModel:
    mean: np.ndarray          # (d,)
    components: np.ndarray    # (d, k) column-orthonormal
    explained: np.ndarray     # (k,) eigenvalue share of total variance
    n: int


def fit_pca(df: DataFrame, vec_col: str, k: int) -> PCAModel:
    """One-pass moment accumulation → d x d eigendecomposition."""
    first = df.select(F.size(vec_col).alias("d")).first()
    if first is None:
        raise ValueError("fit_pca: empty input")
    d = int(first.d)
    if not (0 < k <= d):
        raise ValueError(f"fit_pca: need 0 < k <= {d}, got {k}")

    def moments(batches):
        import pandas as pd

        n, s, xtx = 0, np.zeros(d), np.zeros((d, d))
        for pdf in batches:
            x = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            if x.size == 0:
                continue
            n += x.shape[0]
            s += x.sum(axis=0)
            xtx += x.T @ x
        yield pd.DataFrame(
            {
                "n": [n],
                "s": [s.tolist()],
                "xtx": [xtx.reshape(-1).tolist()],
            }
        )

    parts = df.select(vec_col).mapInPandas(
        moments, "n long, s array<double>, xtx array<double>"
    ).collect()
    n = sum(r.n for r in parts)
    if n == 0:
        raise ValueError("fit_pca: no vectors")
    s = np.zeros(d)
    xtx = np.zeros((d, d))
    # total combine order: (n, sum, xtx) is unique per distinct moment
    # set, so partitions with tying sums still combine deterministically
    for r in sorted(parts, key=lambda r: (r.n, r.s, r.xtx)):
        if r.n:
            s += np.asarray(r.s)
            xtx += np.asarray(r.xtx).reshape(d, d)
    mean = s / n
    cov = xtx / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order]
    # sign convention: largest-magnitude entry of each component >= 0
    flips = np.sign(comps[np.abs(comps).argmax(axis=0), np.arange(k)])
    flips[flips == 0] = 1.0
    comps = comps * flips
    total = float(np.clip(evals.sum(), 1e-300, None))
    return PCAModel(
        mean=mean,
        components=comps,
        explained=evals[order] / total,
        n=n,
    )


def project_pca(
    df: DataFrame, vec_col: str, model: PCAModel, out_col: str = "pca"
) -> DataFrame:
    """Append the k-dim projection: broadcast (mean, components), one
    matmul per Arrow batch — narrow, shuffle-free."""
    spark = df.sparkSession
    b = spark.sparkContext.broadcast(
        (model.mean.tolist(), model.components.tolist())
    )

    def proj(batches):
        mean, comps = b.value
        mean_a = np.asarray(mean)
        comps_a = np.asarray(comps)
        for pdf in batches:
            x = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            if x.size:
                y = (x - mean_a) @ comps_a
                pdf = pdf.assign(**{out_col: list(map(list, y))})
            else:
                pdf = pdf.assign(**{out_col: []})
            yield pdf

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    return df.mapInPandas(proj, f"{schema}, {out_col} array<double>")
