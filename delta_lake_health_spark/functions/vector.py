"""Vector math over ``array<double>`` columns — sequential left-to-right
array folds, chosen deliberately: DuckDB's ``list_dot_product`` folds the
same way, so cosine/dot results are bit-identical between the engine and
the SQL oracles.

Usage note for pair joins: ``l2_norm`` is per-VECTOR — materialize it as a
column BEFORE joining (see plans/similarity.py) so the fold runs
O(vectors), not O(pairs).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double_array(col: str) -> Column:
    """Cast array<float> to array<double> (all fold math is in double)."""
    return F.expr(f"transform({col}, x -> CAST(x AS double))")


def dot(a: str, b: str) -> Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"
    )


def l2_norm(a: str) -> Column:
    return F.sqrt(
        F.expr(f"aggregate(transform({a}, x -> x * x), 0D, (acc, v) -> acc + v)")
    )


def cosine(a: str, b: str) -> Column:
    """Cosine with inline norms — fine for one-off pairs; for pair joins
    precompute ``l2_norm`` per side instead."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
