"""Skew mitigation: salted aggregation and salted broadcast-free joins.

AQE's skew-join splitting handles most runtime skew, but two patterns
still need explicit salting at 100 TB:

- a groupBy whose hot key concentrates >1 executor-worth of rows → the
  two-phase salted aggregate spreads the hot key over ``n_salts``
  partial groups, then merges the partials (both phases map-side
  combinable);
- a shuffle join where one side's hot key would overflow a single task →
  salt the skewed side, explode the other side over all salt values.

Both transforms are semantics-preserving (pytest asserts equality against
the unsalted plan); the salt column is derived from a hash of the whole
row, so it is deterministic — no RNG, reruns produce identical partials.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 16


def _salt_col(df: DataFrame, n_salts: int) -> Column:
    # deterministic per-row salt: hash of all columns modulo n_salts
    return F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salts))


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, str],
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Two-phase salted aggregation for count/sum/min/max (the
    re-aggregable functions). ``aggs`` maps output column -> "fn(col)"
    e.g. {"n": "count(*)", "total": "sum(value)"}.

    Phase 1 groups by (salt, keys) — the hot key becomes n_salts groups of
    bounded size; phase 2 merges partials per key. Both phases get
    map-side partial aggregation from Catalyst, so the extra phase costs
    one small shuffle of |keys| x n_salts rows.
    """
    merge_fn = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}
    phase1_exprs, phase2_exprs = [], []
    for out, spec in aggs.items():
        fn, _, col = spec.partition("(")
        fn = fn.strip().lower()
        col = col.rstrip(")").strip()
        if fn not in merge_fn:
            raise ValueError(f"{fn!r} is not re-aggregable; use plain groupBy")
        arg = F.lit(1) if col in ("*", "1") else F.col(col)
        phase1_exprs.append(
            (F.count(arg) if fn == "count" else getattr(F, fn)(arg)).alias(out)
        )
        phase2_exprs.append(getattr(F, merge_fn[fn])(out).alias(out))
    salted = df.withColumn("_salt", _salt_col(df, n_salts))
    partial = salted.groupBy("_salt", *group_cols).agg(*phase1_exprs)
    return partial.groupBy(*group_cols).agg(*phase2_exprs)


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    n_salts: int = DEFAULT_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed`` has hot join keys: salt the skewed side
    (splitting each hot key into n_salts sub-partitions) and replicate
    ``other`` across all salt values, joining on (keys, salt). Output
    equals the plain join; the hot key's rows now spread over n_salts
    tasks. Replication multiplies the other side n_salts-fold — use when
    ``other`` is far smaller than the skewed side but too big (or too
    skewed) to broadcast.

    Only join types that never emit unmatched ``other`` rows are allowed:
    replicating ``other`` n_salts-fold would duplicate every unmatched
    right row under right/full outer semantics."""
    allowed = ("inner", "left", "leftouter", "left_outer", "left_semi",
               "leftsemi", "left_anti", "leftanti", "semi", "anti")
    if how not in allowed:
        raise ValueError(
            f"salted_join does not support how={how!r}; the replicated side "
            f"would emit unmatched rows n_salts times (allowed: inner/left/"
            f"left_semi/left_anti)"
        )
    s = skewed.withColumn("_salt", _salt_col(skewed, n_salts))
    o = other.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    joined = s.join(o, [*on, "_salt"], how)
    return joined.drop("_salt")
