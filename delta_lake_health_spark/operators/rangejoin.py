"""Bucketized interval/range join — the scalable form of
``point BETWEEN start AND end`` joins.

Spark compiles a raw range join (equi-key + BETWEEN) into a shuffle join
whose range predicate is applied AFTER the key join — fine — but with no
equi-key at all, or a hot key, it degenerates to a nested-loop over the
pair set. The bucketized form turns the range predicate itself into an
equi-join: each interval explodes to the coarse time buckets it covers,
each point maps to its single bucket, and the join key becomes
``(key, bucket)`` — a plain hash join whose fan-out is bounded by
interval_duration / bucket width. A point's bucket intersects a covering
interval exactly once, so no dedup pass is needed.

This is the classic time-bucket trick from streaming/temporal systems
(e.g. interval joins in Flink and range-join optimization in Spark on
Databricks, both public documentation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_point_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket: int,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row (same ``on`` key) with
    ``start_ts <= point_ts <= end_ts``. Timestamps are numeric (e.g.
    epoch micros); ``bucket`` is the bucket width in the same unit —
    choose it near the typical interval length so the explode fan-out
    stays small.

    Output: all point columns + all interval columns (minus the join
    keys' duplicates). ``how='left'`` keeps unmatched points.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"interval_point_join supports inner/left, got {how!r}")
    ivl = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                (F.col(start_ts) / bucket).cast("long"),
                (F.col(end_ts) / bucket).cast("long"),
            )
        ),
    )
    pts = points.withColumn("_bucket", (F.col(point_ts) / bucket).cast("long"))
    if how == "left":
        # unmatched points are recovered by anti-joining on a unique row
        # id, NOT on the point columns: under SQL equality a matched row
        # containing a NULL never equals itself, so it would be emitted
        # twice (once matched, once as an unmatched null-padded row).
        # localCheckpoint pins the non-deterministic ids so both branches
        # see the same values under recompute/AQE.
        pts = pts.withColumn(
            "_pt_id", F.monotonically_increasing_id()
        ).localCheckpoint()
    cond = (F.col(point_ts) >= F.col(start_ts)) & (
        F.col(point_ts) <= F.col(end_ts)
    )
    joined = pts.join(ivl, [*on, "_bucket"], how="inner").where(cond)
    if how == "left":
        matched = joined
        unmatched = pts.join(
            matched.select("_pt_id").distinct(), "_pt_id", "left_anti"
        )
        for c in ivl.columns:
            if c not in unmatched.columns:
                unmatched = unmatched.withColumn(
                    c, F.lit(None).cast(ivl.schema[c].dataType)
                )
        joined = matched.unionByName(unmatched.select(*matched.columns)).drop(
            "_pt_id"
        )
    return joined.drop("_bucket")
