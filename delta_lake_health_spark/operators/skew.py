"""Partition-skewness operators.

Same semantics as the reference's ``DeltaPythonAnalyzer.analyze_skewness``
(reference: src/delta_lake_health/health_analyzers/delta_python_analyzer.py:33-88):

- ``max``     method: ``(max_count - min_count) / max_count``
- ``average`` method: mean absolute deviation of partition counts / mean

but computed Spark-first: the reference materialises the whole table into
pandas/Polars on one node and iterates partition counts in Python; here the
counts are ONE distributed ``groupBy`` (map-side partial agg) and the
normalised skew is ONE tiny second-stage aggregate over the per-partition
counts — the only thing that ever reaches the driver is the final scalar
row. That works unchanged at 100 TB: stage 1 shuffles |partitions| rows,
stage 2 reduces them to one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SKEW_THRESHOLD_DEFAULT = 0.1


def records_per_partition(df: DataFrame, partition_cols: list[str]) -> DataFrame:
    """(partition_key string, cnt long) — key rendering matches the
    reference: single column → plain str, multi column → str(tuple)."""
    if not partition_cols:
        raise ValueError("partition_cols must be non-empty")
    if len(partition_cols) == 1:
        key = F.col(partition_cols[0]).cast("string")
    else:
        key = F.concat(
            F.lit("("),
            F.concat_ws(
                ", ", *[F.concat(F.lit("'"), F.col(c).cast("string"), F.lit("'")) for c in partition_cols]
            ),
            F.lit(")"),
        )
    return (
        df.groupBy(key.alias("partition_key"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def skewness_agg(counts: DataFrame) -> DataFrame:
    """One-row DataFrame with both skew methods + partition count, from a
    (partition_key, cnt) DataFrame. Two-pass-free: mean is computed in the
    same aggregate via sum/count, abs-dev needs the mean first, so this is
    one extra tiny shuffle over |partitions| rows (never over data rows).
    """
    stats = counts.agg(
        F.max("cnt").alias("max_cnt"),
        F.min("cnt").alias("min_cnt"),
        F.avg("cnt").alias("mean_cnt"),
        F.count(F.lit(1)).alias("n_partitions"),
    )
    dev = (
        counts.join(F.broadcast(stats))
        .agg(
            F.avg(F.abs(F.col("cnt") - F.col("mean_cnt"))).alias("avg_abs_dev"),
            F.first("max_cnt").alias("max_cnt"),
            F.first("min_cnt").alias("min_cnt"),
            F.first("mean_cnt").alias("mean_cnt"),
            F.first("n_partitions").alias("n_partitions"),
        )
    )
    skew_max = F.when(
        (F.col("n_partitions") <= 1) | (F.col("max_cnt") == 0), F.lit(0.0)
    ).otherwise((F.col("max_cnt") - F.col("min_cnt")) / F.col("max_cnt"))
    skew_avg = F.when(
        (F.col("n_partitions") <= 1) | (F.col("mean_cnt") == 0), F.lit(0.0)
    ).otherwise(F.col("avg_abs_dev") / F.col("mean_cnt"))
    return dev.select(
        F.round(skew_max, 6).alias("skewness_max"),
        F.round(skew_avg, 6).alias("skewness_average"),
        F.col("n_partitions").cast("long").alias("n_partitions"),
    )


def skewness(df: DataFrame, partition_cols: list[str], method: str = "max") -> float:
    """Scalar skewness, reference-compatible entry point."""
    row = skewness_agg(records_per_partition(df, partition_cols)).collect()[0]
    if method == "max":
        return float(row.skewness_max)
    if method == "average":
        return float(row.skewness_average)
    raise ValueError(f"Unknown skewness method: {method}")


def skew_metrics(
    df: DataFrame,
    partition_cols: list[str],
    threshold: float = SKEW_THRESHOLD_DEFAULT,
    collect_partitions: bool = True,
) -> dict:
    """Reference-shaped dict (delta_python_analyzer.py:80-86). The
    records-per-partition dict is only collected when asked — at high
    partition cardinality callers should keep it as a DataFrame."""
    counts = records_per_partition(df, partition_cols)
    row = skewness_agg(counts).collect()[0]
    out = {
        "partition_columns": list(partition_cols),
        "skewness_max": float(row.skewness_max),
        "skewness_average": float(row.skewness_average),
        "is_skewed": float(row.skewness_max) > threshold,
    }
    if collect_partitions:
        out["records_per_partition_dict"] = {
            r.partition_key: r.cnt for r in counts.collect()
        }
    return out
