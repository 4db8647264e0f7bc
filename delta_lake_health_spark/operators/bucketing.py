"""Bucketed-table layout for shuffle-free co-located joins.

At 100 TB the dominant cost of a fact-fact join (lineitem x orders) is
shuffling both sides on the join key. Writing both tables bucketed by
that key with the same bucket count makes the join a zero-exchange
sort-merge of co-located buckets — the shuffle is paid ONCE at write
time and amortized over every subsequent join.

Spark's bucketing needs a catalog table (``saveAsTable``); plain
``.parquet(path)`` writes lose the bucket spec. ``write_bucketed`` /
``read_bucketed`` wrap that, and ``cobucketed_join`` asserts the layout
actually removed the exchanges (fail-fast instead of silently shuffling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) catalog table.
    ``n_buckets`` should match across tables meant to be co-joined and be
    sized so a single bucket of the largest table fits an executor task."""
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)


def cobucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed tables and VERIFY the plan is exchange-free on
    both sides (raises if a shuffle crept in — e.g. mismatched bucket
    counts or a non-bucket join key)."""
    joined = spark.table(left_table).join(spark.table(right_table), on, how)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    if "Exchange hashpartitioning" in plan:
        raise AssertionError(
            f"join {left_table}x{right_table} on {on} shuffles despite "
            f"bucketing:\n{plan[:2000]}"
        )
    return joined
