"""Backward as-of join — an operator Spark's DataFrame API lacks.

``asof_backward_join(left, right, ...)`` attaches to every left row the
LATEST right row with ``right_ts <= left_ts`` (optionally within a
tolerance window), per key.

Scale design: the naive formulation is a range join (``l.key = r.key AND
r.ts BETWEEN l.ts - tol AND l.ts``) followed by a per-left-row
``row_number`` — the join explodes to |matching pairs| intermediate rows
before the window prunes them. This implementation never builds the pair
set: it UNIONs both sides, sorts each key's rows once by (ts, side), and
carries the most recent right payload forward with ``last(..., ignorenulls)``
over a running window. One shuffle by key + one sort, intermediate size =
|left| + |right| — the standard scalable as-of shape (what pandas
``merge_asof`` does per group, distributed).

Tie semantics: right rows at the same timestamp as a left row DO match
(``<=``); among equal-timestamp right rows the one with the highest
tiebreak column wins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_backward_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload: dict[str, str],
    tolerance: int | None = None,
    right_tiebreak: str | None = None,
) -> DataFrame:
    """For each ``left`` row: the latest ``right`` row per ``on`` key with
    ``right[right_ts] <= left[left_ts]`` (and ``> left_ts - tolerance`` if
    given). Timestamps are numeric (e.g. epoch micros).

    ``payload`` maps output column name -> right column carried over;
    the matched right timestamp is exposed as ``_asof_ts``. Left rows with
    no qualifying right row keep nulls (left-join semantics — filter
    afterwards for inner).
    """
    tb = right_tiebreak or right_ts
    payload_struct = F.struct(
        F.col(right_ts).alias("_asof_ts"),
        F.col(tb).alias("_asof_tb"),
        *[F.col(src).alias(out) for out, src in payload.items()],
    )
    r = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        payload_struct.alias("_payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
          for c in left.columns],
    )
    l = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )
    # per key: sort by (ts, side, tiebreak) — right rows sort before left
    # rows at the same ts, so `<=` matches; among equal-ts right rows the
    # highest tiebreak is last and wins the carry-forward
    w = (
        Window.partitionBy(*on)
        .orderBy("_ts", "_side", F.col("_payload._asof_tb").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        l.unionByName(r)
        .withColumn("_match", F.last("_payload", ignorenulls=True).over(w))
        .where(F.col("_side") == 1)
    )
    if tolerance is not None:
        carried = carried.withColumn(
            "_match",
            F.when(
                F.col("_match._asof_ts") > F.col("_ts") - tolerance,
                F.col("_match"),
            ),
        )
    out_cols: list[Column] = [
        F.col(f"_l_{c}").alias(c) for c in left.columns
    ]
    out_cols.append(F.col("_match._asof_ts").alias("_asof_ts"))
    out_cols.extend(F.col(f"_match.{out}").alias(out) for out in payload)
    return carried.select(*out_cols)
