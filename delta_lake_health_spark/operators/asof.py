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


def asof_forward_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload: dict[str, str],
    tolerance: int | None = None,
    right_tiebreak: str | None = None,
) -> DataFrame:
    """For each ``left`` row: the EARLIEST ``right`` row per key with
    ``right_ts >= left_ts`` (and ``< left_ts + tolerance`` if given) —
    pandas ``merge_asof(direction="forward")``. Implemented as the
    backward join on NEGATED timestamps, so it inherits the same
    union+carry-forward shape: one key shuffle, intermediate size
    |left| + |right|, never the pair set. Tie semantics match backward:
    equal-timestamp right rows DO match; the highest tiebreak wins."""
    l2 = left.withColumn("_neg_lts", -F.col(left_ts))
    r2 = right.withColumn("_neg_rts", -F.col(right_ts))
    out = asof_backward_join(
        l2, r2, on, "_neg_lts", "_neg_rts", payload,
        tolerance=tolerance, right_tiebreak=right_tiebreak,
    )
    return out.withColumn("_asof_ts", -F.col("_asof_ts")).drop("_neg_lts")


def asof_nearest_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload: dict[str, str],
    tolerance: int | None = None,
    right_tiebreak: str | None = None,
) -> DataFrame:
    """For each ``left`` row: the right row with the smallest
    ``|right_ts - left_ts|`` per key (within tolerance on both sides) —
    pandas ``merge_asof(direction="nearest")``. Distance ties break
    toward the PAST (backward) match. Same scalable shape as backward:
    one union, one key shuffle, two in-partition sorts (one per carry
    direction sharing the exchange) — the pair set is never built."""
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
    # backward carry: rights sort BEFORE lefts at equal ts (<= matches),
    # highest tiebreak last so it wins last(ignorenulls)
    w_back = (
        Window.partitionBy(*on)
        .orderBy("_ts", "_side", F.col("_payload._asof_tb").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward carry: lefts sort BEFORE rights at equal ts (>= matches),
    # highest tiebreak first so it wins first(ignorenulls)
    w_fwd = (
        Window.partitionBy(*on)
        .orderBy(
            "_ts",
            F.desc("_side"),
            F.col("_payload._asof_tb").desc_nulls_last(),
        )
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    rows = (
        l.unionByName(r)
        .withColumn("_back", F.last("_payload", ignorenulls=True).over(w_back))
        .withColumn("_fwd", F.first("_payload", ignorenulls=True).over(w_fwd))
        .where(F.col("_side") == 1)
    )
    back, fwd = F.col("_back"), F.col("_fwd")
    if tolerance is not None:
        back = F.when(F.col("_back._asof_ts") > F.col("_ts") - tolerance,
                      F.col("_back"))
        fwd = F.when(F.col("_fwd._asof_ts") < F.col("_ts") + tolerance,
                     F.col("_fwd"))
    rows = rows.withColumn("_b2", back).withColumn("_f2", fwd)
    chosen = (
        F.when(F.col("_f2").isNull(), F.col("_b2"))
        .when(F.col("_b2").isNull(), F.col("_f2"))
        .when(
            (F.col("_ts") - F.col("_b2._asof_ts"))
            <= (F.col("_f2._asof_ts") - F.col("_ts")),
            F.col("_b2"),
        )
        .otherwise(F.col("_f2"))
    )
    rows = rows.withColumn("_match", chosen)
    out_cols: list[Column] = [
        F.col(f"_l_{c}").alias(c) for c in left.columns
    ]
    out_cols.append(F.col("_match._asof_ts").alias("_asof_ts"))
    out_cols.extend(F.col(f"_match.{out}").alias(out) for out in payload)
    return rows.select(*out_cols)
