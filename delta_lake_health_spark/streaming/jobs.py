"""Structured Streaming variants of the events operators (SURVEY §2.3 E4).

Batch/stream parity: ``plans/events.py`` defines the batch semantics;
these jobs express the same logic as ``readStream`` pipelines —

- ``tumbling_hourly``: watermarked 1-hour windowed aggregation
  (event-time, late data dropped past the watermark);
- ``sessionize``: 30-minute-gap sessionization as a custom stateful
  operator via ``applyInPandasWithState`` (event-time timeout closes idle
  sessions once the watermark passes session_end + gap).

Scale: state is keyed by user_id — Spark partitions state across
executors by key hash; per-key state is O(1) (one open session tuple), so
state size is bounded by |active users|, not event volume. The pandas
function receives Arrow batches, never row-at-a-time Python.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SESSION_GAP_US = 30 * 60 * 1_000_000

# raw schema of the events parquet when TIMESTAMP(NANOS) is read as long
EVENTS_RAW_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming source over a directory of events parquet files."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = spark.readStream.schema(EVENTS_RAW_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(source_dir)
    return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))


def tumbling_hourly(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Watermarked tumbling 1-hour window per event type — the streaming
    twin of ``events_tumbling_hourly``."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("user_id").alias("n_users_approx"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
            "n_users_approx",
            "total_value",
        )
    )


_SESSION_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start_us", LongType()),
        StructField("n_events", LongType()),
        StructField("session_value", DoubleType()),
        StructField("duration_us", LongType()),
    ]
)

_SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
        StructField("value", DoubleType()),
    ]
)


def _emit(user_id: int, start: int, last: int, n: int, value: float) -> pd.DataFrame:
    return pd.DataFrame(
        [
            {
                "user_id": user_id,
                "session_start_us": start,
                "n_events": n,
                "session_value": round(value, 2),
                "duration_us": last - start,
            }
        ]
    )


def _sessionize_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        start, last, n, value = state.get
        state.remove()
        yield _emit(user_id, start, last, n, value)
        return

    batch = pd.concat(list(pdfs)).sort_values("ts_us")
    if state.exists:
        start, last, n, value = state.get
    else:
        start = None  # type: ignore[assignment]
        last = n = 0
        value = 0.0

    out: list[pd.DataFrame] = []
    for ts, v in zip(batch["ts_us"], batch["value"]):
        ts = int(ts)
        if start is None:
            start, last, n, value = ts, ts, 1, float(v)
        elif ts - last > SESSION_GAP_US:
            out.append(_emit(user_id, start, last, n, value))
            start, last, n, value = ts, ts, 1, float(v)
        else:
            last, n, value = ts, n + 1, value + float(v)
    state.update((start, last, n, value))
    # close the open session once the event-time watermark passes last+gap
    state.setTimeoutTimestamp(last // 1000 + SESSION_GAP_US // 1000)
    if out:
        yield pd.concat(out)


def sessionize(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Gap-based sessionization as a custom stateful streaming operator."""
    prepared = events.withWatermark("ts", watermark).select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "value", "ts"
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn,
        outputStructType=_SESSION_OUT_SCHEMA,
        stateStructType=_SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def run_to_memory(
    df: DataFrame,
    query_name: str,
    output_mode: str,
    checkpoint_dir: str,
) -> Any:
    """Drive a streaming DataFrame to a memory sink with availableNow
    (process-everything-then-stop) — the pytest harness."""
    q = (
        df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def stream_to_delta(
    df: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    partition_by: list[str] | None = None,
) -> Any:
    """Sink a streaming DataFrame into one of OUR Delta tables: each
    micro-batch becomes one atomic log commit via ``foreachBatch`` +
    ``delta_writer.write`` — so a live ingest pipeline produces exactly
    the table layout the health analyzer and maintenance operators act on
    (appends accumulate small files; ``compact`` then bin-packs them).

    Replay-idempotent: each micro-batch commit carries a ``txn`` action
    keyed by (appId=checkpoint_dir, version=batch_id); a query restarted
    after the sink committed but before the streaming checkpoint advanced
    re-delivers the same batch id, and the writer skips it instead of
    appending duplicates — exactly-once, the Delta sink contract."""
    from delta_lake_health_spark.sources import delta_writer

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        delta_writer.write(
            batch_df.sparkSession,
            batch_df,
            table_path,
            mode="append",
            partition_by=partition_by,
            txn_app_id=checkpoint_dir,
            txn_version=batch_id,
        )

    q = (
        df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def stream_upsert_to_delta(
    df: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    key_cols: list[str],
    partition_by: list[str] | None = None,
) -> Any:
    """Streaming MERGE sink (the CDC-upsert pattern): each micro-batch is
    upserted into the Delta table by ``key_cols`` via ``foreachBatch`` +
    ``delta_writer.merge`` — later batches overwrite earlier rows with the
    same key instead of appending duplicates.

    Exactly-once like ``stream_to_delta``: the merge commit carries a
    ``txn`` action keyed by (appId=checkpoint_dir, version=batch_id), so a
    replayed micro-batch is skipped. The first batch on a fresh table is a
    plain CREATE-style write (merge needs logged metadata to exist).
    Batches must be unique per key (dedupe upstream with
    ``dropDuplicatesWithinWatermark`` if the source can repeat keys
    in-batch)."""
    from delta_lake_health_spark.sources import delta_writer

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if delta_writer.current_version(table_path) < 0:
            delta_writer.write(
                batch_df.sparkSession,
                batch_df,
                table_path,
                mode="append",
                partition_by=partition_by,
                txn_app_id=checkpoint_dir,
                txn_version=batch_id,
            )
            return
        delta_writer.merge(
            batch_df.sparkSession,
            table_path,
            batch_df,
            key_cols,
            txn_app_id=checkpoint_dir,
            txn_version=batch_id,
        )

    q = (
        df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def attribution_stream(
    views: DataFrame,
    purchases: DataFrame,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Stream-stream inner join with event-time range condition: every
    (purchase, view) pair where the view happened within the 30 minutes
    before the purchase by the same user — the streaming twin of the
    batch as-of attribution (``events_purchase_attribution`` emits only
    the latest view; the stream emits all candidates, since 'latest' is
    not final until the watermark closes the window — downstream picks
    min lag per purchase).

    Both sides are watermarked, and the join condition bounds view-ts
    from both directions relative to purchase-ts, so Spark can evict
    buffered state once the watermark passes — bounded state, the
    requirement for an unbounded stream."""
    v = (
        views.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("v_user_id"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("v_ts"),
        )
    )
    p = (
        purchases.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
            "value",
        )
    )
    joined = v.join(
        p,
        F.expr(
            """
            v_user_id = p_user_id AND
            v_ts <= p_ts AND
            v_ts > p_ts - INTERVAL 30 MINUTES
            """
        ),
    )
    return joined.select(
        "purchase_id",
        F.col("p_user_id").alias("user_id"),
        "view_id",
        (F.unix_micros("p_ts") - F.unix_micros("v_ts")).alias("lag_us"),
        F.round("value", 2).alias("purchase_value"),
    )


def unconverted_views_stream(
    views: DataFrame,
    purchases: DataFrame,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Stream-stream LEFT OUTER join (the 'unconverted impressions'
    feed): every view paired with each purchase by the same user in the
    30 minutes AFTER it; a view with no such purchase emits exactly one
    NULL-purchase row — but only once the watermark passes the view's
    join window, when the engine can prove no future match exists. Same
    bounded-state eviction as the inner form; the outer semantics is
    what Spark's watermarked outer join adds on top: correctness of the
    negative ("never converted") depends on event-time progress, not
    wall-clock.

    Note the operational corollary (asserted in tests): outer rows are
    HELD until a later event advances the watermark — a drained stream
    emits them only after one more event arrives. And since the global
    watermark is the MIN across the watermarked streams, that event must
    survive EACH stream's pre-watermark filter: a tick that only reaches
    the purchase side leaves the view side's watermark (and thus the
    global one) stuck, silently withholding the newest negatives.
    Production feeds tick constantly on both sides; replayed fixtures
    need per-side sentinel events.
    """
    v = views.withWatermark("ts", watermark).select(
        F.col("user_id").alias("v_user_id"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"),
    )
    p = purchases.withWatermark("ts", watermark).select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    joined = v.join(
        p,
        F.expr(
            """
            v_user_id = p_user_id AND
            p_ts >= v_ts AND
            p_ts < v_ts + INTERVAL 30 MINUTES
            """
        ),
        "leftOuter",
    )
    return joined.select(
        "view_id",
        F.col("v_user_id").alias("user_id"),
        "purchase_id",
        (F.unix_micros("p_ts") - F.unix_micros("v_ts")).alias("lag_us"),
        F.col("purchase_id").isNotNull().alias("converted"),
    )


def dedup_stream(
    events: DataFrame,
    key_cols: list[str],
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming deduplication: keep the first event per key, tolerating
    duplicates that arrive within the watermark window of each other
    (``dropDuplicatesWithinWatermark``). State per key is evicted once the
    watermark passes, so state size is bounded by keys-per-window, not by
    stream history — the scalable contrast to an unbounded
    ``dropDuplicates`` whose state grows forever."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


# -- windowed approx-distinct (explicit HLL state) -------------------------

_HLL_OUT_SCHEMA = StructType(
    [
        StructField("window_start", StringType()),
        StructField("event_type", StringType()),
        StructField("approx_users", LongType()),
    ]
)

_HLL_STATE_SCHEMA = StructType([StructField("registers", BinaryType())])

_HOUR_US = 3_600 * 1_000_000


def _hll_window_fn(key, pdfs, state: GroupState):
    """Per-(window, event_type) HLL register state. Registers are
    max-merged across micro-batches — order-independent, so the final
    estimate is bit-identical to a single batch pass over the same rows
    (asserted by tests/test_streaming.py)."""
    import numpy as np

    from delta_lake_health_spark.operators import hll

    window_us, event_type = int(key[0]), key[1]
    if state.hasTimedOut:
        (reg_bytes,) = state.get
        state.remove()
        yield pd.DataFrame(
            [
                {
                    "window_start": pd.Timestamp(window_us, unit="us").strftime(
                        "%Y-%m-%d %H:%M:%S"
                    ),
                    "event_type": event_type,
                    "approx_users": hll.estimate(
                        np.frombuffer(reg_bytes, dtype=np.uint8)
                    ),
                }
            ]
        )
        return

    registers = (
        np.frombuffer(state.get[0], dtype=np.uint8).copy()
        if state.exists
        else hll.empty_registers()
    )
    for pdf in pdfs:
        if len(pdf):
            hll.update_registers(registers, pdf["user_id"].to_numpy())
    state.update((registers.tobytes(),))
    # flush once the event-time watermark passes the window end
    state.setTimeoutTimestamp((window_us + _HOUR_US) // 1000)


def windowed_hll_users(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Hourly approx-distinct users per event type as a custom stateful
    operator: the HLL sketch IS the streaming state (4 KiB per open
    window x type), updated vectorized per Arrow batch and emitted when
    the watermark closes the window. Unlike the built-in
    ``approx_count_distinct`` twin in ``tumbling_hourly``, the sketch
    here is explicit and deterministic, so the batch twin
    (``plans/sketch.py::events_windowed_hll_users``) must reproduce the
    stream's output EXACTLY — register-for-register."""
    prepared = (
        events.withWatermark("ts", watermark)
        .select(
            F.unix_micros(F.window("ts", "1 hour").getField("start")).alias(
                "window_us"
            ),
            "event_type",
            "user_id",
            "ts",
        )
    )
    return prepared.groupBy("window_us", "event_type").applyInPandasWithState(
        _hll_window_fn,
        outputStructType=_HLL_OUT_SCHEMA,
        stateStructType=_HLL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def stream_mv_appends(
    spark: SparkSession,
    source_path: str,
    mv_path: str,
    keys: list[str],
    sum_cols: list[str],
    checkpoint_dir: str,
) -> Any:
    """Continuously-maintained aggregate view: tail the source Delta
    table through the ``delta_tail`` streaming source and fold each
    micro-batch's rows into the count/sum MV (``operators/mv.py``
    arithmetic) — the full streaming composition: custom source ->
    micro-batch engine -> Delta-sink MV, all pieces from this repo.

    Exactly-once twice over: the SOURCE offsets (commit versions) live in
    the streaming checkpoint, and each MV overwrite carries a ``txn``
    keyed by (checkpoint_dir, batch_id), so a batch re-delivered after a
    crash between sink-commit and checkpoint-advance is skipped. The
    per-batch work is |batch rows| + |touched groups|; the MV overwrite
    is |groups| — the source is never rescanned, which is the property
    that lets the view ride a 100 TB table's append stream.

    Append-only by design (the ``delta_tail`` contract): a source delete
    fails the stream rather than silently skewing the aggregate; use
    batch ``refresh_mv`` (row-level change feed) for tables that delete.
    """
    from pyspark.sql import functions as F

    from delta_lake_health_spark.sources import delta_writer
    from delta_lake_health_spark.sources.delta_log import DeltaLog
    from delta_lake_health_spark.streaming import delta_source

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        aggs = [F.count(F.lit(1)).alias("d_n")]
        aggs += [F.sum(c).alias(f"d_{c}") for c in sum_cols]
        deltas = batch_df.groupBy(*keys).agg(*aggs)
        try:
            old = DeltaLog(sess, mv_path).snapshot()
        except FileNotFoundError:
            # first batch bootstraps the view (full-history replay)
            delta_writer.write(
                sess,
                deltas.select(
                    *keys,
                    F.col("d_n").alias("n_rows"),
                    *[F.col(f"d_{c}").alias(f"sum_{c}") for c in sum_cols],
                ),
                mv_path,
                mode="overwrite",
                txn_app_id=checkpoint_dir,
                txn_version=batch_id,
            )
            return
        dtypes = dict(old.dtypes)
        merged = old.join(deltas, keys, "full_outer").select(
            *keys,
            (
                F.coalesce(F.col("n_rows"), F.lit(0))
                + F.coalesce(F.col("d_n"), F.lit(0))
            ).alias("n_rows"),
            *[
                (
                    F.coalesce(F.col(f"sum_{c}"), F.lit(0))
                    + F.coalesce(F.col(f"d_{c}"), F.lit(0))
                )
                .cast(dtypes[f"sum_{c}"])
                .alias(f"sum_{c}")
                for c in sum_cols
            ],
        )
        delta_writer.write(
            sess,
            merged,
            mv_path,
            mode="overwrite",
            txn_app_id=checkpoint_dir,
            txn_version=batch_id,
        )

    stream = delta_source.read_stream(spark, source_path)
    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def stream_apply_changes(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    key_cols: list[str],
    checkpoint_dir: str,
    processing_time: str | None = None,
    **source_options,
) -> Any:
    """Continuous APPLY CHANGES (the production medallion shape): tail
    the source Delta table's change feed through the ``delta_tail``
    source in ``readChangeFeed`` mode and apply each micro-batch's NET
    changes (``operators/sync.apply_net_changes``: last-writer-wins
    fold, MERGE the after-images, DV-delete the net-deleted keys) into
    the silver table — the streaming twin of the batch
    ``apply_changes`` (which tracks its own high-water mark in
    domainMetadata; here the streaming checkpoint owns the offsets).

    The SOURCE must have ``delta.enableChangeDataFeed`` set before its
    first mutation: update/delete/merge commits then carry change-data
    files the stream feeds verbatim (true pre/postimages); plain appends
    feed as inserts.

    Exactly-once across restarts: source offsets (commit versions) live
    in the streaming checkpoint; the merge half of every batch carries a
    ``txn`` keyed by (checkpoint_dir, batch_id) so a batch re-delivered
    after a crash between sink-commit and checkpoint-advance is skipped,
    and the DV-delete half runs first and is naturally idempotent
    (already-absent keys produce no positions). Per-batch cost is
    |batch change rows| + |target files containing changed keys| —
    nothing rescans either table.
    """
    from delta_lake_health_spark.operators import sync
    from delta_lake_health_spark.streaming import delta_source

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sync.apply_net_changes(
            batch_df.sparkSession,
            dst_path,
            batch_df,
            key_cols,
            txn_app_id=checkpoint_dir,
            txn_version=batch_id,
        )

    stream = delta_source.read_stream(
        spark, src_path, readchangefeed="true", **source_options
    )
    writer = stream.writeStream.foreachBatch(fold).option(
        "checkpointLocation", checkpoint_dir
    )
    if processing_time is None:
        # drain-everything-now (the Python source runs availableNow as
        # one unbounded batch — pacing options need the timed trigger)
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    # timed trigger: pacing options (maxVersionsPerTrigger etc.) bind
    # per micro-batch; run until a trigger admits nothing (backlog
    # drained), then stop — the paced-drain loop of a bounded catch-up
    import time as _time

    q = writer.trigger(processingTime=processing_time).start()
    try:
        deadline = _time.time() + 240
        while _time.time() < deadline:
            p = q.lastProgress
            if p is not None and p["numInputRows"] == 0:
                return q
            _time.sleep(0.2)
        raise TimeoutError("stream_apply_changes drain did not complete")
    finally:
        q.stop()


def stream_ivf_index_maintenance(
    spark: SparkSession,
    vectors_path: str,
    index_path: str,
    checkpoint_dir: str,
    **source_options,
) -> Any:
    """Continuous ANN-index freshness (D46 + the S5 upsert composed):
    tail an append-only Delta table of vectors (vec_id, emb) through
    ``delta_tail`` and fold each micro-batch into the persisted IVF
    index with ``operators/ann_index.upsert_ivf_index`` — new vectors
    assign to the frozen quantizer, unchanged inverted lists get pure
    append commits, an overflowing list rebuckets alone. Probes served
    from the index tables see every ingested vector after its batch
    commits; periodic retraining (a fresh build+save) stays an offline
    concern.

    Exactly-once: source offsets live in the streaming checkpoint, and
    the upsert itself is idempotent AT THE BATCH LEVEL only if the
    batch replays before new data lands — the same replay window every
    foreachBatch sink has — so the fold additionally skips batches
    whose vec_ids are all already present (an anti-join against the
    lists table, |batch| cost), making a crash-replay a no-op.
    """
    from pyspark.sql import functions as F

    from delta_lake_health_spark.operators import ann_index
    from delta_lake_health_spark.sources.delta_log import DeltaLog
    from delta_lake_health_spark.streaming import delta_source

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sess = batch_df.sparkSession
        import os

        lists = DeltaLog(sess, os.path.join(index_path, "lists")).snapshot()
        fresh = batch_df.select("vec_id", "emb").join(
            lists.select("vec_id"), "vec_id", "left_anti"
        )
        ann_index.upsert_ivf_index(sess, index_path, fresh)

    stream = delta_source.read_stream(spark, vectors_path, **source_options)
    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def stream_fp_index_maintenance(
    spark: SparkSession,
    media_path: str,
    index_path: str,
    checkpoint_dir: str,
    **source_options,
) -> Any:
    """Continuous audio-fingerprint-index freshness (D46 + the M8
    upsert composed, mirroring ``stream_ivf_index_maintenance``): tail
    an append-only Delta table of tracks (media_id, payload) through
    ``delta_tail`` and fold each micro-batch into the persisted
    constellation index with ``operators/audio_fp.upsert_fp_index`` —
    one fingerprint pass per batch, pure append commits, probes see a
    track right after its batch commits.

    Crash-replay safety: the upsert itself anti-joins the batch's
    media_ids against the index, so a replayed batch is a no-op."""
    from delta_lake_health_spark.operators import audio_fp
    from delta_lake_health_spark.streaming import delta_source

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        audio_fp.upsert_fp_index(
            batch_df.sparkSession,
            index_path,
            batch_df.select("media_id", "payload"),
        )

    stream = delta_source.read_stream(spark, media_path, **source_options)
    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def stream_bm25_index_maintenance(
    spark: SparkSession,
    docs_path: str,
    index_path: str,
    checkpoint_dir: str,
    **source_options,
) -> Any:
    """Continuous BM25-index freshness (VERDICT r11 #4 — D46 + the T34
    upsert composed, same shape as ``stream_fp_index_maintenance``):
    tail an append-only Delta docs table (doc_id, text) through
    ``delta_tail`` and fold each micro-batch into the persisted
    postings index with ``operators/text_index.upsert_bm25_index`` —
    one tokenize pass per batch, ONE pure-append commit per batch,
    searches see a doc (with exact idf/avgdl) right after its batch's
    stats re-stamp.

    Crash-replay safety: the upsert anti-joins the batch's doc_ids
    against the kind=dl partition, so a replayed batch is an exact
    no-op; a crash before the stats re-stamp only leaves the totals
    cache stale, which probes detect and recompute around."""
    from delta_lake_health_spark.operators import text_index
    from delta_lake_health_spark.streaming import delta_source

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        text_index.upsert_bm25_index(
            batch_df.sparkSession,
            index_path,
            batch_df.select("doc_id", "text"),
        )

    stream = delta_source.read_stream(spark, docs_path, **source_options)
    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def stream_iceberg_export_maintenance(
    spark: SparkSession,
    table_path: str,
    checkpoint_dir: str,
    **source_options,
) -> Any:
    """Continuous UniForm-style Iceberg freshness (D75 + D46 composed):
    tail the table's own commits through ``delta_tail`` and regenerate
    the Iceberg metadata tree after each micro-batch — the foreign
    reader's snapshot lags the Delta head by at most one trigger.
    ``generate_iceberg_metadata`` is idempotent per Delta version, so
    replayed batches (and batches that coalesce several commits) are
    no-ops beyond a version check."""
    from delta_lake_health_spark.operators import iceberg_uniform
    from delta_lake_health_spark.streaming import delta_source

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        iceberg_uniform.generate_iceberg_metadata(
            batch_df.sparkSession, table_path
        )

    stream = delta_source.read_stream(spark, table_path, **source_options)
    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def stream_minhash_index_maintenance(
    spark: SparkSession,
    docs_path: str,
    index_path: str,
    checkpoint_dir: str,
    **source_options,
) -> Any:
    """Continuous LSH-index freshness (VERDICT r11 #3 — D46 + the X17
    upsert composed): tail an append-only docs table and fold each
    micro-batch into the persisted band index with
    ``operators/minhash_index.upsert_minhash_index`` — one signature
    pass per batch, ONE pure-append commit per batch. Composes with
    ``stream_dedup_ingest`` (X16): the exact-dedup door feeds the
    corpus table, this keeps the NEAR-dup index current behind it.

    Crash-replay safety: the upsert anti-joins against the kind=doc
    partition, so a replayed batch is an exact no-op."""
    from delta_lake_health_spark.operators import minhash_index
    from delta_lake_health_spark.streaming import delta_source

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        minhash_index.upsert_minhash_index(
            batch_df.sparkSession,
            index_path,
            batch_df.select("doc_id", "text"),
        )

    stream = delta_source.read_stream(spark, docs_path, **source_options)
    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


# --------------------------------------------------------------------------
# Streaming CUSUM change-point detection (VERDICT r10 #7 — the E37
# batch detector's continuous twin). Per event type the state carries
# Page's recursion in its prefix-min form — (pt, run_min) — plus the
# buffer of still-open hours; an hour flushes into the recursion when
# the event-time watermark passes its end, exactly when a windowed agg
# would emit it. Alerts therefore fire one watermark-delay after the
# offending hour closes, and the flushed series is BIT-IDENTICAL to
# the batch operator's prefix (same sequential double accumulation,
# same 6-dp round-before-threshold).

_HOUR_US = 3_600_000_000

_CUSUM_OUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("hr_us", LongType()),
        StructField("c", LongType()),
        StructField("cusum", DoubleType()),
        StructField("alert", BooleanType()),
    ]
)

_CUSUM_STATE_SCHEMA = StructType(
    [
        StructField("pt", DoubleType()),
        StructField("run_min", DoubleType()),
        StructField("last_flushed_us", LongType()),
        StructField("pending_hrs", ArrayType(LongType())),
        StructField("pending_counts", ArrayType(LongType())),
    ]
)


def stream_cusum_alerts(
    events: DataFrame,
    mu: dict,
    slack: float = 0.5,
    h: float = 4.0,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Continuous CUSUM over per-type hourly event counts.

    ``mu`` is the per-type in-control reference mean (the quantity the
    batch detector estimates from history — online CUSUM takes it as a
    parameter, per Page 1954). Rows later than the watermark for an
    already-flushed hour are discarded, matching windowed-aggregation
    semantics. Scale shape: state per type is two doubles + the open
    hours only; each micro-batch shuffles |batch| rows once on
    event_type."""
    mu_map = {str(k): float(v) for k, v in mu.items()}
    slack = float(slack)
    h = float(h)

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (etype,) = key
        if state.exists:
            pt, run_min, last_flushed, hrs, counts = state.get
            pending = dict(zip(hrs, counts))
        else:
            pt, run_min, last_flushed, pending = 0.0, 0.0, -1, {}
        if not state.hasTimedOut:  # a timeout invocation has no rows
            for pdf in pdfs:
                for ts_us in pdf["ts_us"]:
                    hr = int(ts_us) - int(ts_us) % _HOUR_US
                    if hr <= last_flushed:
                        continue  # beyond-watermark late: agg would drop it
                    pending[hr] = pending.get(hr, 0) + 1
        wm_ms = state.getCurrentWatermarkMs()
        wm_us = wm_ms * 1000
        if etype not in mu_map:
            # a type with no reference mean is a MISCONFIGURATION:
            # defaulting mu to 0 would make its CUSUM grow with every
            # event and alert forever, silently — fail the query loudly
            raise KeyError(
                f"stream_cusum_alerts: event_type {etype!r} has no entry "
                "in the supplied reference means `mu` — add it (or filter "
                "the stream to the monitored types) before starting"
            )
        m = mu_map[etype]
        out = []
        for hr in sorted(pending):
            if hr + _HOUR_US > wm_us:
                break  # hour still open
            c = pending.pop(hr)
            pt += c - m - slack
            run_min = min(run_min, pt)
            cusum = round(pt - min(run_min, 0.0), 6)
            out.append(
                {
                    "event_type": etype,
                    "hr_us": hr,
                    "c": c,
                    "cusum": cusum,
                    "alert": cusum > h,
                }
            )
            last_flushed = hr
        state.update(
            (
                pt,
                run_min,
                last_flushed,
                list(sorted(pending)),
                [pending[k] for k in sorted(pending)],
            )
        )
        if pending:
            # a type that goes QUIET must still flush once the global
            # watermark passes its earliest open hour — arm an
            # event-time timeout for that instant (clamped above the
            # current watermark, as the API requires)
            due_ms = (min(pending) + _HOUR_US) // 1000
            state.setTimeoutTimestamp(max(due_ms, wm_ms + 1))
        if out:
            yield pd.DataFrame(
                out,
                columns=["event_type", "hr_us", "c", "cusum", "alert"],
            )

    prepared = events.withWatermark("ts", watermark).select(
        "event_type", F.unix_micros("ts").alias("ts_us"), "ts"
    )
    return prepared.groupBy("event_type").applyInPandasWithState(
        fn,
        outputStructType=_CUSUM_OUT_SCHEMA,
        stateStructType=_CUSUM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def stream_dedup_ingest(
    df: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    key_cols: list[str],
    partition_by: list[str] | None = None,
) -> Any:
    """Exact FULL-HISTORY dedup at the corpus door (X1's continuous
    twin — the ingest shape a training-data pipeline runs 24/7): each
    micro-batch first dedupes within itself (one row per key), then
    anti-joins the TARGET TABLE on
    ``key_cols`` so a key ever ingested never lands twice — unlike
    ``dedup_stream`` (dropDuplicatesWithinWatermark), whose state only
    spans the lateness window, this dedupes against all history with
    ZERO streaming state: the Delta table itself is the seen-set.

    Scale shape: the anti-join shuffles |batch| + |table keys-column|
    rows; with the target clustered by the key (``cluster_by`` at
    create, liquid clustering after), the key column scan prunes and
    stays far below a table scan, and the X11 Bloom sidecar
    (``operators/bloom``) can prefilter the probe to
    |probably-seen batch rows| at 100 TB. Exactly-once like the other
    sinks: the append carries a txn action keyed by
    (appId=checkpoint_dir, version=batch_id), so a replayed micro-batch
    commits nothing.

    Returns the finished query; metrics per batch land in the commit's
    operationMetrics (numOutputRows of the surviving append)."""
    from delta_lake_health_spark.sources import delta_writer
    from delta_lake_health_spark.sources.delta_log import DeltaLog

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sess = batch_df.sparkSession
        fresh = batch_df.dropDuplicates(key_cols)
        if delta_writer.current_version(table_path) >= 0:
            seen = (
                DeltaLog(sess, table_path).snapshot().select(*key_cols)
            )
            fresh = fresh.join(seen, key_cols, "left_anti")
        # materialize once: the seen-set anti-join is the dominant cost
        # and must not run again inside the write
        fresh = fresh.localCheckpoint()
        if fresh.isEmpty():
            return  # all-duplicate batch: nothing to commit (replay-safe:
            # a re-delivered batch recomputes the same empty anti-join)
        delta_writer.write(
            sess,
            fresh,
            table_path,
            mode="append",
            partition_by=partition_by,
            txn_app_id=checkpoint_dir,
            txn_version=batch_id,
        )

    q = (
        df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def stream_corpus_door(
    spark: SparkSession,
    source_path: str,
    corpus_path: str,
    quarantine_path: str,
    index_path: str,
    checkpoint_dir: str,
    bm25_path: str | None = None,
    **source_options,
) -> Any:
    """X18 — the COMPOSED streaming corpus door (VERDICT r12 #1): ONE
    continuous job tying together every admission stage a production
    training-data pipeline runs 24/7. Per micro-batch of incoming
    documents (doc_id, text, lang, source, n_chars), in one
    ``foreachBatch``:

    1. **exact dedup** (X16's shape): in-batch content-fingerprint
       dedup (keep the smallest doc_id per md5(text)) plus a
       full-history anti-join against the corpus table's fingerprints —
       the corpus itself is the seen-set, zero streaming state;
    2. **quality gate** (T9): the Gopher rule flags
       (``plans/text.gopher_flags``) — failures are quarantined but
       still INDEXED (see semantics below);
    3. **near-dup novelty probe** (X17): ONE signature pass computes
       the batch's LSH band rows (``plans/dedup.band_rows``), shared by
       the index probe (file-pruned by band_key), the in-batch
       candidate pairs (X3's capped posting-list form), and the index
       upsert. A quality-passing doc is rejected iff it band-collides
       with a SMALLER doc_id — in the index or earlier in the batch;
    4. **writes**, all indexes first, corpus LAST: the X17 index
       upsert (all stage-1 survivors, accepted or not), the optional
       BM25 postings upsert over the accepted docs, the quarantine
       append (reason + the smallest colliding match_doc_id), then the
       corpus append (accepted docs with the X10 content-hash split
       column) — the corpus commit is the batch's finish line, because
       a replay after it re-derives an empty batch.

    **Semantics** (what makes this equal to the batch X10 pipeline):
    under id-ordered ingestion, "reject iff a smaller-id doc collides"
    is the greedy LSH dedup; quality-failed docs still contribute their
    bands (batch X10 builds its candidate graph over ALL docs, kept or
    not), and exact duplicates need no bands of their own — their
    surviving twin's are identical. ``tests/test_corpus_door.py``
    proves the end-state corpus equals ``pipeline_corpus_build``'s
    kept-set on the fixture corpus across 3 micro-batches.

    **Crash-replay safety**, per table: the index upsert anti-joins its
    seen-set partition; quarantine and corpus appends carry ``txn``
    actions keyed by (checkpoint-derived appId, batch_id); decisions
    re-derive identically on replay because the probe ignores
    collisions with ids >= the probe's own (a half-written batch that
    already reached the index cannot flip its own verdicts). Index
    first, corpus last: a crash between writes never yields a corpus
    doc the index doesn't know.

    **Scale shape**: |batch| signature + shingle cost; the corpus
    fingerprint anti-join prunes to the fingerprint column scan (X11's
    Bloom sidecar can prefilter at 100 TB); the index probe is
    file-pruned by band_key; nothing rescans the corpus."""
    from pyspark.sql import Window

    from delta_lake_health_spark.operators import minhash_index as mi
    from delta_lake_health_spark.plans.dedup import (
        _posting_pairs,
        band_rows,
    )
    from delta_lake_health_spark.plans.text import (
        _spark_bucket256_of,
        gopher_flags,
    )
    from delta_lake_health_spark.sources import delta_writer
    from delta_lake_health_spark.sources.delta_log import DeltaLog

    carry = ["doc_id", "text", "lang", "source", "n_chars"]

    def door(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sess = batch_df.sparkSession

        # ---- stage 1: exact dedup (in-batch + full corpus history)
        wmin = Window.partitionBy("content_fp")
        base = (
            batch_df.select(*carry)
            .dropDuplicates(["doc_id"])
            .withColumn("content_fp", F.md5("text"))
            .withColumn("fp_min", F.min("doc_id").over(wmin))
        )
        if delta_writer.current_version(corpus_path) >= 0:
            seen_fp = (
                DeltaLog(sess, corpus_path)
                .snapshot()
                .groupBy(F.md5("text").alias("content_fp"))
                .agg(F.min("doc_id").alias("corpus_match"))
            )
            base = base.join(seen_fp, "content_fp", "left")
        else:
            base = base.withColumn(
                "corpus_match", F.lit(None).cast("long")
            )
        base = base.localCheckpoint()
        exact_dup = base.where(
            (F.col("doc_id") != F.col("fp_min"))
            | F.col("corpus_match").isNotNull()
        ).select(
            *carry,
            F.lit("exact_dup").alias("reason"),
            F.coalesce(
                "corpus_match",
                F.when(F.col("doc_id") != F.col("fp_min"), F.col("fp_min")),
            ).alias("match_doc_id"),
        )
        survivors = base.where(
            (F.col("doc_id") == F.col("fp_min"))
            & F.col("corpus_match").isNull()
        ).select(*carry)

        # ---- stage 2: quality gate (quarantined but still indexed)
        keep = (
            F.col("ok_word_count")
            & F.col("ok_mean_word_len")
            & F.col("ok_stopwords")
            & F.col("ok_distinct_ratio")
        )
        flagged = gopher_flags(survivors, *carry).withColumn(
            "ok", keep
        ).localCheckpoint()
        qfail = flagged.where(~F.col("ok")).select(
            *carry,
            F.lit("quality").alias("reason"),
            F.lit(None).cast("long").alias("match_doc_id"),
        )
        qpass = flagged.where(F.col("ok")).select(*carry)

        # ---- stage 3: near-dup novelty — ONE signature pass
        bands = band_rows(
            survivors.select("doc_id", "text")
        ).localCheckpoint()
        idx_exists = (
            delta_writer.current_version(mi._data_path(index_path)) >= 0
        )
        if idx_exists:
            idx_hits = mi.probe_minhash_index(
                sess, index_path, survivors, bands=bands
            ).where(F.col("index_doc_id") < F.col("probe_doc_id"))
        else:
            idx_hits = sess.createDataFrame(
                [], "probe_doc_id long, index_doc_id long"
            )
        batch_hits = _posting_pairs(
            bands, ["band_idx", "band_key"], "doc_id", "doc_a", "doc_b"
        ).select(
            F.col("doc_b").alias("probe_doc_id"),
            F.col("doc_a").alias("index_doc_id"),
        )
        collisions = (
            idx_hits.unionByName(batch_hits)
            .groupBy("probe_doc_id")
            .agg(F.min("index_doc_id").alias("match_doc_id"))
            .localCheckpoint()
        )
        near_rm = collisions.withColumnRenamed("probe_doc_id", "doc_id")
        near_dup = qpass.join(near_rm, "doc_id").select(
            *carry,
            F.lit("near_dup").alias("reason"),
            "match_doc_id",
        )
        accepted = qpass.join(near_rm, "doc_id", "left_anti").select(
            *carry,
            F.when(_spark_bucket256_of("text") < 204, "train")
            .when(_spark_bucket256_of("text") < 230, "val")
            .otherwise("test")
            .alias("split"),
        )

        # ---- stage 4: writes — ALL indexes first, corpus LAST. Once
        # the corpus append lands, a replay re-derives an EMPTY batch
        # (its own docs hit the exact-dedup seen-set), so any write
        # sequenced after the corpus would be skipped forever on a
        # crash-replay — the corpus commit is the batch's finish line
        # (r13 review finding).
        if idx_exists:
            mi.upsert_minhash_index(sess, index_path, survivors, bands=bands)
        else:
            mi.build_minhash_index(sess, survivors, index_path, bands=bands)
        if bm25_path is not None:
            from delta_lake_health_spark.operators import text_index

            acc = accepted.select("doc_id", "text")
            if (
                delta_writer.current_version(
                    text_index._data_path(bm25_path)
                )
                < 0
            ):
                text_index.build_bm25_index(sess, acc, bm25_path)
            else:
                text_index.upsert_bm25_index(sess, bm25_path, acc)
        quarantined = exact_dup.unionByName(qfail).unionByName(near_dup)
        delta_writer.write(
            sess,
            quarantined,
            quarantine_path,
            mode="append",
            txn_app_id=f"{checkpoint_dir}#quarantine",
            txn_version=batch_id,
        )
        delta_writer.write(
            sess,
            accepted,
            corpus_path,
            mode="append",
            txn_app_id=f"{checkpoint_dir}#corpus",
            txn_version=batch_id,
        )

    from delta_lake_health_spark.streaming import delta_source

    stream = delta_source.read_stream(spark, source_path, **source_options)
    q = (
        stream.writeStream.foreachBatch(door)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def stream_phash_index_maintenance(
    spark: SparkSession,
    media_path: str,
    index_path: str,
    checkpoint_dir: str,
    **source_options,
) -> Any:
    """Continuous pHash-index freshness (M10 — D46 + the phash upsert
    composed): tail an append-only media table and fold each
    micro-batch into the persisted band index with
    ``operators/phash_index.upsert_phash_index`` — one decode+DCT pass
    per batch, ONE pure-append commit per batch, mirroring the other
    five index families' maintenance streams.

    Crash-replay safety: the upsert anti-joins against the kind=img
    partition, so a replayed batch is an exact no-op."""
    from delta_lake_health_spark.operators import phash_index
    from delta_lake_health_spark.streaming import delta_source

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        phash_index.upsert_phash_index(
            batch_df.sparkSession,
            index_path,
            batch_df.select("media_id", "media_type", "payload"),
        )

    stream = delta_source.read_stream(spark, media_path, **source_options)
    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
