"""Streaming jobs vs their batch twins (SURVEY E4).

The stream source is the sf0.001 events table split into three
chronological parquet chunks; maxFilesPerTrigger=1 + availableNow drives
three deterministic micro-batches, so watermarks advance between batches
and event-time timeouts actually fire."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

# Structured Streaming batch-parity battery: slow battery, full-suite close-out only
pytestmark = pytest.mark.slow
from pyspark.sql import functions as F

from delta_lake_health_spark.plans import events as batch_events
from delta_lake_health_spark.sources.catalog import load
from delta_lake_health_spark.streaming import jobs

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def stream_dir(spark):
    tmp = tempfile.mkdtemp()
    src = os.path.join(tmp, "in")
    os.makedirs(src)
    # ts as long nanos, matching EVENTS_RAW_SCHEMA (the on-disk layout of
    # the driver's events table)
    ev = (
        load(spark, SF, "events")
        .withColumn("ts", F.unix_micros("ts") * 1000)
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .orderBy("ts", "event_id")
    )
    rows = ev.count()
    chunk = rows // 3 + 1
    pdf = ev.toPandas()
    for i in range(3):
        part = pdf.iloc[i * chunk : (i + 1) * chunk]
        if len(part):
            spark.createDataFrame(part).coalesce(1).write.parquet(
                os.path.join(src, f"chunk_{i}")
            )
    # flatten: move part files into src with ordered names
    n = 0
    for i in range(3):
        d = os.path.join(src, f"chunk_{i}")
        if not os.path.isdir(d):
            continue
        for f in sorted(os.listdir(d)):
            if f.endswith(".parquet"):
                os.rename(os.path.join(d, f), os.path.join(src, f"{n:03d}.parquet"))
                n += 1
        shutil.rmtree(d)
    yield tmp, src
    shutil.rmtree(tmp, ignore_errors=True)


def test_stream_tumbling_matches_batch(spark, stream_dir):
    tmp, src = stream_dir
    stream = jobs.read_events_stream(spark, src)
    agg = jobs.tumbling_hourly(stream)
    jobs.run_to_memory(agg, "tumbling_t", "complete", os.path.join(tmp, "cp1"))
    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in spark.table("tumbling_t").collect()
    }
    batch = batch_events.QUERIES["events_tumbling_hourly"](spark, SF).collect()
    want = {
        (r.window_start, r.event_type): (r.n_events, r.total_value) for r in batch
    }
    assert got == want


def test_stream_sessionize_matches_batch(spark, stream_dir):
    tmp, src = stream_dir
    stream = jobs.read_events_stream(spark, src, max_files_per_trigger=1)
    sess = jobs.sessionize(stream)
    jobs.run_to_memory(sess, "sessions_t", "append", os.path.join(tmp, "cp2"))
    got = {
        (r.user_id, r.n_events, r.session_value, r.duration_us)
        for r in spark.table("sessions_t").collect()
    }

    batch = batch_events.QUERIES["events_sessionization"](spark, SF)
    w_last = F.max("session_id").over(
        __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy(
            "user_id"
        )
    )
    closed = (
        batch.withColumn("last_sid", w_last)
        .where(F.col("session_id") < F.col("last_sid"))
        .collect()
    )
    want = {
        (r.user_id, r.n_events, r.session_value, r.duration_us) for r in closed
    }
    # every batch-closed session must have been emitted by the stream
    # (gap-split within a batch or event-time timeout across batches);
    # the stream never emits each user's final still-open session.
    assert want <= got
    open_sessions = got - want
    n_users = len({u for (u, *_rest) in got})
    assert len(open_sessions) <= n_users


def test_stream_to_delta_sink(spark, stream_dir):
    """End-to-end: stream micro-batches into our Delta format, then read
    it back through the log and analyze its health."""
    import tempfile

    from delta_lake_health_spark.operators.health import HealthAnalyzer
    from delta_lake_health_spark.sources.delta_log import DeltaLog

    tmp, src = stream_dir
    out = os.path.join(tempfile.mkdtemp(), "events_delta")
    stream = jobs.read_events_stream(spark, src, max_files_per_trigger=1)
    enriched = stream.withColumn("event_date", F.to_date("ts"))
    jobs.stream_to_delta(enriched, out, os.path.join(tmp, "cp3"),
                         partition_by=["event_type"])

    log = DeltaLog(spark, out)
    n_src = load(spark, SF, "events").count()
    assert log.record_count() == n_src          # log-only count, no scan
    assert log.snapshot().count() == n_src
    ops = log.operation_counts()
    assert ops["WRITE"] == 3                    # one commit per micro-batch
    m = HealthAnalyzer(spark).analyze_table(out, collect_partitions=False)
    assert m.record_count == n_src
    assert m.number_of_writes == 3
    assert m.skew_metrics["partition_columns"] == ["event_type"]

    # replay idempotence: each micro-batch commit carried a txn action
    # keyed by (checkpoint_dir, batch_id); re-delivering an already
    # committed batch (restart after sink commit, before the streaming
    # checkpoint advanced) must be a no-op, not a duplicate append
    cp = os.path.join(tmp, "cp3")
    assert log.last_txn_version(cp) == 2
    from delta_lake_health_spark.sources import delta_writer

    replayed = log.snapshot().limit(5)
    v_before = delta_writer.current_version(out)
    v_after = delta_writer.write(
        spark, replayed, out, mode="append",
        partition_by=["event_type"], txn_app_id=cp, txn_version=1,
    )
    assert v_after == v_before                  # skipped, no new commit
    assert DeltaLog(spark, out).record_count() == n_src
    # a genuinely new batch id still commits
    delta_writer.write(
        spark, replayed, out, mode="append",
        partition_by=["event_type"], txn_app_id=cp, txn_version=3,
    )
    log2 = DeltaLog(spark, out)
    assert log2.record_count() == n_src + 5
    assert log2.last_txn_version(cp) == 3
    shutil.rmtree(os.path.dirname(out))


def test_dedup_stream_drops_repeats(spark, stream_dir):
    """Duplicate event_ids injected across micro-batches within the
    watermark window must collapse to one row each."""
    import tempfile

    tmp, src = stream_dir
    dup_dir = os.path.join(tempfile.mkdtemp(), "in")
    os.makedirs(dup_dir)
    # copy the chunks, then re-append chunk 0's file as a late duplicate
    files = sorted(f for f in os.listdir(src) if f.endswith(".parquet"))
    for i, f in enumerate(files):
        shutil.copy(os.path.join(src, f), os.path.join(dup_dir, f"{i:03d}.parquet"))
    shutil.copy(
        os.path.join(src, files[0]),
        os.path.join(dup_dir, f"{len(files):03d}.parquet"),
    )
    stream = jobs.read_events_stream(spark, dup_dir, max_files_per_trigger=1)
    # watermark wider than the data's whole time span: no FIRST occurrence
    # can ever be late-dropped (watermark commit timing varies between
    # runs), so the only rows removed are true duplicates
    deduped = jobs.dedup_stream(stream, ["event_id"], watermark="2000 hours")
    jobs.run_to_memory(deduped, "dedup_t", "append", os.path.join(tmp, "cp4"))
    got = spark.table("dedup_t")
    n_unique = load(spark, SF, "events").count()
    assert got.count() == n_unique
    assert got.groupBy("event_id").count().where(F.col("count") > 1).count() == 0
    shutil.rmtree(os.path.dirname(dup_dir))


def test_stream_attribution_matches_batch_pairs(spark, stream_dir):
    """The stream-stream join must emit exactly the batch candidate set:
    every (purchase, view) pair by the same user with the view in the 30
    minutes before the purchase."""
    tmp, src = stream_dir
    stream = jobs.read_events_stream(spark, src)
    views = stream.where(F.col("event_type") == "view")
    purchases = stream.where(F.col("event_type") == "purchase")
    out = jobs.attribution_stream(views, purchases)
    jobs.run_to_memory(out, "attrib_t", "append", os.path.join(tmp, "cp_attrib"))
    got = {
        (r.purchase_id, r.view_id, r.lag_us)
        for r in spark.table("attrib_t").collect()
    }

    ev = load(spark, SF, "events").select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    v = ev.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("vu"), F.col("event_id").alias("view_id"),
        F.col("ts_us").alias("vt"),
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"),
        F.col("ts_us").alias("pt"),
    )
    want = {
        (r.purchase_id, r.view_id, r.pt - r.vt)
        for r in p.join(
            v,
            (F.col("vu") == F.col("user_id"))
            & (F.col("vt") <= F.col("pt"))
            & (F.col("vt") > F.col("pt") - jobs.SESSION_GAP_US),
        ).collect()
    }
    assert got == want
    assert len(got) > 0

    # and the batch as-of query is exactly the min-lag pair per purchase
    asof = {
        (r.purchase_id, r.view_id, r.lag_us)
        for r in batch_events.QUERIES["events_purchase_attribution"](
            spark, SF
        ).collect()
    }
    by_purchase: dict = {}
    for pid, vid, lag in want:
        cur = by_purchase.get(pid)
        # latest view = smallest lag; ties broken by highest view_id
        if cur is None or (lag, -vid) < (cur[1], -cur[0]):
            by_purchase[pid] = (vid, lag)
    want_asof = {(pid, vid, lag) for pid, (vid, lag) in by_purchase.items()}
    assert asof == want_asof


def test_stream_windowed_hll_matches_batch_exactly(spark, stream_dir):
    """The streaming HLL operator's flushed windows must equal the batch
    twin BIT-EXACTLY (same deterministic sketch on both paths) — a
    stronger claim than 'both approximately right'."""
    tmp, src = stream_dir
    stream = jobs.read_events_stream(spark, src, max_files_per_trigger=1)
    agg = jobs.windowed_hll_users(stream, watermark="30 minutes")
    jobs.run_to_memory(agg, "hll_t", "append", os.path.join(tmp, "cp_hll"))
    got = {
        (r.window_start, r.event_type): r.approx_users
        for r in spark.table("hll_t").collect()
    }

    from delta_lake_health_spark.plans.sketch import QUERIES as SKQ

    want = {
        (r.window_start, r.event_type): r.approx_users
        for r in SKQ["events_windowed_hll_users"](spark, SF).collect()
    }
    # every window the stream flushed must match the batch value exactly;
    # windows still open at end-of-stream (watermark never passed their
    # end) are legitimately absent
    assert got, "stream flushed no windows — watermark never advanced"
    for k, v in got.items():
        assert want.get(k) == v, (k, v, want.get(k))


def test_stream_upsert_to_delta_sink(spark):
    """Streaming MERGE sink: three micro-batches with overlapping keys
    land as upserts (last writer per key wins), and replaying a committed
    batch id is a no-op (txn guard on the merge commit)."""
    import pandas as pd

    from delta_lake_health_spark.sources import delta_writer
    from delta_lake_health_spark.sources.delta_log import DeltaLog

    tmp = tempfile.mkdtemp()
    src = os.path.join(tmp, "in")
    os.makedirs(src)
    chunks = [
        [(k, 0) for k in range(5)],          # create keys 0-4
        [(k, 1) for k in range(2, 7)],       # update 2-4, insert 5-6
        [(0, 2), (6, 2)],                    # update 0 and 6
    ]
    for i, rows in enumerate(chunks):
        spark.createDataFrame(pd.DataFrame(rows, columns=["k", "v"])).coalesce(
            1
        ).write.parquet(os.path.join(src, f"chunk_{i}"))
        for f in sorted(os.listdir(os.path.join(src, f"chunk_{i}"))):
            if f.endswith(".parquet"):
                os.rename(
                    os.path.join(src, f"chunk_{i}", f),
                    os.path.join(src, f"{i:03d}.parquet"),
                )
        shutil.rmtree(os.path.join(src, f"chunk_{i}"))

    out = os.path.join(tmp, "out_delta")
    ckpt = os.path.join(tmp, "ckpt")
    stream = (
        spark.readStream.schema("k long, v long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    jobs.stream_upsert_to_delta(stream, out, ckpt, ["k"])

    got = {r.k: r.v for r in DeltaLog(spark, out).snapshot().collect()}
    assert got == {0: 2, 1: 0, 2: 1, 3: 1, 4: 1, 5: 1, 6: 2}

    # replaying an already-committed batch id is skipped by the txn guard
    v_before = delta_writer.current_version(out)
    replay = spark.createDataFrame(
        pd.DataFrame([(0, 99)], columns=["k", "v"])
    )
    delta_writer.merge(spark, out, replay, ["k"], txn_app_id=ckpt, txn_version=2)
    assert delta_writer.current_version(out) == v_before
    got2 = {r.k: r.v for r in DeltaLog(spark, out).snapshot().collect()}
    assert got2 == got
    # a NEW batch id goes through
    delta_writer.merge(spark, out, replay, ["k"], txn_app_id=ckpt, txn_version=3)
    assert {r.k: r.v for r in DeltaLog(spark, out).snapshot().collect()}[0] == 99
    shutil.rmtree(tmp, ignore_errors=True)


def test_stream_mv_appends_tracks_source(spark, tmp_path):
    from pyspark.sql import functions as F

    from delta_lake_health_spark.sources import delta_writer
    from delta_lake_health_spark.sources.delta_log import DeltaLog
    from delta_lake_health_spark.streaming.jobs import stream_mv_appends

    src = str(tmp_path / "src")
    mv = str(tmp_path / "mv")
    ckpt = str(tmp_path / "ckpt")

    def rows(lo, hi):
        return spark.range(lo, hi).selectExpr(
            "id", "CAST(id % 5 AS LONG) AS k", "CAST(id * 3 AS LONG) AS v"
        )

    def expect():
        return {
            r.k: (r.n_rows, r.sum_v)
            for r in DeltaLog(spark, src)
            .snapshot()
            .groupBy("k")
            .agg(F.count("*").alias("n_rows"), F.sum("v").alias("sum_v"))
            .collect()
        }

    def got():
        return {
            r.k: (r.n_rows, r.sum_v)
            for r in DeltaLog(spark, mv).snapshot().collect()
        }

    delta_writer.write(spark, rows(0, 100).repartition(2), src)
    delta_writer.write(spark, rows(100, 150).repartition(1), src)
    stream_mv_appends(spark, src, mv, ["k"], ["v"], ckpt)
    assert got() == expect()

    # two more source commits; the stream folds ONLY the new versions
    delta_writer.write(spark, rows(150, 200).repartition(1), src)
    delta_writer.write(spark, rows(200, 260).repartition(2), src)
    stream_mv_appends(spark, src, mv, ["k"], ["v"], ckpt)
    assert got() == expect()

    # no new source data: re-run is a clean no-op
    stream_mv_appends(spark, src, mv, ["k"], ["v"], ckpt)
    assert got() == expect()


def test_stream_left_outer_join_emits_unconverted_views(spark, stream_dir):
    """The watermarked LEFT OUTER stream-stream join: converted views
    emit one row per qualifying purchase; unconverted views emit exactly
    one NULL-purchase row once the watermark proves no match can arrive.
    Far-future sentinel events push the watermark past every view's
    join window (outer rows are held until event time advances — the
    documented operational corollary). The global watermark is the MIN
    across both watermarked streams and each side filters by event_type
    BEFORE its watermark operator, so the sentinel must appear on BOTH
    sides: one 'view' and one 'purchase' row (dummy users, spaced wider
    than the join window so they can't pair)."""
    import pandas as pd

    tmp, src = stream_dir
    src2 = os.path.join(tmp, "in_outer")
    os.makedirs(src2)
    for f in os.listdir(src):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(src, f), os.path.join(src2, f))
    max_ts_ns = load(spark, SF, "events").agg(
        F.max(F.unix_micros("ts"))
    ).collect()[0][0] * 1000
    far = max_ts_ns + 2 * 3600 * 10**9
    sentinel = pd.DataFrame(
        [
            {"event_id": 10**12, "ts": far, "user_id": -1,
             "event_type": "view", "value": 0.0, "props": "{}"},
            {"event_id": 10**12 + 1, "ts": far + 3600 * 10**9, "user_id": -2,
             "event_type": "purchase", "value": 0.0, "props": "{}"},
        ]
    )
    spark.createDataFrame(sentinel).coalesce(1).write.mode("append").parquet(src2)

    stream = jobs.read_events_stream(spark, src2)
    views = stream.where(F.col("event_type") == "view")
    purchases = stream.where(F.col("event_type") == "purchase")
    out = jobs.unconverted_views_stream(views, purchases)
    jobs.run_to_memory(out, "outer_t", "append", os.path.join(tmp, "cp_outer"))
    got = spark.table("outer_t").collect()

    ev = load(spark, SF, "events").select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    v = ev.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("vu"), F.col("event_id").alias("view_id"),
        F.col("ts_us").alias("vt"),
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("event_id").alias("purchase_id"),
        F.col("ts_us").alias("pt"),
    )
    want_pairs = {
        (r.view_id, r.purchase_id, r.pt - r.vt)
        for r in v.join(
            p,
            (F.col("vu") == F.col("pu"))
            & (F.col("pt") >= F.col("vt"))
            & (F.col("pt") < F.col("vt") + jobs.SESSION_GAP_US),
        ).collect()
    }
    converted_views = {vid for vid, _, _ in want_pairs}
    all_views = {r.view_id for r in v.collect()}

    got_pairs = {
        (r.view_id, r.purchase_id, r.lag_us) for r in got if r.converted
    }
    got_null = [r for r in got if not r.converted]
    assert got_pairs == want_pairs
    # every unconverted view emits exactly one NULL row
    assert {r.view_id for r in got_null} == all_views - converted_views
    assert len(got_null) == len(all_views - converted_views)
    assert all(r.purchase_id is None and r.lag_us is None for r in got_null)
    assert len(got_null) > 0


def test_stream_cusum_matches_batch_exactly(spark, stream_dir):
    """Streaming CUSUM (VERDICT r10 #7): the flushed per-hour series
    must equal the batch detector's prefix BIT-EXACTLY — same
    sequential double accumulation, same 6-dp round-before-threshold —
    with the same reference means supplied to both sides. Hours whose
    end the watermark never passed are legitimately absent."""
    from delta_lake_health_spark.plans.events import (
        _CUSUM_H,
        _CUSUM_SLACK,
        cusum_hourly_series,
    )

    tmp, src = stream_dir
    ev = load(spark, SF, "events")
    hrs = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count(F.lit(1)).alias("c"))
    mu_df = hrs.groupBy("event_type").agg(F.avg("c").alias("mu"))
    mu = {r.event_type: r.mu for r in mu_df.collect()}
    want = {
        (r.event_type, int(r.hr.timestamp() * 1_000_000)): (
            r.c,
            r.cusum,
            r.cusum > _CUSUM_H,
        )
        for r in cusum_hourly_series(hrs, mu_df).collect()
    }

    stream = jobs.read_events_stream(spark, src, max_files_per_trigger=1)
    out = jobs.stream_cusum_alerts(
        stream, mu=mu, slack=_CUSUM_SLACK, h=_CUSUM_H,
        watermark="30 minutes",
    )
    jobs.run_to_memory(out, "cusum_t", "append", os.path.join(tmp, "cp_cu"))
    got = {
        (r.event_type, r.hr_us): (r.c, r.cusum, r.alert)
        for r in spark.table("cusum_t").collect()
    }
    assert got, "stream flushed no hours — watermark never advanced"
    for k, v in got.items():
        assert want.get(k) == v, (k, v, want.get(k))
    # flushed hours must be a PREFIX per type (recursion state in order)
    per_type: dict = {}
    for (etype, hr_us) in got:
        per_type.setdefault(etype, []).append(hr_us)
    for etype, flushed in per_type.items():
        all_hrs = sorted(
            h for (t, h) in want if t == etype
        )
        assert sorted(flushed) == all_hrs[: len(flushed)]


def test_stream_cusum_flushes_quiet_types(spark):
    """Review fix (r11): a type that goes QUIET must still flush its
    closed hours when the global watermark advances on other types'
    data — the event-time timeout path. Type "b" only ever appears in
    micro-batch 1; its closed hour must still be emitted."""
    import pandas as pd

    tmp = tempfile.mkdtemp()
    src = os.path.join(tmp, "in")
    os.makedirs(src)
    base = 1_700_000_000_000_000  # us, hour-aligned enough
    base -= base % 3_600_000_000
    chunks = [
        # batch 1: both types active in hour 0
        [("a", base + 10), ("b", base + 20), ("b", base + 30)],
        # batch 2+3: ONLY type a, hours 1..2 — the watermark advances
        # past hour 0 and later hour 1 on a's data alone
        [("a", base + 3_600_000_000 + 10)],
        [("a", base + 2 * 3_600_000_000 + 3_600_000_000)],
    ]
    for i, rows in enumerate(chunks):
        pdf = pd.DataFrame(
            [
                {
                    "event_id": j,
                    "ts": ts * 1000,
                    "user_id": 1,
                    "event_type": et,
                    "value": 1.0,
                    "props": "{}",
                }
                for j, (et, ts) in enumerate(rows)
            ]
        )
        spark.createDataFrame(pdf).coalesce(1).write.parquet(
            os.path.join(src, f"c{i}")
        )
    flat = os.path.join(tmp, "flat")
    os.makedirs(flat)
    n = 0
    for i in range(3):
        d = os.path.join(src, f"c{i}")
        for f in sorted(os.listdir(d)):
            if f.endswith(".parquet"):
                os.rename(
                    os.path.join(d, f), os.path.join(flat, f"f{n}.parquet")
                )
                n += 1
    stream = jobs.read_events_stream(spark, flat, max_files_per_trigger=1)
    out = jobs.stream_cusum_alerts(
        stream, mu={"a": 1.0, "b": 1.0}, slack=0.5, h=4.0,
        watermark="10 minutes",
    )
    jobs.run_to_memory(out, "cusum_q", "append", os.path.join(tmp, "cp"))
    got = {
        (r.event_type, r.hr_us): r.c
        for r in spark.table("cusum_q").collect()
    }
    # b's only hour closed while b itself was silent — timeout flushed it
    assert got.get(("b", base)) == 2, got
    assert got.get(("a", base)) == 1, got


def test_stream_dedup_ingest_full_history(spark):
    """stream_dedup_ingest (r11): exact full-history dedup at the
    corpus door — duplicate keys within a batch, across batches, and
    across RESTARTS (new checkpoint, overlapping data) never land
    twice; the target table is the seen-set, no streaming state."""
    import pandas as pd

    from delta_lake_health_spark.sources import delta_writer
    from delta_lake_health_spark.sources.delta_log import DeltaLog

    tmp = tempfile.mkdtemp()
    src = os.path.join(tmp, "in")
    os.makedirs(src)
    # three files -> three micro-batches; keys overlap heavily
    chunks = [
        [(1, "a"), (2, "b"), (2, "b2")],   # in-batch dup on 2
        [(2, "b3"), (3, "c")],             # cross-batch dup on 2
        [(1, "a2"), (4, "d"), (3, "c2")],  # cross-batch dups on 1, 3
    ]
    for i, rows in enumerate(chunks):
        pdf = pd.DataFrame(
            [{"doc_id": k, "text": t} for k, t in rows]
        )
        spark.createDataFrame(pdf).coalesce(1).write.parquet(
            os.path.join(src, f"c{i}")
        )
    flat = os.path.join(tmp, "flat")
    os.makedirs(flat)
    n = 0
    for i in range(3):
        d = os.path.join(src, f"c{i}")
        for f in sorted(os.listdir(d)):
            if f.endswith(".parquet"):
                os.rename(
                    os.path.join(d, f), os.path.join(flat, f"f{n}.parquet")
                )
                n += 1
    tbl = os.path.join(tmp, "corpus")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(flat)
    )
    jobs.stream_dedup_ingest(
        stream, tbl, os.path.join(tmp, "cp1"), ["doc_id"]
    )
    got = {
        r.doc_id for r in DeltaLog(spark, tbl).snapshot().collect()
    }
    assert got == {1, 2, 3, 4}
    assert DeltaLog(spark, tbl).snapshot().count() == 4

    # restart with a FRESH checkpoint over the same source: every batch
    # re-delivers, every key is already in the table -> nothing commits
    v = delta_writer.current_version(tbl)
    stream2 = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(flat)
    )
    jobs.stream_dedup_ingest(
        stream2, tbl, os.path.join(tmp, "cp2"), ["doc_id"]
    )
    assert delta_writer.current_version(tbl) == v
    assert DeltaLog(spark, tbl).snapshot().count() == 4


def test_stream_cusum_missing_mu_fails_loudly(spark):
    """ADVICE r11: an event_type with no reference mean must FAIL the
    query (misconfiguration), not default mu=0 and alert forever."""
    import pandas as pd

    tmp = tempfile.mkdtemp()
    src = os.path.join(tmp, "in")
    os.makedirs(src)
    base = 1_700_000_000_000_000
    base -= base % 3_600_000_000
    pdf = pd.DataFrame(
        [
            {
                "event_id": j,
                "ts": (base + j * 3_600_000_000) * 1000,
                "user_id": 1,
                "event_type": et,
                "value": 1.0,
                "props": "{}",
            }
            for j, et in enumerate(["a", "unconfigured_type", "a"])
        ]
    )
    spark.createDataFrame(pdf).coalesce(1).write.parquet(
        os.path.join(src, "c0")
    )
    stream = jobs.read_events_stream(spark, os.path.join(src, "c0"))
    out = jobs.stream_cusum_alerts(
        stream, mu={"a": 1.0}, slack=0.5, h=4.0, watermark="10 minutes"
    )
    with pytest.raises(Exception, match="has no entry"):
        jobs.run_to_memory(
            out, "cusum_missing_mu", "append", os.path.join(tmp, "cp")
        )
