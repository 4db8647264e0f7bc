"""Sketch / approximate aggregation operators (the 100 TB scale path).

Exact ``COUNT(DISTINCT ...)`` and exact percentiles both need a shuffle
whose state grows with cardinality; at 100 TB the mergeable sketches are
what you actually run:

- ``sketch_approx_distinct`` — HyperLogLog++ distinct users per event
  type (``approx_count_distinct``): fixed-size (kilobytes) mergeable
  state per group, one map-side-combinable pass, relative error ~rsd.
- ``sketch_approx_percentiles`` — ``percentile_approx`` (Greenwald-
  Khanna) per event type: bounded state (accuracy parameter), mergeable,
  vs the exact sort-based percentile.

Neither sketch is bit-reproducible across engines (DuckDB's approximate
aggregates use different algorithms/seeds), so these entries ship WITHOUT
an oracle — the driver records the weaker rows-only check, and the error
bounds are asserted by pytest against the exact values
(tests/test_sketch.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from delta_lake_health_spark.sources.catalog import load

QUERIES: dict = {}
ORACLE: dict = {}

RSD = 0.02  # target relative standard deviation for HLL++
PCT_ACCURACY = 5000  # Greenwald-Khanna accuracy (error <= 1/accuracy)


def query(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


@query("sketch_approx_distinct", None)
def sketch_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("user_id", RSD).alias("approx_users"),
        )
        .orderBy("event_type")
    )


@query("sketch_approx_percentiles", None)
def sketch_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    pct = F.expr(
        f"percentile_approx(value, array(0.5, 0.95, 0.99), {PCT_ACCURACY})"
    )
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(pct[0], 6).alias("p50"),
            F.round(pct[1], 6).alias("p95"),
            F.round(pct[2], 6).alias("p99"),
        )
        .orderBy("event_type")
    )


@query("events_windowed_hll_users", None)
def events_windowed_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly approx-distinct users per event type via OUR deterministic
    HLL (operators/hll.py) — the batch twin of the streaming
    ``windowed_hll_users`` stateful operator. Registers are built per
    (window, event_type) group with vectorized numpy inside
    ``applyInPandas`` (Arrow-batched; the update is a max-merge, so any
    row order gives identical registers) and the estimate is therefore
    bit-identical to the stream's. No oracle: HLL isn't SQL-expressible —
    rows-only driver check; the batch/stream equality and the error bound
    vs exact COUNT(DISTINCT) are asserted in tests/test_streaming.py and
    tests/test_sketch.py.

    Scale: state is 4 KiB per (window x type) group — the map-side
    partial aggregation shape that makes windowed distinct-counting
    feasible at 100 TB (exact distinct needs a user_id-cardinality
    shuffle per window).
    """
    import pandas as pd

    from delta_lake_health_spark.operators import hll

    ev = load(spark, sf_dir, "events")
    prepared = ev.select(
        F.date_format(
            F.window("ts", "1 hour").getField("start"), "yyyy-MM-dd HH:mm:ss"
        ).alias("window_start"),
        "event_type",
        "user_id",
    )

    def agg(pdf: pd.DataFrame) -> pd.DataFrame:
        registers = hll.empty_registers()
        hll.update_registers(registers, pdf["user_id"].to_numpy())
        return pd.DataFrame(
            [
                {
                    "window_start": pdf["window_start"].iloc[0],
                    "event_type": pdf["event_type"].iloc[0],
                    "approx_users": hll.estimate(registers),
                }
            ]
        )

    return (
        prepared.groupBy("window_start", "event_type")
        .applyInPandas(
            agg, "window_start string, event_type string, approx_users long"
        )
        .orderBy("window_start", "event_type")
    )


@query("sketch_heavy_hitters", None)
def sketch_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4 — corpus heavy-hitter tokens via a count-min sketch
    (operators/cms.py): per-partition (D x W) sketches + bounded local
    candidate lists, one tiny cell-sum shuffle, estimates resolved on
    the driver against the merged matrix. The corpus itself never
    shuffles on the (zipfian-hot) token key — the property that makes
    heavy-hitter detection feasible at 100 TB where the exact groupBy
    straggles on the head tokens. CMS counts are additive, so the merged
    matrix is bit-identical regardless of partitioning/order; no oracle
    (the sketch isn't SQL-expressible) — overestimate-only and top-k
    containment vs exact counts are asserted in tests/test_sketch.py.
    """
    import pandas as pd

    from delta_lake_health_spark.operators import cms

    TOP_K = 20
    LOCAL_CANDIDATES = 64

    docs = load(spark, sf_dir, "documents").select("text")

    def partial(batches):
        sketch = cms.new_sketch()
        local_counts: dict[str, int] = {}
        for pdf in batches:
            toks = pdf["text"].str.split(" ").explode()
            counts = toks.value_counts()
            keys = cms.hash_strings(list(counts.index))
            cms.update(sketch, keys, counts.to_numpy())
            for t, c in counts.items():
                local_counts[t] = local_counts.get(t, 0) + int(c)
        rows = [
            {"kind": 0, "cell": int(j * cms.W + w), "cnt": int(v), "token": ""}
            for j in range(cms.D)
            for w, v in enumerate(sketch[j])
            if v
        ]
        top_local = sorted(local_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        rows += [
            {"kind": 1, "cell": 0, "cnt": 0, "token": t}
            for t, _ in top_local[:LOCAL_CANDIDATES]
        ]
        yield pd.DataFrame(rows, columns=["kind", "cell", "cnt", "token"])

    parts = docs.mapInPandas(
        partial, "kind int, cell long, cnt long, token string"
    )
    parts = parts.localCheckpoint()  # one corpus pass feeds both branches
    cells = (
        parts.where("kind = 0")
        .groupBy("cell")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    )
    candidates = sorted(
        r.token for r in parts.where("kind = 1").select("token").distinct().collect()
    )

    from delta_lake_health_spark.operators import cms as _cms

    sketch = _cms.new_sketch()
    for r in cells:
        sketch[r.cell // _cms.W][r.cell % _cms.W] = r.cnt
    est = _cms.estimate(sketch, _cms.hash_strings(candidates))
    order = sorted(
        zip(candidates, (int(e) for e in est)), key=lambda kv: (-kv[1], kv[0])
    )[:TOP_K]
    return spark.createDataFrame(order, "token string, est_count long")


@query("sketch_user_overlap", None)
def sketch_user_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K5 — pairwise distinct-user overlap between event types via KMV
    bottom-k sketches (operators/kmv.py): estimated distinct users per
    type, shared users, and Jaccard for every type pair — the
    segment-overlap question HLL cannot answer (no sound HLL
    intersection). Scale shape: one corpus pass builds per-partition
    bottom-k sketches (mapInPandas, numpy); the per-type merge is a
    groupBy over at most partitions x K tiny rows (the k global
    smallest are each some partition's k smallest, so merging
    per-partition bottom-ks is exact; past ~10k partitions insert a
    (type, h mod B) pre-merge level — the same covering argument holds
    per bucket); the pairwise math
    runs on |types|² driver-side sketches of K values each. The corpus
    never shuffles on user_id. Rows-only (the sketch isn't
    SQL-expressible); error bounds and the exact-below-K regime are
    asserted in tests/test_sketch.py."""
    import numpy as np
    import pandas as pd

    from delta_lake_health_spark.operators import kmv

    SIGN = np.uint64(1 << 63)

    ev = load(spark, sf_dir, "events").select("event_type", "user_id")

    def partial(batches):
        acc: dict[str, np.ndarray] = {}
        for pdf in batches:
            for etype, grp in pdf.groupby("event_type"):
                h = kmv.sketch(kmv.hash_i64(grp["user_id"].to_numpy()))
                prev = acc.get(etype)
                acc[etype] = h if prev is None else kmv.union(prev, h)
        rows = [
            # XOR the sign bit: uint64 hash order == int64 column order,
            # so the JVM-side array_sort below sorts hashes correctly
            {"event_type": t, "h": int(v)}
            for t, sk in acc.items()
            for v in (sk ^ SIGN).view(np.int64)
        ]
        yield pd.DataFrame(rows, columns=["event_type", "h"])

    merged = (
        ev.mapInPandas(partial, "event_type string, h long")
        .groupBy("event_type")
        .agg(
            F.slice(F.array_sort(F.collect_set("h")), 1, kmv.K).alias("sk")
        )
        .collect()
    )
    sketches = {
        r.event_type: (np.array(r.sk, dtype=np.int64).view(np.uint64) ^ SIGN)
        for r in merged
    }
    out = []
    for a in sorted(sketches):
        for b in sorted(sketches):
            if a >= b:
                continue
            inter, jac = kmv.intersect_estimate(sketches[a], sketches[b])
            out.append(
                (
                    a,
                    b,
                    int(round(kmv.estimate(sketches[a]))),
                    int(round(kmv.estimate(sketches[b]))),
                    int(round(inter)),
                    round(jac, 6),
                )
            )
    return spark.createDataFrame(
        out,
        "type_a string, type_b string, est_users_a long, est_users_b long, "
        "est_shared long, jaccard double",
    )


@query("sketch_sample_quantiles", None)
def sketch_sample_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K6 — per-type value quantiles from the deterministic
    bottom-k-by-hash row sample (operators/psample.py): the
    ORDER-INVARIANT alternative to GK/t-digest — the k globally
    smallest row hashes are a deterministic set, so any partitioning,
    batch or stream, yields the bit-identical sketch (asserted in
    tests/test_psample.py). Scale shape: one corpus pass builds
    per-partition bottom-k samples (mapInPandas, numpy); the global
    bottom-k per type is a window over |partitions| x k tiny rows (each
    global member is some partition's local member — the KMV covering
    argument); nearest-rank quantiles come from the <= k sample rows.
    The corpus never shuffles whole. Rows-only (the sample set isn't
    SQL-expressible cross-engine); rank-error bounds and the
    exact-below-k regime are pytest-asserted."""
    import numpy as np
    import pandas as pd

    from delta_lake_health_spark.operators import psample
    from pyspark.sql.window import Window

    SIGN = np.uint64(1 << 63)
    ev = load(spark, sf_dir, "events").select(
        "event_type", "event_id", "value"
    )

    def partial(batches):
        acc: dict[str, tuple] = {}
        for pdf in batches:
            for etype, grp in pdf.groupby("event_type"):
                sk = psample.sketch(
                    grp["event_id"].to_numpy(), grp["value"].to_numpy()
                )
                prev = acc.get(etype)
                acc[etype] = sk if prev is None else psample.union(prev, sk)
        rows = [
            # sign-bit flip: uint64 hash order == signed long order
            {"event_type": t, "h": int(h), "v": float(v)}
            for t, (hs, vs) in acc.items()
            for h, v in zip((hs ^ SIGN).view(np.int64), vs)
        ]
        yield pd.DataFrame(rows, columns=["event_type", "h", "v"])

    parts = ev.mapInPandas(
        partial, "event_type string, h long, v double"
    )
    # cross-partition dedupe mirrors the operator: a replayed row whose
    # copies land in DIFFERENT partitions emits the same hash twice —
    # min(v) per (type, hash) is the operator's deterministic tie-break,
    # so the merged sample is bit-identical under any partitioning
    parts = parts.groupBy("event_type", "h").agg(F.min("v").alias("v"))
    bw = Window.partitionBy("event_type").orderBy("h")
    sample = (
        parts.withColumn("hrn", F.row_number().over(bw))
        .where(F.col("hrn") <= psample.K)
        .select("event_type", "v")
    )
    vw = Window.partitionBy("event_type").orderBy("v")
    # rank + count share one window pass — no join, no second scan
    ranked = sample.withColumn("vrn", F.row_number().over(vw)).withColumn(
        "n_sample",
        F.count(F.lit(1)).over(Window.partitionBy("event_type")),
    )
    picks = []
    for name, q in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
        r = F.greatest(F.lit(1), F.ceil(F.lit(q) * F.col("n_sample")))
        picks.append(
            F.max(F.when(F.col("vrn") == r, F.col("v"))).alias(name)
        )
    return (
        ranked.groupBy("event_type")
        .agg(F.max("n_sample").cast("long").alias("n_sample"), *picks)
        .orderBy("event_type")
    )
