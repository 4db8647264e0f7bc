"""Event-stream operators in their batch form (the Structured Streaming
variants live in ``streaming/jobs.py`` — same logic, watermarked).

Determinism notes: session boundaries compare exact microsecond epochs
(``unix_micros`` / ``epoch_us``) so Spark and DuckDB agree bit-for-bit;
window orderings always carry ``event_id`` as a unique tiebreaker.

Scale: sessionization is the canonical "one shuffle by entity, then a
sorted window per entity" pattern — partitions by ``user_id`` only, so it
scales to any event volume as long as a single user's history fits an
executor (true for any sane dataset; skewed mega-users are handled by
AQE skew splitting for the aggregation that follows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from delta_lake_health_spark.sources.catalog import load

QUERIES: dict = {}
ORACLE: dict = {}

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes

# t-digest/GK accuracy for the percentile_approx twins: rank error is
# bounded by 1/accuracy of the group size — fixed-size mergeable state,
# the 100 TB form of the exact percentiles used for oracle parity.
PCT_APPROX_ACCURACY = 10_000


def _pct(col: str, p: float, approx: bool) -> F.Column:
    """Exact ``percentile`` (oracle-parity form: interpolating, but its
    per-group state is the full sorted values — an OOM risk for a
    mega-group at 100 TB) or ``percentile_approx`` (rank-based on a
    bounded sketch; the at-scale form). Callers expose ``approx=`` so the
    swap is a parameter, not a code edit."""
    if approx:
        return F.percentile_approx(col, p, PCT_APPROX_ACCURACY)
    return F.expr(f"percentile({col}, {p})")


def query(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


# --------------------------------------------------------------------------
# E1 — tumbling hourly windows per event type.
@query(
    "events_tumbling_hourly",
    """
    SELECT STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("window_start", "event_type")
    )


def _session_rows(ev: DataFrame) -> DataFrame:
    """Per-event session ids: lag → new-session flag → running sum. One
    shuffle by user_id; shared by sessionization and the interval join."""
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    flagged = ev.select(
        "user_id", "event_id", "value", F.unix_micros("ts").alias("ts_us")
    ).withColumn(
        "is_new",
        F.when(
            F.lag("ts_us").over(w).isNull()
            | ((F.col("ts_us") - F.lag("ts_us").over(w)) > SESSION_GAP_US),
            1,
        ).otherwise(0),
    )
    return flagged.withColumn(
        "session_id",
        F.sum("is_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


# --------------------------------------------------------------------------
# E2 — sessionization with a 30-minute inactivity gap. lag → flag → running
# sum = session id; then one aggregate per (user, session).
@query(
    "events_sessionization",
    f"""
    WITH flagged AS (
      SELECT user_id, event_id, value,
             epoch_us(ts) AS ts_us,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {SESSION_GAP_US}
                  OR LAG(epoch_us(ts)) OVER w IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, event_id, value, ts_us,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id,
           CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS session_value,
           CAST(MAX(ts_us) - MIN(ts_us) AS BIGINT) AS duration_us
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    sessions = _session_rows(load(spark, sf_dir, "events"))
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
            (F.max("ts_us") - F.min("ts_us")).cast("long").alias("duration_us"),
        )
        .select(
            "user_id",
            F.col("session_id").cast("long").alias("session_id"),
            "n_events",
            "session_value",
            "duration_us",
        )
        .orderBy("user_id", "session_id")
    )


# --------------------------------------------------------------------------
# E11 — sliding (hopping) windows: 1-hour windows every 30 minutes, so
# each event lands in exactly two windows. Spark's F.window(len, slide)
# aligns window starts to epoch multiples of the slide; the oracle
# reproduces that with floor arithmetic on epoch micros x range(2).
_SLIDE_US = 30 * 60 * 1_000_000


@query(
    "events_sliding_hourly",
    f"""
    SELECT STRFTIME(make_timestamp(
             ((epoch_us(ts) // {_SLIDE_US}) - k.range) * {_SLIDE_US}),
             '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM events, range(2) k
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def events_sliding_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


# --------------------------------------------------------------------------
# E10 — point-in-interval join: each purchase joined to the session that
# contains it. The oracle uses the plain BETWEEN range join; the Spark
# plan goes through operators/rangejoin.py's bucketized equi-join (the
# range predicate becomes a (user, hour-bucket) hash-join key, so there
# is no nested-loop pair set at any scale).
@query(
    "events_purchase_sessions",
    f"""
    WITH flagged AS (
      SELECT user_id, event_id, value,
             epoch_us(ts) AS ts_us,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {SESSION_GAP_US}
                  OR LAG(epoch_us(ts)) OVER w IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, event_id, ts_us,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    ), bounds AS (
      SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
             MIN(ts_us) AS start_us, MAX(ts_us) AS end_us,
             COUNT(*) AS session_n_events
      FROM sessions GROUP BY user_id, session_id
    ), p AS (
      SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS pt
      FROM events WHERE event_type = 'purchase'
    )
    SELECT purchase_id, p.user_id, session_id,
           CAST(pt - start_us AS BIGINT) AS offset_us,
           session_n_events
    FROM p JOIN bounds b ON b.user_id = p.user_id
                        AND pt BETWEEN start_us AND end_us
    ORDER BY purchase_id, session_id
    """,
)
def events_purchase_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_health_spark.operators.rangejoin import interval_point_join

    ev = load(spark, sf_dir, "events")
    bounds = (
        _session_rows(ev)
        .groupBy("user_id", F.col("session_id").cast("long").alias("session_id"))
        .agg(
            F.min("ts_us").alias("start_us"),
            F.max("ts_us").alias("end_us"),
            F.count(F.lit(1)).alias("session_n_events"),
        )
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.unix_micros("ts").alias("pt"),
    )
    joined = interval_point_join(
        purchases,
        bounds,
        on=["user_id"],
        point_ts="pt",
        start_ts="start_us",
        end_ts="end_us",
        bucket=3_600_000_000,  # 1-hour buckets ~ typical session length
    )
    return joined.select(
        "purchase_id",
        "user_id",
        "session_id",
        (F.col("pt") - F.col("start_us")).cast("long").alias("offset_us"),
        "session_n_events",
    ).orderBy("purchase_id", "session_id")


# --------------------------------------------------------------------------
# E3 — per-user activity profile.
@query(
    "events_user_stats",
    """
    SELECT user_id,
           COUNT(*) AS n_events,
           COUNT(DISTINCT event_type) AS n_types,
           ROUND(SUM(value), 2) AS total_value,
           STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S') AS first_seen,
           STRFTIME(MAX(ts), '%Y-%m-%d %H:%M:%S') AS last_seen
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def events_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_type").alias("n_types"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("first_seen"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("last_seen"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# E4 — view→purchase conversion funnel (conditional min-timestamp pattern).
@query(
    "events_purchase_funnel",
    """
    WITH per_user AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view'     THEN epoch_us(ts) END) AS first_view_us,
             MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS first_purchase_us
      FROM events GROUP BY user_id
    )
    SELECT COUNT(*) AS n_users,
           CAST(SUM(CASE WHEN first_view_us IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_viewers,
           CAST(SUM(CASE WHEN first_purchase_us IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_buyers,
           CAST(SUM(CASE WHEN first_view_us IS NOT NULL AND first_purchase_us > first_view_us
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
    FROM per_user
    """,
)
def events_purchase_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", us)).alias("first_view_us"),
        F.min(F.when(F.col("event_type") == "purchase", us)).alias("first_purchase_us"),
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.when(F.col("first_view_us").isNotNull(), 1).otherwise(0)).alias(
            "n_viewers"
        ),
        F.sum(F.when(F.col("first_purchase_us").isNotNull(), 1).otherwise(0)).alias(
            "n_buyers"
        ),
        F.sum(
            F.when(
                F.col("first_view_us").isNotNull()
                & (F.col("first_purchase_us") > F.col("first_view_us")),
                1,
            ).otherwise(0)
        ).alias("n_converted"),
    )


# --------------------------------------------------------------------------
# E8 — purchase attribution: for every purchase, the LATEST view by the
# same user within the preceding 30 minutes (backward as-of join with
# tolerance). The oracle is the textbook range-join + row_number form;
# the Spark plan uses operators/asof.py's union + sort + carry-forward,
# which never materializes the |purchase x view| pair set.
@query(
    "events_purchase_attribution",
    f"""
    WITH v AS (
      SELECT user_id, event_id AS view_id, epoch_us(ts) AS vt
      FROM events WHERE event_type = 'view'
    ),
    p AS (
      SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS pt, value
      FROM events WHERE event_type = 'purchase'
    )
    SELECT purchase_id, user_id, view_id,
           CAST(pt - vt AS BIGINT) AS lag_us,
           ROUND(value, 2) AS purchase_value
    FROM (
      SELECT p.purchase_id, p.user_id, v.view_id, p.pt, v.vt, p.value,
             ROW_NUMBER() OVER (PARTITION BY p.purchase_id
                                ORDER BY v.vt DESC, v.view_id DESC) AS rn
      FROM p JOIN v ON v.user_id = p.user_id
         AND v.vt <= p.pt AND v.vt > p.pt - {SESSION_GAP_US}
    ) WHERE rn = 1
    ORDER BY purchase_id
    """,
)
def events_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_health_spark.operators.asof import asof_backward_join

    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("ts_us"),
        "value",
    )
    views = ev.where(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_evt"), "ts_us"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts_us", "value"
    )
    joined = asof_backward_join(
        purchases,
        views,
        on=["user_id"],
        left_ts="ts_us",
        right_ts="ts_us",
        payload={"view_id": "view_evt"},
        tolerance=SESSION_GAP_US,
        right_tiebreak="view_evt",
    )
    return (
        joined.where(F.col("view_id").isNotNull())
        .select(
            "purchase_id",
            "user_id",
            "view_id",
            (F.col("ts_us") - F.col("_asof_ts")).cast("long").alias("lag_us"),
            F.round("value", 2).alias("purchase_value"),
        )
        .orderBy("purchase_id")
    )


# --------------------------------------------------------------------------
# E12 — semi-structured JSON processing: extract props.k with JSON-path,
# bucket it, aggregate. get_json_object stays JVM-side (Jackson) — the
# standard pattern for schema-on-read event payloads.
@query(
    "events_props_json",
    """
    SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY 1 ORDER BY 1
    """,
)
def events_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            (F.get_json_object("props", "$.k").cast("long") % 10).alias("k_bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("k_bucket")
    )


# --------------------------------------------------------------------------
# E13 — pivot: per-user event-type counts as columns (explicit value list
# so the plan is a single pass, no distinct-discovery job).
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@query(
    "events_type_pivot",
    f"""
    SELECT user_id,
           {", ".join(
               f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS {t}"
               for t in EVENT_TYPES
           )}
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def events_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    pivoted = (
        ev.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    # pivot leaves null for absent (user, type) pairs; the SQL SUM form
    # yields 0 — align
    return pivoted.select(
        "user_id", *[F.coalesce(t, F.lit(0)).alias(t) for t in EVENT_TYPES]
    ).orderBy("user_id")


# --------------------------------------------------------------------------
# E5 — exact value percentiles per event type (Spark `percentile` and
# DuckDB `quantile_cont` use the same linear interpolation).
@query(
    "events_value_percentiles",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           ROUND(quantile_cont(value, 0.5), 6)  AS p50,
           ROUND(quantile_cont(value, 0.95), 6) AS p95,
           ROUND(quantile_cont(value, 0.99), 6) AS p99
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_value_percentiles(
    spark: SparkSession, sf_dir: str, approx: bool = False
) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(_pct("value", 0.5, approx), 6).alias("p50"),
            F.round(_pct("value", 0.95, approx), 6).alias("p95"),
            F.round(_pct("value", 0.99, approx), 6).alias("p99"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# E15 — daily cohort retention: users grouped by first-seen date; for
# each (cohort, day-offset <= 7) the distinct returning users and the
# retention rate vs cohort size.  Two shuffles total (first-seen per
# user, then the (cohort, offset) count); the cohort-size side is tiny
# and broadcasts.
@query(
    "events_daily_retention",
    """
    WITH f AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_date
      FROM events GROUP BY user_id
    ),
    c AS (SELECT cohort_date, COUNT(*) AS cohort_size FROM f GROUP BY 1),
    a AS (
      SELECT DISTINCT e.user_id, f.cohort_date,
             date_diff('day', f.cohort_date, CAST(e.ts AS DATE)) AS offset_days
      FROM events e JOIN f USING (user_id)
    )
    SELECT a.cohort_date, a.offset_days,
           COUNT(*) AS n_users,
           ROUND(CAST(COUNT(*) AS DOUBLE) / MAX(c.cohort_size), 6)
             AS retention_rate
    FROM a JOIN c USING (cohort_date)
    WHERE a.offset_days <= 7
    GROUP BY a.cohort_date, a.offset_days
    ORDER BY a.cohort_date, a.offset_days
    """,
)
def events_daily_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("d")
    )
    first = ev.groupBy("user_id").agg(F.min("d").alias("cohort_date"))
    sizes = first.groupBy("cohort_date").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    visits = (
        ev.join(first, "user_id")
        .select(
            "user_id",
            "cohort_date",
            F.datediff("d", "cohort_date").alias("offset_days"),
        )
        .distinct()
        .where(F.col("offset_days") <= 7)
    )
    return (
        visits.join(F.broadcast(sizes), "cohort_date")
        .groupBy("cohort_date", "offset_days")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.round(
                F.count(F.lit(1)).cast("double") / F.max("cohort_size"), 6
            ).alias("retention_rate"),
        )
        .orderBy("cohort_date", "offset_days")
    )


# --------------------------------------------------------------------------
# E16 — strictly-ordered funnel: users whose first signup happened before
# their first view, which happened before their first click, which
# happened before their first purchase — each stage's count requires the
# full ORDERED prefix (unlike E4's unordered conditional-min funnel).
# One groupBy(user) with conditional min aggregates, then one tiny
# summing pass: never a per-stage self-join.
@query(
    "events_funnel_strict_order",
    """
    WITH firsts AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events
      GROUP BY user_id
    )
    SELECT COUNT(*) AS n_users,
           CAST(SUM(CASE WHEN t_signup IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS stage_signup,
           CAST(SUM(CASE WHEN t_signup < t_view THEN 1 ELSE 0 END)
                AS BIGINT) AS stage_view,
           CAST(SUM(CASE WHEN t_signup < t_view AND t_view < t_click
                         THEN 1 ELSE 0 END) AS BIGINT) AS stage_click,
           CAST(SUM(CASE WHEN t_signup < t_view AND t_view < t_click
                          AND t_click < t_purchase
                         THEN 1 ELSE 0 END) AS BIGINT) AS stage_purchase
    FROM firsts
    """,
)
def events_funnel_strict_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")

    def first_of(t):
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    firsts = ev.groupBy("user_id").agg(
        first_of("signup").alias("t_signup"),
        first_of("view").alias("t_view"),
        first_of("click").alias("t_click"),
        first_of("purchase").alias("t_purchase"),
    )
    s1 = F.col("t_signup").isNotNull()
    s2 = F.col("t_signup") < F.col("t_view")
    s3 = s2 & (F.col("t_view") < F.col("t_click"))
    s4 = s3 & (F.col("t_click") < F.col("t_purchase"))
    return firsts.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(s1.cast("long")).alias("stage_signup"),
        F.sum(s2.cast("long")).alias("stage_view"),
        F.sum(s3.cast("long")).alias("stage_click"),
        F.sum(s4.cast("long")).alias("stage_purchase"),
    )


# --------------------------------------------------------------------------
# E17 — native session windows: the same 30-minute-gap sessions expressed
# with Spark's built-in ``session_window`` (one groupBy, JVM-side session
# merge) instead of the explicit lag+cumsum sessionizer of E2 — the
# operator a Spark-first user reaches for, validated against a from-first-
# principles oracle. NOTE the boundary semantics: ``session_window``
# starts a NEW session when the gap is >= the window (end is exclusive),
# while E2's custom sessionizer treats an exactly-gap-sized silence as the
# same session; the oracle mirrors the native rule.
@query(
    "events_session_window_native",
    f"""
    WITH s AS (
      SELECT user_id, event_id, value, ts,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w >= {SESSION_GAP_US}
                  OR LAG(epoch_us(ts)) OVER w IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sid AS (
      SELECT user_id, value, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM s
    )
    SELECT user_id,
           STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           STRFTIME(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S')
             AS session_end,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 6) AS total_value
    FROM sid
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
)
def events_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
            "total_value",
        )
        .orderBy("user_id", "session_start")
    )


# --------------------------------------------------------------------------
# E18 — activity heatmap: events per (day-of-week, hour) — the load
# profile behind capacity planning. Engines disagree on DOW origin
# (Spark Sunday=1, DuckDB Sunday=0), so the oracle shifts by one.
@query(
    "events_activity_heatmap",
    """
    SELECT CAST(EXTRACT(DOW FROM ts) + 1 AS INT) AS dow,
           CAST(EXTRACT(HOUR FROM ts) AS INT) AS hour_of_day,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1, 2
    ORDER BY dow, hour_of_day
    """,
)
def events_activity_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.dayofweek("ts").alias("dow"), F.hour("ts").alias("hour_of_day")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("dow", "hour_of_day")
    )


# --------------------------------------------------------------------------
# E19 — time-series anomaly detection on the hourly event volume: z-score
# each hour's count against the global mean/stddev and flag |z| > 2 (the
# ops-dashboard traffic-spike/outage detector). Scale shape: one hourly
# groupBy (map-side partials), then the 2-value stats row BROADCAST back
# — no second shuffle; at 100 TB the hourly series is |hours| rows,
# driver-scale, regardless of event volume.
@query(
    "events_anomaly_zscore",
    """
    WITH h AS (
      SELECT DATE_TRUNC('hour', ts) AS hour_ts, COUNT(*) AS n_events
      FROM events GROUP BY 1
    ),
    s AS (SELECT AVG(n_events) AS m, STDDEV_SAMP(n_events) AS sd FROM h)
    SELECT hour_ts, n_events,
           ROUND((n_events - m) / sd, 6) AS z
    FROM h CROSS JOIN s
    WHERE ABS((n_events - m) / sd) > 2
    ORDER BY hour_ts
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("hour_ts")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    stats = hourly.agg(
        F.avg("n_events").alias("m"), F.stddev_samp("n_events").alias("sd")
    )
    z = (F.col("n_events") - F.col("m")) / F.col("sd")
    return (
        hourly.crossJoin(F.broadcast(stats))
        .where(F.abs(z) > 2)
        .select("hour_ts", "n_events", F.round(z, 6).alias("z"))
        .orderBy("hour_ts")
    )


# --------------------------------------------------------------------------
# E21 — sequence-pattern matching (the MATCH_RECOGNIZE shape): per user,
# lay the event types on one deterministic time axis and count
# non-overlapping CONSECUTIVE view->click->purchase runs with a single
# regex over the joined sequence — sequence assembly is one groupBy
# (collect_list + array_sort, work ∝ user's events), the pattern scan is
# a JVM-side regexp, and ties are broken by (ts, event_id) identically
# in the oracle. At 100 TB the state per user is their event-type string
# — no self-joins, no per-stage passes.
@query(
    "events_sequence_pattern",
    """
    WITH seq AS (
      SELECT user_id,
             COUNT(*) AS n_events,
             string_agg(event_type, ',' ORDER BY ts, event_id) AS s
      FROM events GROUP BY user_id
    )
    SELECT user_id, n_events,
           len(regexp_extract_all(s, 'view,click,purchase')) AS n_conversions
    FROM seq
    WHERE len(regexp_extract_all(s, 'view,click,purchase')) > 0
    ORDER BY user_id
    """,
)
def events_sequence_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    seq = (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    lambda r: r["event_type"],
                ),
                ",",
            ).alias("s"),
        )
    )
    n_conv = F.size(F.regexp_extract_all("s", F.lit("view,click,purchase"), 0))
    return (
        seq.select("user_id", "n_events", n_conv.alias("n_conversions"))
        .where(F.col("n_conversions") > 0)
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# E22 — funnel time-to-convert: for each funnel step pair (view→click,
# click→purchase, view→purchase), the latency distribution between a
# user's FIRST occurrence of each stage (exact p50/p90/p99 + mean, over
# users who completed the pair in order). One per-user groupBy computes
# all three first-times (uniform user_id keys); the step pivot unions
# three tiny projections of that one aggregate — the events table is
# scanned once. Exact percentiles are the oracle-parity default;
# ``approx=True`` swaps in percentile_approx (fixed-size mergeable
# state) — the form to run at 100 TB.
@query(
    "events_funnel_latency",
    """
    WITH per_user AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view'     THEN epoch_us(ts) END) AS v,
             MIN(CASE WHEN event_type = 'click'    THEN epoch_us(ts) END) AS c,
             MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS p
      FROM events GROUP BY user_id
    ), lags AS (
      SELECT 'view_to_click' AS step, (c - v) / 1e6 AS lag_s
      FROM per_user WHERE v IS NOT NULL AND c > v
      UNION ALL
      SELECT 'click_to_purchase', (p - c) / 1e6
      FROM per_user WHERE c IS NOT NULL AND p > c
      UNION ALL
      SELECT 'view_to_purchase', (p - v) / 1e6
      FROM per_user WHERE v IS NOT NULL AND p > v
    )
    SELECT step,
           COUNT(*) AS n_users,
           ROUND(AVG(lag_s), 6) AS mean_s,
           ROUND(quantile_cont(lag_s, 0.5), 6)  AS p50_s,
           ROUND(quantile_cont(lag_s, 0.9), 6)  AS p90_s,
           ROUND(quantile_cont(lag_s, 0.99), 6) AS p99_s
    FROM lags
    GROUP BY step
    ORDER BY step
    """,
)
def events_funnel_latency(
    spark: SparkSession, sf_dir: str, approx: bool = False
) -> DataFrame:
    lags = _funnel_lags(spark, sf_dir)
    return (
        lags.groupBy("step")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.round(F.avg("lag_s"), 6).alias("mean_s"),
            F.round(_pct("lag_s", 0.5, approx), 6).alias("p50_s"),
            F.round(_pct("lag_s", 0.9, approx), 6).alias("p90_s"),
            F.round(_pct("lag_s", 0.99, approx), 6).alias("p99_s"),
        )
        .orderBy("step")
    )


def _funnel_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(step, lag_s) rows — the latency distribution E22 aggregates (and
    the approx-twin test re-brackets)."""
    ev = load(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", us)).alias("v"),
        F.min(F.when(F.col("event_type") == "click", us)).alias("c"),
        F.min(F.when(F.col("event_type") == "purchase", us)).alias("p"),
    )
    per_user = per_user.localCheckpoint()  # three step projections, one agg

    def step(name: str, a: str, b: str) -> DataFrame:
        return (
            per_user.where(F.col(a).isNotNull() & (F.col(b) > F.col(a)))
            .select(
                F.lit(name).alias("step"),
                ((F.col(b) - F.col(a)) / 1e6).alias("lag_s"),
            )
        )

    return (
        step("view_to_click", "v", "c")
        .unionAll(step("click_to_purchase", "c", "p"))
        .unionAll(step("view_to_purchase", "v", "p"))
    )


# --------------------------------------------------------------------------
# E23 — time-series gap filling + LOCF: turn the sparse hourly series
# into a DENSE per-type grid (every hour between the corpus bounds),
# zero-filling counts and carrying the last observed hourly average
# forward through empty hours (last_value IGNORE NULLS) — the resample/
# ffill step every monitoring pipeline needs before charting or anomaly
# scoring. Scale shape: the hourly aggregate is driver-scale regardless
# of event volume (hours x types rows); the dense grid is generated from
# a broadcast 1-row bounds aggregate via sequence+explode, never by
# scanning; the LOCF window partitions by event_type over that tiny
# series.
@query(
    "events_hourly_gapfill",
    """
    WITH h AS (
      SELECT event_type, date_trunc('hour', ts) AS hr, COUNT(*) AS n,
             ROUND(AVG(value), 6) AS avg_value
      FROM events GROUP BY 1, 2
    ), bounds AS (SELECT MIN(hr) AS lo, MAX(hr) AS hi FROM h),
    grid AS (
      SELECT t.event_type, g.hr
      FROM (SELECT DISTINCT event_type FROM h) t
      CROSS JOIN (SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr
                  FROM bounds) g
    )
    SELECT grid.event_type,
           STRFTIME(grid.hr, '%Y-%m-%d %H:%M:%S') AS hour,
           COALESCE(h.n, 0) AS n_events,
           CAST(h.n IS NULL AS BOOLEAN) AS gap_filled,
           last_value(h.avg_value IGNORE NULLS) OVER (
             PARTITION BY grid.event_type ORDER BY grid.hr
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS avg_value_locf
    FROM grid LEFT JOIN h ON h.event_type = grid.event_type AND h.hr = grid.hr
    ORDER BY grid.event_type, hour
    """,
)
def events_hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    h = (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("hr"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .localCheckpoint()  # bounds, types, and the join all read it
    )
    bounds = h.agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
    types = h.select("event_type").distinct()
    grid = (
        types.crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.expr("sequence(lo, hi, interval 1 hour)")
            ).alias("hr"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(h, ["event_type", "hr"], "left")
        .select(
            "event_type",
            F.date_format("hr", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
            F.col("n").isNull().alias("gap_filled"),
            F.last("avg_value", ignorenulls=True).over(w).alias("avg_value_locf"),
        )
        .orderBy("event_type", "hour")
    )


# --------------------------------------------------------------------------
# E24 — inter-event gap distribution: per event type, exact quantiles of
# the seconds between a user's CONSECUTIVE events — the signal that
# picks a sessionization gap (E2's 30 min) from data instead of
# folklore. One per-user-ordered lag window (uniform user_id
# partitions), then a tiny per-type aggregate.
@query(
    "events_inter_event_gaps",
    """
    WITH gaps AS (
      SELECT event_type,
             (epoch_us(ts) - lag(epoch_us(ts)) OVER (
                PARTITION BY user_id ORDER BY ts, event_id)) / 1e6 AS gap_s
      FROM events
    )
    SELECT event_type,
           COUNT(gap_s) AS n_gaps,
           ROUND(quantile_cont(gap_s, 0.5), 6) AS p50_s,
           ROUND(quantile_cont(gap_s, 0.9), 6) AS p90_s,
           ROUND(MAX(gap_s), 6) AS max_s
    FROM gaps
    WHERE gap_s IS NOT NULL
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_inter_event_gaps(
    spark: SparkSession, sf_dir: str, approx: bool = False
) -> DataFrame:
    gaps = _inter_event_gaps(spark, sf_dir)
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count("gap_s").alias("n_gaps"),
            F.round(_pct("gap_s", 0.5, approx), 6).alias("p50_s"),
            F.round(_pct("gap_s", 0.9, approx), 6).alias("p90_s"),
            F.round(F.max("gap_s"), 6).alias("max_s"),
        )
        .orderBy("event_type")
    )


def _inter_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, gap_s) rows — E24's distribution, reused by the
    approx-twin rank-error test."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_type",
        ((us - F.lag(us).over(w)) / 1e6).alias("gap_s"),
    ).where(F.col("gap_s").isNotNull())


# --------------------------------------------------------------------------
# Rows-only registry entries for the percentile_approx twins (E6/E22/E24
# at-scale forms): the exact-percentile base queries carry the DuckDB
# oracles; these run the SAME plans with `percentile_approx` (GK sketch,
# fixed-size mergeable state — the operator that actually ships at
# 100 TB) so the driver harness exercises the scale-path code itself.
# No oracle by design: the sketch's rank-error is engine-specific; the
# bound vs the exact form is pytest-asserted in
# tests/test_events_queries.py (rank-error brackets per family).
@query("events_value_percentiles_approx", None)
def events_value_percentiles_approx(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return events_value_percentiles(spark, sf_dir, approx=True)


@query("events_funnel_latency_approx", None)
def events_funnel_latency_approx(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return events_funnel_latency(spark, sf_dir, approx=True)


@query("events_inter_event_gaps_approx", None)
def events_inter_event_gaps_approx(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return events_inter_event_gaps(spark, sf_dir, approx=True)


# --------------------------------------------------------------------------
# E25 — Markov transition matrix over per-user event-type sequences: the
# behavioral "what follows what" model read before funnel design and the
# input to next-event-prediction features. One window shuffle by user_id
# (the sessionization partitioning, reused), then an aggregate on the
# bounded (src, dst) key space — |event_types|^2 rows — whose row-count
# is data-size-INDEPENDENT, so the normalizing window runs on a tiny
# frame. p_transition is an exact-integer ratio: no float noise can
# cross the engines.
@query(
    "events_markov_transitions",
    """
    WITH nxt AS (
      SELECT event_type AS src,
             LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS dst
      FROM events
    ), c AS (
      SELECT src, dst, COUNT(*) AS n_transitions
      FROM nxt WHERE dst IS NOT NULL GROUP BY 1, 2
    )
    SELECT src, dst, n_transitions,
           ROUND(n_transitions / SUM(n_transitions) OVER (PARTITION BY src),
                 6) AS p_transition
    FROM c ORDER BY src, dst
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("dst", F.lead("event_type").over(w))
        .where(F.col("dst").isNotNull())
        .select(F.col("event_type").alias("src"), "dst")
    )
    counts = pairs.groupBy("src", "dst").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    wsrc = Window.partitionBy("src")
    return (
        counts.withColumn(
            "p_transition",
            F.round(
                F.col("n_transitions") / F.sum("n_transitions").over(wsrc), 6
            ),
        )
        .select("src", "dst", "n_transitions", "p_transition")
        .orderBy("src", "dst")
    )


# --------------------------------------------------------------------------
# E26 — exponentially time-decayed engagement score per user (half-life
# weighting relative to the corpus's newest event): the standard
# recency-weighted LTV / activity feature. The decay argument is an
# exact-integer microsecond age divided by a constant, so both engines
# exponentiate the SAME double; per-term ulp noise is absorbed by the
# 4 dp round on the sum. Scale: one scalar broadcast (global max ts) +
# one user_id shuffle with map-side partial aggregation — the decayed
# sum is associative, so combiners run before the exchange.
DECAY_TAU_US = 7 * 24 * 3600 * 1_000_000  # 7-day e-folding time


@query(
    "events_user_decay_scores",
    f"""
    WITH mx AS (SELECT MAX(epoch_us(ts)) AS max_us FROM events)
    SELECT user_id,
           COUNT(*) AS n_events,
           MAX(epoch_us(ts)) AS last_seen_us,
           ROUND(SUM(value * EXP(-((mx.max_us - epoch_us(ts))
                                   / {DECAY_TAU_US}.0))), 4)
             AS decayed_value
    FROM events, mx
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def events_user_decay_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id", "value", F.unix_micros("ts").alias("ts_us")
    )
    mx = ev.agg(F.max("ts_us").alias("max_us"))
    decay = F.exp(
        -((F.col("max_us") - F.col("ts_us")) / F.lit(float(DECAY_TAU_US)))
    )
    return (
        ev.crossJoin(F.broadcast(mx))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("ts_us").alias("last_seen_us"),
            F.round(F.sum(F.col("value") * decay), 4).alias("decayed_value"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# E27 — weekly cohort retention matrix: users grouped by first-seen week
# (the cohort), counted per week-offset of later activity, with the
# retention share against the cohort's size — the canonical growth
# triangle. Scale shape: first-seen is one uniform user_id groupBy; the
# join back to events co-partitions on the SAME key (no second shuffle
# key); per-(user, cohort, offset) distinct runs with map-side partials;
# the cohort-size table is |weeks|-bounded and broadcast. week_offset is
# an exact integer (day difference of week-truncated dates / 7), and
# retention is one integer ratio — no float accumulation crosses the
# engines.
@query(
    "events_weekly_cohort_retention",
    """
    WITH firsts AS (
      SELECT user_id, CAST(DATE_TRUNC('week', MIN(ts)) AS DATE) AS cohort_week
      FROM events GROUP BY user_id
    ), act AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             CAST(DATE_DIFF('day', f.cohort_week,
                            CAST(DATE_TRUNC('week', e.ts) AS DATE)) / 7
                  AS BIGINT) AS week_offset
      FROM events e JOIN firsts f USING (user_id)
    ), sizes AS (
      SELECT cohort_week, COUNT(*) AS cohort_size FROM firsts GROUP BY 1
    )
    SELECT a.cohort_week, a.week_offset,
           COUNT(*) AS n_users,
           ROUND(COUNT(*) / CAST(s.cohort_size AS DOUBLE), 6) AS retention
    FROM act a JOIN sizes s USING (cohort_week)
    GROUP BY a.cohort_week, a.week_offset, s.cohort_size
    ORDER BY a.cohort_week, a.week_offset
    """,
)
def events_weekly_cohort_retention(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("user_id", "ts")
    firsts = ev.groupBy("user_id").agg(
        F.to_date(F.date_trunc("week", F.min("ts"))).alias("cohort_week")
    )
    act = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(
                    F.to_date(F.date_trunc("week", F.col("ts"))),
                    F.col("cohort_week"),
                )
                / 7
            )
            .cast("long")
            .alias("week_offset"),
        )
        .distinct()
    )
    sizes = firsts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return (
        act.groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "n_users",
            F.round(
                F.col("n_users") / F.col("cohort_size").cast("double"), 6
            ).alias("retention"),
        )
        .orderBy("cohort_week", "week_offset")
    )


# --------------------------------------------------------------------------
# E28 — user-value Pareto census: how concentrated is total event value
# across users (the "do 10% of users carry 80% of value" read before any
# sampling or rate-limit decision). Every sum is EXACT integer
# micro-units (value * 1e6 rounded once per event), so ranking and
# shares are bit-identical across engines; the only float op is the
# final share division. Scale shape — deliberately NOT a global
# ROW_NUMBER window (single task at |users| = 1e9): per-user totals are
# range-bucketed by value (bucket count bounded by the value DOMAIN,
# not user count), ranked within buckets in parallel, and stitched with
# a |buckets|-sized broadcast prefix — the same two-phase prefix-sum
# pattern as text_pack_sequences. Deciles come from a closed-form rank
# binning (1 + floor(10(r-1)/n)), identical in both engines.
_PARETO_BUCKET_US = 1_000_000  # micro-unit width of one rank bucket


@query(
    "events_user_value_pareto",
    """
    WITH uv AS (
      SELECT user_id,
             SUM(CAST(ROUND(value * 1000000) AS BIGINT)) AS v_int
      FROM events GROUP BY user_id
    ), ranked AS (
      SELECT v_int,
             ROW_NUMBER() OVER (ORDER BY v_int DESC, user_id) AS r,
             COUNT(*) OVER () AS n
      FROM uv
    )
    SELECT CAST(1 + FLOOR(10.0 * (r - 1) / n) AS BIGINT) AS decile,
           COUNT(*) AS n_users,
           CAST(SUM(v_int) AS BIGINT) AS v_int_sum,
           ROUND(SUM(v_int)
                 / (SELECT CAST(SUM(v_int) AS DOUBLE) FROM uv), 6)
             AS value_share
    FROM ranked GROUP BY 1 ORDER BY 1
    """,
)
def events_user_value_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("user_id", "value")
    from delta_lake_health_spark.plans.prefix_rank import (
        bucketed_row_number,
    )

    uv = ev.groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * 1e6).cast("long")).alias("v_int")
    )
    # two-phase bucketed rank (shared prefix_rank impl): DESC value
    # order, so the value-domain bucket is negated to stay ASC-aligned
    tot = uv.agg(
        F.count(F.lit(1)).alias("n"), F.sum("v_int").alias("v_tot")
    )
    ranked = bucketed_row_number(
        uv,
        -F.floor(F.col("v_int") / _PARETO_BUCKET_US).cast("long"),
        [F.desc("v_int"), F.col("user_id")],
        "r",
    ).crossJoin(F.broadcast(tot))
    return (
        ranked.withColumn(
            "decile",
            (
                1 + F.floor(10.0 * (F.col("r") - 1) / F.col("n"))
            ).cast("long"),
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("v_int").alias("v_int_sum"),
            F.round(
                F.sum("v_int") / F.max("v_tot").cast("double"), 6
            ).alias("value_share"),
        )
        .orderBy("decile")
    )


# --------------------------------------------------------------------------
# E29 — metronome (bot-cadence) census: per user, how often their
# inter-event gap equals their single most common gap — scripted
# clients fire on fixed timers, so a high modal-gap share with enough
# events is the classic bot signal read next to E24's gap distribution.
# Everything is exact integer arithmetic (microsecond gaps, counts, one
# final ratio), so no float accumulation can split the engines; the
# modal gap ties break to the smallest gap in both. Scale shape: one
# per-user lag window (uniform user_id partitioning, same shuffle as
# E24), one (user, gap) count with map-side partials, one per-user
# top-1 window — every stage keyed by user_id.
_METRONOME_MIN_GAPS = 5
_METRONOME_SHARE = 0.5


@query(
    "events_metronome_census",
    f"""
    WITH gaps AS (
      SELECT user_id,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    ), c AS (
      SELECT user_id, gap_us, COUNT(*) AS cnt
      FROM gaps WHERE gap_us IS NOT NULL GROUP BY 1, 2
    ), top1 AS (
      SELECT user_id, gap_us, cnt,
             SUM(cnt) OVER (PARTITION BY user_id) AS n_gaps,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY cnt DESC, gap_us) AS rn
      FROM c
    )
    SELECT user_id, CAST(n_gaps AS BIGINT) AS n_gaps,
           gap_us AS modal_gap_us,
           ROUND(cnt / CAST(n_gaps AS DOUBLE), 6) AS modal_share,
           (n_gaps >= {_METRONOME_MIN_GAPS}
            AND cnt / CAST(n_gaps AS DOUBLE) >= {_METRONOME_SHARE})
             AS metronomic
    FROM top1 WHERE rn = 1 ORDER BY user_id
    """,
)
def events_metronome_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("us"), "ts"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "user_id", (F.col("us") - F.lag("us").over(w)).alias("gap_us")
    ).where(F.col("gap_us").isNotNull())
    counts = gaps.groupBy("user_id", "gap_us").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wu = Window.partitionBy("user_id")
    wr = Window.partitionBy("user_id").orderBy(F.desc("cnt"), "gap_us")
    share = F.col("cnt") / F.col("n_gaps").cast("double")
    return (
        counts.withColumn("n_gaps", F.sum("cnt").over(wu))
        .withColumn("rn", F.row_number().over(wr))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("n_gaps").cast("long").alias("n_gaps"),
            F.col("gap_us").alias("modal_gap_us"),
            F.round(share, 6).alias("modal_share"),
            (
                (F.col("n_gaps") >= _METRONOME_MIN_GAPS)
                & (share >= _METRONOME_SHARE)
            ).alias("metronomic"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# E30 — click-to-next-purchase (forward as-of): for every click, the
# NEXT purchase by the same user within the session gap — the
# conversion-wait mirror of E8's backward attribution, driving the new
# forward as-of direction through the registry. Same scale shape as E8:
# union + one user_id shuffle + per-key carry, never the range-join
# pair set (the ORACLE is the pair set + row_number, which is exactly
# what the operator avoids).
@query(
    "events_click_to_purchase",
    f"""
    WITH c AS (
      SELECT user_id, event_id AS click_id, epoch_us(ts) AS ct
      FROM events WHERE event_type = 'click'
    ),
    p AS (
      SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS pt, value
      FROM events WHERE event_type = 'purchase'
    )
    SELECT click_id, user_id, purchase_id,
           CAST(pt - ct AS BIGINT) AS wait_us,
           ROUND(value, 2) AS purchase_value
    FROM (
      SELECT c.click_id, c.user_id, p.purchase_id, p.pt, c.ct, p.value,
             ROW_NUMBER() OVER (PARTITION BY c.click_id
                                ORDER BY p.pt ASC, p.purchase_id DESC) AS rn
      FROM c JOIN p ON p.user_id = c.user_id
         AND p.pt >= c.ct AND p.pt < c.ct + {SESSION_GAP_US}
    ) WHERE rn = 1
    ORDER BY click_id
    """,
)
def events_click_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_health_spark.operators.asof import asof_forward_join

    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("ts_us"),
        "value",
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts_us"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_evt"), "ts_us", "value"
    )
    joined = asof_forward_join(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="ts_us",
        right_ts="ts_us",
        payload={"purchase_id": "purchase_evt", "purchase_value": "value"},
        tolerance=SESSION_GAP_US,
        right_tiebreak="purchase_evt",
    )
    return (
        joined.where(F.col("purchase_id").isNotNull())
        .select(
            "click_id",
            "user_id",
            "purchase_id",
            (F.col("_asof_ts") - F.col("ts_us")).cast("long").alias("wait_us"),
            F.round("purchase_value", 2).alias("purchase_value"),
        )
        .orderBy("click_id")
    )


# --------------------------------------------------------------------------
# E31 — nearest-purchase alignment: for every click, the purchase by
# the same user CLOSEST in time in EITHER direction (within the session
# gap), distance ties toward the past — the sensor-alignment semantics
# of pandas merge_asof(direction="nearest"), driving the third as-of
# direction through the driver gate (E8 backward, E30 forward). The
# operator computes both carries over ONE user_id exchange (two
# in-partition sorts) and compares distances; the ORACLE is the range
# pair set + the equivalent (|dist|, side, tiebreak) ranking — exactly
# what the operator avoids building.
@query(
    "events_click_purchase_nearest",
    f"""
    WITH c AS (
      SELECT user_id, event_id AS click_id, epoch_us(ts) AS ct
      FROM events WHERE event_type = 'click'
    ),
    p AS (
      SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS pt, value
      FROM events WHERE event_type = 'purchase'
    )
    SELECT click_id, user_id, purchase_id,
           CAST(ABS(pt - ct) AS BIGINT) AS dist_us,
           ROUND(value, 2) AS purchase_value
    FROM (
      SELECT c.click_id, c.user_id, p.purchase_id, p.pt, c.ct, p.value,
             ROW_NUMBER() OVER (
               PARTITION BY c.click_id
               ORDER BY ABS(p.pt - c.ct) ASC,
                        CASE WHEN p.pt <= c.ct THEN 0 ELSE 1 END ASC,
                        p.purchase_id DESC) AS rn
      FROM c JOIN p ON p.user_id = c.user_id
         AND p.pt > c.ct - {SESSION_GAP_US}
         AND p.pt < c.ct + {SESSION_GAP_US}
    ) WHERE rn = 1
    ORDER BY click_id
    """,
)
def events_click_purchase_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_health_spark.operators.asof import asof_nearest_join

    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("ts_us"),
        "value",
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts_us"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_evt"), "ts_us", "value"
    )
    joined = asof_nearest_join(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="ts_us",
        right_ts="ts_us",
        payload={"purchase_id": "purchase_evt", "purchase_value": "value"},
        tolerance=SESSION_GAP_US,
        right_tiebreak="purchase_evt",
    )
    return (
        joined.where(F.col("purchase_id").isNotNull())
        .select(
            "click_id",
            "user_id",
            "purchase_id",
            F.abs(F.col("_asof_ts") - F.col("ts_us")).cast("long").alias(
                "dist_us"
            ),
            F.round("purchase_value", 2).alias("purchase_value"),
        )
        .orderBy("click_id")
    )


# --------------------------------------------------------------------------
# E32 — longest consecutive-day activity streak per user (gaps-and-islands).
# The classic retention metric (Duolingo-style streaks): distinct active
# days per user, then day - DENSE-sequence-position is constant within a
# run of consecutive days, so grouping by that anchor yields the islands.
# Scale: one shuffle on user_id for the distinct + window (same layout
# reused by both), then |islands| rows aggregate — no self-join, no
# cross-day cartesian. Emits the top 25 streak rows with deterministic
# tiebreaks. Reference parity: the reference's event-history rollups
# (delta_python_analyzer.py history aggregation) generalized to
# per-entity runs.
@query(
    "events_user_streaks",
    """
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ), isl AS (
      SELECT user_id, d,
             d - CAST(ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY d) AS INT) AS anchor
      FROM days
    ), streaks AS (
      SELECT user_id,
             COUNT(*) AS streak_days,
             STRFTIME(MIN(d), '%Y-%m-%d') AS streak_start,
             STRFTIME(MAX(d), '%Y-%m-%d') AS streak_end
      FROM isl GROUP BY user_id, anchor
    )
    SELECT user_id, streak_days, streak_start, streak_end
    FROM streaks
    ORDER BY streak_days DESC, user_id, streak_start
    LIMIT 25
    """,
)
def events_user_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    isl = days.withColumn(
        "anchor", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    streaks = isl.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).alias("streak_days"),
        F.date_format(F.min("d"), "yyyy-MM-dd").alias("streak_start"),
        F.date_format(F.max("d"), "yyyy-MM-dd").alias("streak_end"),
    )
    return (
        streaks.select("user_id", "streak_days", "streak_start", "streak_end")
        .orderBy(
            F.desc("streak_days"), "user_id", "streak_start"
        )
        .limit(25)
    )


# --------------------------------------------------------------------------
# E33 — hash-holdout A/B conversion lift with a two-proportion z-test.
# Experimentation primitive over the event stream: users are assigned to
# variants by an md5 hash bucket of user_id (the reproducible, engine-
# agnostic split every large experiment system uses — no RNG, no
# assignment table to join), conversion = "user's total purchase value
# above the global median of per-user totals" (a scale-free definition:
# both arms always contain converters and non-converters, so the pooled
# variance never degenerates), and the readout is conversion rate per
# arm plus the pooled two-proportion z statistic (NULL-guarded if the
# split is ever one-sided). Scale: one shuffle on user_id for the
# per-user total, one scalar median broadcast, then a 2-row aggregate
# folded to a single stats row — nothing driver-side scales with users.
_AB_HEX = "0123456789abcdef"


@query(
    "events_ab_holdout_lift",
    f"""
    WITH totals AS (
      SELECT user_id, SUM(value) AS total_purchase
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ), med AS (
      SELECT quantile_cont(total_purchase, 0.5) AS m FROM totals
    ), assign AS (
      SELECT CASE WHEN (strpos('{_AB_HEX}',
                               substr(md5(CAST(user_id AS VARCHAR)), 31, 1))
                        - 1) * 16 +
                       (strpos('{_AB_HEX}',
                               substr(md5(CAST(user_id AS VARCHAR)), 32, 1))
                        - 1) < 128
                  THEN 'A' ELSE 'B' END AS variant,
             CASE WHEN total_purchase > med.m THEN 1 ELSE 0 END AS converted
      FROM totals CROSS JOIN med
    ), arms AS (
      SELECT variant, COUNT(*) AS n_users,
             CAST(SUM(converted) AS BIGINT) AS n_converted
      FROM assign GROUP BY variant
    ), wide AS (
      SELECT
        MAX(CASE WHEN variant = 'A' THEN n_users END) AS n_a,
        MAX(CASE WHEN variant = 'B' THEN n_users END) AS n_b,
        MAX(CASE WHEN variant = 'A' THEN n_converted END) AS conv_a,
        MAX(CASE WHEN variant = 'B' THEN n_converted END) AS conv_b
      FROM arms
    )
    SELECT n_a, n_b, conv_a, conv_b,
           ROUND(conv_a * 1.0 / n_a, 6) AS rate_a,
           ROUND(conv_b * 1.0 / n_b, 6) AS rate_b,
           ROUND(conv_b * 1.0 / n_b - conv_a * 1.0 / n_a, 6) AS lift,
           ROUND(CASE WHEN conv_a + conv_b > 0
                       AND conv_a + conv_b < n_a + n_b
                 THEN (conv_b * 1.0 / n_b - conv_a * 1.0 / n_a) /
                      SQRT(((conv_a + conv_b) * 1.0 / (n_a + n_b)) *
                           (1 - (conv_a + conv_b) * 1.0 / (n_a + n_b)) *
                           (1.0 / n_a + 1.0 / n_b))
                 END, 6) AS z_score
    FROM wide
    """,
)
def events_ab_holdout_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    totals = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum("value").alias("total_purchase"))
    )
    med = totals.agg(
        F.expr("percentile(total_purchase, 0.5)").alias("m")
    )
    uid_hex = F.md5(F.col("user_id").cast("string"))
    bucket = (
        (F.instr(F.lit(_AB_HEX), F.substring(uid_hex, 31, 1)) - 1) * 16
        + (F.instr(F.lit(_AB_HEX), F.substring(uid_hex, 32, 1)) - 1)
    )
    assign = totals.crossJoin(F.broadcast(med)).select(
        F.when(bucket < 128, "A").otherwise("B").alias("variant"),
        F.when(F.col("total_purchase") > F.col("m"), 1)
        .otherwise(0)
        .alias("converted"),
    )
    arms = assign.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("converted").cast("long").alias("n_converted"),
    )
    wide = arms.agg(
        F.max(F.when(F.col("variant") == "A", F.col("n_users"))).alias("n_a"),
        F.max(F.when(F.col("variant") == "B", F.col("n_users"))).alias("n_b"),
        F.max(
            F.when(F.col("variant") == "A", F.col("n_converted"))
        ).alias("conv_a"),
        F.max(
            F.when(F.col("variant") == "B", F.col("n_converted"))
        ).alias("conv_b"),
    )
    p_a = F.col("conv_a") / F.col("n_a")
    p_b = F.col("conv_b") / F.col("n_b")
    conv = F.col("conv_a") + F.col("conv_b")
    n = F.col("n_a") + F.col("n_b")
    pooled = conv / n
    se = F.sqrt(
        pooled * (1 - pooled) * (1 / F.col("n_a") + 1 / F.col("n_b"))
    )
    z = F.when((conv > 0) & (conv < n), (p_b - p_a) / se)
    return wide.select(
        "n_a", "n_b", "conv_a", "conv_b",
        F.round(p_a, 6).alias("rate_a"),
        F.round(p_b, 6).alias("rate_b"),
        F.round(p_b - p_a, 6).alias("lift"),
        F.round(z, 6).alias("z_score"),
    )


# --------------------------------------------------------------------------
# E34 — top user-journey paths: the first 4 events of each user-day,
# concatenated to a path string, counted across the corpus (the "common
# journeys" readout behind every product-analytics path/sankey view).
# Deterministic ordering by (ts, event_id); one shuffle on
# (user_id, day) for the per-journey window, one tiny path aggregate.
# LIMIT ties broken by path text.
@query(
    "events_top_paths",
    """
    WITH ordered AS (
      SELECT user_id, CAST(ts AS DATE) AS d, event_type,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, CAST(ts AS DATE)
               ORDER BY ts, event_id) AS rn
      FROM events
    ), paths AS (
      SELECT user_id, d,
             string_agg(event_type, '>' ORDER BY rn) AS path
      FROM ordered WHERE rn <= 4
      GROUP BY user_id, d
    )
    SELECT path, COUNT(*) AS n_journeys,
           COUNT(DISTINCT user_id) AS n_users
    FROM paths
    GROUP BY path
    ORDER BY n_journeys DESC, path
    LIMIT 20
    """,
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "d").orderBy("ts", "event_id")
    ordered = (
        ev.select(
            "user_id", F.to_date("ts").alias("d"), "event_type", "ts",
            "event_id",
        )
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 4)
    )
    paths = ordered.groupBy("user_id", "d").agg(
        F.concat_ws(
            ">",
            F.expr(
                "transform(array_sort(collect_list(struct(rn, event_type))),"
                " s -> s.event_type)"
            ),
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(
            F.count(F.lit(1)).alias("n_journeys"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy(F.desc("n_journeys"), "path")
        .limit(20)
    )


# --------------------------------------------------------------------------
# E35 — watermark lateness census: how out-of-order is the stream, and
# what would a watermark of W drop? Arrival order is modeled by
# event_id (the ingest sequence of the synthetic feed); an event's
# lateness is the running max of event-time over arrival order minus
# its own event-time. The running max is computed with the TWO-PHASE
# PREFIX pattern (same as the epoch-shuffle rank): 256 arrival-range
# buckets each compute a local running max in parallel, the 256
# per-bucket maxima collect to a broadcast prefix, and the global
# running max is greatest(local, prefix[bucket-1]) — no global
# single-task window at any size. The oracle is the single SQL window
# the pattern replaces.
@query(
    "events_watermark_lateness",
    """
    WITH run AS (
      SELECT ts,
             MAX(ts) OVER (ORDER BY event_id
                           ROWS UNBOUNDED PRECEDING) AS high
      FROM events
    ), lat AS (
      SELECT (epoch_us(high) - epoch_us(ts)) / 60000000.0 AS late_min
      FROM run
    )
    SELECT COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN late_min > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_late_1m,
           CAST(SUM(CASE WHEN late_min > 5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_late_5m,
           CAST(SUM(CASE WHEN late_min > 15 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_late_15m,
           CAST(SUM(CASE WHEN late_min > 60 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_late_60m,
           ROUND(MAX(late_min), 6) AS max_late_min
    FROM lat
    """,
)
def events_watermark_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "event_id", F.unix_micros("ts").alias("ts_us")
    )
    hi = ev.agg(F.max("event_id").alias("m")).collect()[0].m
    width = max(1, (int(hi) + 256) // 256)
    bucketed = ev.withColumn(
        "b", (F.col("event_id") / F.lit(width)).cast("long")
    )
    w_local = (
        Window.partitionBy("b")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = bucketed.withColumn("local_hi", F.max("ts_us").over(w_local))
    # 256-row prefix of per-bucket maxima, broadcast back
    bmax = {
        r.b: r.mx
        for r in bucketed.groupBy("b").agg(F.max("ts_us").alias("mx")).collect()
    }
    prefix_rows, run = [], None
    for b in sorted(bmax):
        prefix_rows.append((b, run))
        run = bmax[b] if run is None else max(run, bmax[b])
    prefix = spark.createDataFrame(prefix_rows, "b long, prefix_hi long")
    late_min = (
        F.greatest(F.col("local_hi"), F.coalesce("prefix_hi", "local_hi"))
        - F.col("ts_us")
    ) / F.lit(60_000_000.0)
    lat = local.join(F.broadcast(prefix), "b").select(late_min.alias("lm"))
    return lat.agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("lm") > 1, 1).otherwise(0))
        .cast("long").alias("n_late_1m"),
        F.sum(F.when(F.col("lm") > 5, 1).otherwise(0))
        .cast("long").alias("n_late_5m"),
        F.sum(F.when(F.col("lm") > 15, 1).otherwise(0))
        .cast("long").alias("n_late_15m"),
        F.sum(F.when(F.col("lm") > 60, 1).otherwise(0))
        .cast("long").alias("n_late_60m"),
        F.round(F.max("lm"), 6).alias("max_late_min"),
    )


# --------------------------------------------------------------------------
# E36 — semi-structured props through the VARIANT type (Spark 4 /
# Delta 4.x variantType): ``parse_json`` turns the raw JSON string into
# the binary variant encoding once, ``variant_get`` extracts typed paths
# with no per-row re-parse of the string for each field (the reason
# variant beats repeated get_json_object at scale: one decode, many typed
# reads, all inside codegen). Delta tables carrying this type are
# protocol-gated by sources/delta_writer (tests/test_variant.py).
@query(
    "events_props_variant",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k,
           CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
             AS min_k,
           CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
             AS max_k,
           CAST(SUM(CASE WHEN CAST(json_extract(props, '$.k') AS BIGINT)
                              % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_odd_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum(F.when(F.col("k") % 2 == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_odd_k"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# E37 — CUSUM change-point alerts (Page 1954): the classical sequential
# detector S_t = max(0, S_{t-1} + x_t - k) over each event-type's hourly
# count series. The recursion LOOKS inherently sequential, but the
# identity S_t = P_t - min(0, min_{j<=t} P_j) with P the plain cumsum of
# (x - k) turns it into two running windows — cumulative sum + running
# min — so the whole detector is one shuffle on the series key and two
# ordered window passes, no recursion, no UDF, and the DuckDB oracle is
# the same two windows. Cross-engine float safety: hourly counts are
# integers, so every aggregate double (mean, cumsum) is order-independent
# exact and the threshold compare agrees bit-for-bit.
_CUSUM_SLACK = 0.5  # drift allowance added to the per-series mean
_CUSUM_H = 4.0      # alert threshold


def cusum_hourly_series(
    hrs: DataFrame, mu: DataFrame, slack: float = _CUSUM_SLACK
) -> DataFrame:
    """Per-hour CUSUM statistic (event_type, hr, c, cusum) from hourly
    counts (event_type, hr, c) and per-series reference means
    (event_type, mu) — the prefix-min rewrite of Page's recursion
    shared by the batch query and the streaming twin's parity test.
    ROUND before any threshold compare (the repo's round-before-rank
    protocol): the running sums are sequential in hr order on both
    engines today, but the 6-dp snap means an engine changing its
    window-sum association order can never flip an alert by one ulp."""
    w = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p = hrs.join(F.broadcast(mu), "event_type").withColumn(
        "pt",
        F.sum(F.col("c") - F.col("mu") - F.lit(slack)).over(w),
    )
    return p.withColumn(
        "cusum",
        F.round(
            F.col("pt") - F.least(F.min("pt").over(w), F.lit(0.0)), 6
        ),
    ).select("event_type", "hr", "c", "cusum")



@query(
    "events_cusum_alerts",
    f"""
    WITH hrs AS (
      SELECT event_type, DATE_TRUNC('hour', ts) AS hr, COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ), st AS (
      SELECT event_type, AVG(c) AS mu FROM hrs GROUP BY 1
    ), p AS (
      SELECT h.event_type, hr, c,
             SUM(c - mu - {_CUSUM_SLACK}) OVER (
               PARTITION BY h.event_type ORDER BY hr
             ) AS pt
      FROM hrs h JOIN st USING (event_type)
    ), cu AS (
      SELECT event_type, hr,
             ROUND(pt - LEAST(MIN(pt) OVER (
               PARTITION BY event_type ORDER BY hr
             ), 0), 6) AS cusum
      FROM p
    )
    SELECT event_type,
           COUNT(*) AS n_hours,
           CAST(SUM(CASE WHEN cusum > {_CUSUM_H} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_alert_hours,
           ROUND(MAX(cusum), 6) AS max_cusum,
           STRFTIME(MIN(CASE WHEN cusum > {_CUSUM_H} THEN hr END),
                    '%Y-%m-%d %H:%M:%S') AS first_alert
    FROM cu GROUP BY event_type ORDER BY event_type
    """,
)
def events_cusum_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    hrs = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count(F.lit(1)).alias("c"))
    st = hrs.groupBy("event_type").agg(F.avg("c").alias("mu"))
    cu = cusum_hourly_series(hrs, st)
    alert = F.col("cusum") > _CUSUM_H
    return (
        cu.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_hours"),
            F.sum(F.when(alert, 1).otherwise(0))
            .cast("long")
            .alias("n_alert_hours"),
            F.round(F.max("cusum"), 6).alias("max_cusum"),
            F.min(
                F.when(
                    alert,
                    F.date_format("hr", "yyyy-MM-dd HH:mm:ss"),
                )
            ).alias("first_alert"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# E38 — Kleinberg burst detection (Kleinberg 2002, 2-state automaton):
# per-user optimal base/burst labeling of the inter-event gap sequence
# via a 2-state Viterbi DP. Sequential PER USER, embarrassingly parallel
# ACROSS users — the applyInPandas contract: each task holds one user's
# gaps, the shuffle is one user_id exchange, output is three integers per
# user. Rows-only by design (a Viterbi DP is not SQL-expressible); the
# shared pure-Python core is parity-tested in tests/test_bursts.py.
@query("events_user_bursts", None)
def events_user_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from delta_lake_health_spark.operators.bursts import (
        kleinberg_two_state,
    )

    ev = load(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("ts_us")
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        times = sorted(pdf["ts_us"].tolist())
        r = kleinberg_two_state([t / 1e6 for t in times])
        return pd.DataFrame(
            [
                {
                    "user_id": int(pdf["user_id"].iloc[0]),
                    "n_events": len(times),
                    "n_bursts": r["n_bursts"],
                    "burst_gaps": r["burst_gaps"],
                    "longest_burst": r["longest_burst"],
                }
            ]
        )

    out = ev.groupBy("user_id").applyInPandas(
        fn,
        "user_id long, n_events long, n_bursts long, burst_gaps long,"
        " longest_burst long",
    )
    # top-25 burstiest users via distributed TakeOrdered (orderBy+limit),
    # then rank the 25 survivors — never a global single-task window
    # over the |users|-sized frame
    top = out.orderBy(
        F.desc("n_bursts"), F.desc("burst_gaps"), F.col("user_id")
    ).limit(25)
    w = Window.orderBy(
        F.desc("n_bursts"), F.desc("burst_gaps"), F.col("user_id")
    )
    return top.withColumn("rank", F.row_number().over(w)).orderBy("rank")
