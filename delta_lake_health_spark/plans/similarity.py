"""Similarity-search operators over the ``embeddings`` table (SURVEY §2.5).

Four operators:

- ``ann_bruteforce_topk`` (S1): exact cosine top-k — the recall baseline.
- ``ann_ivf_topk``        (S2): IVF-style ANN — label centroids act as the
  coarse quantizer; vectors are assigned to their nearest centroid, queries
  probe the ``NPROBE`` nearest inverted lists, candidates are reranked
  exactly. Top-k per query with deterministic tiebreakers.
- ``ann_lsh_buckets``     (S3): random-hyperplane LSH (Charikar 2002) with
  the planes materialised as module-level ±1 constants (derived from md5 at
  import time), so both engines use the *same* planes.
- ``embedding_label_centroids`` (S4): pairwise cosine between label
  centroids.

Determinism across engines: all arithmetic is sequential double-precision
array folds (``aggregate``/``zip_with`` in Spark, ``list_dot_product`` in
DuckDB — both left-to-right), centroid components are rounded to 6 decimals
before reuse so distributed-sum ulp noise can't leak into downstream
comparisons, and every ranking carries a unique-id tiebreaker.

Scale (100 TB): the query set and the centroid table are tiny and
broadcast; the corpus side streams. Brute force is O(|Q|·N) with one
narrow pass + a per-query top-k (window over q_id partitions — |Q|
partitions, each trivially parallel). IVF prunes the corpus to
``NPROBE/N_LABELS`` of the data before the expensive rerank — the classic
inverted-file trade. LSH bucketing is a single narrow projection.

The reference repo has no similarity search (it is a Delta health
toolkit); this is part of the LLM-data-pipeline surface the brief adds.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from delta_lake_health_spark.sources.catalog import load

QUERIES: dict = {}
ORACLE: dict = {}

DIM = 64
TOP_K = 5
N_QUERIES = 8  # query set = vec_id < 8
NPROBE = 3
N_PLANES = 8
K_CENTROIDS = 8  # IVF coarse-quantizer size
KMEANS_ITERS = 3  # Lloyd rounds (deterministic: init = lowest vec_ids)


def query(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


def _plane(p: int) -> list[int]:
    """Deterministic ±1 hyperplane: sign of md5 nibble parity per dim."""
    out = []
    for j in range(DIM):
        h = hashlib.md5(f"plane:{p}:{j}".encode()).hexdigest()
        out.append(1 if int(h[0], 16) % 2 == 0 else -1)
    return out


PLANES = [_plane(p) for p in range(N_PLANES)]


# ---- shared Spark expressions ---------------------------------------------

from delta_lake_health_spark.functions.vector import (
    as_double_array,
    cosine as _cos,
    dot as _dot,
    l2_norm as _norm,
)


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double_array("embedding").alias("emb")
    )


def _with_norm(df: DataFrame, emb_col: str, out: str) -> DataFrame:
    """Precompute the L2 norm per vector BEFORE any pair join — per-pair
    norm evaluation turns an O(vectors) array fold into O(pairs)."""
    return df.withColumn(out, _norm(emb_col))


# ---- shared SQL fragments --------------------------------------------------

_SQL_E = "SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings"


def _sql_cos(a: str, b: str) -> str:
    return (
        f"list_dot_product({a}, {b}) / "
        f"(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
    )


# Centroid per label, components rounded to 6 dp, ordered by dim position.
_SQL_CENTROIDS = f"""
  SELECT label AS cid, list(cv ORDER BY pos) AS cent FROM (
    SELECT label, t.i AS pos, ROUND(AVG(emb[t.i + 1]), 6) AS cv
    FROM e, range({DIM}) t(i)
    GROUP BY label, t.i
  ) GROUP BY label
"""


def _centroids(emb: DataFrame) -> DataFrame:
    """label -> 64-dim centroid (avg per dim, rounded to 6 dp).

    One shuffle on (label, pos) — 640 groups — then a tiny re-assembly;
    the posexplode is a narrow map. Identical math to ``_SQL_CENTROIDS``.
    """
    comp = (
        emb.select("label", F.posexplode("emb").alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(F.round(F.avg("v"), 6).alias("cv"))
    )
    return comp.groupBy(F.col("label").alias("cid")).agg(
        F.expr(
            "transform(array_sort(collect_list(struct(pos, cv))), s -> s.cv)"
        ).alias("cent")
    )


# --------------------------------------------------------------------------
# S1 — brute-force exact cosine top-k: the baseline every ANN variant is
# measured against. Broadcast the query set; one pass over the corpus.
@query(
    "ann_bruteforce_topk",
    f"""
    WITH e AS ({_SQL_E}),
    q AS (SELECT vec_id AS q_id, emb AS q_emb FROM e WHERE vec_id < {N_QUERIES}),
    scored AS (
      SELECT q_id, vec_id, {_sql_cos("q_emb", "emb")} AS cos
      FROM q JOIN e ON vec_id <> q_id
    ), ranked AS (
      SELECT q_id, vec_id, cos,
             ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rn
      FROM scored
    )
    SELECT q_id, vec_id, ROUND(cos, 6) AS cosine, rn
    FROM ranked WHERE rn <= {TOP_K}
    ORDER BY q_id, rn
    """,
)
def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _with_norm(_emb(spark, sf_dir), "emb", "nrm")
    q = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("emb").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    scored = (
        F.broadcast(q)
        .join(emb, F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            (_dot("q_emb", "emb") / (F.col("q_nrm") * F.col("nrm"))).alias("cos"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.col("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= TOP_K)
        .select("q_id", "vec_id", F.round("cos", 6).alias("cosine"), "rn")
        .orderBy("q_id", "rn")
    )


# ---- k-means coarse quantizer (S2) ----------------------------------------
# Deterministic Lloyd iterations, identical on both engines: seed centroids
# are the K_CENTROIDS lowest vec_ids, every averaged component is rounded
# to 6 dp per round (absorbs distributed-sum ulp noise), assignment breaks
# cosine ties by cid. A cluster that loses all members drops out (both
# sides agree). The oracle unrolls the same KMEANS_ITERS rounds as chained
# CTEs generated below.


def _kmeans_centroids(
    emb: DataFrame, k: int = K_CENTROIDS, iters: int = KMEANS_ITERS
) -> DataFrame:
    """(cid, cent) after ``iters`` Lloyd rounds — broadcast centroids,
    one corpus pass per round (assignment), one (cid, dim) shuffle per
    round (mean recompute); the centroid table never leaves broadcast
    size, so this scales with corpus size, not corpus x corpus."""
    cents = emb.where(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cid"),
        F.expr("transform(emb, v -> round(v, 6))").alias("cent"),
    )
    for _ in range(iters):
        c = cents.withColumn("cnrm", _norm("cent"))
        ccos = _dot("emb", "cent") / (F.col("nrm") * F.col("cnrm"))
        aw = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), F.col("cid"))
        assign = (
            emb.join(F.broadcast(c))
            .select("vec_id", "emb", "cid", ccos.alias("ccos"))
            .withColumn("rn", F.row_number().over(aw))
            .where(F.col("rn") == 1)
        )
        comp = (
            assign.select("cid", F.posexplode("emb").alias("pos", "v"))
            .groupBy("cid", "pos")
            .agg(F.round(F.avg("v"), 6).alias("cv"))
        )
        cents = (
            comp.groupBy("cid")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(pos, cv))), s -> s.cv)"
                ).alias("cent")
            )
            # tiny table: materialize per round so the next round's plan
            # doesn't replay every previous round; kept EAGER (r13
            # measured the lazy form ~0.3s slower on ann_ivf_topk:
            # assign and qprobe each broadcast the final centroids, and
            # the two broadcast builds then race through the un-
            # materialized Lloyd chain inside the timed job)
            .localCheckpoint()
        )
    return cents


def _sql_kmeans_ctes() -> tuple[str, str]:
    """Unrolled Lloyd rounds as DuckDB CTE text; returns (ctes, final)."""
    parts = [
        f"c0 AS (SELECT vec_id AS cid, list_transform(emb, v -> round(v, 6)) "
        f"AS cent FROM e WHERE vec_id < {K_CENTROIDS})"
    ]
    prev = "c0"
    for i in range(1, KMEANS_ITERS + 1):
        parts.append(
            f"""a{i} AS (
      SELECT vec_id, emb, cid FROM (
        SELECT e.vec_id, e.emb, c.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY {_sql_cos("e.emb", "c.cent")} DESC, c.cid) AS rn
        FROM e CROSS JOIN {prev} c
      ) WHERE rn = 1
    )"""
        )
        parts.append(
            f"""c{i} AS (
      SELECT cid, list(cv ORDER BY pos) AS cent FROM (
        SELECT cid, t.i AS pos, ROUND(AVG(emb[t.i + 1]), 6) AS cv
        FROM a{i}, range({DIM}) t(i)
        GROUP BY cid, t.i
      ) GROUP BY cid
    )"""
        )
        prev = f"c{i}"
    return ",\n    ".join(parts), prev


_KMEANS_CTES, _KMEANS_FINAL = _sql_kmeans_ctes()


# --------------------------------------------------------------------------
# S2 — IVF-style ANN: k-means coarse quantizer (inverted lists), queries
# probe the NPROBE nearest lists, exact rerank inside.
@query(
    "ann_ivf_topk",
    f"""
    WITH e AS ({_SQL_E}),
    {_KMEANS_CTES},
    cent AS (SELECT cid, cent FROM {_KMEANS_FINAL}),
    assign AS (
      SELECT vec_id, emb, cid FROM (
        SELECT e.vec_id, e.emb, cent.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY {_sql_cos("e.emb", "cent.cent")} DESC, cent.cid) AS arn
        FROM e CROSS JOIN cent
      ) WHERE arn = 1
    ),
    qprobe AS (
      SELECT q_id, q_emb, cid FROM (
        SELECT e.vec_id AS q_id, e.emb AS q_emb, cent.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY {_sql_cos("e.emb", "cent.cent")} DESC, cent.cid) AS prn
        FROM e CROSS JOIN cent
        WHERE e.vec_id < {N_QUERIES}
      ) WHERE prn <= {NPROBE}
    ),
    scored AS (
      SELECT q.q_id, a.vec_id, {_sql_cos("q.q_emb", "a.emb")} AS cos
      FROM qprobe q JOIN assign a ON q.cid = a.cid AND a.vec_id <> q.q_id
    ),
    ranked AS (
      SELECT q_id, vec_id, cos,
             ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rn
      FROM scored
    )
    SELECT q_id, vec_id, ROUND(cos, 6) AS cosine, rn
    FROM ranked WHERE rn <= {TOP_K}
    ORDER BY q_id, rn
    """,
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # materialize the corpus once: the k-means rounds, the final
    # assignment, and the probe each re-reference it
    emb = _with_norm(_emb(spark, sf_dir), "emb", "nrm").localCheckpoint()
    cent = _with_norm(_kmeans_centroids(emb), "cent", "cnrm")
    ccos = _dot("emb", "cent") / (F.col("nrm") * F.col("cnrm"))
    # nearest-centroid assignment: corpus x tiny-centroids broadcast join
    aw = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), F.col("cid"))
    assign = (
        emb.join(F.broadcast(cent))
        .select("vec_id", "emb", "nrm", "cid", ccos.alias("ccos"))
        .withColumn("arn", F.row_number().over(aw))
        .where(F.col("arn") == 1)
        .select("vec_id", "emb", "nrm", "cid")
    )
    qprobe = (
        emb.where(F.col("vec_id") < N_QUERIES)
        .join(F.broadcast(cent))
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("emb").alias("q_emb"),
            F.col("nrm").alias("q_nrm"),
            "cid",
            ccos.alias("ccos"),
        )
        .withColumn(
            "prn",
            F.row_number().over(
                Window.partitionBy("q_id").orderBy(F.desc("ccos"), F.col("cid"))
            ),
        )
        .where(F.col("prn") <= NPROBE)
        .select("q_id", "q_emb", "q_nrm", "cid")
    )
    scored = (
        F.broadcast(qprobe)
        .join(assign, "cid")
        .where(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            (_dot("q_emb", "emb") / (F.col("q_nrm") * F.col("nrm"))).alias("cos"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.col("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= TOP_K)
        .select("q_id", "vec_id", F.round("cos", 6).alias("cosine"), "rn")
        .orderBy("q_id", "rn")
    )


# --------------------------------------------------------------------------
# S3 — random-hyperplane LSH bucketing: 8 fixed ±1 planes → 8-bit bucket.
def _sql_plane_literal(p: list[int]) -> str:
    return "[" + ", ".join(f"{x}.0" for x in p) + "]"


_SQL_BUCKET = " || ".join(
    f"(CASE WHEN list_dot_product(emb, {_sql_plane_literal(p)}) > 0 "
    f"THEN '1' ELSE '0' END)"
    for p in PLANES
)

def _spark_bucket():
    # built lazily: F.expr needs an active session
    return F.concat(
        *[
            F.when(
                F.expr(
                    "aggregate(zip_with(emb, array("
                    + ", ".join(f"{x}D" for x in p)
                    + "), (x, y) -> x * y), 0D, (acc, v) -> acc + v)"
                )
                > 0,
                "1",
            ).otherwise("0")
            for p in PLANES
        ]
    )


@query(
    "ann_lsh_buckets",
    f"""
    WITH e AS ({_SQL_E}),
    b AS (SELECT vec_id, {_SQL_BUCKET} AS bucket FROM e)
    SELECT vec_id, bucket,
           COUNT(*) OVER (PARTITION BY bucket) AS bucket_size
    FROM b
    ORDER BY vec_id
    """,
)
def ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    # bucket projection referenced twice (size agg + join back) — the
    # projection is |PLANES| interpreted array folds, so materialize once.
    # Bucket sizes come from groupBy + broadcast join, NOT a window: a
    # COUNT(*) OVER (PARTITION BY bucket) lands an entire degenerate
    # bucket (clustered corpus -> one bucket value) on a single partition.
    b = emb.select("vec_id", _spark_bucket().alias("bucket")).localCheckpoint()
    sizes = b.groupBy("bucket").agg(F.count(F.lit(1)).alias("bucket_size"))
    return (
        b.join(F.broadcast(sizes), "bucket")
        .select("vec_id", "bucket", "bucket_size")
        .orderBy("vec_id")
    )


# --------------------------------------------------------------------------
# S4 — pairwise cosine between label centroids (tiny output, any SF).
@query(
    "embedding_label_centroids",
    f"""
    WITH e AS ({_SQL_E}),
    cent AS ({_SQL_CENTROIDS})
    SELECT a.cid AS label_a, b.cid AS label_b,
           ROUND({_sql_cos("a.cent", "b.cent")}, 6) AS cosine
    FROM cent a JOIN cent b ON a.cid < b.cid
    ORDER BY label_a, label_b
    """,
)
def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    cent = _centroids(_emb(spark, sf_dir))
    a = cent.select(F.col("cid").alias("label_a"), F.col("cent").alias("ca"))
    b = cent.select(F.col("cid").alias("label_b"), F.col("cent").alias("cb"))
    return (
        a.join(b, F.col("label_a") < F.col("label_b"))
        .select("label_a", "label_b", F.round(_cos("ca", "cb"), 6).alias("cosine"))
        .orderBy("label_a", "label_b")
    )


# --------------------------------------------------------------------------
# S6 — SemDeDup semantic pruning (Abbas et al. 2023, "SemDeDup: Data-
# efficient learning at web-scale through semantic deduplication"): cluster
# the embedding space with the same deterministic k-means used by the IVF
# quantizer, then inside each cluster mark semantic duplicates — pairs
# above a cosine threshold — and REMOVE the copy that sits closer to the
# cluster centroid (the paper keeps the lowest-centroid-similarity member
# of each duplicate group; ties break on vec_id). Scale shape: the
# centroid table is broadcast; the pair join is an equi-join on cid whose
# quadratic term is bounded by the cluster size — at 100 TB, k scales like
# corpus/cluster-budget (same parameterization as operators/ann_index.py),
# which is exactly how SemDeDup bounds its own within-cluster pass.
# Threshold rationale: same as plans/dedup.COSINE_THRESHOLD — the
# synthetic embeddings top out near 0.6 cosine, so a "realistic" 0.95
# would make the operator vacuously empty; 0.40 exercises the full
# cluster -> pair -> prune pipeline with a non-trivial removal set.
SEM_EPS = 0.40


@query(
    "dedup_semantic_prune",
    f"""
    WITH e AS ({_SQL_E}),
    {_KMEANS_CTES},
    cent AS (SELECT cid, cent FROM {_KMEANS_FINAL}),
    assign AS (
      SELECT vec_id, emb, cid, ROUND(ccos, 6) AS cent_cos FROM (
        SELECT e.vec_id, e.emb, cent.cid,
               {_sql_cos("e.emb", "cent.cent")} AS ccos,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY {_sql_cos("e.emb", "cent.cent")} DESC, cent.cid) AS arn
        FROM e CROSS JOIN cent
      ) WHERE arn = 1
    ),
    dup AS (
      SELECT DISTINCT a.vec_id
      FROM assign a JOIN assign b
        ON a.cid = b.cid AND a.vec_id <> b.vec_id
      WHERE ROUND({_sql_cos("a.emb", "b.emb")}, 6) > {SEM_EPS}
        AND (b.cent_cos < a.cent_cos
             OR (b.cent_cos = a.cent_cos AND b.vec_id < a.vec_id))
    )
    SELECT s.vec_id, s.cid, s.cent_cos,
           CAST(CASE WHEN d.vec_id IS NULL THEN 0 ELSE 1 END AS INT) AS removed
    FROM assign s LEFT JOIN dup d ON s.vec_id = d.vec_id
    ORDER BY s.vec_id
    """,
)
def dedup_semantic_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _with_norm(_emb(spark, sf_dir), "emb", "nrm").localCheckpoint()
    cent = _with_norm(_kmeans_centroids(emb), "cent", "cnrm")
    ccos = _dot("emb", "cent") / (F.col("nrm") * F.col("cnrm"))
    aw = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), F.col("cid"))
    assign = (
        emb.join(F.broadcast(cent))
        .select("vec_id", "emb", "nrm", "cid", ccos.alias("ccos"))
        .withColumn("arn", F.row_number().over(aw))
        .where(F.col("arn") == 1)
        .select(
            "vec_id", "emb", "nrm", "cid", F.round("ccos", 6).alias("cent_cos")
        )
        # both sides of the pair join and the final projection read this
        .localCheckpoint()
    )
    a_side = assign.select(
        F.col("vec_id").alias("a_id"),
        F.col("emb").alias("a_emb"),
        F.col("nrm").alias("a_nrm"),
        F.col("cid").alias("a_cid"),
        F.col("cent_cos").alias("a_cc"),
    )
    b_side = assign.select(
        F.col("vec_id").alias("b_id"),
        F.col("emb").alias("b_emb"),
        F.col("nrm").alias("b_nrm"),
        F.col("cid").alias("b_cid"),
        F.col("cent_cos").alias("b_cc"),
    )
    pair_cos = F.round(
        _dot("a_emb", "b_emb") / (F.col("a_nrm") * F.col("b_nrm")), 6
    )
    dup = (
        a_side.join(
            b_side,
            (F.col("a_cid") == F.col("b_cid")) & (F.col("a_id") != F.col("b_id")),
        )
        .where(
            (pair_cos > SEM_EPS)
            & (
                (F.col("b_cc") < F.col("a_cc"))
                | ((F.col("b_cc") == F.col("a_cc")) & (F.col("b_id") < F.col("a_id")))
            )
        )
        .select(F.col("a_id").alias("vec_id"))
        .distinct()
        .withColumn("is_dup", F.lit(1))
    )
    return (
        assign.join(dup, "vec_id", "left")
        .select(
            "vec_id",
            "cid",
            "cent_cos",
            F.coalesce("is_dup", F.lit(0)).cast("int").alias("removed"),
        )
        .orderBy("vec_id")
    )


# --------------------------------------------------------------------------
# S7 — int8 scalar quantization of the embedding column (the compression
# step an ANN index applies before storage: 4x smaller vectors at ~1e-2
# recall cost): per-dimension corpus min/max -> 255-step uniform grid ->
# reconstruction error census per dimension. Rounding is floor(x + 0.5)
# on BOTH engines (banker's-rounding-proof). Scale shape: pass 1 is a
# 64-key groupBy (map-side partials, no skew — dims are uniform); pass 2
# re-scans with the 64-row stats table broadcast; work is linear in
# corpus x dims, shuffles bounded by |dims|.
@query(
    "embedding_scalar_quantize",
    """
    WITH e AS (
      SELECT vec_id,
             CAST(UNNEST(embedding) AS DOUBLE) AS x,
             UNNEST(range(len(embedding))) AS dim
      FROM embeddings
    ),
    stats AS (
      SELECT dim, MIN(x) AS lo, MAX(x) AS hi FROM e GROUP BY dim
    ),
    coded AS (
      SELECT e.dim, e.x, stats.lo, stats.hi,
             (stats.hi - stats.lo) / 255.0 AS scale,
             CASE WHEN stats.hi = stats.lo THEN 0
                  ELSE FLOOR((e.x - stats.lo) / ((stats.hi - stats.lo) / 255.0)
                             + 0.5) END AS code
      FROM e JOIN stats USING (dim)
    )
    SELECT CAST(dim AS INT) AS dim,
           ROUND(MIN(lo), 6) AS lo,
           ROUND(MIN(hi), 6) AS hi,
           ROUND(AVG(POW(x - (lo + code * scale), 2)), 9) AS mse,
           ROUND(MAX(ABS(x - (lo + code * scale))), 9) AS max_abs_err
    FROM coded
    GROUP BY dim
    ORDER BY dim
    """,
)
def embedding_scalar_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding")).alias("dim", "xf"),
    ).select("dim", F.col("xf").cast("double").alias("x"))
    stats = e.groupBy("dim").agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    scale = (F.col("hi") - F.col("lo")) / F.lit(255.0)
    code = F.when(F.col("hi") == F.col("lo"), F.lit(0.0)).otherwise(
        F.floor((F.col("x") - F.col("lo")) / scale + F.lit(0.5)).cast("double")
    )
    coded = (
        e.join(F.broadcast(stats), "dim")
        .withColumn("scale", scale)
        .withColumn("code", code)
        .withColumn("err", F.col("x") - (F.col("lo") + F.col("code") * F.col("scale")))
    )
    return (
        coded.groupBy("dim")
        .agg(
            F.round(F.min("lo"), 6).alias("lo"),
            F.round(F.min("hi"), 6).alias("hi"),
            F.round(F.avg(F.col("err") * F.col("err")), 9).alias("mse"),
            F.round(F.max(F.abs("err")), 9).alias("max_abs_err"),
        )
        .select(
            F.col("dim").cast("int").alias("dim"), "lo", "hi", "mse", "max_abs_err"
        )
        .orderBy("dim")
    )


# --------------------------------------------------------------------------
# S8 — product quantization + asymmetric-distance search (Jégou et al.
# 2011): split each vector into PQ_M subspaces, codebook per subspace =
# the sub-vectors of the PQ_K lowest vec_ids (deterministic sampled
# codebook), encode the corpus to PQ_M bytes/vector (64 doubles -> 8
# codes, 64x), and answer queries by ADC — per-subspace distance tables
# to the codebook summed over the stored codes. Scale shape: the
# codebook (PQ_M x PQ_K tiny rows) broadcasts everywhere; encoding is
# one corpus pass; a query touches |corpus| x PQ_M table lookups instead
# of |corpus| x DIM float ops, and the compressed corpus fits in a
# fraction of the memory — the standard billion-vector search layout.
# Ties (equal sub-distance) break toward the lower code id in BOTH
# engines, so the oracle matches exactly.
PQ_M = 8  # subspaces
PQ_SUB = DIM // PQ_M  # dims per subspace
PQ_K = 16  # codes per subspace
PQ_RERANK = 25  # ADC shortlist width fed to the exact rerank

_SQL_PQ = f"""
    WITH e0 AS ({_SQL_E}),
    e AS (  -- L2-normalize first: ADC's L2 ranking == cosine ranking
      SELECT vec_id, label,
             list_transform(emb, x -> x / sqrt(list_dot_product(emb, emb)))
               AS emb
      FROM e0
    ),
    sub AS (  -- (vec_id, m, 8-dim sub-vector)
      SELECT vec_id, t.m,
             e.emb[t.m * {PQ_SUB} + 1 : t.m * {PQ_SUB} + {PQ_SUB}] AS sv
      FROM e, range({PQ_M}) t(m)
    ),
    cb AS (  -- codebook: sub-vectors of the PQ_K lowest vec_ids
      SELECT vec_id AS code, m, sv AS cv FROM sub WHERE vec_id < {PQ_K}
    ),
    dists AS (  -- every (vector, subspace, code) L2^2
      SELECT sub.vec_id, sub.m, cb.code,
             list_dot_product(sub.sv, sub.sv)
             - 2 * list_dot_product(sub.sv, cb.cv)
             + list_dot_product(cb.cv, cb.cv) AS d2
      FROM sub JOIN cb USING (m)
    ),
    codes AS (  -- argmin code per (vector, subspace), tie -> low code
      SELECT vec_id, m, code, d2 FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                     ORDER BY d2, code) AS rn
        FROM dists
      ) WHERE rn = 1
    ),
    adc AS (  -- query x corpus: sum the query's table entry at v's code
      SELECT q.vec_id AS q_id, c.vec_id,
             SUM(qd.d2) AS approx_d2
      FROM codes c
      JOIN e q ON q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
      JOIN dists qd ON qd.vec_id = q.vec_id AND qd.m = c.m
                    AND qd.code = c.code
      GROUP BY q.vec_id, c.vec_id
    ),
    shortlist AS (  -- ADC shortlist, then exact rerank (standard PQ use)
      SELECT q_id, vec_id FROM (
        SELECT q_id, vec_id,
               ROW_NUMBER() OVER (PARTITION BY q_id
                                  ORDER BY approx_d2, vec_id) AS rn
        FROM adc
      ) WHERE rn <= {PQ_RERANK}
    ),
    reranked AS (  -- vectors are normalized: plain dot == cosine
      SELECT s.q_id, s.vec_id,
             list_dot_product(q.emb, v.emb) AS cos
      FROM shortlist s
      JOIN e q ON q.vec_id = s.q_id
      JOIN e v ON v.vec_id = s.vec_id
    ),
    final AS (
      SELECT q_id, vec_id, cos,
             ROW_NUMBER() OVER (PARTITION BY q_id
                                ORDER BY cos DESC, vec_id) AS rn
      FROM reranked
    )
    SELECT q_id, vec_id, ROUND(cos, 6) AS cosine, rn
    FROM final WHERE rn <= {TOP_K}
    ORDER BY q_id, rn
"""


@query("ann_pq_adc_topk", _SQL_PQ)
def ann_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir).select(
        "vec_id",
        F.expr(
            "transform(emb, x -> x / sqrt(aggregate(zip_with(emb, emb,"
            " (a, b) -> a * b), 0d, (acc, v) -> acc + v)))"
        ).alias("emb"),
    )
    sub = emb.select(
        "vec_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {PQ_M - 1}),"
                f" m -> slice(emb, m * {PQ_SUB} + 1, {PQ_SUB}))"
            )
        ).alias("m", "sv"),
    )
    cb = sub.where(F.col("vec_id") < PQ_K).select(
        F.col("vec_id").alias("code"), "m", F.col("sv").alias("cv")
    )
    d2 = (
        _dot("sv", "sv")
        - 2 * F.expr("aggregate(zip_with(sv, cv, (x, y) -> x * y), 0d, (a, x) -> a + x)")
        + _dot("cv", "cv")
    )
    dists = sub.join(F.broadcast(cb), "m").select(
        "vec_id", "m", "code", d2.alias("d2")
    )
    dists = dists.localCheckpoint()  # feeds codes, query tables, and ADC
    w = Window.partitionBy("vec_id", "m").orderBy("d2", "code")
    codes = (
        dists.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "m", "code")
    )
    qtab = dists.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), "m", "code", F.col("d2").alias("qd2")
    )
    adc = (
        codes.join(F.broadcast(qtab), ["m", "code"])
        .where(F.col("vec_id") != F.col("q_id"))
        .groupBy("q_id", "vec_id")
        .agg(F.sum("qd2").alias("approx_d2"))
    )
    wr = Window.partitionBy("q_id").orderBy("approx_d2", "vec_id")
    shortlist = (
        adc.withColumn("rn", F.row_number().over(wr))
        .where(F.col("rn") <= PQ_RERANK)
        .select("q_id", "vec_id")
    )
    # exact rerank on the (normalized) vectors: dot == cosine
    qv = emb.select(F.col("vec_id").alias("q_id"), F.col("emb").alias("q_emb"))
    reranked = (
        shortlist.join(F.broadcast(qv), "q_id")
        .join(emb, "vec_id")
        .select("q_id", "vec_id", _dot("q_emb", "emb").alias("cos"))
    )
    wf = Window.partitionBy("q_id").orderBy(F.desc("cos"), "vec_id")
    return (
        reranked.withColumn("rn", F.row_number().over(wf))
        .where(F.col("rn") <= TOP_K)
        .select("q_id", "vec_id", F.round("cos", 6).alias("cosine"), "rn")
        .orderBy("q_id", "rn")
    )


# --------------------------------------------------------------------------
# S9 — KNN label-vote classification: the canonical *application* of the
# similarity stack — predict each held-out query vector's label by
# majority vote over its TOP_K exact-cosine neighbors in the labeled
# corpus (queries excluded from the corpus side). Ties break by the
# smaller label; neighbor ranking reuses the deterministic brute-force
# ordering, so both engines see identical vote sets. Scale shape: the
# query set broadcasts against one corpus pass (O(|Q|·N) like S1 — and
# the IVF/PQ paths above are the drop-in pruned variants when |Q| grows).
@query(
    "knn_label_vote",
    f"""
    WITH e AS ({_SQL_E}),
    q AS (SELECT vec_id AS q_id, label AS true_label, emb AS q_emb
          FROM e WHERE vec_id < {N_QUERIES}),
    corpus AS (SELECT vec_id, label, emb FROM e WHERE vec_id >= {N_QUERIES}),
    ranked AS (
      SELECT q_id, true_label, label,
             ROW_NUMBER() OVER (
               PARTITION BY q_id
               ORDER BY {_sql_cos("q_emb", "emb")} DESC, vec_id) AS rn
      FROM q JOIN corpus ON TRUE
    ), votes AS (
      SELECT q_id, true_label, label, COUNT(*) AS n_votes
      FROM ranked WHERE rn <= {TOP_K}
      GROUP BY q_id, true_label, label
    ), best AS (
      SELECT q_id, true_label, label AS predicted_label, n_votes,
             ROW_NUMBER() OVER (PARTITION BY q_id
                                ORDER BY n_votes DESC, label) AS vr
      FROM votes
    )
    SELECT q_id, true_label, predicted_label, n_votes,
           CAST(true_label = predicted_label AS BOOLEAN) AS correct
    FROM best WHERE vr = 1
    ORDER BY q_id
    """,
)
def knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _with_norm(_emb(spark, sf_dir), "emb", "nrm")
    q = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("true_label"),
        F.col("emb").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    corpus = emb.where(F.col("vec_id") >= N_QUERIES)
    scored = (
        F.broadcast(q)
        .crossJoin(corpus)
        .select(
            "q_id",
            "true_label",
            "label",
            "vec_id",
            (_dot("q_emb", "emb") / (F.col("q_nrm") * F.col("nrm"))).alias("cos"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.col("vec_id"))
    votes = (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= TOP_K)
        .groupBy("q_id", "true_label", "label")
        .agg(F.count(F.lit(1)).alias("n_votes"))
    )
    wv = Window.partitionBy("q_id").orderBy(F.desc("n_votes"), F.col("label"))
    return (
        votes.withColumn("vr", F.row_number().over(wv))
        .where(F.col("vr") == 1)
        .select(
            "q_id",
            "true_label",
            F.col("label").alias("predicted_label"),
            "n_votes",
            (F.col("true_label") == F.col("label")).alias("correct"),
        )
        .orderBy("q_id")
    )


# --------------------------------------------------------------------------
# S10 — matryoshka truncation census (Kusupati et al. 2022): how much of
# each embedding's energy survives truncation to a prefix of k dims —
# cos(v, zero-padded v[:k]) reduces algebraically to ||v[:k]||/||v||, so
# the census is the avg/min/p10 energy-retention profile per prefix
# length, which is exactly the curve you consult before shipping
# truncated vectors to a cheaper ANN tier. One corpus pass per k (a
# 4-row broadcast), sequential double folds identical in both engines.
_MATRYOSHKA_DIMS = (8, 16, 32, 64)


@query(
    "embedding_matryoshka_census",
    f"""
    WITH e AS ({_SQL_E}),
    k AS (SELECT UNNEST([{", ".join(map(str, _MATRYOSHKA_DIMS))}]) AS dims)
    SELECT k.dims,
           COUNT(*) AS n_vectors,
           ROUND(AVG(sqrt(list_dot_product(e.emb[1:k.dims], e.emb[1:k.dims]))
                     / sqrt(list_dot_product(e.emb, e.emb))), 6) AS avg_energy,
           ROUND(MIN(sqrt(list_dot_product(e.emb[1:k.dims], e.emb[1:k.dims]))
                     / sqrt(list_dot_product(e.emb, e.emb))), 6) AS min_energy
    FROM e CROSS JOIN k
    GROUP BY k.dims
    ORDER BY k.dims
    """,
)
def embedding_matryoshka_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _with_norm(_emb(spark, sf_dir), "emb", "nrm")
    ks = spark.createDataFrame(
        [(k,) for k in _MATRYOSHKA_DIMS], "dims int"
    )
    prefix_norm = F.sqrt(
        F.expr(
            "aggregate(transform(slice(emb, 1, dims), x -> x * x),"
            " 0D, (acc, v) -> acc + v)"
        )
    )
    ratio = prefix_norm / F.col("nrm")
    return (
        emb.crossJoin(F.broadcast(ks))
        .groupBy("dims")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.avg(ratio), 6).alias("avg_energy"),
            F.round(F.min(ratio), 6).alias("min_energy"),
        )
        .orderBy("dims")
    )


# --------------------------------------------------------------------------
# S11 — distributed PCA census (operators/pca.py): fit k=8 components on
# the embedding corpus in ONE moment-accumulation pass (d x d state,
# N-independent), then report each component's explained-variance share
# and the cumulative curve — the "how many dims does this embedding
# space really have" diagnostic read before choosing a matryoshka
# truncation (S10) or PQ subspace split (S8). Rows-only by design, like
# the sketches: eigendecomposition is not expressible in the oracle's
# SQL; the numerical contracts (orthonormality, parity with numpy on the
# same data, projection variance ordering) are pytest-asserted.
@query("embedding_pca_census", None)
def embedding_pca_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_health_spark.operators.pca import fit_pca

    model = fit_pca(_emb(spark, sf_dir), "emb", k=8)
    cum = 0.0
    rows = []
    for i, share in enumerate(model.explained):
        cum += float(share)
        rows.append((i, round(float(share), 6), round(cum, 6)))
    return spark.createDataFrame(
        rows, "component int, explained_share double, cum_share double"
    )


# --------------------------------------------------------------------------
# S12 — radius (range) retrieval: every corpus vector within a fixed
# cosine radius of each query — the output shape used to calibrate a
# dedup/near-match threshold (S6/X6 consume a radius, and this is the
# query that tells you what a radius *means* on your corpus) and the
# exact baseline for bucketed radius variants. Same declared
# |Q|-broadcast one-pass scan as S1 (broadcast nested-loop over the
# tiny query set; the corpus streams, norms precomputed per vector) —
# but the result is threshold-defined, not rank-defined, so its size
# audits the neighborhood density rather than clamping it at k.
RANGE_THRESHOLD = 0.3


@query(
    "ann_range_search",
    f"""
    WITH e AS ({_SQL_E}),
    q AS (SELECT vec_id AS q_id, emb AS q_emb FROM e WHERE vec_id < {N_QUERIES})
    SELECT q_id, vec_id, ROUND({_sql_cos("q_emb", "emb")}, 6) AS cosine
    FROM q JOIN e ON vec_id >= {N_QUERIES}
    WHERE {_sql_cos("q_emb", "emb")} >= {RANGE_THRESHOLD}
    ORDER BY q_id, vec_id
    """,
)
def ann_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _with_norm(_emb(spark, sf_dir), "emb", "nrm")
    q = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("emb").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    corpus = emb.where(F.col("vec_id") >= N_QUERIES)
    cos = _dot("q_emb", "emb") / (F.col("q_nrm") * F.col("nrm"))
    return (
        F.broadcast(q)
        .join(corpus, cos >= RANGE_THRESHOLD)
        .select("q_id", "vec_id", F.round(cos, 6).alias("cosine"))
        .orderBy("q_id", "vec_id")
    )


# --------------------------------------------------------------------------
# S13 — IVF + PQ composed retrieval: the architecture a 100 TB ANN
# service actually ships (FAISS IVFPQ; Johnson et al. 2017) — the coarse
# quantizer routes each query to IVFPQ_NPROBE inverted lists (so the
# scan touches nprobe/k of the corpus), the scan inside those lists runs
# in the COMPRESSED domain (per-subspace code distances summed from a
# broadcast lookup table — no float vectors move), and only the ADC
# shortlist is reranked exactly. S2 (route, full-precision scan) and S8
# (ADC over the whole corpus) are its two halves; this is the drop-in
# composition, sharing their deterministic quantizer/codebook families.
# Rows-only by design (iterative k-means + two quantizers exceed the
# oracle's SQL); recall-vs-bruteforce and exactness-of-reranked-cosines
# are pytest-asserted like S2/S8.
#
# Round 8 (VERDICT r7 task #6): quantizer training is a BUILD cost that
# amortizes across queries in production, so it is factored into
# `build_ivfpq_artifacts` — trained once per (session, sf_dir), every
# artifact localCheckpointed — and the registry query is the PROBE
# (route + compressed ADC scan + exact rerank). bench.py times the build
# explicitly as its own row; the headline `ann_ivf_pq_topk` measures
# what a served query actually costs.
IVFPQ_NPROBE = 4
IVFPQ_RERANK = 25

_IVFPQ_CACHE: dict[tuple[str, str], dict[str, DataFrame]] = {}


def build_ivfpq_artifacts(
    spark: SparkSession, sf_dir: str, force: bool = False
) -> dict[str, DataFrame]:
    """Train the coarse quantizer, PQ codebook, corpus codes, and list
    assignment ONCE per (session, sf_dir); all localCheckpointed so
    probes replay nothing. ``force=True`` rebuilds (bench uses it to
    time construction)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if not force and key in _IVFPQ_CACHE:
        return _IVFPQ_CACHE[key]
    emb = _emb(spark, sf_dir).select(
        "vec_id",
        F.expr(
            "transform(emb, x -> x / sqrt(aggregate(zip_with(emb, emb,"
            " (a, b) -> a * b), 0d, (acc, v) -> acc + v)))"
        ).alias("emb"),
    ).localCheckpoint()  # quantizer, codes, route, and rerank share it

    # coarse quantizer + list assignment (S2's family; unit vectors)
    embn = emb.withColumn("nrm", F.lit(1.0))
    cent = _with_norm(_kmeans_centroids(embn), "cent", "cnrm").localCheckpoint()
    ccos = _dot("emb", "cent") / F.col("cnrm")
    aw = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), F.col("cid"))
    assign = (
        emb.join(F.broadcast(cent))
        .select("vec_id", "cid", ccos.alias("ccos"))
        .withColumn("arn", F.row_number().over(aw))
        .where(F.col("arn") == 1)
        .select("vec_id", "cid")
        .localCheckpoint()
    )

    # PQ codebook + corpus codes (S8's family)
    sub = emb.select(
        "vec_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {PQ_M - 1}),"
                f" m -> slice(emb, m * {PQ_SUB} + 1, {PQ_SUB}))"
            )
        ).alias("m", "sv"),
    )
    cb = sub.where(F.col("vec_id") < PQ_K).select(
        F.col("vec_id").alias("code"), "m", F.col("sv").alias("cv")
    ).localCheckpoint()
    dists = sub.join(F.broadcast(cb), "m").select(
        "vec_id", "m", "code", _pq_d2().alias("d2")
    )
    w = Window.partitionBy("vec_id", "m").orderBy("d2", "code")
    codes = (
        dists.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "m", "code")
        .localCheckpoint()
    )
    idx = {"emb": emb, "cent": cent, "assign": assign, "cb": cb, "codes": codes}
    _IVFPQ_CACHE[key] = idx
    return idx


def _pq_d2() -> F.Column:
    """Squared L2 between a sub-vector `sv` and a codeword `cv`."""
    return (
        _dot("sv", "sv")
        - 2 * F.expr(
            "aggregate(zip_with(sv, cv, (x, y) -> x * y), 0d, (a, x) -> a + x)"
        )
        + _dot("cv", "cv")
    )


@query("ann_ivf_pq_topk", None)
def ann_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = build_ivfpq_artifacts(spark, sf_dir)
    emb, cent, assign, cb, codes = (
        idx["emb"], idx["cent"], idx["assign"], idx["cb"], idx["codes"]
    )

    # query-side routing: nprobe nearest centroids per query
    ccos = _dot("emb", "cent") / F.col("cnrm")
    qprobe = (
        emb.where(F.col("vec_id") < N_QUERIES)
        .join(F.broadcast(cent))
        .select(F.col("vec_id").alias("q_id"), "cid", ccos.alias("ccos"))
        .withColumn(
            "prn",
            F.row_number().over(
                Window.partitionBy("q_id").orderBy(F.desc("ccos"), F.col("cid"))
            ),
        )
        .where(F.col("prn") <= IVFPQ_NPROBE)
        .select("q_id", "cid")
    )

    # query-side ADC table: per-(q, m, code) distances vs the broadcast
    # codebook — |Q| x PQ_M x PQ_K rows, broadcast-sized by construction
    qsub = emb.where(F.col("vec_id") < N_QUERIES).select(
        "vec_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {PQ_M - 1}),"
                f" m -> slice(emb, m * {PQ_SUB} + 1, {PQ_SUB}))"
            )
        ).alias("m", "sv"),
    )
    qtab = qsub.join(F.broadcast(cb), "m").select(
        F.col("vec_id").alias("q_id"), "m", "code", _pq_d2().alias("qd2")
    )

    # route-then-ADC: only vectors in probed lists enter the compressed
    # scan; the (q, m, code) distance table broadcasts
    cand = (
        F.broadcast(qprobe)
        .join(assign, "cid")
        .where(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id")
    )
    adc = (
        cand.join(codes, "vec_id")
        .join(F.broadcast(qtab), ["q_id", "m", "code"])
        .groupBy("q_id", "vec_id")
        .agg(F.sum("qd2").alias("approx_d2"))
    )
    wr = Window.partitionBy("q_id").orderBy("approx_d2", "vec_id")
    shortlist = (
        adc.withColumn("rn", F.row_number().over(wr))
        .where(F.col("rn") <= IVFPQ_RERANK)
        .select("q_id", "vec_id")
    )

    # exact rerank (unit vectors: dot == cosine)
    qv = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("emb").alias("q_emb")
    )
    reranked = (
        shortlist.join(F.broadcast(qv), "q_id")
        .join(emb, "vec_id")
        .select("q_id", "vec_id", _dot("q_emb", "emb").alias("cos"))
    )
    wf = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.col("vec_id"))
    return (
        reranked.withColumn("rn", F.row_number().over(wf))
        .where(F.col("rn") <= TOP_K)
        .select("q_id", "vec_id", F.round("cos", 6).alias("cosine"), "rn")
        .orderBy("q_id", "rn")
    )


# --------------------------------------------------------------------------
# S14 — FILTERED top-k (hybrid search): nearest neighbors constrained to
# the query's own label — the metadata-predicate + vector composition
# production retrieval almost always runs (filtered ANN / pre-filter
# strategy). Unlike S1's declared broadcast nested-loop, the equality
# predicate turns the scan into a broadcast HASH join on label: each
# query only ever meets its own label's slice of the corpus — candidate
# set |corpus|/|labels| per query instead of |corpus|, the pre-filter
# win no post-filter ANN can match when the predicate is selective.
# One broadcast, one window top-k; no pair set beyond the label-matched
# candidates.
@query(
    "ann_filtered_topk",
    f"""
    WITH e AS ({_SQL_E}),
    q AS (SELECT vec_id AS q_id, label AS q_label, emb AS q_emb
          FROM e WHERE vec_id < {N_QUERIES}),
    scored AS (
      SELECT q_id, vec_id, {_sql_cos("q_emb", "emb")} AS cos
      FROM q JOIN e ON e.label = q.q_label AND vec_id <> q_id
    ), ranked AS (
      SELECT q_id, vec_id, cos,
             ROW_NUMBER() OVER (PARTITION BY q_id
                                ORDER BY cos DESC, vec_id) AS rn
      FROM scored
    )
    SELECT q_id, vec_id, ROUND(cos, 6) AS cosine, rn
    FROM ranked WHERE rn <= {TOP_K}
    ORDER BY q_id, rn
    """,
)
def ann_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _with_norm(_emb(spark, sf_dir), "emb", "nrm")
    q = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        F.col("emb").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    scored = emb.join(
        F.broadcast(q),
        (F.col("label") == F.col("q_label"))
        & (F.col("vec_id") != F.col("q_id")),
    ).select(
        "q_id",
        "vec_id",
        (_dot("q_emb", "emb") / (F.col("q_nrm") * F.col("nrm"))).alias("cos"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.col("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= TOP_K)
        .select("q_id", "vec_id", F.round("cos", 6).alias("cosine"), "rn")
        .orderBy("q_id", "rn")
    )


# --------------------------------------------------------------------------
# S15 — int8 scalar-quantized search (symmetric SQ) + exact rerank: the
# third classic compression point between raw floats (S1) and PQ codes
# (S8/S13). Per-dimension min/max over the corpus -> 8-bit affine codes
# (identical floor(x + 0.5) coding to `embedding_scalar_quantize`, whose
# census already hash-matches DuckDB); the candidate scan is ASYMMETRIC
# (the faiss SQ8 convention): the exact float query against the
# dequantized corpus (lo + c*scale — deterministic doubles, sequential
# cosine folds identical in both engines), then the SQ_RERANK shortlist
# is reranked with exact float cosine. Scale shape: the 64-row stats
# table and the |Q| query vectors broadcast; the corpus is encoded in
# one pass and only the int8 codes persist (4x smaller than floats — the
# form that stays in memory at 10^9 vectors; dequantization at scan time
# is register-level); the exact rerank touches only |Q| x SQ_RERANK full
# vectors.
SQ_RERANK = 25

_SQL_SQ = f"""
    WITH e AS (
      SELECT vec_id,
             CAST(UNNEST(embedding) AS DOUBLE) AS x,
             UNNEST(range(len(embedding))) AS dim
      FROM embeddings
    ),
    stats AS (SELECT dim, MIN(x) AS lo, MAX(x) AS hi FROM e GROUP BY dim),
    coded AS (
      SELECT e.vec_id, e.dim,
             CASE WHEN stats.hi = stats.lo THEN 0
                  ELSE FLOOR((e.x - stats.lo) /
                             ((stats.hi - stats.lo) / 255.0) + 0.5)
             END AS code
      FROM e JOIN stats USING (dim)
    ),
    recon AS (
      SELECT coded.vec_id,
             list(stats.lo + coded.code * ((stats.hi - stats.lo) / 255.0)
                  ORDER BY coded.dim) AS rc
      FROM coded JOIN stats USING (dim) GROUP BY coded.vec_id
    ),
    fq AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_emb
           FROM embeddings WHERE vec_id < {N_QUERIES}),
    approx AS (
      SELECT q_id, vec_id, {_sql_cos("q_emb", "rc")} AS ad
      FROM fq JOIN recon ON vec_id <> q_id
    ),
    short AS (
      SELECT q_id, vec_id,
             ROW_NUMBER() OVER (PARTITION BY q_id
                                ORDER BY ad DESC, vec_id) AS srn
      FROM approx
    ),
    fe AS ({_SQL_E}),
    rerank AS (
      SELECT s.q_id, s.vec_id, {_sql_cos("qe.emb", "ce.emb")} AS cos
      FROM short s
      JOIN fe qe ON qe.vec_id = s.q_id
      JOIN fe ce ON ce.vec_id = s.vec_id
      WHERE s.srn <= {SQ_RERANK}
    ),
    ranked AS (
      SELECT q_id, vec_id, cos,
             ROW_NUMBER() OVER (PARTITION BY q_id
                                ORDER BY cos DESC, vec_id) AS rn
      FROM rerank
    )
    SELECT q_id, vec_id, ROUND(cos, 6) AS cosine, rn
    FROM ranked WHERE rn <= {TOP_K}
    ORDER BY q_id, rn
"""


@query("ann_sq_int8_topk", _SQL_SQ)
def ann_sq_int8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    e = emb.select(
        "vec_id", F.posexplode("emb").alias("dim", "x")
    ).localCheckpoint(eager=False)  # stats + encode share the explode (r14)
    stats = e.groupBy("dim").agg(
        F.min("x").alias("lo"), F.max("x").alias("hi")
    )
    code = F.when(F.col("hi") == F.col("lo"), F.lit(0.0)).otherwise(
        F.floor(
            (F.col("x") - F.col("lo"))
            / ((F.col("hi") - F.col("lo")) / F.lit(255.0))
            + F.lit(0.5)
        ).cast("double")
    )
    # encode + dequantize: one corpus pass with the 64-row stats
    # broadcast, then reassemble the reconstructed array (one shuffle on
    # vec_id). At scale only the int8 codes persist; the lo + c*scale
    # reconstruction is register-level work at scan time.
    recon_v = F.col("lo") + F.col("code") * (
        (F.col("hi") - F.col("lo")) / F.lit(255.0)
    )
    recon = (
        e.join(F.broadcast(stats), "dim")
        .select("vec_id", "dim", code.alias("code"), "lo", "hi")
        .select("vec_id", "dim", recon_v.alias("rv"))
        .groupBy("vec_id")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(dim, rv))),"
                " s -> s.rv)"
            ).alias("rc")
        )
        # norms are per-VECTOR: evaluating them inside the pair join
        # below ran the 64-element fold once per (q, vec) PAIR (r14 —
        # the _with_norm rule this module already documents); same
        # doubles, same cosines
        .withColumn("rnrm", _norm("rc"))
    )
    # asymmetric scan: exact float query vs dequantized corpus cosine
    fq = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("emb").alias("q_emb"),
        _norm("emb").alias("qnrm"),
    )
    approx = recon.join(
        F.broadcast(fq), F.col("vec_id") != F.col("q_id")
    ).select(
        "q_id",
        "vec_id",
        (_dot("q_emb", "rc") / (F.col("qnrm") * F.col("rnrm"))).alias("ad"),
    )
    sw = Window.partitionBy("q_id").orderBy(F.desc("ad"), F.col("vec_id"))
    short = (
        approx.withColumn("srn", F.row_number().over(sw))
        .where(F.col("srn") <= SQ_RERANK)
        .select("q_id", "vec_id")
    )
    # exact rerank on the original floats
    fe = _with_norm(emb, "emb", "nrm")
    qe = fe.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("emb").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    scored = (
        short.join(F.broadcast(qe), "q_id")
        .join(fe, "vec_id")
        .select(
            "q_id",
            "vec_id",
            (_dot("q_emb", "emb") / (F.col("q_nrm") * F.col("nrm"))).alias(
                "cos"
            ),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.col("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= TOP_K)
        .select("q_id", "vec_id", F.round("cos", 6).alias("cosine"), "rn")
        .orderBy("q_id", "rn")
    )


# --------------------------------------------------------------------------
# S16 — graph-based ANN (rows-only: the NN-descent build and the beam
# walk are iterative, not SQL-expressible; recall and
# persisted-index bit-identity are pytest-asserted in
# tests/test_ann_graph.py). Build: distributed NN-descent k-NN graph —
# deterministic hash-seeded init, bounded neighbor-of-neighbor rounds,
# per-node degree cap (operators/ann_graph.py). Probe: lock-step beam
# search from shared entry points, T bounded rounds of
# adjacency-join + score-join + per-query window. The recall/latency
# point IVF/PQ/SQ don't cover: probe cost is |Q| x beam x degree x T
# regardless of corpus size or centroid balance.
_GRAPH_CACHE: dict[tuple[str, str], object] = {}


def build_graph_artifacts(
    spark: SparkSession, sf_dir: str, force: bool = False
):
    """Build the k-NN graph ONCE per (session, sf_dir); probes replay
    nothing (the r8 IVF+PQ build/probe split, graph edition).
    ``force=True`` rebuilds (bench uses it to time construction)."""
    from delta_lake_health_spark.operators import ann_graph

    key = (spark.sparkContext.applicationId, sf_dir)
    if not force and key in _GRAPH_CACHE:
        return _GRAPH_CACHE[key]
    idx = ann_graph.build_knn_graph(_emb(spark, sf_dir))
    _GRAPH_CACHE[key] = idx
    return idx


@query("ann_graph_topk", None)
def ann_graph_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_health_spark.operators import ann_graph

    idx = build_graph_artifacts(spark, sf_dir)
    q = _emb(spark, sf_dir).where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("emb").alias("q_emb")
    )
    return ann_graph.search_graph(
        idx, q, top_k=TOP_K, exclude_same_id=True
    )


# --------------------------------------------------------------------------
# S17 — MMR diversified rerank (Carbonell & Goldstein 1998, "Maximal
# Marginal Relevance"): from each query's top-M cosine shortlist, pick K
# results greedily by  lambda*rel - (1-lambda)*max_sim_to_selected  —
# relevant results that are NOT near-duplicates of each other, the
# standard rerank between retrieval and context assembly.
#
# Spark-first shape: the shortlist (M rows per query) and its pairwise
# sims (M^2 per query) are computed once and localCheckpointed; each of
# the K greedy rounds is then one anti-join + one max-aggregate + one
# per-query window over |Q| x M rows — lock-step across all queries like
# the beam search, never per-query driver loops. Every selection score
# is ROUNDed to 6 dp before the argmax (the k-means protocol) so the
# DuckDB oracle — the same K rounds unrolled as chained CTEs — picks
# identically.
_MMR_M = 16
_MMR_K = 5
_MMR_LAMBDA = 0.7


def _mmr_oracle_sql() -> str:
    lam, mu = _MMR_LAMBDA, round(1 - _MMR_LAMBDA, 6)
    ctes = [
        f"e AS ({_SQL_E})",
        f"q AS (SELECT vec_id AS q_id, emb AS q_emb FROM e "
        f"WHERE vec_id < {N_QUERIES})",
        f"""sl AS (
          SELECT q_id, vec_id, rel FROM (
            SELECT q_id, vec_id, {_sql_cos("q_emb", "emb")} AS rel,
                   ROW_NUMBER() OVER (
                     PARTITION BY q_id
                     ORDER BY {_sql_cos("q_emb", "emb")} DESC, vec_id
                   ) AS srn
            FROM q JOIN e ON vec_id <> q_id
          ) WHERE srn <= {_MMR_M}
        )""",
        f"""pw AS (
          SELECT x.q_id, x.vec_id AS a, y.vec_id AS b,
                 {_sql_cos("ea.emb", "eb.emb")} AS sim
          FROM sl x
          JOIN sl y ON x.q_id = y.q_id AND x.vec_id <> y.vec_id
          JOIN e ea ON ea.vec_id = x.vec_id
          JOIN e eb ON eb.vec_id = y.vec_id
        )""",
        f"""s1 AS (
          SELECT q_id, vec_id, 1 AS mmr_rank,
                 ROUND({lam} * rel, 6) AS mmr_score
          FROM (
            SELECT q_id, vec_id, rel,
                   ROW_NUMBER() OVER (
                     PARTITION BY q_id
                     ORDER BY ROUND({lam} * rel, 6) DESC, vec_id
                   ) AS rn
            FROM sl
          ) WHERE rn = 1
        )""",
        "sel1 AS (SELECT * FROM s1)",
    ]
    for r in range(2, _MMR_K + 1):
        ctes.append(
            f"""s{r} AS (
          SELECT q_id, vec_id, {r} AS mmr_rank, mmr_score FROM (
            SELECT c.q_id, c.vec_id,
                   ROUND({lam} * c.rel - {mu} * m.ms, 6) AS mmr_score,
                   ROW_NUMBER() OVER (
                     PARTITION BY c.q_id
                     ORDER BY ROUND({lam} * c.rel - {mu} * m.ms, 6) DESC,
                              c.vec_id
                   ) AS rn
            FROM sl c
            JOIN (
              SELECT p.q_id, p.a AS vec_id, MAX(p.sim) AS ms
              FROM pw p JOIN sel{r - 1} s
                ON p.q_id = s.q_id AND p.b = s.vec_id
              GROUP BY p.q_id, p.a
            ) m ON c.q_id = m.q_id AND c.vec_id = m.vec_id
            WHERE NOT EXISTS (
              SELECT 1 FROM sel{r - 1} z
              WHERE z.q_id = c.q_id AND z.vec_id = c.vec_id
            )
          ) WHERE rn = 1
        )"""
        )
        ctes.append(
            f"sel{r} AS (SELECT * FROM sel{r - 1} "
            f"UNION ALL SELECT * FROM s{r})"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT q_id, vec_id, mmr_rank, mmr_score FROM sel{_MMR_K}"
        + "\nORDER BY q_id, mmr_rank"
    )


@query("ann_mmr_rerank", _mmr_oracle_sql())
def ann_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_health_spark.operators.rerank import (
        mmr_select_local,
        pairwise_sims,
    )

    emb = _with_norm(_emb(spark, sf_dir), "emb", "nrm")
    q = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("emb").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    rel = _dot("q_emb", "emb") / (F.col("q_nrm") * F.col("nrm"))
    sw = Window.partitionBy("q_id").orderBy(F.desc("rel"), F.col("vec_id"))
    sl = (
        F.broadcast(q)
        .join(emb, F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", rel.alias("rel"))
        .withColumn("srn", F.row_number().over(sw))
        .where(F.col("srn") <= _MMR_M)
        .select("q_id", "vec_id", "rel")
        .localCheckpoint(eager=False)
    )
    # r14 (VERDICT r13 #5): the k greedy rounds run DRIVER-side over the
    # collected shortlist/pairwise rows (constant-bounded at
    # |Q| x M^2 = 8 x 240 rows — see operators/rerank.mmr_select_local);
    # the corpus-scale retrieval above stays in Spark. The distributed
    # k-round form (operators/rerank.mmr_rerank) remains available for
    # callers whose shortlist bound is not a constant.
    pw = pairwise_sims(sl, emb)
    return mmr_select_local(spark, sl, pw, _MMR_LAMBDA, _MMR_K)


# --------------------------------------------------------------------------
# S18 — reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009): fuse
# the exact ranking (S1) with the IVF probe's (S2) by
# sum(1/(60 + rank)) — the standard hybrid-retrieval combiner, robust
# to incomparable score scales because only RANKS enter. Both input
# rankings are themselves oracle-checked, and the oracle here nests
# their SQL as CTEs and fuses identically — the whole composition is
# hash-matched end-to-end. Scale shape: the fusion works on the two
# |Q| x top_k ranking outputs (tiny), never the corpus; whatever the
# input retrievers cost dominates.
_RRF_K = 60


def _rrf_oracle_sql() -> str:
    return f"""
    WITH r1 AS ({ORACLE["ann_bruteforce_topk"]}),
    r2 AS ({ORACLE["ann_ivf_topk"]}),
    u AS (
      SELECT q_id, vec_id, rn FROM r1
      UNION ALL
      SELECT q_id, vec_id, rn FROM r2
    ), f AS (
      SELECT q_id, vec_id,
             ROUND(SUM(1.0 / ({_RRF_K} + rn)), 6) AS rrf
      FROM u GROUP BY q_id, vec_id
    ), ranked AS (
      SELECT q_id, vec_id, rrf,
             ROW_NUMBER() OVER (
               PARTITION BY q_id ORDER BY rrf DESC, vec_id
             ) AS rank
      FROM f
    )
    SELECT q_id, vec_id, rrf, rank
    FROM ranked WHERE rank <= {TOP_K}
    ORDER BY q_id, rank
    """


def _served_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2's ranking served from the PERSISTED IVF artifact (VERDICT r10
    #6): build+save the index once per (machine, sf_dir) with the
    registry quantizer parameters, then answer every probe from
    ``load_ivf_index`` — bit-identical to the in-session ``ann_ivf_topk``
    (same deterministic k-means family, same probe/tie-break/rounding;
    pinned by tests/test_rerank.py), so the nested in-session oracle SQL
    still proves the composition."""
    import os

    from delta_lake_health_spark.operators import ann_index
    from delta_lake_health_spark.sources.fixture import build_once

    tag = os.path.basename(os.path.normpath(sf_dir)) or "default"
    path = f"/tmp/delta_lake_health_spark_fixture/ivf_index_{tag}"
    marker = os.path.join(path, "_IVFIX_COMPLETE")

    def build() -> None:
        idx = ann_index.build_ivf_index(
            _emb(spark, sf_dir),
            k=K_CENTROIDS,
            iters=KMEANS_ITERS,
            nprobe=NPROBE,
        )
        ann_index.save_ivf_index(spark, idx, path)

    # salt carries the PARAMETER VALUES: the builder's source only
    # names K_CENTROIDS/KMEANS_ITERS/NPROBE, so a constant edit must
    # still invalidate the marker (the stale-fixture bug build_once
    # exists to prevent)
    build_once(
        marker,
        build,
        clean=[path],
        salt=f"{sf_dir}:{K_CENTROIDS}:{KMEANS_ITERS}:{NPROBE}",
        deps=(
            ann_index.build_ivf_index,
            ann_index.save_ivf_index,
            _kmeans_centroids,
        ),
    )
    loaded = ann_index.load_ivf_index(spark, path)
    q = _emb(spark, sf_dir).where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("emb").alias("q_emb")
    )
    return ann_index.search(
        loaded, q, top_k=TOP_K, nprobe=NPROBE, exclude_same_id=True
    )


@query("ann_rrf_fusion", _rrf_oracle_sql())
def ann_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the IVF arm is SERVED from the persisted index artifact — the
    # production hybrid-retrieval path; the exact arm has no index to
    # persist (it IS the corpus scan)
    from delta_lake_health_spark.operators.rerank import rrf_fuse

    r1 = QUERIES["ann_bruteforce_topk"](spark, sf_dir)
    r2 = _served_ivf_topk(spark, sf_dir)
    return rrf_fuse([r1, r2], k=_RRF_K, top=TOP_K)
