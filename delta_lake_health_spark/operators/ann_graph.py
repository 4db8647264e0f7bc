"""Graph-based ANN: distributed NN-descent k-NN graph + beam search
(SURVEY §2.5 S16 — the NSW/HNSW recall/latency point the IVF/PQ/SQ
ladder doesn't cover).

Reference family: NN-descent (Dong et al., WWW 2011, "Efficient
K-Nearest Neighbor Graph Construction for Generic Similarity Measures")
for the build; NSW greedy beam search (Malkov et al. 2014) for the
probe. Both are re-expressed as BOUNDED DataFrame rounds — no
per-node pointer chasing, no driver-side graph:

- **Build** (``build_knn_graph``): start from a deterministic
  pseudo-random R-regular graph (``xxhash64(vec_id, j) mod N`` — no
  RNG), then a fixed number of NN-descent rounds. Each round proposes
  neighbors-of-neighbors over the UNDIRECTED edge view (u-v, v-w => u
  considers w), caps the per-node candidate list (deterministic hash
  order) so a hub node cannot quadratically explode a round, scores
  each NEW candidate pair once and reuses the cosine in BOTH
  directions (the local-join trick of NN-descent — without it, a good
  pair discovered from u's side never improves w's list, and measured
  recall@5 at sf0.1 drops 0.975 -> 0.80), and keeps the best
  ``degree`` edges per node (cosine DESC, dst tie-break). One round =
  two vec_id-keyed shuffle joins (attach endpoint embeddings) + one
  per-src window. State between rounds is localCheckpointed: round
  plans never nest.

- **Search** (``search_graph``): all queries advance in lock-step beam
  rounds. The frontier (|Q| x beam rows) joins the adjacency on the
  node key, the discovered neighbors join the vector table for scoring,
  and the per-query best-``beam`` of the NEW scores becomes the next
  frontier; every scored row accumulates into the visited set that
  yields the final top-k. T rounds = T (adjacency-join + score-join +
  window) stages — latency is bounded and identical for every query.

Scale shape at 100 TB: the adjacency is |N| x degree rows keyed by src
(persisted as a Delta table clustered on src — probe rounds read only
the frontier's files); the vector table is keyed by vec_id; every join
in build and search is a keyed shuffle with per-node caps, never
corpus x corpus; the only driver-side state is the entry-point id list
(|entries| ints) and the build parameters. Hub-node skew is bounded by
the candidate cap (build) and beam width (search).

Determinism: hash-seeded init, fixed round counts, every window ordered
with a vec_id tie-break — identical graphs and probes across runs,
which is what lets the persisted-index tests assert bit-identity.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from delta_lake_health_spark.functions.vector import dot as _dot
from delta_lake_health_spark.functions.vector import l2_norm as _norm

DEFAULT_DEGREE = 16
DEFAULT_BUILD_ROUNDS = 4
DEFAULT_BEAM = 12
DEFAULT_SEARCH_ROUNDS = 4
DEFAULT_ENTRIES = 4
# per-node candidate cap per NN-descent round (deterministic hash
# sample of the neighbors-of-neighbors set): bounds a round's scoring
# work to |N| x cap even around hub nodes
CANDIDATE_CAP = 192


@dataclass
class GraphIndex:
    """Materialized k-NN graph: adjacency + vectors + entry points."""

    edges: DataFrame    # (src, dst, cosine) — |N| x degree, keyed by src
    vectors: DataFrame  # (vec_id, emb, nrm) — the corpus with norms
    entries: list[int]  # entry-point vec_ids (driver-side, |entries| ints)
    degree: int
    beam_default: int
    search_rounds_default: int


def _score_edges(cand: DataFrame, vectors: DataFrame) -> DataFrame:
    """Attach both endpoint embeddings and score cosine — two
    vec_id-keyed joins, norms precomputed per vector."""
    src_v = vectors.select(
        F.col("vec_id").alias("src"),
        F.col("emb").alias("s_emb"),
        F.col("nrm").alias("s_nrm"),
    )
    dst_v = vectors.select(
        F.col("vec_id").alias("dst"),
        F.col("emb").alias("d_emb"),
        F.col("nrm").alias("d_nrm"),
    )
    return (
        cand.join(src_v, "src")
        .join(dst_v, "dst")
        .select(
            "src",
            "dst",
            (
                _dot("s_emb", "d_emb") / (F.col("s_nrm") * F.col("d_nrm"))
            ).alias("cosine"),
        )
    )


# bucket count for the dense-rank two-phase pattern (init targets):
# |buckets| counts reach the driver, never the ids themselves
_RANK_BUCKETS = 256


def _dense_ranks(ids: DataFrame) -> DataFrame:
    """(vec_id, rank) with rank DENSE in [0, N) for ANY id domain —
    sparse, negative, or non-contiguous vec_ids all work. Two-phase:
    bucket-local row_number + a |buckets|-row prefix-sum window whose
    result broadcasts back (the pareto-census / pack-sequences pattern)
    — no global single-task window over the ids, and no driver
    round-trip: the only window ordered globally runs over the
    _RANK_BUCKETS-row counts frame."""
    local = ids.select(
        "vec_id",
        F.pmod(F.xxhash64("vec_id"), F.lit(_RANK_BUCKETS))
        .cast("int")
        .alias("bkt"),
    ).withColumn(
        "lrn",
        F.row_number().over(Window.partitionBy("bkt").orderBy("vec_id"))
        - 1,
    )
    offs = (
        local.groupBy("bkt")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "off",
            F.coalesce(
                F.sum("n").over(
                    Window.orderBy("bkt").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("bkt", "off")
    )
    return local.join(F.broadcast(offs), "bkt").select(
        "vec_id", (F.col("lrn") + F.col("off")).alias("rank")
    )


def build_knn_graph(
    emb: DataFrame,
    degree: int = DEFAULT_DEGREE,
    rounds: int = DEFAULT_BUILD_ROUNDS,
    entries: int = DEFAULT_ENTRIES,
    candidate_cap: int = CANDIDATE_CAP,
) -> GraphIndex:
    """NN-descent over ``emb`` (vec_id, emb): deterministic random init,
    ``rounds`` neighbor-of-neighbor refinement rounds, per-node degree
    cap. Entry points are the ``entries`` lowest vec_ids (stable,
    engine-independent)."""
    vectors = emb.select(
        "vec_id", "emb", _norm("emb").alias("nrm")
    ).localCheckpoint()
    n = vectors.count()
    degree = min(degree, max(1, n - 1))

    # deterministic pseudo-random R-regular init: no RNG, no driver
    # loop. Targets are drawn as dense RANKS in [0, n) and joined back
    # to real vec_ids — hashing the id itself into [0, n) would point
    # at nonexistent vectors whenever ids are sparse or non-contiguous,
    # and the score join would silently drop them (starving initial
    # degree and recall).
    ranks = _dense_ranks(vectors.select("vec_id")).localCheckpoint()
    init = (
        ranks.select(
            F.col("vec_id").alias("src"),
            F.explode(
                F.expr(
                    f"transform(sequence(0, {degree - 1}),"
                    f" j -> pmod(xxhash64(vec_id, j), {n}))"
                )
            ).alias("trank"),
        )
        .join(
            ranks.select(
                F.col("rank").alias("trank"),
                F.col("vec_id").alias("dst"),
            ),
            "trank",
        )
        .select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )
    edges = _score_edges(init, vectors).localCheckpoint()

    for _ in range(rounds):
        und = edges.select("src", "dst").unionByName(
            edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        )
        non = (
            und.alias("a")
            .join(
                und.alias("b").select(
                    F.col("src").alias("mid"), F.col("dst").alias("dst2")
                ),
                F.col("a.dst") == F.col("mid"),
            )
            .select(F.col("a.src").alias("src"), F.col("dst2").alias("dst"))
            .where(F.col("src") != F.col("dst"))
        )
        cand = non.dropDuplicates(["src", "dst"])
        # bound the per-node scoring work: deterministic hash-order
        # sample of the candidate set
        cw = Window.partitionBy("src").orderBy(
            F.xxhash64("src", "dst"), F.col("dst")
        )
        cand = (
            cand.withColumn("crn", F.row_number().over(cw))
            .where(F.col("crn") <= candidate_cap)
            .drop("crn")
            # existing edges keep their stored cosine below — never
            # re-score a pair the graph already holds
            .join(edges.select("src", "dst"), ["src", "dst"], "left_anti")
        )
        sc = _score_edges(cand, vectors)
        # reuse each computed cosine in BOTH directions: a pair found
        # from u's neighborhood improves w's list in the same round
        sc = sc.unionByName(
            sc.select(
                F.col("dst").alias("src"),
                F.col("src").alias("dst"),
                "cosine",
            )
        )
        kw = Window.partitionBy("src").orderBy(
            F.desc("cosine"), F.col("dst")
        )
        edges = (
            sc.unionByName(edges)
            .dropDuplicates(["src", "dst"])
            .withColumn("rn", F.row_number().over(kw))
            .where(F.col("rn") <= degree)
            .drop("rn")
            .localCheckpoint()
        )

    entry_ids = [
        r.vec_id
        for r in vectors.select("vec_id")
        .orderBy("vec_id")
        .limit(entries)
        .collect()
    ]
    return GraphIndex(
        edges=edges,
        vectors=vectors,
        entries=entry_ids,
        degree=degree,
        beam_default=DEFAULT_BEAM,
        search_rounds_default=DEFAULT_SEARCH_ROUNDS,
    )


def search_graph(
    index: GraphIndex,
    queries: DataFrame,
    top_k: int = 5,
    beam: int | None = None,
    rounds: int | None = None,
    exclude_same_id: bool = False,
) -> DataFrame:
    """Lock-step beam search: every query starts at the shared entry
    points and advances ``rounds`` times; the answer is the top-k of
    everything scored along the way. ``queries`` = (q_id, q_emb)."""
    beam = beam or index.beam_default
    rounds = rounds if rounds is not None else index.search_rounds_default

    q = queries.select(
        "q_id", "q_emb", _norm("q_emb").alias("qnrm")
    ).localCheckpoint()

    def _score(cand: DataFrame) -> DataFrame:
        # cand = (q_id, vec_id); attach query + corpus vectors, score
        return (
            cand.join(q, "q_id")
            .join(index.vectors, "vec_id")
            .select(
                "q_id",
                "vec_id",
                (
                    _dot("q_emb", "emb") / (F.col("qnrm") * F.col("nrm"))
                ).alias("cosine"),
            )
        )

    entry_rows = q.select("q_id").crossJoin(
        F.broadcast(
            index.vectors.sparkSession.createDataFrame(
                [(int(e),) for e in index.entries], "vec_id long"
            )
        )
    )
    visited = _score(entry_rows).localCheckpoint()
    frontier = visited

    bw = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.col("vec_id"))
    for _ in range(rounds):
        frontier = (
            frontier.withColumn("brn", F.row_number().over(bw))
            .where(F.col("brn") <= beam)
            .select("q_id", "vec_id")
        )
        neigh = (
            frontier.join(
                index.edges.select(
                    F.col("src").alias("vec_id"), F.col("dst")
                ),
                "vec_id",
            )
            .select("q_id", F.col("dst").alias("vec_id"))
            .dropDuplicates(["q_id", "vec_id"])
            # expand only UNVISITED nodes: revisits re-score the same
            # cosine and can only crowd the beam with stale rows
            .join(
                visited.select("q_id", "vec_id"),
                ["q_id", "vec_id"],
                "left_anti",
            )
        )
        scored = _score(neigh).localCheckpoint()
        visited = visited.unionByName(scored).localCheckpoint()
        frontier = scored

    out = visited
    if exclude_same_id:
        out = out.where(F.col("vec_id") != F.col("q_id"))
    rw = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.col("vec_id"))
    return (
        out.withColumn("rn", F.row_number().over(rw))
        .where(F.col("rn") <= top_k)
        .select("q_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rn")
        .orderBy("q_id", "rn")
    )


def save_graph_index(spark, index: GraphIndex, path: str) -> dict:
    """Persist as TWO Delta tables under ``path`` — edges (clustered on
    src: a probe round's frontier reads prune to the touched files) and
    vectors (clustered on vec_id) — with the search parameters and
    entry points recorded as table properties on the edges table. Build
    once on the cluster, serve beam probes from any session."""
    import os

    from delta_lake_health_spark.sources import delta_writer

    delta_writer.write(
        spark, index.edges, os.path.join(path, "edges"),
        mode="overwrite", cluster_by=["src"],
    )
    delta_writer.write(
        spark, index.vectors, os.path.join(path, "vectors"),
        mode="overwrite", cluster_by=["vec_id"],
    )
    # artifact-maintenance contract (D57, r13): declared clustering +
    # autoCompact on both tables so refresh appends bin-pack themselves
    # with src/vec_id file pruning preserved by the cluster-aware compact
    for sub, cols in (("edges", ["src"]), ("vectors", ["vec_id"])):
        delta_writer.set_cluster_columns(
            spark, os.path.join(path, sub), cols
        )
        delta_writer.set_table_property(
            spark,
            os.path.join(path, sub),
            "delta.autoOptimize.autoCompact",
            "true",
        )
    for key, val in (
        ("graph.degree", index.degree),
        ("graph.beamDefault", index.beam_default),
        ("graph.searchRoundsDefault", index.search_rounds_default),
        ("graph.entries", ",".join(str(e) for e in index.entries)),
    ):
        delta_writer.set_table_property(
            spark, os.path.join(path, "edges"), key, str(val)
        )
    return {"degree": index.degree, "path": path}


def load_graph_index(spark, path: str) -> GraphIndex:
    """Reopen a persisted graph: two snapshot reads + parameters from
    the edges table's properties. Probes against the loaded index are
    bit-identical to probes against the in-session build."""
    import os

    from delta_lake_health_spark.sources.delta_log import DeltaLog

    elog = DeltaLog(spark, os.path.join(path, "edges"))
    cfg = elog.metadata().get("configuration") or {}
    return GraphIndex(
        edges=elog.snapshot(),
        vectors=DeltaLog(spark, os.path.join(path, "vectors")).snapshot(),
        entries=[
            int(x) for x in cfg["graph.entries"].split(",") if x != ""
        ],
        degree=int(cfg["graph.degree"]),
        beam_default=int(cfg["graph.beamDefault"]),
        search_rounds_default=int(cfg["graph.searchRoundsDefault"]),
    )
