"""X18 — the composed streaming corpus door
(``streaming/jobs.stream_corpus_door``): one foreachBatch job running
quality gate (T9) + exact dedup (X16) + near-dup novelty probe (X17)
+ index maintenance. Across three id-ordered micro-batches the
end-state corpus must equal the batch X10 pipeline
(``pipeline_corpus_build`` / ``curated_documents``) on the same input,
every input doc must land in exactly one of corpus/quarantine, the
LSH index must hold exactly the stage-1 survivors, and a full crash
replay (checkpoint wiped) must change nothing."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from delta_lake_health_spark.operators import minhash_index as mi
from delta_lake_health_spark.plans.dedup import (
    QUERIES,
    curated_documents,
)
from delta_lake_health_spark.sources import delta_writer
from delta_lake_health_spark.sources.catalog import load
from delta_lake_health_spark.sources.delta_log import DeltaLog
from delta_lake_health_spark.streaming.jobs import stream_corpus_door
from tests.conftest import SF_DIR

COLS = ["doc_id", "text", "lang", "source", "n_chars"]


def _docs(spark):
    return load(spark, SF_DIR, "documents").select(*COLS)


def _run_door(spark, root, n_batches=3, bm25=False):
    docs = _docs(spark)
    hi = docs.agg(F.max("doc_id")).collect()[0][0]
    bounds = [hi * (i + 1) // n_batches for i in range(n_batches)]
    src = os.path.join(root, "source")
    lo = -1
    for i, b in enumerate(bounds):
        part = docs.where(
            (F.col("doc_id") > lo) & (F.col("doc_id") <= b)
        )
        delta_writer.write(
            spark, part, src, mode="overwrite" if i == 0 else "append"
        )
        stream_corpus_door(
            spark,
            src,
            corpus_path=os.path.join(root, "corpus"),
            quarantine_path=os.path.join(root, "quarantine"),
            index_path=os.path.join(root, "lsh"),
            checkpoint_dir=os.path.join(root, "ckpt"),
            bm25_path=os.path.join(root, "bm25") if bm25 else None,
        )
        lo = b
    return root


@pytest.fixture(scope="module")
def door(spark, tmp_path_factory):
    return _run_door(
        spark, str(tmp_path_factory.mktemp("door")), bm25=True
    )


def _table(spark, door, name):
    return DeltaLog(spark, os.path.join(door, name)).snapshot()


def test_end_state_equals_batch_pipeline(spark, door):
    """The door's accepted corpus == the batch X10 kept-set, per doc
    and per payload column (split included), on the same input."""
    got = {
        tuple(r)
        for r in _table(spark, door, "corpus")
        .select(*COLS, "split")
        .collect()
    }
    want = {
        tuple(r)
        for r in curated_documents(spark, SF_DIR)
        .select(*COLS, "split")
        .collect()
    }
    assert got == want and got, "door corpus diverges from batch X10"
    # census form too (the X10 driver-row contract)
    batch = {
        tuple(r)
        for r in QUERIES["pipeline_corpus_build"](spark, SF_DIR).collect()
    }
    door_census = {
        tuple(r)
        for r in _table(spark, door, "corpus")
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .collect()
    }
    assert door_census == batch


def test_every_doc_lands_exactly_once(spark, door):
    corpus = _table(spark, door, "corpus").select("doc_id")
    quar = _table(spark, door, "quarantine").select("doc_id")
    routed = corpus.unionByName(quar)
    n_in = _docs(spark).count()
    assert routed.count() == n_in
    assert routed.distinct().count() == n_in
    reasons = {
        r.reason
        for r in _table(spark, door, "quarantine")
        .select("reason")
        .distinct()
        .collect()
    }
    assert reasons <= {"exact_dup", "quality", "near_dup"}
    # every non-quality rejection carries its colliding doc
    bad = (
        _table(spark, door, "quarantine")
        .where(
            (F.col("reason") != "quality")
            & F.col("match_doc_id").isNull()
        )
        .count()
    )
    assert bad == 0
    # the colliding doc is always an earlier (smaller-id) one
    order = (
        _table(spark, door, "quarantine")
        .where(F.col("match_doc_id").isNotNull())
        .where(F.col("match_doc_id") >= F.col("doc_id"))
        .count()
    )
    assert order == 0


def test_index_holds_stage1_survivors(spark, door):
    """The LSH artifact's seen-set = corpus + non-exact quarantine
    (quality-fails and near-dup rejects contribute bands; exact dups
    don't need to — their surviving twin's bands are identical)."""
    seen = {
        r.doc_id
        for r in mi._seen_docs(
            spark, mi._log(spark, mi._data_path(os.path.join(door, "lsh")))
        ).collect()
    }
    corpus_ids = {
        r.doc_id for r in _table(spark, door, "corpus").collect()
    }
    non_exact = {
        r.doc_id
        for r in _table(spark, door, "quarantine")
        .where(F.col("reason") != "exact_dup")
        .collect()
    }
    assert seen == corpus_ids | non_exact
    # BM25 maintenance indexed exactly the accepted docs
    from delta_lake_health_spark.operators import text_index

    dl = text_index._dl_rows(
        spark,
        DeltaLog(
            spark, text_index._data_path(os.path.join(door, "bm25"))
        ),
    )
    assert {r.doc_id for r in dl.select("doc_id").collect()} == corpus_ids


def test_crash_replay_is_noop(spark, door, tmp_path):
    """Wipe the streaming checkpoint and rerun the whole door over the
    same source: every micro-batch replays, and the txn guards +
    index/BM25 anti-joins must make all of it a no-op."""
    import shutil

    versions = {
        t: delta_writer.current_version(os.path.join(door, t))
        for t in ("corpus", "quarantine")
    }
    idx_v = delta_writer.current_version(
        mi._data_path(os.path.join(door, "lsh"))
    )
    before = {
        tuple(r)
        for r in _table(spark, door, "corpus").collect()
    }
    shutil.rmtree(os.path.join(door, "ckpt"))
    stream_corpus_door(
        spark,
        os.path.join(door, "source"),
        corpus_path=os.path.join(door, "corpus"),
        quarantine_path=os.path.join(door, "quarantine"),
        index_path=os.path.join(door, "lsh"),
        checkpoint_dir=os.path.join(door, "ckpt"),
        bm25_path=os.path.join(door, "bm25"),
    )
    for t, v in versions.items():
        assert (
            delta_writer.current_version(os.path.join(door, t)) == v
        ), f"{t} advanced on replay"
    assert (
        delta_writer.current_version(
            mi._data_path(os.path.join(door, "lsh"))
        )
        == idx_v
    )
    after = {
        tuple(r)
        for r in _table(spark, door, "corpus").collect()
    }
    assert after == before


def test_exact_dup_quarantine_paths(spark, tmp_path):
    """The fixture corpus has no identical texts, so the exact_dup
    quarantine reason never fires there — drive both exact paths with
    crafted input: an in-batch twin (match = the batch's same-text
    min) and a cross-batch twin of an ACCEPTED doc (match = the
    corpus doc)."""
    t1 = (
        "the quick brown fox jumps over and under the lazy dog while "
        "seven other animals watch from nearby hills during early "
        "morning light"
    )
    t3 = (
        "completely different prose about database engines and the "
        "way vectorized execution pipelines process columnar batches "
        "with late materialization strategies everywhere"
    )
    root = str(tmp_path / "door")
    src = os.path.join(root, "source")
    kw = dict(
        corpus_path=os.path.join(root, "corpus"),
        quarantine_path=os.path.join(root, "quarantine"),
        index_path=os.path.join(root, "lsh"),
        checkpoint_dir=os.path.join(root, "ckpt"),
    )
    batch1 = spark.createDataFrame(
        [
            (1, t1, "en", "web", len(t1)),
            (2, t1, "en", "web", len(t1)),  # in-batch exact twin
            (3, t3, "en", "web", len(t3)),
        ],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    delta_writer.write(spark, batch1, src, mode="overwrite")
    stream_corpus_door(spark, src, **kw)
    batch2 = spark.createDataFrame(
        [(4, t1, "en", "web", len(t1))],  # cross-batch twin of doc 1
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    delta_writer.write(spark, batch2, src, mode="append")
    stream_corpus_door(spark, src, **kw)
    quar = {
        r.doc_id: (r.reason, r.match_doc_id)
        for r in _table(spark, root, "quarantine").collect()
    }
    assert quar[2] == ("exact_dup", 1)
    assert quar[4] == ("exact_dup", 1)
    corpus_ids = {r.doc_id for r in _table(spark, root, "corpus").collect()}
    assert corpus_ids == {1, 3}
    # exact twins never enter the LSH index (their twin's bands are
    # identical — indexing them would only add self-noise)
    seen = {
        r.doc_id
        for r in mi._seen_docs(
            spark, mi._log(spark, mi._data_path(os.path.join(root, "lsh")))
        ).collect()
    }
    assert seen == {1, 3}
