"""Persisted MinHash-LSH index (operators/minhash_index.py, X17,
VERDICT r11 #3): served candidate pairs must be bit-identical to the
in-session X3 query, upserts must be single append-only commits that
converge to the from-scratch build with exact replay no-ops, and the
novelty probe must file-prune through the cluster_by(band_key) layout
and find the indexed near-dups of an incoming doc."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from delta_lake_health_spark.operators import minhash_index as mi
from delta_lake_health_spark.plans.dedup import QUERIES
from delta_lake_health_spark.sources import delta_writer
from delta_lake_health_spark.sources.catalog import load
from tests.conftest import SF_DIR


def _docs(spark):
    return load(spark, SF_DIR, "documents").select("doc_id", "text")


def _pairs(df):
    return sorted((r.doc_a, r.doc_b) for r in df.collect())


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("mh") / "idx")
    m = mi.build_minhash_index(spark, _docs(spark), path)
    assert m["n_docs"] == _docs(spark).count()
    return path


def test_served_pairs_match_registry_query(spark, built):
    served = mi.serve_candidate_pairs(spark, built)
    in_session = QUERIES["dedup_minhash_pairs"](spark, SF_DIR)
    want = _pairs(in_session)
    assert want, "fixture corpus has no LSH candidate pairs"
    assert _pairs(served) == want


def test_upsert_converges_and_is_append_only(spark, built, tmp_path):
    docs = _docs(spark).localCheckpoint()
    inc = str(tmp_path / "inc")
    mi.build_minhash_index(spark, docs.where(F.col("doc_id") % 3 != 0), inc)
    v0 = delta_writer.current_version(mi._data_path(inc))
    m = mi.upsert_minhash_index(
        spark, inc, docs.where(F.col("doc_id") % 3 == 0)
    )
    assert m["numDocsAdded"] == docs.where("doc_id % 3 = 0").count()
    v1 = delta_writer.current_version(mi._data_path(inc))
    assert v1 == v0 + 1
    acts = delta_writer._version_actions(mi._data_path(inc), v1)
    kinds = {k for a in acts for k in a}
    assert "add" in kinds and "remove" not in kinds
    assert _pairs(mi.serve_candidate_pairs(spark, inc)) == _pairs(
        mi.serve_candidate_pairs(spark, built)
    )
    # replaying the same docs is an exact no-op (crash-replay safety)
    m2 = mi.upsert_minhash_index(
        spark, inc, docs.where(F.col("doc_id") % 3 == 0)
    )
    assert m2 == {"numDocsAdded": 0}
    assert delta_writer.current_version(mi._data_path(inc)) == v1


def test_upsert_empty_batch_is_noop(spark, built):
    v = delta_writer.current_version(mi._data_path(built))
    empty = _docs(spark).where(F.lit(False))
    assert mi.upsert_minhash_index(spark, built, empty) == {
        "numDocsAdded": 0
    }
    assert delta_writer.current_version(mi._data_path(built)) == v


def test_probe_finds_indexed_duplicates(spark, built):
    """A probe doc whose text EQUALS an indexed doc's shares every band
    — the probe must surface that doc as a candidate."""
    sample = _docs(spark).orderBy("doc_id").limit(3).collect()
    probes = spark.createDataFrame(
        [(r.doc_id + 1_000_000, r.text) for r in sample],
        "doc_id long, text string",
    )
    got = mi.probe_minhash_index(spark, built, probes)
    hits = {(r.probe_doc_id, r.index_doc_id) for r in got.collect()}
    for r in sample:
        assert (r.doc_id + 1_000_000, r.doc_id) in hits


def test_verified_probe_decision(spark, built):
    """X17c: exact copies verify at jaccard 1.0 / is_dup 1; a lightly
    mutated copy still matches its source above threshold with a
    jaccard the exact shingle-set math produced; unrelated text is
    novel (NULL match, is_dup 0); the threshold is honored."""
    sample = _docs(spark).orderBy("doc_id").limit(2).collect()
    dup = (sample[0].doc_id + 1_000_000, sample[0].text)
    toks = sample[1].text.split(" ")
    near = (sample[1].doc_id + 1_000_000, " ".join(toks[:-3]))
    novel = (9_999_999, "zq0 zq1 zq2 zq3 zq4 zq5 zq6 zq7 zq8 zq9")
    probes = spark.createDataFrame(
        [dup, near, novel], "doc_id long, text string"
    )
    out = mi.verified_probe(spark, built, probes, _docs(spark))
    got = {r.probe_doc_id: r for r in out.collect()}
    assert set(got) == {dup[0], near[0], novel[0]}  # one row per probe
    assert got[dup[0]].best_match == sample[0].doc_id
    assert got[dup[0]].jaccard == 1.0 and got[dup[0]].is_dup == 1
    r = got[near[0]]
    assert r.best_match == sample[1].doc_id
    assert 0.2 <= r.jaccard <= 1.0 and r.is_dup == 1
    nv = got[novel[0]]
    assert nv.best_match is None and nv.jaccard is None and nv.is_dup == 0
    # threshold honored: nothing reaches an impossible bar, but the
    # best_match evidence still lands in the quarantine record
    strict = mi.verified_probe(
        spark, built, probes, _docs(spark), threshold=1.1
    ).collect()
    assert all(row.is_dup == 0 for row in strict)
    assert any(row.best_match is not None for row in strict)


def test_probe_prunes_index_files(spark, tmp_path):
    """Build with AQE coalescing off to get the multi-file clustered
    layout a real corpus produces, then prove a narrow probe touches
    only the files whose band_key range it hits."""
    from delta_lake_health_spark.plans.dedup import band_rows

    docs = _docs(spark).localCheckpoint()
    path = str(tmp_path / "idx")
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    spark.conf.set(coalesce_key, "false")
    try:
        mi.build_minhash_index(spark, docs, path)
    finally:
        spark.conf.set(coalesce_key, "true")
    log = mi._log(spark, mi._data_path(path))
    total = log.active_files().count()
    assert total > 4
    one = docs.orderBy("doc_id").limit(1).collect()[0]
    probe = spark.createDataFrame(
        [(9_999_999, one.text)], "doc_id long, text string"
    )
    probe_bands = band_rows(probe).localCheckpoint()
    paths = log.pruned_files_for_keys(
        probe_bands.select("band_key"),
        "band_key",
        partition_filter={"kind": "band"},
    )
    assert 1 <= len(paths) < total, (len(paths), total)
    got = mi.probe_minhash_index(spark, path, probe)
    assert (9_999_999, one.doc_id) in {
        (r.probe_doc_id, r.index_doc_id) for r in got.collect()
    }


def test_auto_compaction_after_small_upserts(spark, tmp_path):
    """The self-maintaining-artifact contract (VERDICT r12 #3): the
    build DECLARES delta.autoOptimize.autoCompact, so a run of small
    upserts triggers an automatic OPTIMIZE commit (dataChange=false)
    behind the write that crossed minNumFiles — file count drops and
    served pairs stay bit-identical, with no explicit maintenance
    call anywhere."""
    from delta_lake_health_spark.sources.delta_log import DeltaLog

    docs = _docs(spark).localCheckpoint()
    path = str(tmp_path / "idx")
    data = mi._data_path(path)
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    spark.conf.set(coalesce_key, "false")
    try:
        mi.build_minhash_index(
            spark, docs.where(F.col("doc_id") < 200), path
        )
        assert (
            DeltaLog(spark, data)
            .metadata()["configuration"]
            .get("delta.autoOptimize.autoCompact")
            == "true"
        )
        delta_writer.set_table_property(
            spark, data, "delta.autoOptimize.minNumFiles", "6"
        )
        for lo in range(200, 500, 60):
            mi.upsert_minhash_index(
                spark,
                path,
                docs.where(
                    (F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 60)
                ),
            )
    finally:
        spark.conf.set(coalesce_key, "true")
    log = DeltaLog(spark, data)
    ops = [r.operation for r in log.history().collect()]
    assert "OPTIMIZE" in ops, "no automatic compaction fired"
    # the compaction's adds are dataChange=false (change-feed invisible)
    opt_v = next(
        r.version
        for r in log.history().collect()
        if r.operation == "OPTIMIZE"
    )
    acts = delta_writer._version_actions(data, int(opt_v))
    adds = [a["add"] for a in acts if "add" in a]
    assert adds and all(a.get("dataChange") is False for a in adds)
    # compaction actually shrank the small-file population vs the
    # uncompacted trajectory (pre-build files + 5 upserts' files)
    removed = [a["remove"] for a in acts if "remove" in a]
    assert len(removed) > len(adds)
    # and the artifact still serves the exact full-corpus answer
    assert _pairs(mi.serve_candidate_pairs(spark, path)) == _pairs(
        QUERIES["dedup_minhash_pairs"](spark, SF_DIR)
    )


def test_registry_served_row(spark):
    got = QUERIES["dedup_minhash_served"](spark, SF_DIR)
    want = QUERIES["dedup_minhash_pairs"](spark, SF_DIR)
    assert _pairs(got) == _pairs(want)


@pytest.mark.slow
def test_stream_minhash_index_maintenance_parity(spark, tmp_path):
    """X17 freshness path: new-doc commits folded through the
    delta_tail maintenance stream must leave served candidate pairs
    bit-equal to a from-scratch build, and replaying the commits
    through a fresh checkpoint must be an exact no-op."""
    from delta_lake_health_spark.streaming.jobs import (
        stream_minhash_index_maintenance,
    )

    docs = _docs(spark).localCheckpoint()
    docs_tbl = str(tmp_path / "docs")
    idx = str(tmp_path / "idx")
    full = str(tmp_path / "full")
    seed = docs.where(F.col("doc_id") % 3 == 0)
    delta_writer.write(spark, seed, docs_tbl)
    mi.build_minhash_index(spark, seed, idx)
    delta_writer.write(
        spark, docs.where(F.col("doc_id") % 3 == 1), docs_tbl, mode="append"
    )
    delta_writer.write(
        spark, docs.where(F.col("doc_id") % 3 == 2), docs_tbl, mode="append"
    )
    stream_minhash_index_maintenance(
        spark, docs_tbl, idx, str(tmp_path / "ckpt")
    )
    mi.build_minhash_index(spark, docs, full)
    assert _pairs(mi.serve_candidate_pairs(spark, idx)) == _pairs(
        mi.serve_candidate_pairs(spark, full)
    )
    v = delta_writer.current_version(mi._data_path(idx))
    stream_minhash_index_maintenance(
        spark, docs_tbl, idx, str(tmp_path / "ckpt2")
    )
    assert delta_writer.current_version(mi._data_path(idx)) == v


def test_duplicate_ids_in_batch_never_self_pair(spark, tmp_path):
    """r12 review: a build or upsert batch carrying the same doc_id
    twice must not write duplicate band rows — posting list [x, x]
    would expand to the self-pair (x, x), an output the X3 oracle can
    never emit."""
    docs = _docs(spark).limit(10).localCheckpoint()
    dup = docs.unionByName(docs)  # every id twice
    path = str(tmp_path / "idx")
    m = mi.build_minhash_index(spark, dup, path)
    assert m["n_docs"] == 10
    pairs = _pairs(mi.serve_candidate_pairs(spark, path))
    assert all(a < b for a, b in pairs)
    # upsert with an internally-duplicated batch: count is distinct ids
    more = _docs(spark).where("doc_id >= 400").limit(5).localCheckpoint()
    m2 = mi.upsert_minhash_index(spark, path, more.unionByName(more))
    assert m2["numDocsAdded"] == 5
    pairs = _pairs(mi.serve_candidate_pairs(spark, path))
    assert all(a < b for a, b in pairs)


def test_precomputed_bands_with_conflicting_duplicate_ids(spark, tmp_path):
    """r13 review: the precomputed-bands fast path must not bypass the
    r12 duplicate-id guard — a batch carrying the same doc_id with TWO
    texts gets its bands recomputed from the chosen (max) text, never a
    mix of both."""
    from delta_lake_health_spark.plans.dedup import band_rows

    rows = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (1, "zz yy xx ww vv uu tt ss"),  # conflicting duplicate
            (2, "one two three four five six seven"),
        ],
        "doc_id long, text string",
    )
    path = str(tmp_path / "idx")
    mi.build_minhash_index(spark, rows, path, bands=band_rows(rows))
    stored = (
        mi._band_scan(spark, mi._log(spark, mi._data_path(path)))
        .collect()
    )
    got = {(r.doc_id, r.band_idx, r.band_key) for r in stored}
    chosen = spark.createDataFrame(
        [(1, "zz yy xx ww vv uu tt ss"),
         (2, "one two three four five six seven")],
        "doc_id long, text string",
    )
    want = {
        (r.doc_id, r.band_idx, r.band_key)
        for r in band_rows(chosen).collect()
    }
    assert got == want  # exactly the chosen texts' bands, no mixing
    # ...and through the UPSERT path too (r13 third-pass review: an
    # early per-id collapse upstream had made the guard dead there)
    batch = spark.createDataFrame(
        [
            (9, "aa bb cc dd ee"),
            (9, "ww xx yy zz aa"),  # conflicting duplicate
            (10, "pp qq rr ss tt"),
        ],
        "doc_id long, text string",
    )
    mi.upsert_minhash_index(spark, path, batch, bands=band_rows(batch))
    stored9 = {
        (r.doc_id, r.band_idx, r.band_key)
        for r in mi._band_scan(
            spark, mi._log(spark, mi._data_path(path))
        ).where("doc_id IN (9, 10)").collect()
    }
    chosen9 = spark.createDataFrame(
        [(9, "ww xx yy zz aa"), (10, "pp qq rr ss tt")],
        "doc_id long, text string",
    )
    want9 = {
        (r.doc_id, r.band_idx, r.band_key)
        for r in band_rows(chosen9).collect()
    }
    assert stored9 == want9
