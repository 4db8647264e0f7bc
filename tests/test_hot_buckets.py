"""Adversarial degenerate-bucket tests: a boilerplate-heavy corpus puts
EVERY document in one simhash/LSH bucket. Bucket-size accounting must not
route that bucket through a single partition (the old
``COUNT(*) OVER (PARTITION BY bucket)`` did exactly that); the grouped
count + broadcast join back keeps per-partition work bounded while
producing identical output."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from delta_lake_health_spark.plans.dedup import dedup_simhash
from delta_lake_health_spark.plans.similarity import ann_lsh_buckets

N_DOCS = 100_000


@pytest.fixture(scope="module")
def degenerate_dir(spark):
    """An sf-dir whose documents are all identical and whose embeddings
    are all the same vector — one simhash value, one LSH bucket."""
    tmp = tempfile.mkdtemp()
    text = "the quick brown fox jumps over the lazy dog again and again"
    spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.lit(text).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("web").alias("source"),
        F.lit(len(text)).alias("n_chars"),
    ).write.parquet(os.path.join(tmp, "documents.parquet"))

    dim = len(
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("embedding")
        .first()
        .embedding
    )
    vec = [float(i % 7) / 7.0 + 0.1 for i in range(dim)]
    spark.range(N_DOCS // 5).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(v).cast("float") for v in vec]).alias("embedding"),
        F.lit(0).alias("label"),
    ).write.parquet(os.path.join(tmp, "embeddings.parquet"))
    yield tmp
    shutil.rmtree(tmp)


def _plan(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_simhash_degenerate_bucket_no_window(spark, degenerate_dir):
    out = dedup_simhash(spark, degenerate_dir)
    assert "Window" not in _plan(out)
    rows = out.limit(10).collect()
    assert all(r.bucket_size == N_DOCS for r in rows)
    assert out.count() == N_DOCS
    # single distinct simhash — the degenerate case this test exists for
    assert out.select("simhash").distinct().count() == 1


def test_lsh_degenerate_bucket_no_window(spark, degenerate_dir):
    out = ann_lsh_buckets(spark, degenerate_dir)
    assert "Window" not in _plan(out)
    n = N_DOCS // 5
    rows = out.limit(10).collect()
    assert all(r.bucket_size == n for r in rows)
    assert out.count() == n
    assert out.select("bucket").distinct().count() == 1


def test_shingle_duplication_bounded_on_identical_corpus(spark, degenerate_dir):
    """100k identical docs: every 8-token window collides into one hash
    per position. The census must stay a grouped count + hash join (no
    per-bucket window, no pair expansion) and report dup_fraction 1.0."""
    from delta_lake_health_spark.plans.dedup import dedup_shingle_duplication

    rows = dedup_shingle_duplication(spark, degenerate_dir).collect()
    assert len(rows) == 1 and rows[0].source == "web"
    assert rows[0].dup_fraction == 1.0
    # 12-token text -> 5 distinct 8-windows per doc
    assert rows[0].n_shingles == 5 * 100_000


def test_shingle_scan_prunes_unused_columns(spark):
    """The n-gram/shingle scan family must not read lang/n_chars off the
    parquet — column pruning reaches the scan. Audited via the top-ngrams
    query (the census itself materializes through localCheckpoint, which
    truncates the visible plan at the checkpoint)."""
    from delta_lake_health_spark.plans.text import text_top_ngrams

    df = text_top_ngrams(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert scans, "no scan found in plan"
    for s in scans:
        assert "lang" not in s and "n_chars" not in s, s[:200]
        assert "text" in s
