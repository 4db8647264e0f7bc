"""VARIANT data type through the Delta writer/reader (D74, Delta 4.x
``variantType``).

Contract: a table created with a VariantType column carries the
variantType reader+writer feature from version 0 (the shredded parquet
encoding is unreadable to engines without variant support, so both
sides gate); a variant column appended onto an existing plain table
upgrades the protocol in the same commit; add-action stats survive the
pyarrow footer gap (numRecords recovered via the DuckDB footer read,
no min/max for variant per spec); snapshots, time travel, checkpoints
and DV deletes all work over variant data.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from delta_lake_health_spark.sources import delta_writer
from delta_lake_health_spark.sources.delta_log import DeltaLog


def _vdf(spark, lo, hi):
    return spark.range(lo, hi).select(
        "id",
        F.parse_json(
            F.concat(
                F.lit('{"k": '),
                (F.col("id") % 3).cast("string"),
                F.lit(', "tag": "t"}'),
            )
        ).alias("pv"),
    )


@pytest.fixture()
def vtable(spark, tmp_path):
    path = str(tmp_path / "vt")
    delta_writer.write(spark, _vdf(spark, 0, 10), path)
    return path


def test_variant_create_gates_protocol(spark, vtable):
    p = DeltaLog(spark, vtable).protocol()
    assert p["minReaderVersion"] == 3 and p["minWriterVersion"] == 7
    assert "variantType" in p["readerFeatures"]
    assert "variantType" in p["writerFeatures"]


def test_variant_snapshot_and_time_travel(spark, vtable):
    log = DeltaLog(spark, vtable)
    snap = log.snapshot()
    assert [f.dataType.typeName() for f in snap.schema.fields] == [
        "long", "variant",
    ]
    got = snap.select(
        F.sum(F.variant_get("pv", "$.k", "bigint")).alias("s"),
        F.count_distinct(F.variant_get("pv", "$.tag", "string")).alias("t"),
    ).first()
    assert got.s == 9 and got.t == 1
    delta_writer.write(spark, _vdf(spark, 10, 20), vtable, mode="append")
    log2 = DeltaLog(spark, vtable)
    assert log2.snapshot().count() == 20
    assert log2.snapshot(as_of=0).count() == 10


def test_variant_add_stats_numrecords(spark, vtable):
    """pyarrow cannot open the VARIANT-annotated footer; the add action
    must still carry an exact numRecords (DuckDB fallback) and, per the
    spec, no min/max for the variant column."""
    log = DeltaLog(spark, vtable)
    adds = log.live_add_actions()
    assert sum(json.loads(a["stats"])["numRecords"] for a in adds) == 10
    nonempty = [
        json.loads(a["stats"])
        for a in adds
        if json.loads(a["stats"])["numRecords"] > 0
    ]
    lo = min(st["minValues"]["id"] for st in nonempty)
    hi = max(st["maxValues"]["id"] for st in nonempty)
    assert (lo, hi) == (0, 9)  # plain columns keep skipping stats
    for a in adds:
        st = json.loads(a["stats"])
        assert not any("pv" in k for k in st["minValues"])
        assert not any("pv" in k for k in st["maxValues"])


def test_variant_append_upgrades_existing_table(spark, tmp_path):
    path = str(tmp_path / "plain")
    delta_writer.write(spark, spark.range(0, 5).select("id"), path)
    p0 = DeltaLog(spark, path).protocol()
    assert "readerFeatures" not in p0 or "variantType" not in (
        p0.get("readerFeatures") or []
    )
    df = spark.range(5, 8).select(
        "id", F.parse_json(F.lit('{"x": 1}')).alias("pv")
    )
    v = delta_writer.write(spark, df, path, mode="append", merge_schema=True)
    log = DeltaLog(spark, path)
    p = log.protocol()
    assert "variantType" in p["readerFeatures"]
    assert "variantType" in p["writerFeatures"]
    # the upgrade landed IN the append commit, not a separate one
    acts = delta_writer._version_actions(path, v)
    kinds = {k for a in acts for k in a}
    assert "protocol" in kinds and "add" in kinds
    snap = log.snapshot()
    assert snap.count() == 8
    # pre-variant rows read the new column as null variant
    assert snap.where(F.col("pv").isNull()).count() == 5


def test_variant_checkpoint_roundtrip(spark, vtable):
    delta_writer.write(spark, _vdf(spark, 10, 15), vtable, mode="append")
    DeltaLog(spark, vtable).checkpoint()
    log = DeltaLog(spark, vtable)
    assert os.path.exists(
        os.path.join(vtable, "_delta_log", "_last_checkpoint")
    )
    got = (
        log.snapshot()
        .groupBy(F.variant_get("pv", "$.k", "bigint").alias("k"))
        .count()
        .orderBy("k")
        .collect()
    )
    assert [(r.k, r["count"]) for r in got] == [(0, 5), (1, 5), (2, 5)]


def test_variant_dv_delete(spark, vtable):
    """DV delete over a variant table: the anti-join path never touches
    the variant bytes, rows disappear, survivors still decode."""
    delta_writer.delete_with_dv(spark, vtable, "id < 4")
    snap = DeltaLog(spark, vtable).snapshot()
    assert snap.count() == 6
    s = snap.select(
        F.sum(F.variant_get("pv", "$.k", "bigint")).alias("s")
    ).first()
    assert s.s == sum(i % 3 for i in range(4, 10))


def test_plain_column_named_variant_does_not_gate(spark, tmp_path):
    """A LongType column literally named "variant" must not trip the
    variantType protocol gate (the detection is a type walk, not a
    schema-JSON substring test)."""
    path = str(tmp_path / "named")
    delta_writer.write(
        spark, spark.range(0, 5).selectExpr("id", "id AS variant"), path
    )
    p = DeltaLog(spark, path).protocol()
    assert p == {"minReaderVersion": 1, "minWriterVersion": 2,
                 "readerFeatures": [], "writerFeatures": []} or (
        "variantType" not in (p.get("readerFeatures") or [])
        and "variantType" not in (p.get("writerFeatures") or [])
    )


def test_convert_to_delta_gates_variant(spark, tmp_path):
    """CONVERT TO DELTA over a directory of shredded-variant parquet must
    stamp the variantType (3,7) protocol — a (1,2) convert would hand
    non-variant engines bytes they can't decode."""
    d = str(tmp_path / "raw")
    _vdf(spark, 0, 12).write.parquet(d)
    delta_writer.convert_to_delta(spark, d)
    p = DeltaLog(spark, d).protocol()
    assert "variantType" in p["readerFeatures"]
    assert "variantType" in p["writerFeatures"]
    snap = DeltaLog(spark, d).snapshot()
    assert snap.count() == 12
    s = snap.select(
        F.sum(F.variant_get("pv", "$.k", "bigint")).alias("s")
    ).first()
    assert s.s == sum(i % 3 for i in range(12))
