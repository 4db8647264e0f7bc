"""Foreign-log interop (round 7): `DeltaLog` reading a `_delta_log` it
did NOT write — the checked-in `tests/fixtures/foreign_delta/` fixture
replicates delta-spark 3.x / delta-rs 0.17 output per the public Delta
PROTOCOL.md (see `gen_foreign_delta.py` for exactly what foreign shapes
it carries: unknown commitInfo/metaData/remove fields, hive partition
dirs with the partition column absent from the parquet, JSON-string
stats with nullCount, a classic checkpoint + `_last_checkpoint` with a
JSON tail past it). Every prior Delta test reads our own writer's
output; this is the reader's first contact with the foreign wire form.

Expected table state (see the generator):
  v0: ids 0-9   v1: +10-12   v2: delete ids 8-9   v3: +13-14
  final: ids 0-7, 10-14 over partitions a/b/c, 4 live files.
"""

from __future__ import annotations

import os

FIXTURE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "fixtures", "foreign_delta"
)


def _log(spark):
    from delta_lake_health_spark.sources.delta_log import DeltaLog

    return DeltaLog(spark, FIXTURE)


def test_foreign_snapshot_merges_checkpoint_and_tail(spark):
    log = _log(spark)
    assert log.last_checkpoint() == 2  # the foreign checkpoint is used
    assert log.version() == 3
    rows = sorted(
        (r.id, r.v, r.p) for r in log.snapshot().select("id", "v", "p").collect()
    )
    want = sorted(
        (i, i * 1.5, p)
        for i, p in [(x, "a") for x in range(5)]
        + [(x, "b") for x in range(5, 8)]
        + [(x, "a") for x in range(10, 13)]
        + [(x, "c") for x in range(13, 15)]
    )
    assert rows == want
    assert log.record_count() == 13


def test_foreign_time_travel_and_history(spark):
    log = _log(spark)
    v0 = sorted(r.id for r in log.snapshot(as_of=0).select("id").collect())
    assert v0 == list(range(10))
    v1 = sorted(r.id for r in log.snapshot(as_of=1).select("id").collect())
    assert v1 == list(range(13))
    # operation names come from the foreign commitInfo lines verbatim
    hist = {r["version"]: r["operation"] for r in log.history().collect()}
    assert hist[0] == "WRITE" and hist[2] == "DELETE" and hist[3] == "WRITE"


def test_foreign_detail_and_stats_skipping(spark):
    log = _log(spark)
    det = log.detail()
    assert det["numFiles"] == 4
    adds = log.live_add_actions()
    assert det["sizeInBytes"] == sum(int(a["size"]) for a in adds)
    assert det["partitionColumns"] == ["p"]
    # foreign JSON-string stats drive skipping: id >= 13 matches only
    # fileE; partition pruning on p resolves from the log's
    # partitionValues (the parquet files don't contain the column)
    pruned = [r.path for r in log.pruned_files("id", 13, 10**9).collect()]
    assert len(pruned) == 1 and "5dbfb9c0" in pruned[0]
    ids_c = sorted(
        r.id
        for r in log.snapshot().where("p = 'c'").select("id").collect()
    )
    assert ids_c == [13, 14]


# --------------------------------------------------------------------------
# Shredded-variant foreign log (VERDICT r10 #9, the D74 follow-on):
# Delta 4.x writers shred VARIANT columns into typed parquet subcolumns
# and gate the table with the variantType reader+writer feature. This
# engine supports the feature, so a foreign shredded-variant table must
# READ — snapshot, typed variant_get, stats-only record count — and
# accept our appends in the same protocol; a foreign log pairing
# variantType with an unknown reader feature must refuse loudly, naming
# the feature.


def _foreign_variant_table(spark, tmp_path) -> str:
    """A shredded-variant table whose _delta_log WE did not write:
    parquet from a plain (non-Delta) Spark write, log JSON hand-built
    in the foreign wire shape (engineInfo, txnId, minimal stats)."""
    import glob
    import json

    from pyspark.sql import functions as F

    path = str(tmp_path / "foreign_variant")
    df = spark.range(0, 12).select(
        "id",
        F.parse_json(
            F.concat(
                F.lit('{"k": '),
                (F.col("id") % 4).cast("string"),
                F.lit(', "s": "x"}'),
            )
        ).alias("pv"),
    )
    df.coalesce(2).write.parquet(path)
    files = sorted(
        os.path.basename(p)
        for p in glob.glob(os.path.join(path, "part-*.parquet"))
    )
    log_dir = os.path.join(path, "_delta_log")
    os.makedirs(log_dir)
    schema = {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True,
             "metadata": {}},
            {"name": "pv", "type": "variant", "nullable": True,
             "metadata": {}},
        ],
    }
    actions = [
        {"commitInfo": {"timestamp": 1700000000000,
                        "operation": "WRITE",
                        "operationParameters": {"mode": "Overwrite"},
                        "engineInfo": "Apache-Spark/4.0.0 Delta-Lake/4.0.0",
                        "txnId": "5f7a0000-dead-beef-0000-000000000000"}},
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["variantType"],
                      "writerFeatures": ["variantType"]}},
        {"metaData": {"id": "11111111-2222-3333-4444-555555555555",
                      "format": {"provider": "parquet", "options": {}},
                      "schemaString": json.dumps(schema),
                      "partitionColumns": [],
                      "configuration": {},
                      "createdTime": 1700000000000}},
    ]
    for f in files:
        st = os.stat(os.path.join(path, f))
        actions.append(
            {"add": {"path": f, "partitionValues": {},
                     "size": st.st_size,
                     "modificationTime": 1700000000000,
                     "dataChange": True,
                     "stats": json.dumps({"numRecords": 6})}}
        )
    with open(os.path.join(log_dir, f"{0:020d}.json"), "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    return path


def test_foreign_shredded_variant_reads(spark, tmp_path):
    from pyspark.sql import functions as F

    from delta_lake_health_spark.sources.delta_log import DeltaLog

    path = _foreign_variant_table(spark, tmp_path)
    log = DeltaLog(spark, path)
    p = log.protocol()
    assert "variantType" in p["readerFeatures"]
    snap = log.snapshot()
    assert [f.dataType.typeName() for f in snap.schema.fields] == [
        "long", "variant",
    ]
    got = snap.select(
        F.sum(F.variant_get("pv", "$.k", "bigint")).alias("s"),
        F.count_distinct(
            F.variant_get("pv", "$.s", "string")
        ).alias("t"),
    ).first()
    assert got.s == sum(i % 4 for i in range(12)) and got.t == 1
    # stats-only record count — no data scan needed
    assert log.record_count() == 12


def test_foreign_shredded_variant_accepts_our_append(spark, tmp_path):
    from pyspark.sql import functions as F

    from delta_lake_health_spark.sources import delta_writer
    from delta_lake_health_spark.sources.delta_log import DeltaLog

    path = _foreign_variant_table(spark, tmp_path)
    more = spark.range(12, 15).select(
        "id", F.parse_json(F.lit('{"k": 9, "s": "x"}')).alias("pv")
    )
    delta_writer.write(spark, more, path, mode="append")
    log = DeltaLog(spark, path)
    assert log.snapshot().count() == 15
    s = log.snapshot().select(
        F.sum(F.variant_get("pv", "$.k", "bigint")).alias("s")
    ).first()
    assert s.s == sum(i % 4 for i in range(12)) + 27


def test_foreign_variant_with_unknown_feature_refuses(spark, tmp_path):
    import json

    import pytest

    from delta_lake_health_spark.sources import delta_writer

    path = _foreign_variant_table(spark, tmp_path)
    # a later foreign commit upgrades to a feature we do not implement
    with open(
        os.path.join(path, "_delta_log", f"{1:020d}.json"), "w"
    ) as fh:
        fh.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["variantType"],
            "writerFeatures": ["variantType", "futureMagicFeature"],
        }}) + "\n")
    df = spark.range(20, 22).selectExpr(
        "id", "parse_json('{\"k\": 1}') AS pv"
    )
    with pytest.raises(ValueError, match="futureMagicFeature"):
        delta_writer.write(spark, df, path, mode="append")
