"""Delta identity columns (writer feature ``identityColumns``):
declaration writes the spec's field metadata keys (delta.identity.start/
step/allowExplicitInsert + highWaterMark once values exist), writes that
omit the column get distributed per-partition contiguous blocks past the
mark, the mark is re-emitted in the SAME commit's metaData (so concurrent
identity writers conflict instead of duplicating), GENERATED ALWAYS
refuses explicit batches, BY DEFAULT accepts them and advances the mark,
UPDATE refuses assignment, and legacy minWriterVersion=6 tables become
writable.

Cites the Delta protocol spec's Identity Columns section (delta-io/delta
PROTOCOL.md): values are start + k*step, all distinct, tracked by a
monotonic high-water mark in the column's field metadata.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

import pytest

# identity-columns battery: slow battery, full-suite close-out only
pytestmark = pytest.mark.slow
from pyspark.sql import functions as F

from delta_lake_health_spark.sources import delta_writer
from delta_lake_health_spark.sources.delta_log import DeltaLog


@pytest.fixture()
def table(spark):
    tmp = tempfile.mkdtemp()
    path = f"{tmp}/ident"
    yield path
    shutil.rmtree(tmp, ignore_errors=True)


def _payload(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("CAST(id AS STRING) AS name")


def _with_id_col(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "CAST(id AS STRING) AS name", "CAST(NULL AS LONG) AS uid"
    )


def _spec(spark, path, col="uid"):
    meta = DeltaLog(spark, path).metadata()
    return delta_writer._identity_specs(meta.get("schema")).get(col)


def test_generated_values_unique_monotonic_across_writes(spark, table):
    # declare on an empty-but-typed table (one seed row defines the schema,
    # then overwrite away), then two multi-partition appends
    delta_writer.write(spark, _with_id_col(spark, 0, 1), table)
    delta_writer.write(
        spark, _with_id_col(spark, 0, 0), table, mode="overwrite"
    )
    delta_writer.set_identity_column(spark, table, "uid", start=10, step=3)

    delta_writer.write(spark, _payload(spark, 0, 40).repartition(4), table)
    delta_writer.write(spark, _payload(spark, 40, 65).repartition(3), table)

    rows = DeltaLog(spark, table).snapshot().select("uid").collect()
    vals = sorted(r.uid for r in rows)
    assert len(vals) == 65
    assert len(set(vals)) == 65, "identity values must be distinct"
    # every value is start + k*step
    assert all((v - 10) % 3 == 0 and v >= 10 for v in vals)
    # dense per-partition blocks: first write covers exactly 40 steps
    assert vals == [10 + 3 * k for k in range(65)]
    assert _spec(spark, table)["hwm"] == 10 + 3 * 64


def test_mark_in_metadata_survives_checkpoint(spark, table):
    delta_writer.write(spark, _with_id_col(spark, 0, 1), table)
    delta_writer.write(spark, _with_id_col(spark, 0, 0), table, mode="overwrite")
    delta_writer.set_identity_column(spark, table, "uid")
    delta_writer.write(spark, _payload(spark, 0, 10), table)
    hwm = _spec(spark, table)["hwm"]
    assert hwm == 10
    DeltaLog(spark, table).checkpoint()
    # wipe the commit JSONs' metaData visibility by reading post-checkpoint
    assert _spec(spark, table)["hwm"] == 10
    delta_writer.write(spark, _payload(spark, 0, 5), table)
    vals = sorted(
        r.uid for r in DeltaLog(spark, table).snapshot().select("uid").collect()
    )
    assert vals == list(range(1, 16))


def test_generated_always_refuses_explicit_batch(spark, table):
    delta_writer.write(spark, _with_id_col(spark, 0, 1), table)
    delta_writer.write(spark, _with_id_col(spark, 0, 0), table, mode="overwrite")
    delta_writer.set_identity_column(spark, table, "uid")
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        delta_writer.write(spark, _with_id_col(spark, 0, 5), table)


def test_by_default_accepts_explicit_and_advances_mark(spark, table):
    delta_writer.write(spark, _with_id_col(spark, 0, 1), table)
    delta_writer.write(spark, _with_id_col(spark, 0, 0), table, mode="overwrite")
    delta_writer.set_identity_column(
        spark, table, "uid", allow_explicit_insert=True
    )
    explicit = spark.range(0, 3).selectExpr(
        "CAST(id AS STRING) AS name", "CAST(100 + id AS LONG) AS uid"
    )
    delta_writer.write(spark, explicit, table)
    assert _spec(spark, table)["hwm"] == 102
    # generated values start past the explicit ones — no collision
    delta_writer.write(spark, _payload(spark, 0, 4), table)
    vals = sorted(
        r.uid for r in DeltaLog(spark, table).snapshot().select("uid").collect()
    )
    assert vals == [100, 101, 102, 103, 104, 105, 106]


def test_declare_on_existing_data_syncs_mark(spark, table):
    seeded = spark.range(0, 20).selectExpr(
        "CAST(id AS STRING) AS name", "CAST(id * 2 AS LONG) AS uid"
    )
    delta_writer.write(spark, seeded, table)
    delta_writer.set_identity_column(spark, table, "uid", start=1, step=1)
    assert _spec(spark, table)["hwm"] == 38
    delta_writer.write(spark, _payload(spark, 0, 2), table)
    vals = {
        r.uid for r in DeltaLog(spark, table).snapshot().select("uid").collect()
    }
    assert {39, 40} <= vals and len(vals) == 22


def test_negative_step(spark, table):
    delta_writer.write(spark, _with_id_col(spark, 0, 1), table)
    delta_writer.write(spark, _with_id_col(spark, 0, 0), table, mode="overwrite")
    delta_writer.set_identity_column(spark, table, "uid", start=0, step=-2)
    delta_writer.write(spark, _payload(spark, 0, 3), table)
    vals = sorted(
        r.uid for r in DeltaLog(spark, table).snapshot().select("uid").collect()
    )
    assert vals == [-4, -2, 0]
    assert _spec(spark, table)["hwm"] == -4


def test_update_refuses_identity_assignment(spark, table):
    delta_writer.write(spark, _with_id_col(spark, 0, 1), table)
    delta_writer.write(spark, _with_id_col(spark, 0, 0), table, mode="overwrite")
    delta_writer.set_identity_column(spark, table, "uid")
    delta_writer.write(spark, _payload(spark, 0, 5), table)
    with pytest.raises(ValueError, match="identity column"):
        delta_writer.update(spark, table, "name = '1'", {"uid": "999"})


def test_merge_refuses_generated_always_allows_by_default(spark, table):
    delta_writer.write(spark, _with_id_col(spark, 0, 1), table)
    delta_writer.write(spark, _with_id_col(spark, 0, 0), table, mode="overwrite")
    delta_writer.set_identity_column(spark, table, "uid")
    delta_writer.write(spark, _payload(spark, 0, 5), table)
    src = spark.range(0, 2).selectExpr(
        "CAST(id AS STRING) AS name", "CAST(50 + id AS LONG) AS uid"
    )
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        delta_writer.merge(spark, table, src, ["name"])

    # a BY DEFAULT table merges and the mark advances past the source
    path2 = table + "_bd"
    delta_writer.write(spark, _with_id_col(spark, 0, 1), path2)
    delta_writer.write(spark, _with_id_col(spark, 0, 0), path2, mode="overwrite")
    delta_writer.set_identity_column(
        spark, path2, "uid", allow_explicit_insert=True
    )
    delta_writer.write(spark, _payload(spark, 0, 3), path2)  # uids 1..3
    # a source missing the column gets a clear refusal, not a crash
    with pytest.raises(ValueError, match="must provide the identity"):
        delta_writer.merge(spark, path2, src.drop("uid"), ["name"])
    delta_writer.merge(spark, path2, src, ["name"])
    assert _spec(spark, path2)["hwm"] == 51
    delta_writer.write(spark, _payload(spark, 10, 12), path2)
    vals = sorted(
        r.uid for r in DeltaLog(spark, path2).snapshot().select("uid").collect()
    )
    assert vals == [3, 50, 51, 52, 53]  # names 0,1 upserted; 52,53 generated


def test_declaration_refusals(spark, table):
    df = spark.range(0, 3).selectExpr(
        "CAST(id AS STRING) AS name",
        "CAST(NULL AS LONG) AS uid",
        "CAST(id AS INT) AS narrow",
        "CAST(id % 2 AS LONG) AS part",
    )
    delta_writer.write(spark, df, table, partition_by=["part"])
    with pytest.raises(ValueError, match="non-zero"):
        delta_writer.set_identity_column(spark, table, "uid", step=0)
    with pytest.raises(ValueError, match="must be LONG"):
        delta_writer.set_identity_column(spark, table, "narrow")
    with pytest.raises(ValueError, match="partition column"):
        delta_writer.set_identity_column(spark, table, "part")
    with pytest.raises(ValueError, match="not in table schema"):
        delta_writer.set_identity_column(spark, table, "missing")
    delta_writer.set_identity_column(spark, table, "uid")
    with pytest.raises(ValueError, match="already an identity"):
        delta_writer.set_identity_column(spark, table, "uid")


def test_protocol_upgrade_enumerates_feature(spark, table):
    delta_writer.write(spark, _with_id_col(spark, 0, 1), table)
    delta_writer.set_identity_column(spark, table, "uid",
                                     allow_explicit_insert=True)
    p = DeltaLog(spark, table).protocol()
    assert p["minWriterVersion"] == 7
    assert "identityColumns" in (p.get("writerFeatures") or [])


def test_sync_identity_recomputes_and_never_shrinks(spark, table):
    delta_writer.write(spark, _with_id_col(spark, 0, 1), table)
    delta_writer.write(spark, _with_id_col(spark, 0, 0), table, mode="overwrite")
    delta_writer.set_identity_column(
        spark, table, "uid", allow_explicit_insert=True
    )
    delta_writer.write(spark, _payload(spark, 0, 5), table)  # 1..5
    v = delta_writer.sync_identity(spark, table, "uid")
    # mark already covers the data: no new commit
    assert v == delta_writer.current_version(table)
    assert _spec(spark, table)["hwm"] == 5
    with pytest.raises(ValueError, match="not an identity"):
        delta_writer.sync_identity(spark, table, "name")


def test_streaming_sink_batches_get_unique_ids_replay_safe(spark, table):
    """The streaming-sink contract (write with txn appId/version, what
    stream_to_delta's foreachBatch issues) composed with identity:
    micro-batches get disjoint contiguous blocks, and a REPLAYED batch
    is skipped before any values are generated — the mark must not
    advance and no duplicates appear."""
    delta_writer.write(spark, _with_id_col(spark, 0, 1), table)
    delta_writer.write(spark, _with_id_col(spark, 0, 0), table, mode="overwrite")
    delta_writer.set_identity_column(spark, table, "uid")
    for bid, (lo, hi) in enumerate([(0, 10), (10, 25), (25, 30)]):
        delta_writer.write(
            spark, _payload(spark, lo, hi).repartition(2), table,
            txn_app_id="cp", txn_version=bid,
        )
    assert _spec(spark, table)["hwm"] == 30
    # replay batch 1: skipped, mark unchanged, count unchanged
    v = delta_writer.write(
        spark, _payload(spark, 10, 25), table, txn_app_id="cp", txn_version=1
    )
    assert v == delta_writer.current_version(table)
    assert _spec(spark, table)["hwm"] == 30
    vals = sorted(
        r.uid for r in DeltaLog(spark, table).snapshot().select("uid").collect()
    )
    assert vals == list(range(1, 31))


def test_legacy_v6_table_is_writable_and_maintained(spark, table):
    """A foreign minWriterVersion=6 log (the legacy identityColumns
    protocol) is accepted and its identity column maintained."""
    os.makedirs(os.path.join(table, "_delta_log"))
    schema = {
        "type": "struct",
        "fields": [
            {"name": "name", "type": "string", "nullable": True,
             "metadata": {}},
            {"name": "uid", "type": "long", "nullable": True,
             "metadata": {
                 "delta.identity.start": 1,
                 "delta.identity.step": 1,
                 "delta.identity.allowExplicitInsert": False,
             }},
        ],
    }
    actions = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 6}},
        {"metaData": {
            "id": "11111111-2222-3333-4444-555555555555",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema),
            "partitionColumns": [],
            "configuration": {},
            "createdTime": 0,
        }},
        {"commitInfo": {"timestamp": 0, "operation": "CREATE TABLE",
                        "operationParameters": {}}},
    ]
    with open(os.path.join(table, "_delta_log",
                           "0" * 20 + ".json"), "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions) + "\n")

    delta_writer.write(spark, _payload(spark, 0, 4), table)
    vals = sorted(
        r.uid for r in DeltaLog(spark, table).snapshot().select("uid").collect()
    )
    assert vals == [1, 2, 3, 4]
    assert _spec(spark, table)["hwm"] == 4
