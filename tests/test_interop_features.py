"""Interop table features modern delta-spark writers stamp routinely —
``timestampNtz`` (gates only the TIMESTAMP_NTZ type, native in Spark 4),
``domainMetadata`` (this engine already writes/checkpoints domain
metadata for row tracking), and ``vacuumProtocolCheck`` (VACUUM must
consult the protocol before touching files). A real-world table created
by delta-spark 3.x frequently carries all three; refusing them locked
this engine out of those tables for no capability reason.
"""

from __future__ import annotations

import datetime
import json
import os
import shutil
import tempfile

import pytest

from delta_lake_health_spark.operators import maintenance
from delta_lake_health_spark.sources import delta_writer
from delta_lake_health_spark.sources.delta_log import DeltaLog


@pytest.fixture()
def table(spark):
    tmp = tempfile.mkdtemp()
    path = f"{tmp}/interop"
    yield path
    shutil.rmtree(tmp, ignore_errors=True)


def _foreign_interop_table(spark, path):
    """A (3,7) table carrying the three interop features, a
    TIMESTAMP_NTZ column, and a foreign domainMetadata action — the
    wire shape a modern delta-spark writer produces."""
    df = spark.sql(
        "SELECT id, TIMESTAMP_NTZ '2024-06-01 12:00:00' + "
        "make_interval(0, 0, 0, 0, 0, CAST(id AS INT), 0) AS ts "
        "FROM range(5)"
    )
    df.coalesce(1).write.parquet(path)
    rel = [
        f for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith("_")
    ][0]
    schema = json.loads(df.schema.json())
    actions = [
        {"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["timestampNtz", "vacuumProtocolCheck"],
            "writerFeatures": ["timestampNtz", "vacuumProtocolCheck",
                               "domainMetadata", "appendOnly",
                               "invariants"],
        }},
        {"metaData": {
            "id": "aaaaaaaa-bbbb-cccc-dddd-eeeeeeeeeeee",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema),
            "partitionColumns": [],
            "configuration": {},
            "createdTime": 0,
        }},
        {"domainMetadata": {
            "domain": "delta.foreign.widget",
            "configuration": json.dumps({"k": "v"}),
            "removed": False,
        }},
        {"add": {
            "path": rel,
            "partitionValues": {},
            "size": os.path.getsize(os.path.join(path, rel)),
            "modificationTime": 0,
            "dataChange": True,
            "stats": json.dumps({"numRecords": 5}),
        }},
        {"commitInfo": {"timestamp": 0, "operation": "WRITE",
                        "operationParameters": {}}},
    ]
    os.makedirs(os.path.join(path, "_delta_log"))
    with open(os.path.join(path, "_delta_log", "0" * 20 + ".json"), "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions) + "\n")


def test_interop_features_read_write_vacuum(spark, table):
    _foreign_interop_table(spark, table)
    log = DeltaLog(spark, table)

    # read: the gate passes and the NTZ values survive
    rows = sorted(
        (r.id, r.ts) for r in log.snapshot().select("id", "ts").collect()
    )
    assert len(rows) == 5
    assert rows[0][1] == datetime.datetime(2024, 6, 1, 12, 0, 0)
    assert rows[4][1] == datetime.datetime(2024, 6, 1, 12, 4, 0)

    # the foreign domain metadata is visible through the accessor
    dom = log.domain_metadata("delta.foreign.widget")
    assert dom is not None

    # write: an append with NTZ values commits and reads back
    more = spark.sql(
        "SELECT id, TIMESTAMP_NTZ '2024-06-02 00:00:00' AS ts "
        "FROM range(5, 7)"
    )
    delta_writer.write(spark, more, table)
    assert DeltaLog(spark, table).snapshot().count() == 7

    # vacuum: runs (protocol consulted, nothing live is deletable)
    out = maintenance.vacuum(spark, table, retention_hours=0.0, dry_run=True)
    assert out["numDeletedFiles"] == 0


def test_vacuum_refuses_unknown_protocol(spark, table):
    """vacuumProtocolCheck's whole point: VACUUM against a table whose
    protocol this engine doesn't understand must refuse, not delete by
    a stale live-set."""
    delta_writer.write(
        spark, spark.range(0, 5).selectExpr("id"), table
    )
    v = delta_writer.current_version(table)
    with open(os.path.join(table, "_delta_log",
                           f"{v + 1:020d}.json"), "w") as fh:
        fh.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["futureSkippingIndex"],
            "writerFeatures": ["futureSkippingIndex"],
        }}) + "\n")
        fh.write(json.dumps({"commitInfo": {
            "timestamp": 1, "operation": "UPGRADE",
            "operationParameters": {}}}) + "\n")
    with pytest.raises(ValueError, match="unsupported Delta reader"):
        maintenance.vacuum(spark, table, retention_hours=0.0)
