"""Writer-side wire-format conformance (round 7): run a battery of
mutations and validate EVERY line of every emitted `_delta_log` commit
against the public Delta PROTOCOL.md shapes — the other direction of the
foreign-log interop fixture (reader-side, `test_foreign_log.py`). A
foreign reader consumes field shapes, not our Python objects, so the
guard is on the serialized JSON itself.

Declared extension: the `dv` action (our deletion vectors are
sidecar-file based with log-level Delta semantics — SURVEY D31); the
validator accepts it by name but still type-checks its fields. Every
OTHER action must be spec-shaped.
"""

from __future__ import annotations

import json
import os


def _validate_add(a: dict, table: str) -> None:
    rel = a["path"]
    assert isinstance(rel, str) and rel, a
    # relative within the table, or absolute (SHALLOW CLONE sources)
    if not os.path.isabs(rel):
        f = os.path.join(table, rel)
        if os.path.isfile(f):  # later maintenance may have removed it
            assert os.path.getsize(f) == a["size"], rel
    assert isinstance(a["partitionValues"], dict)
    for k, v in a["partitionValues"].items():
        assert isinstance(k, str) and (v is None or isinstance(v, str))
    assert isinstance(a["size"], int) and a["size"] >= 0
    assert isinstance(a["modificationTime"], int) and a["modificationTime"] > 0
    assert isinstance(a["dataChange"], bool)
    if a.get("stats") is not None:
        st = json.loads(a["stats"])  # must be a JSON STRING per spec
        assert isinstance(st["numRecords"], int) and st["numRecords"] >= 0
        for blk in ("minValues", "maxValues"):
            if blk in st:
                assert isinstance(st[blk], dict)
    if a.get("tags") is not None:
        assert all(
            isinstance(k, str) and isinstance(v, str)
            for k, v in a["tags"].items()
        )
    if a.get("baseRowId") is not None:
        assert isinstance(a["baseRowId"], int) and a["baseRowId"] >= 0


def _validate_metadata(m: dict) -> None:
    assert isinstance(m["id"], str) and m["id"]
    assert m["format"]["provider"] == "parquet"
    sch = json.loads(m["schemaString"])  # JSON STRING per spec
    assert sch["type"] == "struct"
    for f in sch["fields"]:
        assert {"name", "type", "nullable", "metadata"} <= set(f)
    assert isinstance(m["partitionColumns"], list)
    assert isinstance(m.get("configuration", {}), dict)


def _validate_protocol(p: dict) -> None:
    r, w = p["minReaderVersion"], p["minWriterVersion"]
    assert isinstance(r, int) and isinstance(w, int)
    if w >= 7:
        assert isinstance(p.get("writerFeatures"), list) and p["writerFeatures"]
    if r >= 3:
        assert isinstance(p.get("readerFeatures"), list)


_KNOWN = {
    "commitInfo", "protocol", "metaData", "add", "remove", "txn",
    "cdc", "domainMetadata",
    "dv",  # declared extension (SURVEY D31)
}


def _validate_commit(path: str, table: str) -> dict:
    """Validate one commit JSON; returns {action_kind: count}."""
    seen: dict[str, int] = {}
    with open(path) as fh:
        for ln, line in enumerate(fh):
            obj = json.loads(line)
            assert isinstance(obj, dict) and len(obj) == 1, (path, ln)
            (kind, body), = obj.items()
            assert kind in _KNOWN, f"unknown action {kind} in {path}"
            seen[kind] = seen.get(kind, 0) + 1
            if kind == "add":
                _validate_add(body, table)
            elif kind == "remove":
                assert isinstance(body["path"], str) and body["path"]
                assert isinstance(body["deletionTimestamp"], int)
                assert isinstance(body["dataChange"], bool)
            elif kind == "metaData":
                _validate_metadata(body)
            elif kind == "protocol":
                _validate_protocol(body)
            elif kind == "txn":
                assert isinstance(body["appId"], str)
                assert isinstance(body["version"], int)
            elif kind == "commitInfo":
                assert isinstance(body["timestamp"], int)
                assert isinstance(body.get("operation"), str)
            elif kind == "cdc":
                assert isinstance(body["path"], str)
                assert body["dataChange"] is False
            elif kind == "domainMetadata":
                assert isinstance(body["domain"], str)
                assert isinstance(body["configuration"], str)
            elif kind == "dv":
                assert isinstance(body["path"], str)
                assert isinstance(body["numDeletedRows"], int)
    assert seen.get("commitInfo", 0) <= 1, path
    return seen


def test_every_emitted_commit_is_spec_shaped(spark, tmp_path):
    from delta_lake_health_spark.operators import maintenance
    from delta_lake_health_spark.sources import delta_writer
    from delta_lake_health_spark.sources.delta_log import DeltaLog

    t = str(tmp_path / "t")

    def df(lo, hi):
        return spark.range(lo, hi).selectExpr(
            "id", "CAST(id % 3 AS STRING) AS p", "CAST(id AS DOUBLE) AS v"
        ).coalesce(1)

    delta_writer.write(spark, df(0, 30), t, partition_by=["p"])
    delta_writer.write(spark, df(30, 60), t, mode="append")
    delta_writer.write(  # schema evolution re-emits metaData
        spark,
        df(60, 80).selectExpr("*", "id * 2 AS extra"),
        t,
        mode="append",
        merge_schema=True,
    )
    delta_writer.delete(spark, t, "id >= 70")
    delta_writer.set_table_property(spark, t, "delta.enableChangeDataFeed", "true")
    delta_writer.update(spark, t, "id = 5", {"v": "v + 1.0"})
    delta_writer.delete_with_dv(spark, t, "id = 6")  # protocol upgrade + dv
    delta_writer.enable_row_tracking(spark, t)  # domainMetadata action
    delta_writer.merge(
        spark,
        t,
        df(55, 65),
        ["id"],
        txn_app_id="conformance",
        txn_version=1,
    )
    maintenance.compact(spark, t)
    log = DeltaLog(spark, t)
    log.checkpoint()

    log_dir = os.path.join(t, "_delta_log")
    commits = sorted(f for f in os.listdir(log_dir) if f.endswith(".json"))
    # contiguous zero-padded versions from 0
    assert [int(c[:20]) for c in commits] == list(range(len(commits)))
    assert all(len(c) == 25 for c in commits)  # 20 digits + ".json"

    totals: dict[str, int] = {}
    for c in commits:
        for k, n in _validate_commit(os.path.join(log_dir, c), t).items():
            totals[k] = totals.get(k, 0) + n
    # the battery exercised every action kind we emit
    for kind in ("add", "remove", "metaData", "protocol", "commitInfo",
                 "txn", "cdc", "domainMetadata", "dv"):
        assert totals.get(kind, 0) >= 1, (kind, totals)
    # v0 must declare protocol + metaData (spec requirement)
    v0 = _validate_commit(os.path.join(log_dir, commits[0]), t)
    assert v0.get("protocol") == 1 and v0.get("metaData") == 1

    # _last_checkpoint + spec checkpoint naming
    with open(os.path.join(log_dir, "_last_checkpoint")) as fh:
        lc = json.load(fh)
    assert isinstance(lc["version"], int) and isinstance(lc["size"], int)
    from delta_lake_health_spark.sources.delta_log import checkpoint_file_names

    for name in checkpoint_file_names(lc):
        assert os.path.isfile(os.path.join(log_dir, name))
