"""UniForm-style Iceberg metadata export (operators/iceberg_uniform.py,
D75, VERDICT r11 #9): the generated metadata tree, walked exactly like
an Iceberg reader (version-hint → metadata JSON → manifest list →
manifests), must name the SAME live file set as the Delta snapshot with
matching record counts, sizes, and typed partition values; exports are
idempotent per Delta version and refuse tables with live deletion
vectors; the hand-rolled Avro object-container encoding round-trips."""

from __future__ import annotations

import json
import os

import pytest

from delta_lake_health_spark.operators import iceberg_uniform as iu
from delta_lake_health_spark.sources import delta_writer
from delta_lake_health_spark.sources.delta_log import DeltaLog


def _table(spark, tmp_path, partitioned=False):
    path = str(tmp_path / ("pt" if partitioned else "t"))
    df = spark.range(0, 2000).selectExpr(
        "id", "id % 3 AS k", "CAST(id % 7 AS DOUBLE) AS v"
    )
    delta_writer.write(
        spark,
        df.repartition(4),
        path,
        partition_by=["k"] if partitioned else None,
    )
    return path


def test_avro_ocf_roundtrip():
    schema = {
        "type": "record",
        "name": "t",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": "string"},
            {"name": "c", "type": ["null", "long"], "default": None},
            {"name": "d", "type": "boolean"},
            {"name": "e", "type": "double"},
        ],
    }
    rows = [
        {"a": -1, "b": "x", "c": None, "d": True, "e": 1.5},
        {"a": 2**40, "b": "", "c": -(2**33), "d": False, "e": -0.25},
        {"a": 0, "b": "héllo", "c": 7, "d": True, "e": 0.0},
    ]
    import tempfile

    p = os.path.join(tempfile.mkdtemp(), "t.avro")
    n = iu.write_avro_ocf(p, schema, rows, b"0123456789abcdef")
    assert n == os.path.getsize(p)
    assert iu.read_avro_ocf(p) == rows


def _file_set_from_delta(spark, path):
    log = DeltaLog(spark, path)
    out = {}
    for a in log.live_add_actions():
        stats = json.loads(a.get("stats") or "{}")
        out[os.path.join(path, a["path"])] = (
            int(stats.get("numRecords", -1)),
            int(a["size"]),
            a.get("partitionValues") or {},
        )
    return out


@pytest.mark.parametrize("partitioned", [False, True])
def test_export_matches_delta_snapshot(spark, tmp_path, partitioned):
    path = _table(spark, tmp_path, partitioned)
    m = iu.generate_iceberg_metadata(spark, path)
    assert not m["skipped"] and m["n_files"] >= 1
    want = _file_set_from_delta(spark, path)
    got = iu.read_iceberg_file_set(path)
    assert len(got) == len(want) == m["n_files"]
    for f in got:
        rc, size, pv = want[f["file_path"]]
        assert f["file_format"] == "PARQUET"
        assert f["record_count"] == rc
        assert f["file_size_in_bytes"] == size
        if partitioned:
            # typed identity-partition values (Delta stores strings)
            assert f["partition"] == {"k": int(pv["k"])}
        else:
            assert f["partition"] == {}
    # metadata JSON structure an Iceberg reader needs
    with open(m["metadata_file"]) as fh:
        meta = json.load(fh)
    assert meta["format-version"] == 1
    assert meta["current-snapshot-id"] == m["snapshot_id"]
    names = [f["name"] for f in meta["schema"]["fields"]]
    assert names == ["id", "k", "v"]
    # ADVICE r12: the Delta parquet carries no Iceberg field IDs, so a
    # conformant reader needs schema.name-mapping.default to resolve
    # columns by name instead of serving NULLs
    mapping = json.loads(
        meta["properties"]["schema.name-mapping.default"]
    )
    assert {m_["names"][0]: m_["field-id"] for m_ in mapping} == {
        f["name"]: f["id"] for f in meta["schema"]["fields"]
    }
    if partitioned:
        spec = meta["partition-specs"][0]["fields"]
        assert [
            (s["name"], s["transform"]) for s in spec
        ] == [("k", "identity")]


def test_export_idempotent_and_tracks_new_commits(spark, tmp_path):
    path = _table(spark, tmp_path)
    m1 = iu.generate_iceberg_metadata(spark, path)
    assert not m1["skipped"]
    m2 = iu.generate_iceberg_metadata(spark, path)
    assert m2["skipped"] and m2["delta_version"] == m1["delta_version"]
    # the idempotent return carries the same D77 keys as a fresh export
    assert m2["format_version"] == m1["format_version"] == 1
    assert m2["sequence_number"] == m1["sequence_number"]
    # a new commit refreshes the export: new snapshot, full live set
    delta_writer.write(
        spark,
        spark.range(5000, 5100).selectExpr(
            "id", "id % 3 AS k", "CAST(id % 7 AS DOUBLE) AS v"
        ).coalesce(1),
        path,
        mode="append",
    )
    m3 = iu.generate_iceberg_metadata(spark, path)
    assert not m3["skipped"]
    assert m3["snapshot_id"] > m1["snapshot_id"]
    got = {f["file_path"] for f in iu.read_iceberg_file_set(path)}
    assert got == set(_file_set_from_delta(spark, path))
    # version-hint points at the newest metadata json
    with open(os.path.join(path, "metadata", "version-hint.text")) as fh:
        v = int(fh.read().strip())
    assert os.path.exists(
        os.path.join(path, "metadata", f"v{v}.metadata.json")
    )
    assert v == 2


def test_export_reflects_deletes_and_optimize(spark, tmp_path):
    from delta_lake_health_spark.operators import maintenance

    path = _table(spark, tmp_path)
    delta_writer.delete(spark, path, "k = 1")
    iu.generate_iceberg_metadata(spark, path)
    got = {f["file_path"] for f in iu.read_iceberg_file_set(path)}
    assert got == set(_file_set_from_delta(spark, path))
    maintenance.compact(
        spark,
        path,
        small_file_size=1 << 30,
        target_file_size=1 << 30,
    )
    iu.generate_iceberg_metadata(spark, path)
    got = {f["file_path"] for f in iu.read_iceberg_file_set(path)}
    assert got == set(_file_set_from_delta(spark, path))
    # record counts survive the rewrite chain
    total = sum(
        f["record_count"] for f in iu.read_iceberg_file_set(path)
    )
    assert total == DeltaLog(spark, path).snapshot().count()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("partitioned", [False, True])
def test_v2_export_applies_position_deletes(spark, tmp_path, partitioned):
    """D77: a DV-bearing snapshot exports as format-version 2 with a
    delete manifest carrying position-delete files, and reading the
    tree (data scan + position-delete anti-join) equals the DV-applied
    Delta snapshot row-for-row — NO REORG PURGE required."""
    from delta_lake_health_spark.sources.delta_log import DeltaLog

    path = _table(spark, tmp_path, partitioned)
    delta_writer.delete_with_dv(spark, path, "id % 5 = 2")
    m = iu.generate_iceberg_metadata(spark, path)
    assert m["format_version"] == 2 and m["n_delete_files"] >= 1
    with open(m["metadata_file"]) as fh:
        meta = json.load(fh)
    assert meta["format-version"] == 2
    snap = next(
        s
        for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    assert snap["sequence-number"] == meta["last-sequence-number"] == 1
    # delete entries are position-delete files scoped per partition
    dels = iu.read_iceberg_deletes(path)
    assert dels and all(d["content"] == 1 for d in dels)
    if partitioned:
        assert {d["partition"]["k"] for d in dels} <= {0, 1, 2}
    # row-level parity with the DV-applied Delta snapshot
    want = DeltaLog(spark, path).snapshot()
    got = iu.read_iceberg_rows(spark, path).select(*want.columns)
    assert _rows(got) == _rows(want)
    assert got.count() == 2000 - 400  # 400 ids hit id % 5 = 2
    # data-file record counts stay PHYSICAL (deletes subtract at read)
    assert (
        sum(f["record_count"] for f in iu.read_iceberg_file_set(path))
        == 2000
    )


def test_v2_export_chains_sequence_numbers(spark, tmp_path):
    """Sequence numbers chain across every export; SNAPSHOTS chain only
    within a format version (r13 review: a v1 snapshot's manifest list
    is unreadable under v2 schema resolution and vice versa — a format
    transition expires the prior snapshots, spec-style)."""
    path = _table(spark, tmp_path)
    m1 = iu.generate_iceberg_metadata(spark, path)
    assert m1["format_version"] == 1 and m1["sequence_number"] == 1
    delta_writer.delete_with_dv(spark, path, "id < 100")
    m2 = iu.generate_iceberg_metadata(spark, path)
    assert m2["format_version"] == 2 and m2["sequence_number"] == 2
    with open(m2["metadata_file"]) as fh:
        meta = json.load(fh)
    # v1 -> v2 transition: the v1 snapshot is expired, counter carries
    assert [s["snapshot-id"] for s in meta["snapshots"]] == [
        m2["snapshot_id"]
    ]
    assert len(meta["snapshot-log"]) == 1
    got = iu.read_iceberg_rows(spark, path)
    assert got.count() == 1900
    # same-format chain: another DV commit -> v2 again -> both listed
    delta_writer.delete_with_dv(spark, path, "id >= 1900")
    m3 = iu.generate_iceberg_metadata(spark, path)
    assert m3["format_version"] == 2 and m3["sequence_number"] == 3
    with open(m3["metadata_file"]) as fh:
        meta3 = json.load(fh)
    assert [s["snapshot-id"] for s in meta3["snapshots"]] == [
        m2["snapshot_id"],
        m3["snapshot_id"],
    ]
    assert iu.read_iceberg_rows(spark, path).count() == 1800
    # idempotence still holds at the new version
    m4 = iu.generate_iceberg_metadata(spark, path)
    assert m4["skipped"]


def test_export_refuses_nested_schema(spark, tmp_path):
    path = str(tmp_path / "nested")
    df = spark.range(5).selectExpr(
        "id", "named_struct('a', id) AS s"
    )
    delta_writer.write(spark, df, path)
    with pytest.raises(ValueError, match="primitive"):
        iu.generate_iceberg_metadata(spark, path)


@pytest.mark.slow
def test_stream_export_maintenance(spark, tmp_path):
    """D75 × D46: commits folded through the delta_tail maintenance
    stream keep the Iceberg tree current with the Delta head."""
    from delta_lake_health_spark.streaming.jobs import (
        stream_iceberg_export_maintenance,
    )

    path = _table(spark, tmp_path)
    delta_writer.write(
        spark,
        spark.range(9000, 9050).selectExpr(
            "id", "id % 3 AS k", "CAST(id % 7 AS DOUBLE) AS v"
        ).coalesce(1),
        path,
        mode="append",
    )
    stream_iceberg_export_maintenance(
        spark, path, str(tmp_path / "ckpt")
    )
    assert iu.current_export_version(path) == int(
        DeltaLog(spark, path).version()
    )
    got = {f["file_path"] for f in iu.read_iceberg_file_set(path)}
    assert got == set(_file_set_from_delta(spark, path))


def test_export_refuses_statless_files(spark, tmp_path):
    """r12 review: record_count is spec-REQUIRED and foreign readers
    answer COUNT(*) from it — a live file with no numRecords stats is
    a loud refusal, never a -1 guess."""
    path = _table(spark, tmp_path)
    log_dir = os.path.join(path, "_delta_log")
    for name in sorted(os.listdir(log_dir)):
        if not name.endswith(".json"):
            continue
        p = os.path.join(log_dir, name)
        lines = []
        with open(p) as fh:
            for line in fh:
                act = json.loads(line)
                if "add" in act:
                    act["add"].pop("stats", None)
                lines.append(json.dumps(act))
        with open(p, "w") as fh:
            fh.write("\n".join(lines) + "\n")
    with pytest.raises(ValueError, match="numRecords"):
        iu.generate_iceberg_metadata(spark, path)


def test_read_avro_ocf_negative_map_block_count():
    """r12 review: Avro permits map blocks with a NEGATIVE count
    followed by a byte size; the reader must consume the size long
    instead of desynchronizing."""
    import tempfile

    schema = {
        "type": "record",
        "name": "t",
        "fields": [{"name": "a", "type": "long"}],
    }
    rows = [{"a": 5}, {"a": -7}]
    pairs = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": b"null",
    }
    blob = b"".join(
        iu._enc_str(k) + iu._zigzag(len(v)) + v for k, v in pairs.items()
    )
    sync = b"0123456789abcdef"
    body = b"".join(iu._enc_value(schema, r) for r in rows)
    out = (
        b"Obj\x01"
        + iu._zigzag(-len(pairs))  # negative count ...
        + iu._zigzag(len(blob))  # ... followed by byte size (spec)
        + blob
        + iu._zigzag(0)
        + sync
        + iu._zigzag(len(rows))
        + iu._zigzag(len(body))
        + body
        + sync
    )
    p = os.path.join(tempfile.mkdtemp(), "neg.avro")
    with open(p, "wb") as fh:
        fh.write(out)
    assert iu.read_avro_ocf(p) == rows


def test_export_drops_to_v1_after_reorg_purge(spark, tmp_path):
    """The LIVE-DV distinction (r12 review) now picks the FORMAT
    version (D77): a DV-bearing snapshot exports v2 with delete files;
    after REORG PURGE rewrites the files, historical dv actions are
    no-ops and the next export is a plain v1 tree with no deletes —
    same sequence chain."""
    from delta_lake_health_spark.operators import maintenance

    path = _table(spark, tmp_path)
    delta_writer.delete_with_dv(spark, path, "k = 2")
    m1 = iu.generate_iceberg_metadata(spark, path)
    assert m1["format_version"] == 2 and m1["n_delete_files"] >= 1
    maintenance.reorg_purge(spark, path)
    m = iu.generate_iceberg_metadata(spark, path)
    assert not m["skipped"]
    assert m["format_version"] == 1 and m["n_delete_files"] == 0
    assert m["sequence_number"] == m1["sequence_number"] + 1
    assert iu.read_iceberg_deletes(path) == []
    got = {f["file_path"] for f in iu.read_iceberg_file_set(path)}
    assert got == set(_file_set_from_delta(spark, path))
    total = sum(f["record_count"] for f in iu.read_iceberg_file_set(path))
    assert total == DeltaLog(spark, path).snapshot().count()


def test_export_refuses_column_mapping(spark, tmp_path):
    """r12 review: renamed columns are metadata-only (parquet keeps
    physical names); a by-name Iceberg v1 reader would serve nulls —
    refuse instead."""
    path = _table(spark, tmp_path)
    delta_writer.rename_column(spark, path, "v", "value")
    with pytest.raises(ValueError, match="column mapping"):
        iu.generate_iceberg_metadata(spark, path)
