"""Minimal Delta-protocol writer (reader v1 / writer v2, plus
position-delete deletion vectors via ``delete_with_dv``) — enough to
create, append to, delete from, and maintain real ``_delta_log`` tables
without any delta library, so the health analyzer and the maintenance
operators have genuine tables to act on.

The data path is pure Spark (``df.write.parquet`` — distributed, any
scale); only the commit step is driver-side, exactly like every Delta
writer: a commit is one small JSON file listing add/remove actions.

Log layout written here (subset of the Delta spec the reference's delta-rs
backend reads/writes — see PROTOCOL.md of delta-io/delta):

- ``_delta_log/{version:020d}.json`` — newline-delimited actions:
  ``protocol`` + ``metaData`` (v0), then ``add``/``remove`` + ``commitInfo``.
- add actions carry ``partitionValues``, ``size``, ``stats`` (JSON with
  ``numRecords``) so log-only record counts work with no data scan.

Reference parity: history/ops semantics consumed by
src/delta_lake_health/health_analyzers/delta_python_analyzer.py:167-188.
"""

from __future__ import annotations

import json
import math
import os
import re
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

LOG_DIR = "_delta_log"


def _log_path(table_path: str, version: int) -> str:
    return os.path.join(table_path, LOG_DIR, f"{version:020d}.json")


def current_version(table_path: str) -> int:
    """Highest committed version, or -1 for a fresh table."""
    log = os.path.join(table_path, LOG_DIR)
    if not os.path.isdir(log):
        return -1
    versions = [
        int(f[:20])
        for f in os.listdir(log)
        if f.endswith(".json") and f[:20].isdigit()
    ]
    return max(versions, default=-1)


def _list_parquet_rel(table_path: str) -> set[str]:
    out = set()
    for dirpath, dirnames, filenames in os.walk(table_path):
        # hive convention: underscore-prefixed dirs are metadata, not data
        # (_delta_log, _deletes sidecars)
        dirnames[:] = [d for d in dirnames if not d.startswith("_")]
        for f in filenames:
            if f.endswith(".parquet"):
                rel = os.path.relpath(os.path.join(dirpath, f), table_path)
                out.add(rel)
    return out


def _partition_values(rel_path: str) -> dict[str, str]:
    vals: dict[str, str] = {}
    for seg in rel_path.split(os.sep)[:-1]:
        if "=" in seg:
            k, v = seg.split("=", 1)
            vals[k] = v
    return vals


STATS_STRING_PREFIX = 32  # truncation length for string stats


def _truncate_min(s: str) -> str:
    """A truncated MIN stays a valid lower bound (any prefix of s <= s)."""
    return s[:STATS_STRING_PREFIX]


def _truncate_max(s: str) -> str | None:
    """A truncated MAX must be ADJUSTED UP to stay a valid upper bound:
    chop to the prefix, then increment the last character that has a
    successor (dropping everything after it). Returns None when no
    character can be incremented (all U+10FFFF) — the caller then drops
    the max stat entirely, which only makes skipping less selective,
    never wrong. This is the Delta/Iceberg string-stats truncation rule:
    unbounded raw strings (URLs, JSON blobs) would otherwise bloat every
    add action and the checkpoint with kilobytes of stats per column."""
    if len(s) <= STATS_STRING_PREFIX:
        return s
    prefix = s[:STATS_STRING_PREFIX]
    for i in range(len(prefix) - 1, -1, -1):
        cp = ord(prefix[i])
        if cp == 0xD7FF:
            # skip the surrogate block D800-DFFF: lone surrogates are not
            # valid scalar values for non-Python stats consumers, and JVM
            # UTF-16 comparison order disagrees with code-point order there
            return prefix[:i] + chr(0xE000)
        if cp < 0x10FFFF:
            return prefix[:i] + chr(cp + 1)
    return None


def _column_minmax(md) -> tuple[dict, dict]:
    """Per-file min/max from the parquet footer's row-group statistics —
    no data read. Values must be JSON-encodable; bytes decode as UTF-8 or
    are skipped. Long string bounds are truncated (min: plain prefix;
    max: prefix adjusted up) so stats stay small at any payload size."""
    mins: dict = {}
    maxs: dict = {}
    for rg in range(md.num_row_groups):
        row_group = md.row_group(rg)
        for ci in range(row_group.num_columns):
            col = row_group.column(ci)
            st = col.statistics
            if st is None or not st.has_min_max:
                continue
            name = col.path_in_schema
            lo, hi = st.min, st.max
            if hasattr(lo, "isoformat"):
                lo, hi = lo.isoformat(), hi.isoformat()
            try:
                if isinstance(lo, bytes):
                    lo = lo.decode("utf-8")
                if isinstance(hi, bytes):
                    hi = hi.decode("utf-8")
                json.dumps([lo, hi])
            except (UnicodeDecodeError, TypeError):
                continue
            if name not in mins or lo < mins[name]:
                mins[name] = lo
            if name not in maxs or hi > maxs[name]:
                maxs[name] = hi
    for name, lo in list(mins.items()):
        if isinstance(lo, str):
            mins[name] = _truncate_min(lo)
    for name, hi in list(maxs.items()):
        if isinstance(hi, str):
            adjusted = _truncate_max(hi)
            if adjusted is None:
                del maxs[name]
            else:
                maxs[name] = adjusted
    return mins, maxs


_DUCK_FOOTER_LOCAL = None


def _duckdb_footer_con():
    """Per-thread cached DuckDB connection for footer reads (connections
    are not safe for concurrent use; concurrent-writer tests run
    _add_action from multiple threads)."""
    global _DUCK_FOOTER_LOCAL
    import threading

    if _DUCK_FOOTER_LOCAL is None:
        _DUCK_FOOTER_LOCAL = threading.local()
    if getattr(_DUCK_FOOTER_LOCAL, "con", None) is None:
        import duckdb

        _DUCK_FOOTER_LOCAL.con = duckdb.connect()
    return _DUCK_FOOTER_LOCAL.con


def _duckdb_schema_types(con, fp: str) -> tuple[dict, set]:
    """(leaf_types, variant_groups) from ``parquet_schema``: full-path
    tuple → (physical, converted, logical) for every leaf, plus the path
    tuples of variant-encoded groups. DuckDB reports no logical type for
    VARIANT, so detection is structural — a group whose direct leaf
    children include ``metadata`` and ``value`` BYTE_ARRAYs (the spec's
    variant encoding; a false positive on a coincidental user struct
    only skips stats, never mis-prunes)."""
    rows = con.sql(
        "SELECT name, type, num_children, converted_type, logical_type"
        " FROM parquet_schema(?)",
        params=[fp],
    ).fetchall()
    leaf_types: dict = {}
    group_leaf_kids: dict = {}
    # preorder walk: each row is the next child of the deepest open group
    stack: list = []  # [path_tuple, remaining_children]
    it = iter(rows)
    root = next(it, None)
    if root is None:
        return {}, set()
    stack.append([(), int(root[2] or 0)])
    for name, phys, nchild, conv, logical in it:
        while stack and stack[-1][1] == 0:
            stack.pop()
        if not stack:
            break
        path = stack[-1][0] + (name,)
        stack[-1][1] -= 1
        if nchild and int(nchild) > 0:
            group_leaf_kids[path] = []
            stack.append([path, int(nchild)])
        else:
            leaf_types[path] = (phys, conv, logical)
            parent = path[:-1]
            if parent in group_leaf_kids:
                group_leaf_kids[parent].append((name, phys))
    variant_groups = {
        p
        for p, kids in group_leaf_kids.items()
        if {"metadata", "value"}
        <= {n for n, t in kids if t == "BYTE_ARRAY"}
    }
    return leaf_types, variant_groups


def _duckdb_footer_stats(fp: str) -> tuple[int, dict, dict]:
    """(num_rows, mins, maxs) from a parquet footer DuckDB can read but
    pyarrow cannot (VARIANT logical type). Same contract as the pyarrow
    path: typed bounds for INT/FLOAT/DOUBLE/BYTE_ARRAY, ISO-format
    strings for TIMESTAMP/DATE/INT96 (DuckDB renders those stats as
    formatted time strings, mapped back to the pyarrow ``isoformat``
    shape), dotted paths for plain nested struct leaves. Every leaf
    under a variant-encoded group is skipped (the spec's
    no-stats-for-variant rule)."""
    import datetime as _dt

    con = _duckdb_footer_con()
    num_rows = con.sql(
        "SELECT num_rows FROM parquet_file_metadata(?)", params=[fp]
    ).fetchone()[0]
    leaf_types, variant_groups = _duckdb_schema_types(con, fp)
    mins: dict = {}
    maxs: dict = {}
    rows = con.sql(
        "SELECT path_in_schema, type, stats_min_value, stats_max_value"
        " FROM parquet_metadata(?)",
        params=[fp],
    ).fetchall()
    for path, typ, lo, hi in rows:
        if lo is None or hi is None:
            continue
        ptuple = tuple(path.split(", "))
        if any(ptuple[:i] in variant_groups for i in range(1, len(ptuple))):
            continue
        _, conv, logical = leaf_types.get(ptuple, (typ, None, None))
        conv = conv or ""
        logical = logical or ""
        dotted = ".".join(ptuple)
        try:
            if (
                typ == "INT96"
                or conv.startswith("TIMESTAMP")
                or logical.startswith("TimestampType")
            ):
                lo = _dt.datetime.fromisoformat(lo).isoformat()
                hi = _dt.datetime.fromisoformat(hi).isoformat()
            elif conv == "DATE" or logical.startswith("DateType"):
                lo = _dt.date.fromisoformat(lo).isoformat()
                hi = _dt.date.fromisoformat(hi).isoformat()
            elif typ in ("INT32", "INT64"):
                lo, hi = int(lo), int(hi)
            elif typ in ("FLOAT", "DOUBLE"):
                lo, hi = float(lo), float(hi)
            elif typ == "BYTE_ARRAY" and not conv.startswith(
                ("DECIMAL", "INTERVAL")
            ):
                json.dumps([lo, hi])  # UTF-8/JSON-encodable guard
            else:
                continue
        except (ValueError, TypeError, UnicodeDecodeError):
            continue
        if dotted not in mins or lo < mins[dotted]:
            mins[dotted] = lo
        if dotted not in maxs or hi > maxs[dotted]:
            maxs[dotted] = hi
    for name, lo in list(mins.items()):
        if isinstance(lo, str):
            mins[name] = _truncate_min(lo)
    for name, hi in list(maxs.items()):
        if isinstance(hi, str):
            adjusted = _truncate_max(hi)
            if adjusted is None:
                del maxs[name]
            else:
                maxs[name] = adjusted
    return int(num_rows), mins, maxs


def _add_action(table_path: str, rel: str, data_change: bool = True) -> dict:
    """``data_change=False`` is for data-preserving rewrites (OPTIMIZE /
    z-order / DV purge): the Delta spec requires those adds to carry
    ``dataChange = false`` so change-feed consumers skip them."""
    import pyarrow.parquet as pq

    fp = os.path.join(table_path, rel)
    try:
        md = pq.ParquetFile(fp).metadata
        mins, maxs = _column_minmax(md)
        num_rows = md.num_rows
    except OSError:
        # Files carrying the parquet VARIANT logical type (Spark 4
        # shredded variant columns) predate this pyarrow's thrift
        # vocabulary. Recover the footer through DuckDB instead — a
        # metadata read, no data scan — including typed min/max for the
        # PLAIN top-level columns, so data skipping on a variant
        # table's ordinary columns keeps pruning. Variant leaves are
        # nested paths ("pv, value", ...) and are excluded, matching
        # the spec's no-stats-for-variant rule.
        num_rows, mins, maxs = _duckdb_footer_stats(fp)
    stats = {"numRecords": num_rows, "minValues": mins, "maxValues": maxs}
    return {
        "add": {
            "path": rel.replace(os.sep, "/"),
            "partitionValues": _partition_values(rel),
            "size": os.path.getsize(fp),
            "modificationTime": int(os.path.getmtime(fp) * 1000),
            "dataChange": data_change,
            "stats": json.dumps(stats),
        }
    }


# Writer features this engine actually maintains; the write gate refuses
# tables demanding anything else — a commit that ignores a writer feature
# it doesn't understand corrupts the table for conforming writers.
SUPPORTED_WRITER_FEATURES = frozenset(
    {
        "appendOnly", "invariants", "checkConstraints", "generatedColumns",
        "changeDataFeed", "columnMapping", "deletionVectors",
        "inCommitTimestamp", "v2Checkpoint", "rowTracking",
        "identityColumns",
        # interop features modern delta-spark writers stamp routinely:
        # domainMetadata (this engine writes/checkpoints domain metadata
        # for row tracking already — latest-per-domain reconciliation in
        # delta_log), timestampNtz (gates only the TIMESTAMP_NTZ type,
        # native in Spark 4), vacuumProtocolCheck (vacuum() consults
        # both protocol gates before touching files)
        "domainMetadata", "timestampNtz", "vacuumProtocolCheck",
        # liquid clustering: declared columns in the delta.clustering
        # domain, applied on ingest and by OPTIMIZE (set_cluster_columns)
        "clustering",
        # variantType: the VARIANT data type (Delta 4.x) — gated as a
        # reader+writer feature because the shredded parquet encoding is
        # unreadable to engines without variant support
        "variantType",
        # allowColumnDefaults: column DEFAULT values (writer feature —
        # inserts that omit the column get the default; readers see
        # plain data)
        "allowColumnDefaults",
    }
)
# Legacy minWriterVersion -> the features it implies (Delta spec table);
# used both for gating legacy protocols and for enumerating features when
# a table upgrades to the table-features protocol (3, 7).
_LEGACY_WRITER_FEATURES = {
    1: frozenset(),
    2: frozenset({"appendOnly", "invariants"}),
    3: frozenset({"appendOnly", "invariants", "checkConstraints"}),
    4: frozenset(
        {"appendOnly", "invariants", "checkConstraints", "changeDataFeed",
         "generatedColumns"}
    ),
    5: frozenset(
        {"appendOnly", "invariants", "checkConstraints", "changeDataFeed",
         "generatedColumns", "columnMapping"}
    ),
    6: frozenset(
        {"appendOnly", "invariants", "checkConstraints", "changeDataFeed",
         "generatedColumns", "columnMapping", "identityColumns"}
    ),
}
_LEGACY_READER_FEATURES = {1: frozenset(), 2: frozenset({"columnMapping"})}


_SCAN_MISS = object()


def _scan_log_then_checkpoint(
    table_path: str,
    screen: str,
    json_handler,
    ckpt_column: str,
    ckpt_handler,
    default,
):
    """Shared driver-side action lookup (no Spark job): scan commit
    JSONs newest-first — lines substring-screened by ``screen`` before
    json.loads — stopping at the last checkpoint (a checkpoint always
    folds the latest of every scanned action), then fall back to the
    checkpoint parquet's ``ckpt_column`` via pyarrow. Handlers return
    ``_SCAN_MISS`` to keep scanning. One implementation for every
    per-commit driver gate (protocol check, row-id high-water mark), so
    the tail-walk/boundary/fallback rules can never diverge."""
    log_dir = os.path.join(table_path, LOG_DIR)
    try:
        files = sorted(
            (f for f in os.listdir(log_dir)
             if f.endswith(".json") and f[:20].isdigit()),
            reverse=True,
        )
    except FileNotFoundError:
        return default
    ckpt_version = -1
    try:
        with open(os.path.join(log_dir, "_last_checkpoint")) as fh:
            ckpt_version = int(json.loads(fh.read())["version"])
    except (FileNotFoundError, KeyError, ValueError):
        pass
    for f in files:
        if int(f[:20]) < ckpt_version:
            break  # the checkpoint (read below) folds anything older
        with open(os.path.join(log_dir, f)) as fh:
            for line in fh:
                if screen not in line:
                    continue
                out = json_handler(json.loads(line))
                if out is not _SCAN_MISS:
                    return out
    try:
        import pyarrow.parquet as pq

        from delta_lake_health_spark.sources.delta_log import (
            checkpoint_file_names,
        )

        with open(os.path.join(log_dir, "_last_checkpoint")) as fh:
            info = json.loads(fh.read())
        # V2: non-file actions live in the UUID top-level file
        for name in checkpoint_file_names(info):
            fp = os.path.join(log_dir, name)
            if ckpt_column not in pq.read_schema(fp).names:
                continue
            t = pq.read_table(fp, columns=[ckpt_column])
            for row in t.column(ckpt_column).to_pylist():
                out = ckpt_handler(row)
                if out is not _SCAN_MISS:
                    return out
    except (FileNotFoundError, KeyError, ValueError):
        pass
    return default


def _latest_protocol_fs(table_path: str) -> dict:
    """Driver-side protocol lookup (the write gate runs on EVERY
    commit) via the shared tail-then-checkpoint scan."""
    default = {"minReaderVersion": 1, "minWriterVersion": 2,
               "readerFeatures": [], "writerFeatures": []}

    def norm(p: dict) -> dict:
        return {
            "minReaderVersion": int(p.get("minReaderVersion", 1)),
            "minWriterVersion": int(p.get("minWriterVersion", 2)),
            "readerFeatures": list(p.get("readerFeatures") or []),
            "writerFeatures": list(p.get("writerFeatures") or []),
        }

    return _scan_log_then_checkpoint(
        table_path,
        screen='"protocol"',
        json_handler=lambda a: (
            norm(a["protocol"]) if "protocol" in a else _SCAN_MISS
        ),
        ckpt_column="protocol",
        ckpt_handler=lambda row: (
            norm(row)
            if row and row.get("minReaderVersion") is not None
            else _SCAN_MISS
        ),
        default=default,
    )


def _refuse_append_only(spark: SparkSession, table_path: str, op: str) -> None:
    """`delta.appendOnly=true` tables refuse data-removing operations
    (Delta's enforcement for the appendOnly writer feature): DELETE,
    DV-DELETE, UPDATE, file-removing MERGE, OVERWRITE, RESTORE. Pure
    maintenance rewrites (OPTIMIZE / z-order / DV purge, dataChange =
    false) stay allowed, as in Delta. One cached metadata read; called
    only from the rare mutation paths, never the append hot path."""
    from delta_lake_health_spark.sources.delta_log import DeltaLog

    if current_version(table_path) < 0:
        return
    cfg = DeltaLog(spark, table_path).metadata().get("configuration", {})
    if str(cfg.get("delta.appendOnly", "")).lower() == "true":
        raise ValueError(
            f"{op} is not allowed on an append-only table "
            f"(delta.appendOnly=true): {table_path}"
        )


def _require_writable(spark: SparkSession, table_path: str) -> None:
    """Protocol gate for writes (Delta spec): refuse to commit to a
    table whose protocol demands writer capabilities this engine lacks —
    a commit that ignores an unknown writer feature (identity columns,
    row tracking, ...) corrupts the table for conforming writers."""
    if current_version(table_path) < 0:
        return
    p = _latest_protocol_fs(table_path)
    w = p["minWriterVersion"]
    feats = (
        set(p["writerFeatures"])
        if w >= 7
        else set(_LEGACY_WRITER_FEATURES.get(w, {"__unknown__"}))
    )
    unsupported = feats - SUPPORTED_WRITER_FEATURES
    if w > 7 or unsupported:
        raise ValueError(
            f"unsupported Delta writer requirements: minWriterVersion={w}, "
            f"features={sorted(unsupported)} (supported: "
            f"{sorted(SUPPORTED_WRITER_FEATURES)})"
        )


def _protocol_upgrade_action(
    spark: SparkSession, table_path: str, feature: str
) -> dict | None:
    """The protocol action that enables ``feature`` on this table, or
    None when the current protocol already allows it. Column mapping
    upgrades to the legacy (2, 5) pair; deletion vectors require the
    table-features protocol (3, 7), which must enumerate every feature
    the table already relies on (the spec's legacy-to-features
    migration)."""
    p = _latest_protocol_fs(table_path)
    r, w = p["minReaderVersion"], p["minWriterVersion"]
    if feature == "columnMapping":
        if (r, w) >= (2, 5) and (
            w < 7 or "columnMapping" in p["writerFeatures"]
        ):
            return None
        if w < 7:
            return {"protocol": {"minReaderVersion": max(r, 2),
                                 "minWriterVersion": max(w, 5)}}
        return {
            "protocol": {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": sorted(
                    set(p["readerFeatures"]) | {"columnMapping"}
                ),
                "writerFeatures": sorted(
                    set(p["writerFeatures"]) | {"columnMapping"}
                ),
            }
        }
    if feature in (
        "rowTracking",
        "identityColumns",
        "domainMetadata",
        "allowColumnDefaults",
    ):
        # writer-only table features (readers may ignore row ids;
        # identity values are plain data once written; domain metadata
        # is writer bookkeeping; default values are plain data once
        # materialized by the writer): the writer
        # protocol moves to table features (7) and enumerates, the
        # reader version is untouched. identityColumns is also legacy
        # minWriterVersion 6, but we always upgrade through features —
        # a (1,6) protocol would drag in every v6-implied feature.
        if w >= 7 and feature in p["writerFeatures"]:
            return None
        if feature == "identityColumns" and w == 6:
            return None  # legacy v6 already implies it
        writer_feats = (
            set(p["writerFeatures"]) if w >= 7
            else set(_LEGACY_WRITER_FEATURES.get(w, set()))
        )
        proto: dict = {
            "minReaderVersion": r,
            "minWriterVersion": 7,
            "writerFeatures": sorted(writer_feats | {feature}),
        }
        if r >= 3:
            proto["readerFeatures"] = sorted(set(p["readerFeatures"]))
        return {"protocol": proto}
    if feature == "clustering":
        # liquid clustering depends on domainMetadata (the declared
        # columns live in the delta.clustering domain) — enumerate both
        need = {"clustering", "domainMetadata"}
        if w >= 7 and need <= set(p["writerFeatures"]):
            return None
        writer_feats = (
            set(p["writerFeatures"]) if w >= 7
            else set(_LEGACY_WRITER_FEATURES.get(w, set()))
        )
        proto = {
            "minReaderVersion": r,
            "minWriterVersion": 7,
            "writerFeatures": sorted(writer_feats | need),
        }
        if r >= 3:
            proto["readerFeatures"] = sorted(set(p["readerFeatures"]))
        return {"protocol": proto}
    if feature in ("deletionVectors", "v2Checkpoint", "variantType"):
        # table-features-only capabilities — reader AND writer gated:
        # upgrade to (3, 7) and enumerate every feature the table
        # already relies on. "Already enabled" requires the feature on
        # BOTH sides: a foreign (3,7) table listing it only as a writer
        # feature would otherwise never get the reader-side gate, and
        # engines without the capability would read bytes they cannot
        # decode (ADVICE r10).
        if (
            w >= 7
            and r >= 3
            and feature in p["writerFeatures"]
            and feature in p["readerFeatures"]
        ):
            return None
        reader_feats = (
            set(p["readerFeatures"]) if r >= 3
            else set(_LEGACY_READER_FEATURES.get(r, set()))
        )
        writer_feats = (
            set(p["writerFeatures"]) if w >= 7
            else set(_LEGACY_WRITER_FEATURES.get(w, set()))
        )
        return {
            "protocol": {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": sorted(reader_feats | {feature}),
                "writerFeatures": sorted(writer_feats | {feature}),
            }
        }
    raise ValueError(f"unknown feature {feature!r}")


def _prev_in_commit_ts(table_path: str, version: int) -> int:
    """The predecessor commit's inCommitTimestamp (or its commitInfo
    timestamp as the pre-ICT fallback), -1 for version 0. One small
    driver-side JSON read — the same cost class as the put-if-absent
    itself."""
    if version <= 0:
        return -1
    prev = _log_path(table_path, version - 1)
    try:
        with open(prev) as f:
            for line in f:
                a = json.loads(line)
                if "commitInfo" in a:
                    ci = a["commitInfo"]
                    ts = ci.get("inCommitTimestamp")
                    if ts is None:  # foreign writer may emit null
                        ts = ci.get("timestamp")
                    return int(ts) if ts is not None else -1
    except (FileNotFoundError, TypeError, ValueError):
        pass  # predecessor cleaned up / malformed — fall back to clock
    return -1


def _row_tracking_enabled(table_path: str) -> bool:
    p = _latest_protocol_fs(table_path)
    return (
        p["minWriterVersion"] >= 7
        and "rowTracking" in p["writerFeatures"]
    )


def _latest_row_id_hwm(table_path: str) -> int:
    """Driver-side row-id high-water-mark lookup via the shared
    tail-then-checkpoint scan. -1 when the ``delta.rowTracking`` domain
    was never written."""

    def hwm_of(dm: dict) -> int:
        if dm.get("domain") != "delta.rowTracking" or dm.get("removed"):
            return -1
        cfg = json.loads(dm.get("configuration") or "{}")
        return int(cfg.get("rowIdHighWaterMark", -1))

    return _scan_log_then_checkpoint(
        table_path,
        screen='"delta.rowTracking"',
        json_handler=lambda a: (
            hwm_of(a["domainMetadata"])
            if "domainMetadata" in a
            else _SCAN_MISS
        ),
        ckpt_column="domainMetadata",
        ckpt_handler=lambda row: (
            hwm_of(row)
            if row and row.get("domain") == "delta.rowTracking"
            else _SCAN_MISS
        ),
        default=-1,
    )


CLUSTERING_DOMAIN = "delta.clustering"


def clustering_columns(table_path: str) -> list[str]:
    """The table's declared liquid-clustering columns (latest
    ``delta.clustering`` domainMetadata), [] when never declared or
    cleared. Driver-side via the shared tail-then-checkpoint scan — no
    Spark job, so the per-write default lookup stays commit-cost; a
    table whose protocol never enabled the feature short-circuits
    without scanning the log at all (every write calls this)."""
    p = _latest_protocol_fs(table_path)
    if p["minWriterVersion"] < 7 or "clustering" not in p["writerFeatures"]:
        return []

    def cols_of(dm: dict) -> list[str]:
        if dm.get("removed"):
            return []
        cfg = json.loads(dm.get("configuration") or "{}")
        return list(cfg.get("clusteringColumns", []))

    return _scan_log_then_checkpoint(
        table_path,
        screen=f'"{CLUSTERING_DOMAIN}"',
        json_handler=lambda a: (
            cols_of(a["domainMetadata"])
            if a.get("domainMetadata", {}).get("domain") == CLUSTERING_DOMAIN
            else _SCAN_MISS
        ),
        ckpt_column="domainMetadata",
        ckpt_handler=lambda row: (
            cols_of(row)
            if row and row.get("domain") == CLUSTERING_DOMAIN
            else _SCAN_MISS
        ),
        default=[],
    )


def set_cluster_columns(
    spark: SparkSession, table_path: str, cols: list[str]
) -> int:
    """ALTER TABLE ... CLUSTER BY (Delta liquid clustering, writer
    feature ``clustering``): records the declared columns in the
    ``delta.clustering`` domainMetadata. Every subsequent ``write`` that
    doesn't pass an explicit ``cluster_by`` range-partitions and sorts
    its batch by the declared columns (clustered ingest), and
    ``zorder_cluster(cluster_cols=None)`` re-clusters incrementally over
    them — the two halves of liquid clustering's contract. ``cols=[]``
    clears the declaration (CLUSTER BY NONE)."""
    _require_writable(spark, table_path)
    from delta_lake_health_spark.sources.delta_log import DeltaLog

    meta = DeltaLog(spark, table_path).metadata()
    names = {f["name"] for f in (meta.get("schema") or {}).get("fields", [])}
    for c in cols:
        if c not in names:
            raise ValueError(f"cluster column {c!r} not in table schema")
        if c in meta.get("partition_columns", []):
            raise ValueError(
                f"cluster column {c!r} is a partition column — clustering "
                "within a partition value is a no-op"
            )
    actions: list[dict] = []
    upgrade = _protocol_upgrade_action(spark, table_path, "clustering")
    if upgrade is not None:
        actions.append(upgrade)
    actions.append(
        {
            "domainMetadata": {
                "domain": CLUSTERING_DOMAIN,
                "configuration": json.dumps({"clusteringColumns": list(cols)}),
                "removed": False,
            }
        }
    )
    actions.append(
        _commit_info("CLUSTER BY", {"clusterBy": json.dumps(list(cols))}, {})
    )
    version = current_version(table_path)
    _commit(table_path, version + 1, actions)
    return version + 1


PRESERVE_ROW_ID_FLAG = "__preserveRowId__"


def _assign_row_ids(table_path: str, version: int, actions: list[dict]) -> None:
    """Row-tracking assignment (in ``_commit`` so EVERY operator —
    write, delete, merge, update, compact, clone — gets ids, and a
    retried commit re-derives them from the then-current high-water
    mark instead of reusing stale ones): each add action gets
    ``baseRowId`` (fresh ids [base, base + numRecords - 1]) and
    ``defaultRowCommitVersion``; the commit carries the advanced
    ``delta.rowTracking`` domainMetadata.

    A metadata-only re-add of an UNCHANGED file (stats backfill) marks
    itself with ``PRESERVE_ROW_ID_FLAG`` and keeps its carried-over
    baseRowId — reassigning would break the spec's id stability for
    rows that never moved. The flag is stripped before serialization."""
    adds = [a["add"] for a in actions if "add" in a]
    if not adds or not _row_tracking_enabled(table_path):
        return
    hwm = _latest_row_id_hwm(table_path)
    assigned = False
    for add in adds:
        # the flag is READ, never popped: a retried commit re-enters
        # here with the same actions list and must still preserve —
        # serialization in _commit strips the private key
        if add.get(PRESERVE_ROW_ID_FLAG):
            continue
        n = int(json.loads(add.get("stats") or "{}").get("numRecords", 0))
        add["baseRowId"] = hwm + 1
        add["defaultRowCommitVersion"] = version
        hwm += n
        assigned = True
    if not assigned:
        return  # nothing new assigned: leave the hwm domain untouched
    # replace any stale domainMetadata from a previous attempt
    actions[:] = [
        a for a in actions
        if a.get("domainMetadata", {}).get("domain") != "delta.rowTracking"
    ]
    actions.append(
        {
            "domainMetadata": {
                "domain": "delta.rowTracking",
                "configuration": json.dumps({"rowIdHighWaterMark": hwm}),
                "removed": False,
            }
        }
    )


def _commit(table_path: str, version: int, actions: list[dict]) -> None:
    _assign_row_ids(table_path, version, actions)
    # In-commit timestamps (Delta ICT): the commit's own monotonic
    # timestamp is the authority for timestampAsOf — max(wall clock,
    # predecessor + 1 ms), so clock skew between writers can never make
    # history non-monotonic at WRITE time (the reader-side adjustment in
    # DeltaLog.commit_timestamps remains as the fallback for foreign
    # pre-ICT logs). Stamped UNCONDITIONALLY: commit_mutation retries a
    # rebased commit with the SAME actions list, and reusing the first
    # attempt's stamp would write an ICT below the interleaved winner's.
    for a in actions:
        if "commitInfo" in a:
            a["commitInfo"]["inCommitTimestamp"] = max(
                int(time.time() * 1000), _prev_in_commit_ts(table_path, version) + 1
            )
    path = _log_path(table_path, version)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + f".tmp-{uuid.uuid4().hex}"

    def _serializable(a: dict) -> dict:
        # strip the in-memory preserve marker WITHOUT mutating the
        # caller's actions (commit retries must still see it)
        add = a.get("add")
        if add and PRESERVE_ROW_ID_FLAG in add:
            return {**a, "add": {k: v for k, v in add.items()
                                 if k != PRESERVE_ROW_ID_FLAG}}
        return a

    with open(tmp, "w") as f:
        for a in actions:
            f.write(json.dumps(_serializable(a)) + "\n")
    # atomic single-writer commit; a real multi-writer would need
    # put-if-absent on the log store
    if os.path.exists(path):
        os.remove(tmp)
        raise RuntimeError(f"concurrent commit: version {version} exists")
    os.rename(tmp, path)
    _write_version_checksum(table_path, version, actions)


def _write_version_checksum(
    table_path: str, version: int, actions: list[dict]
) -> None:
    """Delta's ``<version>.crc`` version checksum: tableSizeBytes and
    numFiles maintained INCREMENTALLY from the predecessor's checksum
    plus this commit's add/remove actions, so ``DESCRIBE DETAIL`` reads
    two numbers from one tiny file instead of replaying the log. The
    checksum is an accelerator, never an authority — if the predecessor
    checksum is missing (foreign log) or a removed file's size can't be
    resolved, no checksum is written and readers fall back to replay."""
    size, n = 0, 0
    if version > 0:
        prev = os.path.join(
            table_path, "_delta_log", f"{version - 1:020d}.crc"
        )
        try:
            with open(prev) as f:
                c = json.loads(f.read())
            size, n = int(c["tableSizeBytes"]), int(c["numFiles"])
        except (FileNotFoundError, KeyError, ValueError):
            return
    try:
        for a in actions:
            if "add" in a:
                size += int(a["add"]["size"])
                n += 1
            elif "remove" in a:
                rel = a["remove"]["path"]
                fp = rel if os.path.isabs(rel) else os.path.join(table_path, rel)
                size -= os.path.getsize(fp)
                n -= 1
    except (OSError, KeyError, TypeError, ValueError):
        return  # accelerator only: never let checksum math break a commit
    crc = {"tableSizeBytes": size, "numFiles": n, "version": version}
    out = os.path.join(table_path, "_delta_log", f"{version:020d}.crc")
    tmp_crc = out + f".tmp-{uuid.uuid4().hex}"
    with open(tmp_crc, "w") as f:
        f.write(json.dumps(crc))
    os.replace(tmp_crc, out)


def _commit_info(operation: str, parameters: dict, metrics: dict) -> dict:
    return {
        "commitInfo": {
            "timestamp": int(time.time() * 1000),
            "operation": operation,
            "operationParameters": {k: str(v) for k, v in parameters.items()},
            "operationMetrics": {k: str(v) for k, v in metrics.items()},
        }
    }


def _metadata_action(
    df: DataFrame,
    partition_by: list[str],
    schema: dict | None = None,
    existing: dict | None = None,
) -> dict:
    """``schema`` overrides the logged schemaString — schema evolution
    logs the MERGED schema (evolution-added columns nullable), not the
    incoming batch's expression nullability.

    ``existing`` is the table's current metadata when re-emitting
    metaData on an already-created table: the table id is stable for the
    table's lifetime and the configuration (``delta.constraints.*``,
    other properties) must survive schema evolution — only the
    schemaString changes. Omitting it is only correct at version 0."""
    existing = existing or {}
    return {
        "metaData": {
            "id": existing.get("id") or str(uuid.uuid4()),
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema) if schema else df.schema.json(),
            "partitionColumns": list(partition_by),
            "configuration": dict(existing.get("configuration") or {}),
            "createdTime": int(time.time() * 1000),
        }
    }


def _active_rel_paths(spark: SparkSession, table_path: str) -> list[str]:
    from delta_lake_health_spark.sources.delta_log import DeltaLog

    return [
        r.path for r in DeltaLog(spark, table_path).live_files_rows()
    ]


def _norm_fields(schema: dict) -> list[dict]:
    """Schema shape for equality checks: (name, type, nullable) only —
    field METADATA (e.g. generation expressions) is table-level state
    that an incoming batch never carries, so it must not count as a
    schema difference."""
    return [
        {k: f.get(k) for k in ("name", "type", "nullable")}
        for f in schema.get("fields", [])
    ]


_WIDENING_CHAINS = (
    ["byte", "short", "integer", "long"],
    ["float", "double"],
)


def _widened_type(logged_t, incoming_t):
    """Delta type widening: if the incoming PRIMITIVE type is strictly
    wider than the logged one along an allowed chain (byte->short->int->
    long, float->double), the TABLE type widens — old files stay valid
    because the parquet reader upcasts them (Spark 4 widening reads).
    Returns the widened type name, or None when no widening applies."""
    if not isinstance(logged_t, str) or not isinstance(incoming_t, str):
        return None
    for chain in _WIDENING_CHAINS:
        if logged_t in chain and incoming_t in chain:
            if chain.index(incoming_t) > chain.index(logged_t):
                return incoming_t
    return None


def _merge_append_schema(spark, df: DataFrame, table_path: str, merge_schema: bool):
    """For an append whose schema differs from the logged one: either raise
    (default) or — with ``merge_schema`` — align ``df`` to the merged
    schema (logged fields first, cast to their logged types or WIDENED to
    the incoming type per the Delta type-widening chains; new fields
    appended). Returns (df, schema_changed)."""
    from delta_lake_health_spark.sources.delta_log import DeltaLog

    logged = DeltaLog(spark, table_path).metadata().get("schema")
    cur = json.loads(df.schema.json())
    if logged is None or _norm_fields(logged) == _norm_fields(cur):
        return df, False, None
    # a batch that is merely STRICTER on nullability (non-null values
    # into a nullable column) is always safe — not a schema change
    lf, cf = _norm_fields(logged), _norm_fields(cur)
    if [(f["name"], f["type"]) for f in lf] == [
        (f["name"], f["type"]) for f in cf
    ] and all(
        l.get("nullable") or not c.get("nullable")
        for l, c in zip(lf, cf)
    ):
        return df, False, None
    if not merge_schema:
        raise ValueError(
            "append schema differs from the table schema; pass "
            "merge_schema=True to evolve it"
        )
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    cur_types = {f["name"]: f["type"] for f in cur["fields"]}
    logged_fields = []
    for f in logged["fields"]:
        wide = _widened_type(f.get("type"), cur_types.get(f["name"]))
        logged_fields.append({**f, "type": wide} if wide else f)
    logged = {**logged, "fields": logged_fields}

    logged_names = {f["name"] for f in logged["fields"]}
    # evolution-added columns are ALWAYS nullable (Delta mergeSchema
    # semantics): files written before the column existed read it as null,
    # so recording the incoming batch's nullable=false would make the
    # widened table violate its own schema
    merged = {
        "type": "struct",
        "fields": logged["fields"]
        + [
            {**f, "nullable": True}
            for f in cur["fields"]
            if f["name"] not in logged_names
        ],
    }
    mtype = StructType.fromJson(merged)
    cols = [
        F.col(f.name).cast(f.dataType)
        if f.name in df.columns
        else F.lit(None).cast(f.dataType).alias(f.name)
        for f in mtype.fields
    ]
    return df.select(*cols), True, merged


def set_constraint(
    spark: SparkSession, table_path: str, name: str, expr: str
) -> int:
    """ALTER TABLE ... ADD CONSTRAINT (Delta CHECK constraints): records
    ``delta.constraints.<name> = <expr>`` in the table configuration (the
    Delta convention) via a re-emitted metaData action; every subsequent
    ``write``/``merge`` validates its batch against the expression and
    refuses the commit on violation. The EXISTING data is validated once
    here (one scan) so a constraint can't be added that the table already
    breaks — same as Delta."""
    _require_writable(spark, table_path)
    from pyspark.sql import functions as F

    from delta_lake_health_spark.sources.delta_log import DeltaLog

    log = DeltaLog(spark, table_path)
    bad = log.snapshot().where(~F.expr(expr)).limit(1).count()
    if bad:
        raise ValueError(
            f"cannot add constraint {name!r}: existing rows violate ({expr})"
        )
    meta = log.metadata()
    config = dict(meta.get("configuration", {}))
    config[f"delta.constraints.{name}"] = expr
    version = current_version(table_path)
    _commit(
        table_path,
        version + 1,
        [
            {
                "metaData": {
                    "id": meta["id"],
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": json.dumps(meta["schema"]),
                    "partitionColumns": meta.get("partition_columns", []),
                    "configuration": config,
                    "createdTime": int(time.time() * 1000),
                }
            },
            _commit_info("ADD CONSTRAINT", {"name": name, "expr": expr}, {}),
        ],
    )
    return version + 1


def set_table_property(
    spark: SparkSession, table_path: str, key: str, value: str
) -> int:
    """ALTER TABLE ... SET TBLPROPERTIES (one key): re-emit metaData with
    the configuration entry added/updated — schema, id, partitioning all
    carry over. Properties with engine behavior attached:
    ``delta.autoOptimize.autoCompact`` (+ ``minNumFiles`` /
    ``smallFileSize``) trigger post-commit compaction in ``write``;
    ``delta.constraints.*`` should go through ``set_constraint`` (which
    validates existing data first)."""
    return set_table_properties(spark, table_path, {key: value})


def set_table_properties(
    spark: SparkSession, table_path: str, props: dict
) -> int:
    """SET TBLPROPERTIES for several keys in ONE commit — the form
    callers that stamp a coherent parameter SET (e.g. the audio
    fingerprint index's frame/hop/fanOut) must use, so no reader can
    ever observe a half-stamped configuration between commits."""
    _require_writable(spark, table_path)
    from delta_lake_health_spark.sources.delta_log import DeltaLog

    meta = DeltaLog(spark, table_path).metadata()
    config = dict(meta.get("configuration", {}))
    stamped = {str(k): str(v) for k, v in props.items()}
    config.update(stamped)
    version = current_version(table_path)
    _commit(
        table_path,
        version + 1,
        [
            {
                "metaData": {
                    "id": meta["id"],
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": json.dumps(meta["schema"]),
                    "partitionColumns": meta.get("partition_columns", []),
                    "configuration": config,
                    "createdTime": int(time.time() * 1000),
                }
            },
            _commit_info("SET TBLPROPERTIES", stamped, {}),
        ],
    )
    return version + 1


def _maybe_auto_compact(spark: SparkSession, table_path: str, meta) -> None:
    """Delta's autoCompact: when ``delta.autoOptimize.autoCompact`` is
    set on the table, a successful write checks the small-file
    population and, past ``minNumFiles``, runs a standard OPTIMIZE
    commit right behind its own — writers pay a bounded compaction
    instead of the table degrading until someone remembers to run
    maintenance. The compaction is the ordinary ``maintenance.compact``
    (dataChange=false adds, change-feed invisible)."""
    config = (meta or {}).get("configuration", {})
    if config.get("delta.autoOptimize.autoCompact", "").lower() != "true":
        return
    min_files = int(config.get("delta.autoOptimize.minNumFiles", "16"))
    small_size = int(
        config.get("delta.autoOptimize.smallFileSize", str(32 * 1024 * 1024))
    )
    from pyspark.sql import functions as F

    from delta_lake_health_spark.operators import maintenance
    from delta_lake_health_spark.sources.delta_log import DeltaLog

    n_small = (
        DeltaLog(spark, table_path)
        .active_files()
        .where(F.col("size") < small_size)
        .count()
    )
    if n_small >= min_files:
        maintenance.compact(
            spark, table_path, small_file_size=small_size
        )


def drop_constraint(spark: SparkSession, table_path: str, name: str) -> int:
    """ALTER TABLE ... DROP CONSTRAINT."""
    _require_writable(spark, table_path)
    from delta_lake_health_spark.sources.delta_log import DeltaLog

    meta = DeltaLog(spark, table_path).metadata()
    config = dict(meta.get("configuration", {}))
    config.pop(f"delta.constraints.{name}", None)
    version = current_version(table_path)
    _commit(
        table_path,
        version + 1,
        [
            {
                "metaData": {
                    "id": meta["id"],
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": json.dumps(meta["schema"]),
                    "partitionColumns": meta.get("partition_columns", []),
                    "configuration": config,
                    "createdTime": int(time.time() * 1000),
                }
            },
            _commit_info("DROP CONSTRAINT", {"name": name}, {}),
        ],
    )
    return version + 1


def _to_physical(spark: SparkSession, df: DataFrame, table_path: str) -> DataFrame:
    """Rename logical -> physical column names just before writing data
    files: RENAME COLUMN is metadata-only, so every data file — old and
    new — carries PHYSICAL names. No-op for never-renamed tables."""
    from delta_lake_health_spark.sources.delta_log import DeltaLog

    if current_version(table_path) < 0:
        return df
    mapping = DeltaLog.column_mapping(
        DeltaLog(spark, table_path).metadata().get("schema")
    )
    if mapping:
        df = df.withColumnsRenamed(mapping)
    return df


def _refuse_referenced(meta: dict, col: str, action: str) -> None:
    """Renaming/dropping a column that a CHECK constraint or generation
    expression references would silently break them — refuse, like Delta."""
    import re

    exprs = [
        v
        for k, v in meta.get("configuration", {}).items()
        if k.startswith("delta.constraints.")
    ]
    for f in (meta.get("schema") or {}).get("fields", []):
        g = (f.get("metadata") or {}).get("delta.generationExpression")
        if g:
            exprs.append(g)
    for expr in exprs:
        if re.search(rf"\b{re.escape(col)}\b", expr):
            raise ValueError(
                f"cannot {action} column {col!r}: referenced by a constraint "
                f"or generation expression ({expr})"
            )


def _commit_schema_change(
    spark: SparkSession, table_path: str, fields: list[dict],
    operation: str, parameters: dict,
) -> int:
    from delta_lake_health_spark.sources.delta_log import DeltaLog

    _require_writable(spark, table_path)
    meta = DeltaLog(spark, table_path).metadata()
    version = current_version(table_path)
    # RENAME/DROP introduce column-mapping metadata: the same commit must
    # raise the protocol so conforming readers know to apply the mapping
    upgrade = (
        [_protocol_upgrade_action(spark, table_path, "columnMapping")]
        if operation in ("RENAME COLUMN", "DROP COLUMN")
        else []
    )
    _commit(
        table_path,
        version + 1,
        [a for a in upgrade if a]
        + [
            {
                "metaData": {
                    "id": meta["id"],
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": json.dumps({"type": "struct", "fields": fields}),
                    "partitionColumns": meta.get("partition_columns", []),
                    "configuration": meta.get("configuration", {}),
                    "createdTime": int(time.time() * 1000),
                }
            },
            _commit_info(operation, parameters, {}),
        ],
    )
    return version + 1


def rename_column(
    spark: SparkSession, table_path: str, old: str, new: str
) -> int:
    """ALTER TABLE ... RENAME COLUMN — metadata-only via Delta column
    mapping: the field keeps its PHYSICAL name (recorded under
    ``delta.columnMapping.physicalName``), so no data file is rewritten;
    readers rename physical -> logical at scan time. Partition columns
    and columns referenced by constraints / generation expressions are
    refused."""
    from delta_lake_health_spark.sources.delta_log import DeltaLog

    meta = DeltaLog(spark, table_path).metadata()
    schema = meta.get("schema") or {}
    names = {f["name"] for f in schema.get("fields", [])}
    if old not in names:
        raise ValueError(f"column {old!r} not in table schema")
    if new in names:
        raise ValueError(f"column {new!r} already exists")
    if old in meta.get("partition_columns", []):
        raise ValueError(
            f"cannot rename partition column {old!r} (directory layout is "
            "physical)"
        )
    _refuse_referenced(meta, old, "rename")
    fields = []
    for f in schema["fields"]:
        if f["name"] == old:
            md = dict(f.get("metadata") or {})
            md.setdefault("delta.columnMapping.physicalName", old)
            fields.append({**f, "name": new, "metadata": md})
        else:
            fields.append(f)
    return _commit_schema_change(
        spark, table_path, fields, "RENAME COLUMN", {"from": old, "to": new}
    )


def drop_column(spark: SparkSession, table_path: str, col: str) -> int:
    """ALTER TABLE ... DROP COLUMN — metadata-only: the field leaves the
    logical schema; the data stays in the files and is simply never read
    (Delta column-mapping drop semantics)."""
    from delta_lake_health_spark.sources.delta_log import DeltaLog

    meta = DeltaLog(spark, table_path).metadata()
    schema = meta.get("schema") or {}
    names = {f["name"] for f in schema.get("fields", [])}
    if col not in names:
        raise ValueError(f"column {col!r} not in table schema")
    if col in meta.get("partition_columns", []):
        raise ValueError(f"cannot drop partition column {col!r}")
    if len(names) == 1:
        raise ValueError("cannot drop the only column")
    _refuse_referenced(meta, col, "drop")
    fields = [f for f in schema["fields"] if f["name"] != col]
    return _commit_schema_change(
        spark, table_path, fields, "DROP COLUMN", {"column": col}
    )


def _column_defaults(schema: dict | None) -> dict[str, str]:
    """{column: default expression} from the field-metadata key
    ``CURRENT_DEFAULT`` (the public delta-spark convention for the
    ``allowColumnDefaults`` writer feature)."""
    out: dict[str, str] = {}
    for f in (schema or {}).get("fields", []):
        d = (f.get("metadata") or {}).get("CURRENT_DEFAULT")
        if d:
            out[f["name"]] = d
    return out


# evaluation-time-dependent / non-deterministic functions a standalone
# SELECT happily evaluates but which would make a 'constant' default
# differ per batch and per replayed write (ADVICE r12). Two classes:
# ordinary functions (require the call parens) and NILADIC builtins
# Spark accepts bare — `current_date` with no parens parses as the
# function, not a column, so the word alone must refuse (r13 review:
# the paren-required form let bare current_date through, and the
# double-eval check can't catch a value that only changes at midnight).
_NONDETERMINISTIC_FN = re.compile(
    r"\b(rand|randn|random|uuid|shuffle|monotonically_increasing_id|"
    r"unix_timestamp|input_file_name|now|curdate|current_timezone)\s*\("
    r"|\b(current_timestamp|current_date|localtimestamp|current_user|"
    r"session_user|current_database|current_catalog|current_schema)\b",
    re.IGNORECASE,
)


def set_column_default(
    spark: SparkSession, table_path: str, col: str, expr: str
) -> int:
    """ALTER TABLE ... ALTER COLUMN col SET DEFAULT expr (Delta's
    ``allowColumnDefaults`` writer feature, D76): the default
    expression lands in the schema field's metadata under
    ``CURRENT_DEFAULT``; every subsequent INSERT/append that OMITS the
    column materializes the default (writer-side — readers see plain
    data, so the protocol upgrade is writer-only). The expression must
    be constant-foldable per the feature contract: it is validated
    here by evaluating it once, and a reference to another column
    refuses loudly instead of materializing garbage."""
    _require_writable(spark, table_path)
    from delta_lake_health_spark.sources.delta_log import DeltaLog

    meta = DeltaLog(spark, table_path).metadata()
    schema = meta.get("schema") or {}
    fields = [dict(f) for f in schema.get("fields", [])]
    names = {f["name"] for f in fields}
    if col not in names:
        raise ValueError(f"column {col!r} not in table schema")
    target_type = next(f["type"] for f in fields if f["name"] == col)
    if not isinstance(target_type, str):
        # _fill_default_columns only materializes primitive (string-typed)
        # targets; accepting a struct/array/map here would stamp a default
        # that is silently never applied, surfacing later as a confusing
        # schema-mismatch on append — refuse at SET DEFAULT time instead
        raise ValueError(
            f"default for {col!r} refused: column type is non-primitive"
            f" ({json.dumps(target_type)[:80]}); defaults are supported"
            " on primitive columns only"
        )
    # screen the expression with string literals blanked out: the words
    # only matter as FUNCTION references, not inside quoted constants
    # (r13 review: "concat('current_date: ', 'x')" is a pure constant).
    # The blanking is ESCAPE-aware — backslash escapes and doubled
    # quotes pair like Spark's parser, in both quote styles — so a
    # niladic can't hide behind a mis-paired 'literal' and an escaped
    # apostrophe doesn't falsely refuse a constant.
    _blanked = re.sub(
        r"'(?:\\.|''|[^'\\])*'|\"(?:\\.|\"\"|[^\"\\])*\"", "''", expr
    )
    if _NONDETERMINISTIC_FN.search(_blanked):
        # a 'constant' default must evaluate to the SAME value on every
        # batch and on replay/rebuild; rand()/uuid()/current_timestamp()
        # pass a standalone SELECT but differ per evaluation — refuse
        raise ValueError(
            f"default expression for {col!r} must be deterministic;"
            f" ({expr!r}) references a non-deterministic or"
            " evaluation-time-dependent function"
        )
    try:
        # zero-table SELECT: any column reference fails to resolve, so
        # only genuinely constant-foldable expressions pass
        first = spark.sql(f"SELECT {expr}").collect()
    except Exception as ex:
        raise ValueError(
            f"default expression for {col!r} must be constant-foldable;"
            f" ({expr!r}) failed to evaluate standalone: {ex}"
        ) from ex
    # belt-and-braces for functions the name screen misses: two separate
    # evaluations of a constant-foldable expression must agree
    second = spark.sql(f"SELECT {expr}").collect()
    if [tuple(r) for r in first] != [tuple(r) for r in second]:
        raise ValueError(
            f"default expression for {col!r} must be deterministic;"
            f" ({expr!r}) produced different values on two evaluations"
        )
    for f in fields:
        if f["name"] == col:
            md = dict(f.get("metadata") or {})
            md["CURRENT_DEFAULT"] = expr
            f["metadata"] = md
    actions: list[dict] = []
    upgrade = _protocol_upgrade_action(
        spark, table_path, "allowColumnDefaults"
    )
    if upgrade:
        actions.append(upgrade)
    version = current_version(table_path)
    actions += [
        {
            "metaData": {
                "id": meta["id"],
                "format": {"provider": "parquet", "options": {}},
                "schemaString": json.dumps(
                    {"type": "struct", "fields": fields}
                ),
                "partitionColumns": meta.get("partition_columns", []),
                "configuration": meta.get("configuration", {}),
                "createdTime": int(time.time() * 1000),
            }
        },
        _commit_info(
            "ALTER COLUMN SET DEFAULT",
            {"column": col, "expr": expr, "type": str(target_type)},
            {},
        ),
    ]
    _commit(table_path, version + 1, actions)
    return version + 1


def clear_column_default(
    spark: SparkSession, table_path: str, col: str
) -> int:
    """ALTER TABLE ... ALTER COLUMN col DROP DEFAULT: remove the
    ``CURRENT_DEFAULT`` metadata; appends omitting the column go back
    to the ordinary schema-conformance rules."""
    _require_writable(spark, table_path)
    from delta_lake_health_spark.sources.delta_log import DeltaLog

    meta = DeltaLog(spark, table_path).metadata()
    fields = [dict(f) for f in (meta.get("schema") or {}).get("fields", [])]
    hit = False
    for f in fields:
        if f["name"] == col:
            md = dict(f.get("metadata") or {})
            hit = md.pop("CURRENT_DEFAULT", None) is not None
            f["metadata"] = md
    if not hit:
        raise ValueError(f"column {col!r} has no default")
    version = current_version(table_path)
    _commit(
        table_path,
        version + 1,
        [
            {
                "metaData": {
                    "id": meta["id"],
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": json.dumps(
                        {"type": "struct", "fields": fields}
                    ),
                    "partitionColumns": meta.get("partition_columns", []),
                    "configuration": meta.get("configuration", {}),
                    "createdTime": int(time.time() * 1000),
                }
            },
            _commit_info("ALTER COLUMN DROP DEFAULT", {"column": col}, {}),
        ],
    )
    return version + 1


def _fill_default_columns(
    spark: SparkSession, df: DataFrame, meta: dict | None
):
    """Materialize declared DEFAULTs for columns the batch OMITS
    (allowColumnDefaults writer behavior — cast to the declared type);
    columns the batch provides keep their values untouched. Takes the
    caller's already-loaded metadata — no extra log replay per
    write."""
    from pyspark.sql import functions as F

    schema = (meta or {}).get("schema")
    defaults = _column_defaults(schema)
    if not defaults:
        return df
    types = {f["name"]: f["type"] for f in (schema or {}).get("fields", [])}
    for c, expr in defaults.items():
        if c not in df.columns and isinstance(types.get(c), str):
            df = df.withColumn(c, F.expr(expr).cast(types[c]))
    return df


def _generated_columns(schema: dict | None) -> dict[str, str]:
    """{column: generation expression} from the Delta-spec field metadata
    key ``delta.generationExpression``."""
    out: dict[str, str] = {}
    for f in (schema or {}).get("fields", []):
        g = (f.get("metadata") or {}).get("delta.generationExpression")
        if g:
            out[f["name"]] = g
    return out


def set_generated_column(
    spark: SparkSession, table_path: str, col: str, expr: str
) -> int:
    """Declare ``col`` as a GENERATED column (Delta generated columns:
    the generation expression lives in the schema field's metadata under
    ``delta.generationExpression``). Subsequent writes compute the column
    when the batch omits it and refuse batches whose provided values
    disagree with the expression. Existing data is validated once here."""
    _require_writable(spark, table_path)
    from pyspark.sql import functions as F

    from delta_lake_health_spark.sources.delta_log import DeltaLog

    log = DeltaLog(spark, table_path)
    meta = log.metadata()
    schema = meta.get("schema") or {}
    fields = [dict(f) for f in schema.get("fields", [])]
    if col not in {f["name"] for f in fields}:
        raise ValueError(f"column {col!r} not in table schema")
    bad = (
        log.snapshot()
        .where(~F.col(col).eqNullSafe(F.expr(expr)))
        .limit(1)
        .count()
    )
    if bad:
        raise ValueError(
            f"cannot declare {col!r} generated: existing rows violate ({expr})"
        )
    for f in fields:
        if f["name"] == col:
            md = dict(f.get("metadata") or {})
            md["delta.generationExpression"] = expr
            f["metadata"] = md
    version = current_version(table_path)
    _commit(
        table_path,
        version + 1,
        [
            {
                "metaData": {
                    "id": meta["id"],
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": json.dumps({"type": "struct", "fields": fields}),
                    "partitionColumns": meta.get("partition_columns", []),
                    "configuration": meta.get("configuration", {}),
                    "createdTime": int(time.time() * 1000),
                }
            },
            _commit_info("SET GENERATED COLUMN", {"column": col, "expr": expr}, {}),
        ],
    )
    return version + 1


def _fill_generated_columns(spark: SparkSession, df: DataFrame, table_path: str):
    """Compute generated columns the batch omitted (Delta writer
    behavior); provided values are checked in ``_validate_constraints``."""
    from pyspark.sql import functions as F

    from delta_lake_health_spark.sources.delta_log import DeltaLog

    if current_version(table_path) < 0:
        return df
    gens = _generated_columns(
        DeltaLog(spark, table_path).metadata().get("schema")
    )
    for c, expr in gens.items():
        if c not in df.columns:
            df = df.withColumn(c, F.expr(expr))
    return df


def _identity_specs(schema: dict | None) -> dict[str, dict]:
    """{column: spec} for Delta identity columns — the spec's field
    metadata keys ``delta.identity.start`` / ``step`` /
    ``highWaterMark`` (absent until the first value is generated) /
    ``allowExplicitInsert`` (False = GENERATED ALWAYS, True = GENERATED
    BY DEFAULT)."""
    out: dict[str, dict] = {}
    for f in (schema or {}).get("fields", []):
        md = f.get("metadata") or {}
        if "delta.identity.start" in md:
            out[f["name"]] = {
                "start": int(md["delta.identity.start"]),
                "step": int(md["delta.identity.step"]),
                "hwm": (
                    int(md["delta.identity.highWaterMark"])
                    if "delta.identity.highWaterMark" in md
                    else None
                ),
                "allow_explicit": bool(
                    md.get("delta.identity.allowExplicitInsert", False)
                ),
            }
    return out


def _identity_fields(
    meta: dict, updates: dict[str, int]
) -> list[dict]:
    """The table's schema fields with each column's
    ``delta.identity.highWaterMark`` replaced per ``updates`` — the
    field list a HWM-advancing commit re-emits in its metaData."""
    fields = [dict(f) for f in (meta.get("schema") or {}).get("fields", [])]
    for f in fields:
        if f["name"] in updates:
            md = dict(f.get("metadata") or {})
            md["delta.identity.highWaterMark"] = updates[f["name"]]
            f["metadata"] = md
    return fields


def _identity_metadata_action(meta: dict, fields: list[dict]) -> dict:
    """metaData action re-emitting the logged table state with updated
    ``fields`` — id, partitioning, and configuration all carry over
    (this is an append-path re-emit, never a schema replacement)."""
    return {
        "metaData": {
            "id": meta["id"],
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps({"type": "struct", "fields": fields}),
            "partitionColumns": meta.get("partition_columns", []),
            "configuration": dict(meta.get("configuration") or {}),
            "createdTime": int(time.time() * 1000),
        }
    }


def set_identity_column(
    spark: SparkSession,
    table_path: str,
    col: str,
    start: int = 1,
    step: int = 1,
    allow_explicit_insert: bool = False,
) -> int:
    """Declare ``col`` an IDENTITY column (Delta identity columns,
    writer feature ``identityColumns``): subsequent ``write`` batches
    that omit the column get values ``start + k*step`` assigned
    distributed (per-partition contiguous blocks — the same reservation
    shape Delta's tasks use), with the high-water mark re-emitted in the
    SAME commit's metaData so concurrent writers conflict instead of
    duplicating values. ``allow_explicit_insert=False`` is GENERATED
    ALWAYS (providing the column refuses); True is GENERATED BY DEFAULT
    (provided values accepted, the mark advances past them).

    Declaring on a table with existing data syncs the mark to the
    column's current extreme so generated values never collide
    (the spec's SYNC IDENTITY, run once at declaration)."""
    _require_writable(spark, table_path)
    from pyspark.sql import functions as F

    from delta_lake_health_spark.sources.delta_log import DeltaLog

    if step == 0:
        raise ValueError("identity step must be non-zero")
    log = DeltaLog(spark, table_path)
    meta = log.metadata()
    schema = meta.get("schema") or {}
    field = next(
        (f for f in schema.get("fields", []) if f["name"] == col), None
    )
    if field is None:
        raise ValueError(f"column {col!r} not in table schema")
    if field.get("type") != "long":
        raise ValueError(
            f"identity column must be LONG, {col!r} is {field.get('type')!r}"
        )
    if col in meta.get("partition_columns", []):
        raise ValueError(f"identity column {col!r} cannot be a partition column")
    md = field.get("metadata") or {}
    if "delta.generationExpression" in md:
        raise ValueError(f"column {col!r} is already a generated column")
    if "delta.identity.start" in md:
        raise ValueError(f"column {col!r} is already an identity column")

    # sync the mark to existing data so generated values never collide
    agg = F.max(col) if step > 0 else F.min(col)
    row = log.snapshot().agg(agg.alias("m")).collect()[0]
    hwm = None
    if row["m"] is not None:
        hwm = int(row["m"])
        if (step > 0 and hwm < start) or (step < 0 and hwm > start):
            hwm = None  # all existing values sit before start; fresh series

    fields = [dict(f) for f in schema["fields"]]
    for f in fields:
        if f["name"] == col:
            fmd = dict(f.get("metadata") or {})
            fmd["delta.identity.start"] = start
            fmd["delta.identity.step"] = step
            fmd["delta.identity.allowExplicitInsert"] = allow_explicit_insert
            if hwm is not None:
                fmd["delta.identity.highWaterMark"] = hwm
            f["metadata"] = fmd
    actions: list[dict] = []
    upgrade = _protocol_upgrade_action(spark, table_path, "identityColumns")
    if upgrade is not None:
        actions.append(upgrade)
    actions.append(_identity_metadata_action(meta, fields))
    actions.append(
        _commit_info(
            "SET IDENTITY COLUMN",
            {"column": col, "start": start, "step": step,
             "allowExplicitInsert": allow_explicit_insert},
            {},
        )
    )
    version = current_version(table_path)
    _commit(table_path, version + 1, actions)
    return version + 1


def sync_identity(spark: SparkSession, table_path: str, col: str) -> int:
    """ALTER TABLE ... SYNC IDENTITY: recompute the high-water mark from
    the column's actual data (max for positive step, min for negative)
    and re-emit metaData when it moved. The mark only ever advances —
    shrinking it would let future generated values collide with rows a
    concurrent reader already saw."""
    _require_writable(spark, table_path)
    from pyspark.sql import functions as F

    from delta_lake_health_spark.sources.delta_log import DeltaLog

    log = DeltaLog(spark, table_path)
    meta = log.metadata()
    specs = _identity_specs(meta.get("schema"))
    if col not in specs:
        raise ValueError(f"column {col!r} is not an identity column")
    spec = specs[col]
    agg = F.max(col) if spec["step"] > 0 else F.min(col)
    row = log.snapshot().agg(agg.alias("m")).collect()[0]
    version = current_version(table_path)
    if row["m"] is None:
        return version  # empty table: nothing to sync
    data_mark = int(row["m"])
    hwm = spec["hwm"]
    if hwm is not None and (
        (spec["step"] > 0 and data_mark <= hwm)
        or (spec["step"] < 0 and data_mark >= hwm)
    ):
        return version  # mark already covers the data
    fields = _identity_fields(meta, {col: data_mark})
    _commit(
        table_path,
        version + 1,
        [
            _identity_metadata_action(meta, fields),
            _commit_info("SYNC IDENTITY", {"column": col}, {}),
        ],
    )
    return version + 1


_PARTITION_ID_BITS = 33  # monotonically_increasing_id: pid<<33 | local row


def _fill_identity_columns(
    spark: SparkSession, df: DataFrame, table_path: str, meta: dict | None
):
    """Assign identity values to columns the batch omits and validate
    explicit values; returns ``(df, hwm_updates)`` where ``hwm_updates``
    maps column -> new high-water mark the commit must re-emit (empty
    when the table has no identity columns or nothing advanced).

    Scale shape: one ``localCheckpoint`` pins the batch (freezing the
    nondeterministic partition ids so the count pass and the assignment
    pass agree), one tiny per-partition-count aggregate (|partitions|
    rows to the driver — bounded by the batch's task count, not its
    rows), then values come from a broadcast offsets join: each
    partition gets a contiguous block past the mark, exactly the
    reservation scheme Delta writers use per task. No data shuffle."""
    specs = _identity_specs((meta or {}).get("schema"))
    if not specs:
        return df, {}
    from pyspark.sql import functions as F

    updates: dict[str, int] = {}
    to_generate: dict[str, dict] = {}
    explicit_aggs = []
    for col, spec in specs.items():
        if col in df.columns:
            if not spec["allow_explicit"]:
                raise ValueError(
                    f"identity column {col!r} is GENERATED ALWAYS; the "
                    "batch must not provide it"
                )
            explicit_aggs.append(
                (F.max(col) if spec["step"] > 0 else F.min(col)).alias(col)
            )
        else:
            to_generate[col] = spec

    if to_generate:
        df = df.withColumn(
            "_id_mid", F.monotonically_increasing_id()
        ).localCheckpoint()
        pid = F.shiftright("_id_mid", _PARTITION_ID_BITS)
        counts = sorted(
            df.groupBy(pid.alias("_id_pid"))
            .agg(F.count(F.lit(1)).alias("_id_cnt"))
            .collect(),
            key=lambda r: r["_id_pid"],
        )
        offsets, acc = [], 0
        for r in counts:
            offsets.append((int(r["_id_pid"]), acc))
            acc += int(r["_id_cnt"])
        off_df = spark.createDataFrame(
            offsets or [(0, 0)], "_id_pid long, _id_off long"
        )
        df = df.join(
            F.broadcast(off_df),
            pid == F.col("_id_pid"),
            "left",
        ).drop("_id_pid")
        local = F.col("_id_mid").bitwiseAND(
            F.lit((1 << _PARTITION_ID_BITS) - 1)
        )
        for col, spec in to_generate.items():
            base = spec["hwm"]
            if base is None:
                base = spec["start"] - spec["step"]
            value = (
                F.lit(base)
                + F.lit(spec["step"]) * (F.col("_id_off") + local + F.lit(1))
            ).cast("long")
            # the offsets join covers every partition id by construction,
            # so the value is never null — coalesce restores the
            # non-nullable flag the join's schema lost (the logged column
            # may be NOT NULL and the append comparison is nullability-
            # sensitive)
            df = df.withColumn(col, F.coalesce(value, F.lit(0).cast("long")))
            if acc > 0:
                updates[col] = base + spec["step"] * acc
        df = df.drop("_id_mid", "_id_off")

    if explicit_aggs:
        row = df.agg(*explicit_aggs).collect()[0]
        for col, spec in specs.items():
            if col not in df.columns or col in to_generate:
                continue
            if row[col] is None:
                continue
            seen = int(row[col])
            hwm = spec["hwm"]
            if hwm is None:
                hwm = spec["start"] - spec["step"]
            if (spec["step"] > 0 and seen > hwm) or (
                spec["step"] < 0 and seen < hwm
            ):
                updates[col] = seen

    if to_generate:
        # withColumn appended the filled columns at the END; restore the
        # logged field order so the append-schema comparison (which is
        # order-sensitive) sees the table's own shape
        logged_order = [
            f["name"] for f in (meta or {}).get("schema", {}).get("fields", [])
        ]
        if set(df.columns) == set(logged_order):
            df = df.select(*logged_order)
    return df, updates


def _constraint_aggs(spark: SparkSession, df: DataFrame, table_path: str):
    """(aggregate columns, checks, not_null, gens) folding every CHECK
    constraint / non-nullable logged column / generated-column equation
    into one set of violation-count aggregates — or None when the table
    declares nothing to validate."""
    from pyspark.sql import functions as F

    from delta_lake_health_spark.sources.delta_log import DeltaLog

    if current_version(table_path) < 0:
        return None
    meta = DeltaLog(spark, table_path).metadata()
    checks = {
        k[len("delta.constraints."):]: v
        for k, v in meta.get("configuration", {}).items()
        if k.startswith("delta.constraints.")
    }
    not_null = [
        f["name"]
        for f in (meta.get("schema") or {}).get("fields", [])
        if f.get("nullable") is False and f["name"] in df.columns
    ]
    gens = {
        c: expr
        for c, expr in _generated_columns(meta.get("schema")).items()
        if c in df.columns
    }
    if not checks and not not_null and not gens:
        return None
    aggs = [
        F.sum(F.when(~F.expr(expr), 1).otherwise(0)).alias(f"c_{name}")
        for name, expr in checks.items()
    ] + [
        F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"n_{c}")
        for c in not_null
    ] + [
        F.sum(
            F.when(~F.col(c).eqNullSafe(F.expr(expr)), 1).otherwise(0)
        ).alias(f"g_{c}")
        for c, expr in gens.items()
    ]
    return aggs, checks, not_null, gens


def _raise_constraint_violations(row, checks, not_null, gens) -> None:
    """Raise on any nonzero violation count; ``row`` supports both the
    Row of a standalone aggregate and the dict an Observation yields."""
    get = row.get if isinstance(row, dict) else row.__getitem__
    for name, expr in checks.items():
        n = get(f"c_{name}") or 0
        if n:
            raise ValueError(
                f"CHECK constraint {name!r} violated by {n} row(s): ({expr})"
            )
    for c in not_null:
        n = get(f"n_{c}") or 0
        if n:
            raise ValueError(f"NOT NULL constraint violated: {c} has {n} null(s)")
    for c, expr in gens.items():
        n = get(f"g_{c}") or 0
        if n:
            raise ValueError(
                f"generated column {c!r} has {n} row(s) disagreeing with ({expr})"
            )


def _validate_constraints(spark: SparkSession, df: DataFrame, table_path: str):
    """One pass over the batch being written (NOT the table): every CHECK
    constraint and every non-nullable logged column is folded into a
    single aggregate of violation counts — map-side partials, one tiny
    shuffle, regardless of how many constraints exist. (``write()`` fuses
    this into the data-write job via Observation instead — r14; the
    standalone pass remains for the update/merge/copy-into rewrites.)"""
    agg = _constraint_aggs(spark, df, table_path)
    if agg is None:
        return
    aggs, checks, not_null, gens = agg
    row = df.agg(*aggs).collect()[0]
    _raise_constraint_violations(row, checks, not_null, gens)


def _schema_has_variant(dt) -> bool:
    """True when ``dt`` (a DataType or StructType) contains a
    VariantType anywhere — top-level, nested in structs, or inside
    array/map element types."""
    from pyspark.sql import types as T

    if isinstance(dt, T.VariantType):
        return True
    if isinstance(dt, T.StructType):
        return any(_schema_has_variant(f.dataType) for f in dt.fields)
    if isinstance(dt, T.ArrayType):
        return _schema_has_variant(dt.elementType)
    if isinstance(dt, T.MapType):
        return _schema_has_variant(dt.keyType) or _schema_has_variant(
            dt.valueType
        )
    return False


def write(
    spark: SparkSession,
    df: DataFrame,
    table_path: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
    merge_schema: bool = False,
    max_commit_retries: int = 10,
    txn_app_id: str | None = None,
    txn_version: int | None = None,
    checkpoint_interval: int | None = None,
    cluster_by: list[str] | None = None,
) -> int:
    """Write ``df`` as a new Delta commit; returns the committed version.

    ``cluster_by`` range-partitions and sorts the batch by the given
    columns BEFORE writing (Delta's optimized/clustered ingest): each
    output file then covers a narrow, mostly-disjoint range of the
    cluster key, so the per-file min/max stats prune sharply from the
    first write — no OPTIMIZE ZORDER rewrite needed for the common
    single-key access path. One extra range shuffle per batch.

    Idempotent replay guard: with ``txn_app_id``/``txn_version`` set the
    commit carries a ``txn`` action (Delta spec), and a write whose
    version is at or below the last recorded one for that appId is
    SKIPPED (returns the current version, writes nothing) — this is what
    makes a restarted streaming sink exactly-once instead of
    duplicate-on-replay. The guard is rechecked inside the commit retry
    loop so a concurrent attempt of the same batch cannot double-commit.

    Schema handling: an append whose schema differs from the logged one
    raises unless ``merge_schema=True``, which widens the table schema
    (old columns keep their types, new columns append; old files read as
    null for new columns via the logged read schema in ``snapshot``).

    Concurrency: the data files are written once; the commit step is an
    optimistic put-if-absent retried up to ``max_commit_retries`` times
    with the version (and, for overwrite, the remove set) recomputed per
    attempt — the standard Delta optimistic-concurrency loop. On a local
    FS the file-set diff below is not concurrency-safe for simultaneous
    writers to the SAME directory tree; the retry protects the log, which
    is where real log stores (put-if-absent object stores) draw the line.
    """
    partition_by = list(partition_by or [])
    if mode not in ("append", "overwrite"):
        raise ValueError(f"bad mode {mode!r}")
    if (txn_app_id is None) != (txn_version is None):
        raise ValueError("txn_app_id and txn_version must be set together")
    _require_writable(spark, table_path)
    version = current_version(table_path)

    def _already_committed() -> bool:
        if txn_app_id is None or current_version(table_path) < 0:
            return False
        from delta_lake_health_spark.sources.delta_log import DeltaLog

        last = DeltaLog(spark, table_path).last_txn_version(txn_app_id)
        return last is not None and txn_version <= last

    if _already_committed():
        return current_version(table_path)

    def _logged_meta():
        if current_version(table_path) < 0:
            return None
        from delta_lake_health_spark.sources.delta_log import DeltaLog

        return DeltaLog(spark, table_path).metadata()

    schema_changed = False
    merged_schema: dict | None = None
    hwm_updates: dict[str, int] = {}
    meta_at_validation = _logged_meta()
    logged_schema = (meta_at_validation or {}).get("schema")
    if version >= 0:
        # writes inherit the table's partition layout: unpartitioned
        # files appended into a hive-partitioned table would be invisible
        # to the partition-injecting snapshot reader (silent data loss),
        # and a CONFLICTING layout on append corrupts partition pruning
        logged_parts = (meta_at_validation or {}).get(
            "partition_columns"
        ) or []
        if not partition_by:
            partition_by = list(logged_parts)
        elif mode == "append" and list(partition_by) != list(logged_parts):
            raise ValueError(
                f"append partitioned by {partition_by}, but the table is "
                f"partitioned by {logged_parts}"
            )
        # defaults BEFORE generated columns: a generation expression may
        # reference a defaulted column the batch omitted
        df = _fill_default_columns(spark, df, meta_at_validation)
        df = _fill_generated_columns(spark, df, table_path)
        df, hwm_updates = _fill_identity_columns(
            spark, df, table_path, meta_at_validation
        )
        if mode == "append":
            df, schema_changed, merged_schema = _merge_append_schema(
                spark, df, table_path, merge_schema
            )
        else:
            schema_changed = (
                logged_schema is not None
                and _norm_fields(logged_schema)
                != _norm_fields(json.loads(df.schema.json()))
            )
            if list(partition_by) != list(logged_parts):
                # overwrite may re-layout the table, but then the
                # metaData action must be re-emitted with the new
                # partitionColumns or readers keep injecting the old ones
                schema_changed = True

    # constraint validation FUSED into the data-write job (r14, guide
    # §2.4: remove a whole batch pass): the violation-count aggregates
    # ride as an Observation on the plan that the parquet write
    # executes; the counts are checked after the write and BEFORE the
    # commit, so a violating batch still never commits (its uncommitted
    # files are unlinked below — same no-debris outcome as the old
    # standalone pre-pass, one batch scan cheaper).
    constraint_check = _constraint_aggs(spark, df, table_path)
    constraint_obs = None
    if constraint_check is not None:
        from pyspark.sql import Observation

        constraint_obs = Observation()
        df = df.observe(constraint_obs, *constraint_check[0])
    if cluster_by is None and version >= 0:
        # liquid clustering: a clustered table's declared columns apply
        # to every ingest that doesn't choose its own layout (skipped
        # when a schema-replacing overwrite dropped a declared column)
        declared = clustering_columns(table_path)
        if declared and all(c in df.columns for c in declared):
            cluster_by = declared
    if cluster_by:
        # BEFORE _to_physical: cluster columns are LOGICAL names (a
        # renamed table's physical names would not resolve). Partition
        # count follows the incoming batch, not the shuffle default —
        # inheriting 200 would shred a small batch into tiny files.
        n_out = max(1, df.rdd.getNumPartitions())
        df = df.repartitionByRange(n_out, *cluster_by).sortWithinPartitions(
            *cluster_by
        )
    if not (mode == "overwrite" and schema_changed):
        # files carry physical names; a schema-REPLACING overwrite resets
        # the mapping (its metaData is re-emitted from the new df schema)
        df = _to_physical(spark, df, table_path)
    if version >= 0 and cluster_by is None:
        # delta.autoOptimize.optimizeWrite: size the batch's output
        # partition count to the target file size BEFORE writing, so
        # many-partition small batches don't shred into small files at
        # ingest (the pre-write shuffle Delta's Optimized Write runs).
        # Bytes/row comes from the table's own live add stats
        # (metadata-scale); cost = one count() pass over the batch, paid
        # only when the property is set. Only ever coalesces DOWN —
        # a genuinely large batch keeps its parallelism.
        ow = str(
            (meta_at_validation or {}).get("configuration", {}).get(
                "delta.autoOptimize.optimizeWrite", ""
            )
        ).lower() == "true"
        if ow:
            from delta_lake_health_spark.sources.delta_log import DeltaLog

            adds_live = DeltaLog(spark, table_path).live_add_actions()
            tot_b = sum(a.get("size", 0) for a in adds_live)
            tot_r = sum(
                json.loads(a.get("stats") or "{}").get("numRecords", 0)
                for a in adds_live
            )
            bytes_per_row = (tot_b / tot_r) if tot_r else 100.0
            from delta_lake_health_spark.operators.maintenance import (
                _table_target_file_size,
            )

            target = _table_target_file_size(DeltaLog(spark, table_path))
            # Pin the batch before counting: without this the incoming
            # plan is evaluated twice (count + write) and a
            # nondeterministic upstream could size against stale counts.
            df = df.localCheckpoint(eager=True)
            n_rows = df.count()
            n_out = max(1, math.ceil(n_rows * bytes_per_row / target))
            if n_out < df.rdd.getNumPartitions():
                df = (
                    df.repartition(n_out, *partition_by)
                    if partition_by
                    else df.repartition(n_out)
                )
    # VARIANT columns gate the variantType table feature (reader+writer:
    # the shredded parquet encoding is unreadable without it). A real
    # type walk, not a schema-JSON substring test — a plain column
    # NAMED "variant" must not gate anything.
    needs_variant = _schema_has_variant(df.schema)

    before = _list_parquet_rel(table_path)
    writer = df.write.mode("append")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(table_path)
    new_files = sorted(_list_parquet_rel(table_path) - before)
    if constraint_obs is not None:
        _, checks, not_null, gens = constraint_check
        try:
            _raise_constraint_violations(
                constraint_obs.get, checks, not_null, gens
            )
        except Exception:
            for rel in new_files:  # violating batch leaves no debris
                try:
                    os.remove(os.path.join(table_path, rel))
                except OSError:
                    pass
            raise
    adds = [_add_action(table_path, rel) for rel in new_files]
    n_records = sum(json.loads(a["add"]["stats"])["numRecords"] for a in adds)

    for attempt in range(max_commit_retries + 1):
        removed: list[str] = []
        if mode == "overwrite" and version >= 0:
            _refuse_append_only(spark, table_path, "OVERWRITE")
            removed = [
                p for p in _active_rel_paths(spark, table_path)
                if p not in set(new_files)
            ]
        actions: list[dict] = []
        next_version = version + 1
        if next_version == 0:
            if needs_variant:
                actions.append(
                    {
                        "protocol": {
                            "minReaderVersion": 3,
                            "minWriterVersion": 7,
                            "readerFeatures": ["variantType"],
                            "writerFeatures": sorted(
                                {"appendOnly", "invariants", "variantType"}
                            ),
                        }
                    }
                )
            else:
                actions.append(
                    {"protocol": {"minReaderVersion": 1,
                                  "minWriterVersion": 2}}
                )
            actions.append(_metadata_action(df, partition_by))
        else:
            if needs_variant and (
                upgrade := _protocol_upgrade_action(
                    spark, table_path, "variantType"
                )
            ) is not None:
                actions.append(upgrade)
            if schema_changed:
                # schema-changing write: re-emit metaData so snapshot() of a
                # later-emptied table reconstructs the NEW schema; table id and
                # configuration (constraints) carry over from the current
                # metadata — re-emitting must not drop them. Identity marks
                # advanced by this very batch fold into the same action.
                if hwm_updates and merged_schema is not None:
                    merged_schema = {
                        **merged_schema,
                        "fields": _identity_fields(
                            {**meta_at_validation, "schema": merged_schema},
                            hwm_updates,
                        ),
                    }
                actions.append(
                    _metadata_action(
                        df, partition_by, merged_schema, existing=meta_at_validation
                    )
                )
            elif hwm_updates:
                # identity-only metaData re-emit: the schema shape is
                # unchanged, only the high-water marks moved — committing
                # them with the data is what makes concurrent identity
                # writers CONFLICT (metadata change) instead of silently
                # generating duplicate values
                actions.append(
                    _identity_metadata_action(
                        meta_at_validation,
                        _identity_fields(meta_at_validation, hwm_updates),
                    )
                )
        actions.extend(adds)
        now = int(time.time() * 1000)
        for rel in removed:
            actions.append(
                {"remove": {"path": rel, "deletionTimestamp": now,
                            "dataChange": True}}
            )
        if txn_app_id is not None:
            actions.append(
                {"txn": {"appId": txn_app_id, "version": txn_version,
                         "lastUpdated": now}}
            )
        actions.append(
            _commit_info(
                "WRITE",
                {"mode": "Overwrite" if mode == "overwrite" else "Append",
                 "partitionBy": json.dumps(partition_by)},
                {"numFiles": len(adds), "numOutputRows": n_records,
                 "numRemovedFiles": len(removed)},
            )
        )
        try:
            _commit(table_path, next_version, actions)
            if checkpoint_interval and next_version > 0 and (
                next_version % checkpoint_interval == 0
            ):
                # Delta's periodic checkpoint (delta.checkpointInterval):
                # fold the log so readers scan one parquet + a short tail
                # instead of every commit JSON
                from delta_lake_health_spark.sources.delta_log import DeltaLog

                DeltaLog(spark, table_path).checkpoint()
            # best-effort, CONTAINED: the data commit above already
            # succeeded, so a compaction that loses a concurrency race
            # must not bubble its RuntimeError into this retry loop —
            # that would re-commit the same add actions as a duplicate
            try:
                _maybe_auto_compact(spark, table_path, meta_at_validation)
            except RuntimeError:
                pass  # a later write's auto-compact picks the files up
            return next_version
        except RuntimeError:
            if attempt == max_commit_retries:
                raise
            version = current_version(table_path)
            if _already_committed():
                # the colliding commit was this very transaction (a
                # concurrent replay of the same batch) — don't double-write
                return version
            if _logged_meta() != meta_at_validation:
                # the winning commit changed the table metadata (schema
                # evolution, constraint add/drop, rename); this write's
                # alignment/validation/metaData re-emit all used the old
                # one — committing it would silently clobber the change
                raise RuntimeError(
                    "concurrent schema change during commit retry; "
                    "re-run the write against the new table schema"
                )
    raise AssertionError("unreachable")


def delete(spark: SparkSession, table_path: str, predicate: str) -> int:
    """Delete rows matching ``predicate`` (SQL string). Rewrites only the
    files that contain matching rows (file-pruned via a per-file match
    count), commits remove+add with operation DELETE."""
    _require_writable(spark, table_path)
    _refuse_append_only(spark, table_path, "DELETE")

    from pyspark.sql import functions as F

    from delta_lake_health_spark.sources.delta_log import DeltaLog

    log = DeltaLog(spark, table_path)
    base_version = current_version(table_path)
    read_files = {p.replace(os.sep, "/") for p in _active_rel_paths(spark, table_path)}
    snap = log.snapshot_with_positions()
    hit_files = {
        r._rel_path
        for r in snap.where(F.expr(predicate))
        .select("_rel_path")
        .distinct()
        .collect()
    }
    version = base_version
    if not hit_files:
        _commit(
            table_path,
            version + 1,
            [_commit_info("DELETE", {"predicate": predicate},
                          {"numRemovedFiles": 0, "numDeletedRows": 0})],
        )
        return version + 1

    cdc_rel: str | None = None
    if _cdf_enabled(log.metadata()):
        # read only the HIT files (DV-aware, like the survivor rewrite) —
        # filtering the full snapshot would make the change-data write
        # scan the table instead of ∝ |changed rows|
        change = (
            log.read_data_files(sorted(hit_files))
            .where(F.expr(predicate))
            .withColumn("_change_type", F.lit("delete"))
        )
        cdc_rel = _write_change_data(spark, table_path, change)

    # rewrite survivors of the hit files only, preserving partitioning;
    # DV-aware read so soft-deleted positions don't resurrect
    survivors = log.read_data_files(sorted(hit_files)).where(~F.expr(predicate))
    survivors = _to_physical(spark, survivors, table_path)
    partition_by = log.partition_columns()
    before = _list_parquet_rel(table_path)
    writer = survivors.write.mode("append")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(table_path)
    new_files = sorted(_list_parquet_rel(table_path) - before)

    now = int(time.time() * 1000)
    actions = [_add_action(table_path, rel) for rel in new_files]
    actions += [
        {"remove": {"path": rel.replace(os.sep, "/"), "deletionTimestamp": now,
                    "dataChange": True}}
        for rel in sorted(hit_files)
    ]
    if cdc_rel is not None:
        actions.append(_cdc_action(table_path, cdc_rel))
    actions.append(
        _commit_info("DELETE", {"predicate": predicate},
                     {"numRemovedFiles": len(hit_files),
                      "numAddedFiles": len(new_files)})
    )
    return commit_mutation(
        table_path,
        version,
        actions,
        read_files=read_files,
        removed_files={p.replace(os.sep, "/") for p in hit_files},
    )


def merge(
    spark: SparkSession,
    table_path: str,
    source: DataFrame,
    key_cols: list[str],
    txn_app_id: str | None = None,
    txn_version: int | None = None,
    not_matched_by_source_delete: str | None = None,
    ) -> int:
    """Upsert ``source`` into the table by ``key_cols`` (whole-row update
    on match, insert otherwise) — the MERGE operation the reference counts
    in history (delta_python_analyzer.py:168 ops_summary).

    ``not_matched_by_source_delete`` adds Delta's ``WHEN NOT MATCHED BY
    SOURCE THEN DELETE`` clause with a condition (SQL over target rows;
    ``"true"`` deletes every unmatched row): target rows with no key
    match in the source that satisfy it are deleted — the CDC full-sync
    shape ("source is the truth for the slice it covers", e.g. condition
    = the source's partition range). Only files actually containing such
    rows are rewritten, same pruning as the match side.

    Implementation: rewrite only the files containing matched keys (same
    file pruning as delete) or condition-qualified unmatched rows,
    dropping their matched/deleted rows, then append the full source.
    One distributed semi-join to find hit files, one rewrite job, one
    commit. Hit-file detection and the survivor read both go through the
    DV-aware log reader (``snapshot_with_positions`` /
    ``read_data_files``) — a plain ``snapshot()`` scan cannot resolve
    ``_metadata.file_path`` after its DV anti-join, and a raw parquet
    survivor read would resurrect soft-deleted rows into rewritten files.
    """
    _require_writable(spark, table_path)

    import time as _time

    from pyspark.sql import functions as F

    from delta_lake_health_spark.sources.delta_log import DeltaLog

    if (txn_app_id is None) != (txn_version is None):
        raise ValueError("txn_app_id and txn_version must be set together")
    log = DeltaLog(spark, table_path)
    if txn_app_id is not None:
        last = log.last_txn_version(txn_app_id)
        if last is not None and txn_version <= last:
            return current_version(table_path)  # replay of a committed batch
    base_version = current_version(table_path)
    read_files = {
        p.replace(os.sep, "/") for p in _active_rel_paths(spark, table_path)
    }
    source = _fill_generated_columns(spark, source, table_path)
    merge_meta = log.metadata()
    identity_updates: dict[str, int] = {}
    id_specs = _identity_specs(merge_meta.get("schema"))
    if id_specs:
        # MERGE is a whole-row upsert here: the source must carry every
        # column, so GENERATED ALWAYS identity (explicit values refused)
        # cannot be merged into; BY DEFAULT accepts the source's values
        # and the mark advances past them in this same commit.
        always = [c for c, s in id_specs.items() if not s["allow_explicit"]]
        if always:
            raise ValueError(
                f"cannot MERGE into GENERATED ALWAYS identity column(s) "
                f"{always}; declare them with allow_explicit_insert=True "
                "or use write()"
            )
        missing = [c for c in id_specs if c not in source.columns]
        if missing:
            raise ValueError(
                "MERGE is a whole-row upsert: the source must provide "
                f"the identity column(s) {missing}"
            )
        row = source.agg(
            *[
                (F.max(c) if s["step"] > 0 else F.min(c)).alias(c)
                for c, s in id_specs.items()
            ]
        ).collect()[0]
        for c, s in id_specs.items():
            if row[c] is None:
                continue
            seen = int(row[c])
            hwm = s["hwm"] if s["hwm"] is not None else s["start"] - s["step"]
            if (s["step"] > 0 and seen > hwm) or (s["step"] < 0 and seen < hwm):
                identity_updates[c] = seen
    _validate_constraints(spark, source, table_path)
    partition_by = log.partition_columns()
    keys = source.select(*key_cols).distinct()
    snap = log.snapshot_with_positions()
    hit_files = {
        r._rel_path
        for r in snap.join(F.broadcast(keys), key_cols, "left_semi")
        .select("_rel_path")
        .distinct()
        .collect()
    }
    if not_matched_by_source_delete is not None:
        # files holding unmatched rows the delete condition qualifies
        hit_files |= {
            r._rel_path
            for r in snap.join(F.broadcast(keys), key_cols, "left_anti")
            .where(F.expr(not_matched_by_source_delete))
            .select("_rel_path")
            .distinct()
            .collect()
        }

    if hit_files:
        # insert-only merges append; a file-removing merge is a data
        # removal and falls under the append-only refusal like UPDATE
        _refuse_append_only(spark, table_path, "MERGE (file-rewriting)")

    cdc_rel: str | None = None
    if _cdf_enabled(log.metadata()):
        # change rows, whole-row-update semantics: matched target rows
        # are preimages, their source rows postimages; unmatched source
        # rows are inserts; condition-qualified unmatched target rows
        # are deletes. All derived from frames already computed — one
        # extra narrow write ∝ |changed rows|.
        out_cols = [c for c in source.columns]
        tgt = snap.drop("_rel_path", "_row_index").select(*out_cols)
        matched_tgt = tgt.join(F.broadcast(keys), key_cols, "left_semi")
        matched_keys = matched_tgt.select(*key_cols).distinct()
        src_upd = source.select(*out_cols).join(
            F.broadcast(matched_keys), key_cols, "left_semi"
        )
        src_ins = source.select(*out_cols).join(
            F.broadcast(matched_keys), key_cols, "left_anti"
        )
        change = (
            matched_tgt.withColumn("_change_type", F.lit("update_preimage"))
            .unionByName(
                src_upd.withColumn("_change_type", F.lit("update_postimage"))
            )
            .unionByName(src_ins.withColumn("_change_type", F.lit("insert")))
        )
        if not_matched_by_source_delete is not None:
            deleted = (
                tgt.join(F.broadcast(keys), key_cols, "left_anti")
                .where(
                    F.coalesce(
                        F.expr(not_matched_by_source_delete), F.lit(False)
                    )
                )
                .withColumn("_change_type", F.lit("delete"))
            )
            change = change.unionByName(deleted)
        cdc_rel = _write_change_data(spark, table_path, change)

    before = _list_parquet_rel(table_path)
    if hit_files:
        survivors = log.read_data_files(sorted(hit_files)).join(
            F.broadcast(keys), key_cols, "left_anti"
        )
        if not_matched_by_source_delete is not None:
            # delete only when the condition is TRUE: a NULL condition
            # must keep the row (matching the hit-file detection above
            # and Delta's clause semantics) — bare ~expr would turn
            # NULL into filtered-out, i.e. silent data loss
            survivors = survivors.where(
                ~F.coalesce(
                    F.expr(not_matched_by_source_delete), F.lit(False)
                )
            )
        survivors = _to_physical(spark, survivors, table_path)
        writer = survivors.write.mode("append")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(table_path)
    src_writer = _to_physical(spark, source, table_path).write.mode("append")
    if partition_by:
        src_writer = src_writer.partitionBy(*partition_by)
    src_writer.parquet(table_path)
    new_files = sorted(_list_parquet_rel(table_path) - before)

    now = int(_time.time() * 1000)
    actions = [_add_action(table_path, rel) for rel in new_files]
    actions += [
        {"remove": {"path": rel.replace(os.sep, "/"), "deletionTimestamp": now,
                    "dataChange": True}}
        for rel in sorted(hit_files)
    ]
    if cdc_rel is not None:
        actions.append(_cdc_action(table_path, cdc_rel))
    if identity_updates:
        actions.append(
            _identity_metadata_action(
                merge_meta, _identity_fields(merge_meta, identity_updates)
            )
        )
    if txn_app_id is not None:
        actions.append(
            {"txn": {"appId": txn_app_id, "version": txn_version,
                     "lastUpdated": now}}
        )
    actions.append(
        _commit_info(
            "MERGE",
            {"matchedPredicate": json.dumps(key_cols)},
            {"numTargetFilesRemoved": len(hit_files),
             "numTargetFilesAdded": len(new_files)},
        )
    )
    return commit_mutation(
        table_path,
        base_version,
        actions,
        read_files=read_files,
        removed_files={p.replace(os.sep, "/") for p in hit_files},
    )


def clone_shallow(spark: SparkSession, source_path: str, target_path: str) -> int:
    """SHALLOW CLONE (Delta `CREATE TABLE ... SHALLOW CLONE src`): a new
    table whose v0 log references the source's live data files by
    ABSOLUTE path — zero data copied, metadata-only, O(|files|). The
    clone then evolves independently: writes/deletes/compactions land
    in the clone's own directory (copy-on-write — rewrites read the
    referenced source files but write locally), and vacuum on the clone
    never deletes source files because they live outside its directory
    listing. Readers resolve partition values from the LOG
    (``_read_with_logged_partitions``), since hive basePath inference
    can't span two directory trees.

    Refused when the source has deletion vectors still soft-deleting
    live rows: the clone's log can't reference the source's sidecars.
    ``apply_deletion_vectors`` on the source first."""
    from delta_lake_health_spark.sources.delta_log import DeltaLog

    src = DeltaLog(spark, source_path)
    if os.path.isdir(os.path.join(target_path, LOG_DIR)):
        raise ValueError(f"target is already a Delta table: {target_path}")
    if src._live_dv_paths(src.active_files()):
        raise ValueError(
            "shallow clone of a table with live deletion vectors is "
            "unsupported; run apply_deletion_vectors on the source first"
        )
    meta = src.metadata()
    if not meta.get("schema"):
        raise ValueError("source table has no logged schema")
    adds = src.live_add_actions()
    now = int(time.time() * 1000)
    actions: list[dict] = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {
            "metaData": {
                "id": str(uuid.uuid4()),
                "format": {"provider": "parquet", "options": {}},
                "schemaString": json.dumps(meta["schema"]),
                "partitionColumns": meta.get("partition_columns", []),
                "configuration": meta.get("configuration", {}),
                "createdTime": now,
            }
        },
    ]
    for a in adds:
        a = dict(a)
        if not os.path.isabs(a["path"]):
            a["path"] = os.path.join(src.table_path, a["path"])
        # the clone starts without rowTracking (fresh v0 protocol):
        # carrying the source's ids would collide with ids assigned from
        # the clone's own (empty) high-water mark after a later enable
        a.pop("baseRowId", None)
        a.pop("defaultRowCommitVersion", None)
        actions.append({"add": a})
    actions.append(
        _commit_info(
            "CLONE",
            {"source": src.table_path, "isShallow": True},
            {"numFiles": len(adds), "numCopiedFiles": 0},
        )
    )
    os.makedirs(target_path, exist_ok=True)
    _commit(target_path, 0, actions)
    return 0


def clone_deep(spark: SparkSession, source_path: str, target_path: str) -> int:
    """DEEP CLONE (Delta `CREATE TABLE ... CLONE src`): an independent
    table holding the source's CURRENT snapshot — every live data file
    (and every deletion-vector sidecar still masking one) is COPIED into
    the target directory, and a fresh v0 log references the copies by
    relative path. Unlike :func:`clone_shallow`, the result shares no
    storage with the source: either table can be vacuumed, overwritten,
    or deleted without affecting the other. It is also the standard way
    to MATERIALIZE a shallow clone (absolute source references become
    local copies). Add-action stats and partitionValues carry over
    verbatim — no stats recompute, no data scan beyond the byte copy.
    Row-tracking ids are stripped for the same reason as shallow clone
    (the clone's high-water mark starts empty). Scale shape: the log
    commit is O(|files|) metadata like shallow clone; the byte copy is
    the data-sized step and is embarrassingly parallel (one task per
    file on a cluster — there is no shuffle, no ordering constraint).

    DV sidecars are copied verbatim: their ``rel_path`` keys match the
    copied files' relative paths, so the clone's snapshot masks exactly
    the rows the source masks. Refused only when the source mixes live
    DVs with absolute-path adds (a materialization would change the
    paths the sidecars key on)."""
    from pyspark.sql import functions as F

    from delta_lake_health_spark.sources.delta_log import DeltaLog

    src = DeltaLog(spark, source_path)
    if os.path.isdir(os.path.join(target_path, LOG_DIR)):
        raise ValueError(f"target is already a Delta table: {target_path}")
    meta = src.metadata()
    if not meta.get("schema"):
        raise ValueError("source table has no logged schema")
    adds = src.live_add_actions()
    live_dvs = src._live_dv_paths(src.active_files())
    if live_dvs and any(os.path.isabs(a["path"]) for a in adds):
        raise ValueError(
            "deep clone of a table mixing live deletion vectors with "
            "absolute-path file references is unsupported; run "
            "apply_deletion_vectors on the source first"
        )

    def _target_rel(a: dict) -> str:
        p = a["path"]
        if not os.path.isabs(p):
            return p
        root = src.table_path.rstrip("/") + "/"
        if p.startswith(root):
            return p[len(root):]
        # foreign absolute reference (source is a shallow clone):
        # re-root under the hive layout its partitionValues imply
        parts = [
            f"{k}={a.get('partitionValues', {})[k]}"
            for k in meta.get("partition_columns", [])
            if (a.get("partitionValues") or {}).get(k) is not None
        ]
        return "/".join(parts + [os.path.basename(p)])

    os.makedirs(target_path, exist_ok=True)
    copied: list[tuple[dict, str]] = []
    seen: set[str] = set()
    for a in adds:
        rel = _target_rel(a).replace(os.sep, "/")
        if rel in seen:
            raise ValueError(f"deep clone target path collision: {rel}")
        seen.add(rel)
        src_abs = (
            a["path"]
            if os.path.isabs(a["path"])
            else os.path.join(src.table_path, a["path"])
        )
        dst_abs = os.path.join(target_path, rel)
        os.makedirs(os.path.dirname(dst_abs) or target_path, exist_ok=True)
        shutil.copy2(src_abs, dst_abs)
        copied.append((a, rel))
    dv_counts: dict[str, int] = {}
    if live_dvs:
        dv_acts = (
            src.actions()
            .where(F.col("dv").isNotNull())
            .select(F.col("dv.path").alias("p"),
                    F.col("dv.numDeletedRows").alias("n"))
            .collect()
        )
        n_by_path = {r.p: int(r.n) for r in dv_acts}
        for rel in live_dvs:
            dst_abs = os.path.join(target_path, rel)
            os.makedirs(os.path.dirname(dst_abs), exist_ok=True)
            src_abs = os.path.join(src.table_path, rel)
            if os.path.isdir(src_abs):  # sidecar written as a parquet dir
                shutil.copytree(src_abs, dst_abs)
            else:
                shutil.copy2(src_abs, dst_abs)
            dv_counts[rel] = n_by_path.get(rel, 0)

    now = int(time.time() * 1000)
    if live_dvs:
        protocol = {
            "minReaderVersion": 3,
            "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors"],
            "writerFeatures": sorted(
                set(_LEGACY_WRITER_FEATURES[2]) | {"deletionVectors"}
            ),
        }
    else:
        protocol = {"minReaderVersion": 1, "minWriterVersion": 2}
    actions: list[dict] = [
        {"protocol": protocol},
        {
            "metaData": {
                "id": str(uuid.uuid4()),
                "format": {"provider": "parquet", "options": {}},
                "schemaString": json.dumps(meta["schema"]),
                "partitionColumns": meta.get("partition_columns", []),
                "configuration": meta.get("configuration", {}),
                "createdTime": now,
            }
        },
    ]
    for a, rel in copied:
        a = dict(a)
        a["path"] = rel
        a.pop("baseRowId", None)
        a.pop("defaultRowCommitVersion", None)
        actions.append({"add": a})
    for rel, n in sorted(dv_counts.items()):
        actions.append({"dv": {"path": rel, "numDeletedRows": n}})
    actions.append(
        _commit_info(
            "CLONE",
            {"source": src.table_path, "isShallow": False},
            {"numFiles": len(copied), "numCopiedFiles": len(copied),
             "numCopiedDVs": len(dv_counts)},
        )
    )
    _commit(target_path, 0, actions)
    return 0


def convert_to_delta(
    spark: SparkSession, table_path: str, partition_by: list[str] | None = None
) -> int:
    """``CONVERT TO DELTA parquet.`path``` — in-place, metadata-only
    adoption of an existing plain-parquet directory: the data files stay
    exactly where they are; a v0 log is written that references them
    with footer-derived stats (numRecords + min/max per column, read
    from parquet FOOTERS — no data scan), so skipping and log-only
    health metrics work from the first query. Partition columns are
    declared via ``partition_by`` or inferred from the hive
    ``key=value`` directory layout (every file must agree on the key
    set — mixed layouts are refused, as Delta does). After conversion
    the table is a first-class Delta table: append/delete/time-travel/
    OPTIMIZE all apply. Scale shape: one footer read per file
    (parallelizable one-task-per-file on a cluster; no shuffle) and an
    O(|files|) metadata commit."""
    if os.path.isdir(os.path.join(table_path, LOG_DIR)):
        raise ValueError(f"already a Delta table: {table_path}")
    rels = sorted(_list_parquet_rel(table_path))
    if not rels:
        raise ValueError(f"no parquet data files under {table_path}")
    # hive partition keys, in directory order (from the deepest path so
    # nested layouts keep their level order)
    key_sets = {tuple(_partition_values(r)) for r in rels}
    if len(key_sets) > 1:
        raise ValueError(
            f"inconsistent hive partitioning across files: "
            f"{sorted(key_sets)}"
        )
    inferred = list(key_sets.pop())
    part_cols = list(partition_by) if partition_by is not None else inferred
    if set(part_cols) != set(inferred):
        raise ValueError(
            f"declared partition columns {part_cols} do not match the "
            f"directory layout {inferred}"
        )
    schema = spark.read.parquet(table_path).schema
    # converted variant data needs the same reader+writer gate a fresh
    # write would stamp — a (1,2) protocol over shredded variant files
    # would let non-variant engines read bytes they can't decode
    proto: dict = (
        {
            "minReaderVersion": 3,
            "minWriterVersion": 7,
            "readerFeatures": ["variantType"],
            "writerFeatures": sorted(
                {"appendOnly", "invariants", "variantType"}
            ),
        }
        if _schema_has_variant(schema)
        else {"minReaderVersion": 1, "minWriterVersion": 2}
    )
    actions: list[dict] = [
        {"protocol": proto},
        {
            "metaData": {
                "id": str(uuid.uuid4()),
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema.json(),
                "partitionColumns": part_cols,
                "configuration": {},
                "createdTime": int(time.time() * 1000),
            }
        },
    ]
    for rel in rels:
        actions.append(_add_action(table_path, rel))
    actions.append(
        _commit_info(
            "CONVERT",
            {"partitionedBy": json.dumps(part_cols)},
            {"numConvertedFiles": len(rels)},
        )
    )
    _commit(table_path, 0, actions)
    return 0


DELETES_DIR = "_deletes"


CHANGE_DATA_DIR = "_change_data"


def _cdf_enabled(meta: dict) -> bool:
    config = (meta or {}).get("configuration", {}) or {}
    return str(config.get("delta.enableChangeDataFeed", "")).lower() == "true"


def _cdc_action(table_path: str, rel: str) -> dict:
    return {
        "cdc": {
            "path": rel,
            "partitionValues": {},
            "size": os.path.getsize(os.path.join(table_path, rel)),
            "dataChange": False,
        }
    }


def _write_change_data(spark: SparkSession, table_path: str, change) -> str:
    """Write one commit's change-data parquet under ``_change_data/``
    (underscore-prefixed: excluded from data-file listings and from the
    folder walks, like ``_deletes``). Columns are the table's LOGICAL
    names at write time plus ``_change_type``; the CDF reader unions
    with allowMissingColumns, so files predating a later RENAME
    null-fill exactly like old data files do. Returns the relative
    path."""
    out_dir = os.path.join(table_path, CHANGE_DATA_DIR)
    os.makedirs(out_dir, exist_ok=True)
    tmp = os.path.join(out_dir, f".cdc-tmp-{uuid.uuid4().hex}")
    change.coalesce(1).write.parquet(tmp)
    part = next(
        f for f in sorted(os.listdir(tmp)) if f.endswith(".parquet")
    )
    rel = f"{CHANGE_DATA_DIR}/cdc-{uuid.uuid4().hex}.parquet"
    os.rename(os.path.join(tmp, part), os.path.join(table_path, rel))
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    return rel


def _latest_add_fields(log, paths: set[str]) -> dict[str, dict]:
    """Per path, the preserved fields of its latest add action (tags,
    baseRowId, defaultRowCommitVersion) — what a metadata-only re-add
    must carry forward so backfills can't silently destroy ZCUBE
    membership or row-id stability."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    if not paths:
        return {}
    adds = (
        log.actions()
        .where(F.col("add").isNotNull() & F.col("add.path").isin(list(paths)))
        .select(
            F.col("add.path").alias("p"),
            F.col("add.tags").alias("tags"),
            F.col("add.baseRowId").alias("base"),
            F.col("add.defaultRowCommitVersion").alias("dcv"),
            "version",
        )
    )
    w = Window.partitionBy("p").orderBy(F.desc("version"))
    out: dict[str, dict] = {}
    for r in (
        adds.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .collect()
    ):
        keep: dict = {}
        if r.tags:
            keep["tags"] = dict(r.tags)
        if r.base is not None:
            keep["baseRowId"] = int(r.base)
            if r.dcv is not None:
                keep["defaultRowCommitVersion"] = int(r.dcv)
        out[r.p] = keep
    return out


def enable_row_tracking(spark: SparkSession, table_path: str) -> int:
    """Enable Delta row tracking (writer feature ``rowTracking``): every
    subsequent commit's add actions carry ``baseRowId`` /
    ``defaultRowCommitVersion`` (assigned centrally in ``_commit``), and
    the ``delta.rowTracking`` domainMetadata tracks the id high-water
    mark. Existing live files are BACKFILLED in a second commit
    (dataChange=false re-adds), so ``DeltaLog.row_ids()`` resolves an id
    for every row immediately.

    Scope note (fresh vs stable ids, Delta spec): ids here are FRESH row
    ids — stable under appends and DV soft-deletes, REASSIGNED by
    file-rewriting operations (OPTIMIZE / UPDATE / MERGE rewrite);
    stable-id materialization into a physical column is not implemented.
    Returns the version of the backfill (or upgrade) commit."""
    _require_writable(spark, table_path)

    from pyspark.sql import functions as F

    from delta_lake_health_spark.sources.delta_log import DeltaLog

    upgrade = _protocol_upgrade_action(spark, table_path, "rowTracking")
    if upgrade is not None:
        _commit(
            table_path,
            current_version(table_path) + 1,
            [
                upgrade,
                _commit_info(
                    "UPGRADE PROTOCOL",
                    {"feature": "rowTracking"},
                    {},
                ),
            ],
        )
    # backfill: re-add live files that predate row tracking so every
    # current row resolves an id (assignment happens inside _commit)
    log = DeltaLog(spark, table_path)
    adds = (
        log.actions()
        .where(F.col("add").isNotNull())
        .select(
            F.col("add.path").alias("_p"),
            F.col("add.baseRowId").alias("_base"),
            "version",
        )
    )
    live = log.active_files().select(
        F.col("path").alias("_p"), F.col("version").alias("_v")
    )
    need = [
        r._p
        for r in adds.join(
            live,
            (adds["_p"] == live["_p"]) & (F.col("version") == F.col("_v")),
            "left_semi",
        )
        .where(F.col("_base").isNull())
        .select("_p")
        .collect()
    ]
    version = current_version(table_path)
    if not need:
        return version
    # re-add paired with a same-version remove: add outranks remove at
    # the same version (the documented add-wins rule), so the file stays
    # live while the incremental .crc checksum nets to zero instead of
    # double-counting the re-added bytes
    now = int(time.time() * 1000)
    carried = _latest_add_fields(log, set(need))
    actions: list[dict] = []
    for rel in sorted(need):
        a = _add_action(table_path, rel, data_change=False)
        # the re-add must not destroy the file's existing tags (ZCUBE
        # membership for incremental z-order rides there)
        tags = carried.get(rel, {}).get("tags")
        if tags:
            a["add"]["tags"] = tags
        actions.append(a)
    actions += [
        {"remove": {"path": rel.replace(os.sep, "/"),
                    "deletionTimestamp": now, "dataChange": False}}
        for rel in sorted(need)
    ]
    actions.append(
        _commit_info(
            "ROW TRACKING BACKFILL",
            {},
            {"numBackfilledFiles": len(need)},
        )
    )
    _commit(table_path, version + 1, actions)
    return version + 1


def delete_with_dv(spark: SparkSession, table_path: str, predicate: str) -> int:
    """DELETE via a deletion vector: soft-delete the matching row
    POSITIONS in a position-delete sidecar instead of rewriting data
    files (Iceberg-style position deletes; the Delta spec's DV feature
    with a parquet sidecar in place of the roaring bitmap).

    Commit = one tiny sidecar (rel_path, row_index per deleted row) + a
    ``dv`` action. ``DeltaLog.snapshot`` anti-joins the positions back;
    ``maintenance.apply_deletion_vectors`` later rewrites the affected
    files and retires the vectors. At 100 TB this turns a delete that
    touches 1% of rows in every file from a full-table rewrite into a
    |deleted rows|-sized append."""
    _require_writable(spark, table_path)
    _refuse_append_only(spark, table_path, "DELETE (deletion vector)")

    from pyspark.sql import functions as F

    from delta_lake_health_spark.sources.delta_log import DeltaLog

    log = DeltaLog(spark, table_path)
    version = current_version(table_path)
    read_files = {
        p.replace(os.sep, "/") for p in _active_rel_paths(spark, table_path)
    }
    hits = (
        log.snapshot_with_positions()
        .where(F.expr(predicate))
        .select(
            F.col("_rel_path").alias("rel_path"),
            F.col("_row_index").alias("row_index"),
        )
    )
    n = hits.count()
    if n == 0:
        _commit(
            table_path,
            version + 1,
            [_commit_info("DELETE", {"predicate": predicate, "mode": "dv"},
                          {"numDeletedRows": 0})],
        )
        return version + 1
    dv_rel = f"{DELETES_DIR}/dv-{version + 1:020d}"
    hits.coalesce(1).write.parquet(os.path.join(table_path, dv_rel))
    cdc_actions: list[dict] = []
    if _cdf_enabled(log.metadata()):
        # restrict to the files the hit positions live in (∝ |changed
        # rows|, not table size); read_data_files is DV-aware, so rows
        # already soft-deleted earlier are not re-reported
        hit_rels = sorted(
            {r.rel_path for r in hits.select("rel_path").distinct().collect()}
        )
        change = (
            log.read_data_files(hit_rels)
            .where(F.expr(predicate))
            .withColumn("_change_type", F.lit("delete"))
        )
        cdc_actions = [
            _cdc_action(table_path, _write_change_data(spark, table_path, change))
        ]
    # first DV on this table: the same commit upgrades the protocol to
    # the table-features form with deletionVectors enumerated, so
    # conforming readers without DV support refuse instead of reading
    # soft-deleted rows back
    upgrade = _protocol_upgrade_action(spark, table_path, "deletionVectors")
    return commit_mutation(
        table_path,
        version,
        ([upgrade] if upgrade else [])
        + [
            {"dv": {"path": dv_rel, "numDeletedRows": n}},
            *cdc_actions,
            _commit_info("DELETE", {"predicate": predicate, "mode": "dv"},
                         {"numDeletedRows": n, "numRewrittenFiles": 0}),
        ],
        read_files=read_files,
    )


def update(
    spark: SparkSession,
    table_path: str,
    predicate: str,
    set_exprs: dict[str, str],
) -> int:
    """UPDATE rows matching ``predicate``: every RHS in ``set_exprs``
    (column -> SQL expression) is evaluated against the OLD row (standard
    SQL UPDATE semantics — assignments never see each other), only the
    files containing matches are rewritten, and the commit is
    remove+add with operation UPDATE, mirroring Delta's copy-on-write
    UPDATE. Generated columns are recomputed from their expressions after
    the assignment (updating one directly is refused), and CHECK / NOT
    NULL constraints validate the rewritten batch. With
    ``delta.enableChangeDataFeed`` set the commit carries a change-data
    file (true update_preimage/postimage rows); without it the feed
    reconstructs the commit as delete+insert pairs for the touched
    files, same as Delta's UPDATE without CDF."""
    _require_writable(spark, table_path)
    _refuse_append_only(spark, table_path, "UPDATE")

    from pyspark.sql import functions as F

    from delta_lake_health_spark.sources.delta_log import DeltaLog

    log = DeltaLog(spark, table_path)
    meta = log.metadata()
    gens = _generated_columns(meta.get("schema"))
    idents = _identity_specs(meta.get("schema"))
    for col in set_exprs:
        if col in gens:
            raise ValueError(
                f"column {col!r} is generated ({gens[col]!r}); it is "
                "recomputed automatically and cannot be assigned"
            )
        if col in idents:
            raise ValueError(
                f"column {col!r} is an identity column and cannot be "
                "assigned by UPDATE (Delta identity semantics)"
            )
    version = current_version(table_path)
    read_files = {
        p.replace(os.sep, "/") for p in _active_rel_paths(spark, table_path)
    }
    snap = log.snapshot_with_positions()
    hit_files = {
        r._rel_path
        for r in snap.where(F.expr(predicate))
        .select("_rel_path")
        .distinct()
        .collect()
    }
    if not hit_files:
        _commit(
            table_path,
            version + 1,
            [_commit_info("UPDATE", {"predicate": predicate},
                          {"numRemovedFiles": 0, "numUpdatedRows": 0})],
        )
        return version + 1

    df = log.read_data_files(sorted(hit_files))
    for col in set_exprs:
        if col not in df.columns:
            raise ValueError(f"unknown column {col!r}")
    cond = F.expr(predicate)
    dtypes = dict(df.dtypes)
    rewritten = df.select(
        *[
            (
                F.when(cond, F.expr(set_exprs[c]).cast(dtypes[c]))
                .otherwise(F.col(c))
                .alias(c)
                if c in set_exprs
                else F.col(c)
            )
            for c in df.columns
        ]
    )
    for gcol, gexpr in gens.items():
        rewritten = rewritten.withColumn(
            gcol, F.expr(gexpr).cast(dtypes[gcol])
        )
    _validate_constraints(spark, rewritten, table_path)
    n_updated = df.where(cond).count()

    # CDF (Delta spec cdc action): with delta.enableChangeDataFeed set,
    # the commit carries a _change_data file holding exactly the changed
    # rows as update_preimage / update_postimage — so the feed reports
    # true row-level updates instead of delete+insert pairs for every
    # row of the rewritten files. Work ∝ |matched rows|, not file size.
    cdc_rel: str | None = None
    if _cdf_enabled(meta):
        matched = df.where(cond)
        post = matched.select(
            *[
                (
                    F.expr(set_exprs[c]).cast(dtypes[c]).alias(c)
                    if c in set_exprs
                    else F.col(c)
                )
                for c in df.columns
            ]
        )
        for gcol, gexpr in gens.items():
            post = post.withColumn(gcol, F.expr(gexpr).cast(dtypes[gcol]))
        change = matched.withColumn(
            "_change_type", F.lit("update_preimage")
        ).unionByName(post.withColumn("_change_type", F.lit("update_postimage")))
        cdc_rel = _write_change_data(spark, table_path, change)

    rewritten = _to_physical(spark, rewritten, table_path)
    partition_by = log.partition_columns()
    before = _list_parquet_rel(table_path)
    writer = rewritten.write.mode("append")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(table_path)
    new_files = sorted(_list_parquet_rel(table_path) - before)

    now = int(time.time() * 1000)
    actions = [_add_action(table_path, rel) for rel in new_files]
    actions += [
        {"remove": {"path": rel.replace(os.sep, "/"), "deletionTimestamp": now,
                    "dataChange": True}}
        for rel in sorted(hit_files)
    ]
    if cdc_rel is not None:
        actions.append(_cdc_action(table_path, cdc_rel))
    actions.append(
        _commit_info("UPDATE", {"predicate": predicate},
                     {"numRemovedFiles": len(hit_files),
                      "numAddedFiles": len(new_files),
                      "numUpdatedRows": n_updated})
    )
    return commit_mutation(
        table_path,
        version,
        actions,
        read_files=read_files,
        removed_files={p.replace(os.sep, "/") for p in hit_files},
    )


# --------------------------------------------------------------------------
# Optimistic-concurrency conflict detection for read-modify-write commits
# (the Delta conflict matrix). Blind appends retry freely (write() above);
# DELETE / UPDATE / MERGE / DV-delete read a snapshot, so a commit that
# lands between their read and their commit must be CHECKED, not blindly
# rebased:
#
#   winner action                 loser op outcome
#   -----------------------------------------------------------------
#   metaData / protocol change    MetadataChangedException
#   removed a file we removed     ConcurrentDeleteDeleteException
#   removed a file we read        ConcurrentDeleteReadException
#   added data files              ConcurrentAppendException (the new rows
#                                 might match our predicate — Serializable)
#   txn / commitInfo only         safe: rebase to the next version
#
# Exception names mirror delta-io/delta's org.apache.spark.sql.delta.


class ConcurrentWriteConflict(RuntimeError):
    pass


class MetadataChangedException(ConcurrentWriteConflict):
    pass


class ConcurrentAppendException(ConcurrentWriteConflict):
    pass


class ConcurrentDeleteReadException(ConcurrentWriteConflict):
    pass


class ConcurrentDeleteDeleteException(ConcurrentWriteConflict):
    pass


def _version_actions(table_path: str, version: int) -> list[dict]:
    with open(_log_path(table_path, version)) as fh:
        return [json.loads(line) for line in fh if line.strip()]


def check_commit_conflicts(
    table_path: str,
    base_version: int,
    read_files: set[str],
    removed_files: set[str],
) -> int:
    """Validate the commits that landed after ``base_version`` against
    this operation's read/remove sets (driver-side, |interleaved actions|
    work). Returns the rebased commit version to use, or raises the
    matching conflict exception."""
    current = current_version(table_path)
    for v in range(base_version + 1, current + 1):
        for act in _version_actions(table_path, v):
            if "metaData" in act or "protocol" in act:
                raise MetadataChangedException(
                    f"version {v} changed table metadata/protocol"
                )
            if "remove" in act:
                p = act["remove"]["path"]
                if p in removed_files:
                    raise ConcurrentDeleteDeleteException(
                        f"version {v} also removed {p}"
                    )
                if p in read_files:
                    raise ConcurrentDeleteReadException(
                        f"version {v} removed {p}, which this operation read"
                    )
            if "add" in act and act["add"].get("dataChange"):
                raise ConcurrentAppendException(
                    f"version {v} added data files that may match this "
                    "operation's predicate"
                )
            if "dv" in act:
                raise ConcurrentDeleteReadException(
                    f"version {v} committed a deletion vector over files "
                    "this operation may have read"
                )
    return current + 1


def commit_mutation(
    table_path: str,
    base_version: int,
    actions: list[dict],
    read_files: set[str] | None = None,
    removed_files: set[str] | None = None,
    max_retries: int = 10,
) -> int:
    """Put-if-absent commit for a read-modify-write operation: on a
    version collision, run the conflict matrix over the interleaved
    commits and either rebase (safe winners only: txn/commitInfo-only
    commits, e.g. replay-guard markers) or raise the typed conflict."""
    read_files = read_files or set()
    removed_files = removed_files or set()
    version = base_version + 1
    for _ in range(max_retries):
        try:
            _commit(table_path, version, actions)
            return version
        except RuntimeError as ex:
            if "concurrent commit" not in str(ex):
                raise
            version = check_commit_conflicts(
                table_path, base_version, read_files, removed_files
            )
    raise RuntimeError(f"commit contention after {max_retries} retries")


COPY_INTO_DOMAIN = "delta.copyInto"


def copy_into(
    spark: SparkSession,
    table_path: str,
    source_dir: str,
    pattern: str = "*.parquet",
) -> dict:
    """``COPY INTO``: idempotent bulk ingest of external parquet files.
    Each source file is identified by (name, size, mtime-ns); the set of
    already-loaded identities lives in a ``domainMetadata`` action
    (``delta.copyInto``, keyed per source directory) and the data adds,
    the updated loaded-set, and the commitInfo land in ONE commit — so a
    replay after any crash either sees the file already in the loaded
    set (skipped) or re-attempts the whole batch atomically. Exactly
    Databricks COPY INTO's contract: files are never double-loaded, new
    files in a growing directory load incrementally.

    Scale: the loaded-set is |ingested files| metadata (the same planning
    cost every Delta log operation carries); reading the new files is a
    distributed scan; nothing else scales with table size.
    Returns ``{"numLoadedFiles", "numSkippedFiles", "version"}``.
    """
    import glob as _glob

    _require_writable(spark, table_path)
    from delta_lake_health_spark.sources.delta_log import DeltaLog

    log = DeltaLog(spark, table_path)
    meta = log.metadata()
    logical_cols = [f["name"] for f in (meta.get("schema") or {})["fields"]]
    partition_by = meta.get("partition_columns") or []

    src_key = os.path.abspath(source_dir)
    cfg = log.domain_metadata(COPY_INTO_DOMAIN) or {}
    loaded: dict = dict(cfg.get(src_key, {}))

    candidates = sorted(_glob.glob(os.path.join(source_dir, pattern)))
    new_paths = []
    upgraded = 0
    # Legacy (pre-ns) loaded-sets hold size:mtime-ms. The old ms value
    # may have been derived either as int(st_mtime * 1000) (float
    # rounding) or st_mtime_ns // 1e6, which can disagree by 1 ms for
    # some mtimes — accept size + ms within ±1 ms so neither derivation
    # silently re-ingests an already-loaded file. A ms value is always
    # < 1e15 (epoch ms ≈ 1.7e12 vs epoch ns ≈ 1.7e18), so legacy and ns
    # identities cannot be confused.
    def _is_legacy_match(recorded: str, st) -> bool:
        size_s, _, val_s = (recorded or "").partition(":")
        if not val_s.lstrip("-").isdigit():
            return False
        val = int(val_s)
        return (
            size_s == str(st.st_size)
            and val < 10**15
            and abs(val - st.st_mtime_ns // 1_000_000) <= 1
        )

    for p in candidates:
        st = os.stat(p)
        # Full-nanosecond mtime: a file rewritten with different content
        # but identical size within the same millisecond must re-ingest.
        ident = f"{st.st_size}:{st.st_mtime_ns}"
        name = os.path.basename(p)
        recorded = loaded.get(name)
        if recorded == ident:
            continue
        if recorded is not None and _is_legacy_match(recorded, st):
            loaded[name] = ident
            upgraded += 1
            continue
        new_paths.append((p, name, ident))
    if not new_paths:
        if upgraded:
            # Persist the ns-upgraded entries NOW (a metadata-only
            # commit) instead of re-deriving them on every run until a
            # new file happens to arrive.
            actions = [
                {
                    "domainMetadata": {
                        "domain": COPY_INTO_DOMAIN,
                        "configuration": json.dumps(
                            {**cfg, src_key: loaded}
                        ),
                        "removed": False,
                    }
                },
                _commit_info(
                    "COPY INTO",
                    {"source": src_key, "pattern": pattern},
                    {
                        "numFiles": 0,
                        "numOutputRows": 0,
                        "numSourceFiles": 0,
                        "numUpgradedIdentities": upgraded,
                    },
                ),
            ]
            upgrade = _protocol_upgrade_action(
                spark, table_path, "domainMetadata"
            )
            if upgrade is not None:
                actions.insert(0, upgrade)
            version = commit_mutation(
                table_path, current_version(table_path), actions
            )
        else:
            version = current_version(table_path)
        return {
            "numLoadedFiles": 0,
            "numSkippedFiles": len(candidates),
            "version": version,
        }

    df = spark.read.parquet(*[p for p, _, _ in new_paths])
    missing = [c for c in logical_cols if c not in df.columns]
    extra = [c for c in df.columns if c not in logical_cols]
    if missing or extra:
        raise ValueError(
            f"COPY INTO schema mismatch: missing={missing} extra={extra}"
        )
    df = df.select(*logical_cols)
    _validate_constraints(spark, df, table_path)
    df = _to_physical(spark, df, table_path)

    before = _list_parquet_rel(table_path)
    writer = df.write.mode("append")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(table_path)
    new_files = sorted(_list_parquet_rel(table_path) - before)

    for _, name, ident in new_paths:
        loaded[name] = ident
    actions: list[dict] = []
    upgrade = _protocol_upgrade_action(spark, table_path, "domainMetadata")
    if upgrade is not None:
        actions.append(upgrade)
    adds = [_add_action(table_path, rel) for rel in new_files]
    actions += adds
    n_records = sum(
        json.loads(a["add"]["stats"])["numRecords"] for a in adds
    )
    actions.append(
        {
            "domainMetadata": {
                "domain": COPY_INTO_DOMAIN,
                "configuration": json.dumps({**cfg, src_key: loaded}),
                "removed": False,
            }
        }
    )
    actions.append(
        _commit_info(
            "COPY INTO",
            {"source": src_key, "pattern": pattern},
            {
                "numFiles": len(new_files),
                "numOutputRows": n_records,
                "numSourceFiles": len(new_paths),
            },
        )
    )
    version = commit_mutation(
        table_path, current_version(table_path), actions
    )
    return {
        "numLoadedFiles": len(new_paths),
        "numSkippedFiles": len(candidates) - len(new_paths),
        "version": version,
    }


def drop_feature(spark: SparkSession, table_path: str, feature: str) -> int:
    """``ALTER TABLE ... DROP FEATURE`` (Delta 3.x): remove a table
    feature from the protocol so engines without that capability can
    read/write the table again. Refused while any trace of the feature
    is still live — the checks are the spec's:

    - ``deletionVectors``: no live file may carry pending DV positions
      (run REORG PURGE first) — readers that skip the DV anti-join would
      resurrect deleted rows;
    - ``columnMapping``: no field may carry a physicalName mapping and
      no dropped-column data may linger (REORG PURGE clears the files;
      renames cannot be un-mapped, so a renamed table keeps the feature);
    - ``changeDataFeed``: ``delta.enableChangeDataFeed`` is cleared from
      the table configuration IN THE SAME COMMIT as the protocol
      downgrade, so post-drop writers stop producing ``_change_data``
      files the downgraded protocol no longer declares;
    - ``v2Checkpoint``: if ``_last_checkpoint`` currently points at a V2
      (UUID + sidecar) checkpoint, the checkpoint is REWRITTEN in the
      classic V1 layout first — a downgraded external reader resolving
      ``_last_checkpoint`` must never land on a layout its protocol
      doesn't know;
    - writer-only bookkeeping features (``rowTracking``, ``clustering``,
      ``domainMetadata``, ``identityColumns``) drop freely — their state
      is ignorable by spec.

    History note: per the spec, commits BEFORE the drop may still
    contain the feature's actions; readers of old versions re-enter the
    feature-gated path. This matches Delta's two-phase
    ``DROP FEATURE TRUNCATE HISTORY`` flow where ``cleanup_log``
    (operators/maintenance.py) is the truncation half.
    """
    from pyspark.sql import functions as F

    from delta_lake_health_spark.sources.delta_log import DeltaLog

    _require_writable(spark, table_path)
    log = DeltaLog(spark, table_path)
    p = log.protocol()
    reader_feats = set(p.get("readerFeatures") or [])
    writer_feats = set(p.get("writerFeatures") or [])
    if feature not in (reader_feats | writer_feats):
        raise ValueError(f"table does not declare feature {feature!r}")

    if feature == "deletionVectors":
        dv = log.deletion_vectors()
        if dv is not None:
            live = log.active_files().select(
                F.col("path").alias("rel_path")
            )
            n_live = dv.join(
                F.broadcast(live), "rel_path", "left_semi"
            ).count()
            if n_live:
                raise ValueError(
                    f"cannot drop deletionVectors: {n_live} live DV "
                    "positions remain — run reorg_purge first"
                )
    elif feature == "columnMapping":
        schema = log.metadata().get("schema") or {}
        mapped = [
            f["name"]
            for f in schema.get("fields", [])
            if (f.get("metadata") or {}).get(
                "delta.columnMapping.physicalName"
            )
        ]
        if mapped:
            raise ValueError(
                f"cannot drop columnMapping: renamed columns {mapped} "
                "still map to physical names"
            )
    elif feature not in (
        "rowTracking", "clustering", "domainMetadata", "identityColumns",
        "v2Checkpoint", "changeDataFeed",
    ):
        raise ValueError(f"drop of feature {feature!r} not supported")

    extra_actions: list[dict] = []
    if feature == "changeDataFeed":
        meta = log.metadata()
        config = dict(meta.get("configuration", {}))
        if config.pop("delta.enableChangeDataFeed", None) is not None:
            extra_actions.append(
                {
                    "metaData": {
                        "id": meta["id"],
                        "format": {"provider": "parquet", "options": {}},
                        "schemaString": json.dumps(meta["schema"]),
                        "partitionColumns": meta.get(
                            "partition_columns", []
                        ),
                        "configuration": config,
                        "createdTime": int(time.time() * 1000),
                    }
                }
            )
    elif feature == "v2Checkpoint":
        lc = log.last_checkpoint_info()
        if lc is not None and lc.get("format") == "v2":
            log.checkpoint(format="v1")
            log = DeltaLog(spark, table_path)

    proto = {
        "minReaderVersion": p["minReaderVersion"],
        "minWriterVersion": p["minWriterVersion"],
    }
    if p["minReaderVersion"] >= 3:
        proto["readerFeatures"] = sorted(reader_feats - {feature})
    if p["minWriterVersion"] >= 7:
        proto["writerFeatures"] = sorted(writer_feats - {feature})
    actions = [
        {"protocol": proto},
        *extra_actions,
        _commit_info("DROP FEATURE", {"feature": feature}, {}),
    ]
    version = current_version(table_path) + 1
    _commit(table_path, version, actions)
    return version
