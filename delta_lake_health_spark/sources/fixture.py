"""Deterministic on-disk Delta-table fixture for the oracle-checked
health-analyzer query.

The driver's correctness gate runs a Spark query AND a DuckDB oracle over
the same inputs. The health analyzer needs a real Delta table, so this
module builds one — with pure pyarrow + json (no SparkSession), so it can
run at import time and is guaranteed to exist before either side of the
compare executes. Layout (hive-partitioned by ``day``):

- v0 WRITE:  day=Mon 80 rows, day=Tue 10, day=Wed 10
- v1 WRITE:  3 small appends (8 / 1 / 1 rows)
- v2 DELETE: removes the 8-row Mon file, adds a 6-row rewrite
- plus one ORPHAN parquet never referenced by the log

Live state: 6 files, 108 records, Mon=86 / Tue=11 / Wed=11 (skewed).
Every metric the query emits is derivable from the raw ``_delta_log``
JSON plus a parquet glob, which is exactly what the DuckDB oracle does.
"""

from __future__ import annotations

import json
import os
import shutil

FIXTURE_PATH = "/tmp/delta_lake_health_spark_fixture/health_table"
_MARKER = "_FIXTURE_COMPLETE"


def _val(i: int) -> float:
    return float(10 + (i * 7) % 41)


def _write_parquet(path: str, offset: int, n: int) -> int:
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "val": pa.array([_val(offset + i) for i in range(n)], pa.float64()),
            "idx": pa.array(range(offset, offset + n), pa.int64()),
        }
    )
    pq.write_table(t, path)
    return os.path.getsize(path)


def _add(table: str, rel: str, day: str, offset: int, n: int) -> dict:
    size = _write_parquet(os.path.join(table, rel), offset, n)
    vals = [_val(offset + i) for i in range(n)]
    stats = {
        "numRecords": n,
        "minValues": {"idx": offset, "val": min(vals)},
        "maxValues": {"idx": offset + n - 1, "val": max(vals)},
    }
    return {
        "add": {
            "path": rel,
            "partitionValues": {"day": day},
            "size": size,
            "modificationTime": 1700000000000,
            "dataChange": True,
            "stats": json.dumps(stats),
        }
    }


def _commit(table: str, version: int, actions: list[dict]) -> None:
    log = os.path.join(table, "_delta_log")
    with open(os.path.join(log, f"{version:020d}.json"), "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")


def _info(op: str, ts: int) -> dict:
    return {
        "commitInfo": {
            "timestamp": ts,
            "operation": op,
            "operationParameters": {},
            "operationMetrics": {},
        }
    }


def build_fixture(path: str = FIXTURE_PATH) -> str:
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(os.path.join(path, "_delta_log"))
    for day in ("Mon", "Tue", "Wed"):
        os.makedirs(os.path.join(path, f"day={day}"), exist_ok=True)

    schema_string = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "val", "type": "double", "nullable": True, "metadata": {}},
                {"name": "idx", "type": "long", "nullable": True, "metadata": {}},
                {"name": "day", "type": "string", "nullable": True, "metadata": {}},
            ],
        }
    )
    v0 = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {
            "metaData": {
                "id": "00000000-0000-0000-0000-000000000001",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema_string,
                "partitionColumns": ["day"],
                "configuration": {},
                "createdTime": 1700000000000,
            }
        },
        _add(path, "day=Mon/part-00000.parquet", "Mon", 0, 80),
        _add(path, "day=Tue/part-00001.parquet", "Tue", 100, 10),
        _add(path, "day=Wed/part-00002.parquet", "Wed", 200, 10),
        _info("WRITE", 1700000001000),
    ]
    _commit(path, 0, v0)

    v1 = [
        _add(path, "day=Mon/part-00003.parquet", "Mon", 300, 8),
        _add(path, "day=Tue/part-00004.parquet", "Tue", 400, 1),
        _add(path, "day=Wed/part-00005.parquet", "Wed", 500, 1),
        _info("WRITE", 1700000002000),
    ]
    _commit(path, 1, v1)

    v2 = [
        {
            "remove": {
                "path": "day=Mon/part-00003.parquet",
                "deletionTimestamp": 1700000003000,
                "dataChange": True,
            }
        },
        _add(path, "day=Mon/part-00006.parquet", "Mon", 600, 6),
        _info("DELETE", 1700000003000),
    ]
    _commit(path, 2, v2)

    # v3: deletion vector — soft-delete the first 3 rows of the Tue file
    # (position-delete sidecar + dv action, no file rewrite)
    import pyarrow as pa
    import pyarrow.parquet as pq

    dv_rel = "_deletes/dv-00000000000000000003"
    os.makedirs(os.path.join(path, dv_rel), exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "rel_path": pa.array(["day=Tue/part-00001.parquet"] * 3),
                "row_index": pa.array([0, 1, 2], pa.int64()),
            }
        ),
        os.path.join(path, dv_rel, "part-0.parquet"),
    )
    v3 = [
        {"dv": {"path": dv_rel, "numDeletedRows": 3}},
        _info("DELETE", 1700000004000),
    ]
    _commit(path, 3, v3)

    # orphan data file the log never references
    _write_parquet(os.path.join(path, "day=Mon/orphan-00000.parquet"), 700, 5)

    with open(os.path.join(path, _MARKER), "w") as f:
        f.write(_FIXTURE_VERSION + "\n")
    return path


_FIXTURE_VERSION = "v3"  # bump to force a rebuild of stale fixtures

MEDIA_FIXTURE_PATH = "/tmp/delta_lake_health_spark_fixture/media.parquet"


_MEDIA_FIXTURE_VERSION = "v7"  # v7: adds real baseline JFIF (JPEG) images


def build_media_fixture(path: str = MEDIA_FIXTURE_PATH) -> str:
    """Deterministic multimodal table: binary payloads — synthetic
    SIMG/SVID plus REAL 24/32-bit BMP images, REAL PCM16 WAV audio, and
    REAL YUV4MPEG2 video — with the metadata the encoder logged, written
    with pure pyarrow so it exists before either side of the driver
    compare. The oracle reads the LOGGED columns; the Spark query
    re-derives them from the BINARY via the mapInPandas decode (for
    BMP/WAV/Y4M that is a genuine format parse)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from delta_lake_health_spark.operators.multimodal import media_row

    ids, types, payloads, ws, hs, nfs, rates = [], [], [], [], [], [], []
    for i in range(64):
        mtype, payload, w, h, nf, rate = media_row(i)
        ids.append(i); types.append(mtype); payloads.append(payload)
        ws.append(w); hs.append(h); nfs.append(nf); rates.append(rate)
    t = pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "media_type": pa.array(types, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "n_frames": pa.array(nfs, pa.int32()),
            "sample_rate": pa.array(rates, pa.int32()),
        }
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(t, path)
    with open(path + ".version", "w") as f:
        f.write(_MEDIA_FIXTURE_VERSION + "\n")
    return path


def ensure_media_fixture(path: str = MEDIA_FIXTURE_PATH) -> str:
    current = None
    if os.path.isfile(path) and os.path.isfile(path + ".version"):
        with open(path + ".version") as f:
            current = f.read().strip()
    if current != _MEDIA_FIXTURE_VERSION:
        build_media_fixture(path)
    return path


def ensure_fixture(path: str = FIXTURE_PATH) -> str:
    """Build once per machine; rebuild if missing, incomplete, or stale."""
    marker = os.path.join(path, _MARKER)
    current = None
    if os.path.isfile(marker):
        with open(marker) as f:
            current = f.read().strip()
    if current != _FIXTURE_VERSION:
        build_fixture(path)
    return path


# --------------------------------------------------------------------------
# CONVERT TO DELTA source fixture (round 8, VERDICT r7 task #7): a plain
# hive-partitioned parquet directory with NO _delta_log — the
# `delta_convert_snapshot` query converts it in place and reads the
# reconstructed snapshot; the DuckDB oracle reads the same parquet glob
# directly, proving the footer-derived add-action stats and the hive
# partition inference against an independent engine. Built with pure
# pyarrow at import time like the analyzer fixture, so the oracle side
# never depends on the Spark side having run first.
CONVERT_SRC_PATH = "/tmp/delta_lake_health_spark_fixture/convert_src"
_CONVERT_MARKER = "_CONVERT_FIXTURE_COMPLETE"
_CONVERT_VERSION = "convert-v1"

# (day -> [(idx offset, row count)]): Mon split across two files so the
# per-partition aggregate has to merge multiple add actions.
_CONVERT_SPECS = {
    "Mon": [(0, 40), (40, 24)],
    "Tue": [(100, 17)],
    "Wed": [(200, 9)],
}


def build_convert_fixture(path: str = CONVERT_SRC_PATH) -> str:
    shutil.rmtree(path, ignore_errors=True)
    i = 0
    for day, files in _CONVERT_SPECS.items():
        d = os.path.join(path, f"day={day}")
        os.makedirs(d)
        for offset, n in files:
            _write_parquet(os.path.join(d, f"part-{i:05d}.parquet"), offset, n)
            i += 1
    with open(os.path.join(path, _CONVERT_MARKER), "w") as f:
        f.write(_CONVERT_VERSION)
    return path


def ensure_convert_fixture(path: str = CONVERT_SRC_PATH) -> str:
    """Build once per machine. A leftover ``_delta_log`` from an earlier
    conversion of the SAME fixture version is kept (conversion is
    deterministic over these files); any staleness rebuilds from scratch,
    which also clears the log."""
    marker = os.path.join(path, _CONVERT_MARKER)
    current = None
    if os.path.isfile(marker):
        with open(marker) as f:
            current = f.read().strip()
    if current != _CONVERT_VERSION:
        build_convert_fixture(path)
    return path


# --------------------------------------------------------------------------
# Shared guard for the query-layer /tmp fixtures (ADVICE r10): the old
# markers recorded only that a build FINISHED, not which definition
# built it — editing a fixture silently reused the stale on-disk table
# and surfaced as a confusing oracle mismatch; concurrent queries
# building the same fixture also raced rmtree/write. The marker now
# stores a hash of the builder's source (plus optional salt), and the
# build runs under an exclusive flock.
_LOCK_DIR = "/tmp/delta_lake_health_spark_fixture/.locks"


def definition_hash(build, salt: str = "", deps: tuple = ()) -> str:
    """Hash of the builder's source + each dependency's source + salt.
    ``deps`` should name the functions whose BEHAVIOR defines the
    artifact (the thin build closure usually just calls them — editing
    a callee must invalidate the marker, not silently reuse the stale
    artifact)."""
    import hashlib
    import inspect

    parts = []
    for fn in (build, *deps):
        try:
            parts.append(inspect.getsource(fn))
        except (OSError, TypeError):  # no source (REPL / C callable)
            parts.append(repr(fn))
    parts.append(salt)
    return hashlib.sha256("\x00".join(parts).encode()).hexdigest()[:16]


def build_once(
    marker: str,
    build,
    clean: list[str] | None = None,
    salt: str = "",
    deps: tuple = (),
) -> None:
    """Run ``build()`` exactly once per (machine, definition): skipped
    when ``marker`` already records this definition's hash (the hash
    covers ``build``'s source, every function in ``deps``, and
    ``salt``), serialized against concurrent builders via flock, and
    preceded by an rmtree of every path in ``clean`` (stale trees from
    ANY prior definition)."""
    import fcntl
    import hashlib

    version = definition_hash(build, salt, deps)

    def _ok() -> bool:
        try:
            with open(marker) as fh:
                return fh.read().strip() == version
        except OSError:
            return False

    if _ok():
        return
    os.makedirs(_LOCK_DIR, exist_ok=True)
    lock_path = os.path.join(
        _LOCK_DIR,
        hashlib.sha256(marker.encode()).hexdigest()[:16] + ".lock",
    )
    with open(lock_path, "w") as lf:
        fcntl.flock(lf, fcntl.LOCK_EX)
        try:
            if _ok():  # another builder won the race
                return
            for p in clean or []:
                shutil.rmtree(p, ignore_errors=True)
            build()
            with open(marker, "w") as fh:
                fh.write(version)
        finally:
            fcntl.flock(lf, fcntl.LOCK_UN)
