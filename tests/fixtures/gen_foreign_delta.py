#!/usr/bin/env python
"""Generate the checked-in FOREIGN Delta table fixture
(`tests/fixtures/foreign_delta/`) — a `_delta_log` in the shape real
foreign writers produce, per the public Delta PROTOCOL.md and the
published output of delta-spark 3.x / delta-rs 0.17:

* JSON commits carry the foreign writers' extra fields our reader's
  ACTION_SCHEMA does not model (`commitInfo.engineInfo`,
  `commitInfo.isolationLevel`, `commitInfo.txnId`, `metaData.format`,
  `remove.extendedFileMetadata` / `partitionValues` / `size`,
  `clientVersion`) — the reader must project them away, not choke.
* Data files use Spark's `part-00000-<uuid>.c000.snappy.parquet` naming
  under hive partition dirs, and do NOT contain the partition column
  (real delta-spark layout — partition values live only in the log).
* `add.stats` / `metaData.schemaString` are JSON-encoded STRINGS (the
  spec's wire form), stats including the `nullCount` block our writer
  doesn't emit.
* v2 has a classic single-file checkpoint (one row per action, no
  commitInfo per spec, `remove` tombstone retained) + `_last_checkpoint`
  with the `size` field, and v3 exists only as a JSON tail past it —
  a reader must merge checkpoint + tail.
* v0-v2 mimic delta-spark (engineInfo, WRITE/DELETE operations); v3
  mimics delta-rs (clientVersion, no engineInfo).

The container cannot install delta-spark/delta-rs, so this is a
hand-constructed replica of their documented output, not a captured
one; every field follows the public spec. Regenerate with
`python tests/fixtures/gen_foreign_delta.py` (deterministic).

Table: (id long, v double) partitioned by p string.
  v0 WRITE   : fileA p=a ids 0-4, fileB p=b ids 5-9
  v1 WRITE   : fileC p=a ids 10-12
  v2 DELETE  : remove fileB, add fileD p=b ids 5-7   (checkpoint here)
  v3 WRITE   : fileE p=c ids 13-14                    (delta-rs append)
Final snapshot: ids 0-7, 10-14  (13 rows, 4 live files).
"""

from __future__ import annotations

import json
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.join(HERE, "foreign_delta")
LOG = os.path.join(ROOT, "_delta_log")

SCHEMA_STRING = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "double", "nullable": True, "metadata": {}},
            {"name": "p", "type": "string", "nullable": True, "metadata": {}},
        ],
    }
)

FILES = {
    # name -> (partition value, ids)
    "fileA": ("a", range(0, 5)),
    "fileB": ("b", range(5, 10)),
    "fileC": ("a", range(10, 13)),
    "fileD": ("b", range(5, 8)),
    "fileE": ("c", range(13, 15)),
}
UUIDS = {
    "fileA": "1f7f5d8b-1a2b-4c3d-8e9f-000000000001",
    "fileB": "2a8e6c9d-2b3c-4d5e-9fa0-000000000002",
    "fileC": "3b9f7dae-3c4d-4e6f-a0b1-000000000003",
    "fileD": "4cafa8bf-4d5e-4f70-b1c2-000000000004",
    "fileE": "5dbfb9c0-5e6f-4081-c2d3-000000000005",
}
T0 = 1700000000000  # base commit timestamp (ms)


def _rel_path(name: str) -> str:
    p, _ = FILES[name][0], FILES[name][1]
    return f"p={p}/part-00000-{UUIDS[name]}.c000.snappy.parquet"


def _write_data(name: str) -> tuple[str, int, str]:
    """Write the parquet (WITHOUT the partition column, like delta-spark)
    and return (rel_path, size, stats_json)."""
    ids = list(FILES[name][1])
    vals = [float(i) * 1.5 for i in ids]
    tbl = pa.table({"id": pa.array(ids, pa.int64()), "v": pa.array(vals)})
    rel = _rel_path(name)
    abspath = os.path.join(ROOT, rel)
    os.makedirs(os.path.dirname(abspath), exist_ok=True)
    pq.write_table(tbl, abspath, compression="snappy")
    stats = {
        "numRecords": len(ids),
        "minValues": {"id": min(ids), "v": min(vals)},
        "maxValues": {"id": max(ids), "v": max(vals)},
        "nullCount": {"id": 0, "v": 0},
    }
    return rel, os.path.getsize(abspath), json.dumps(stats)


def _add(name: str, ts: int) -> dict:
    rel, size, stats = _write_data(name)
    return {
        "add": {
            "path": rel,
            "partitionValues": {"p": FILES[name][0]},
            "size": size,
            "modificationTime": ts,
            "dataChange": True,
            "stats": stats,
        }
    }


def _commit(version: int, lines: list[dict]) -> None:
    path = os.path.join(LOG, f"{version:020d}.json")
    with open(path, "w") as f:
        for line in lines:
            f.write(json.dumps(line, separators=(",", ":")) + "\n")


def main() -> None:
    shutil.rmtree(ROOT, ignore_errors=True)
    os.makedirs(LOG)

    meta = {
        "metaData": {
            "id": "9b305f40-8b29-4c10-b4b0-d14e1e51a1f1",
            "name": None,
            "description": None,
            "format": {"provider": "parquet", "options": {}},
            "schemaString": SCHEMA_STRING,
            "partitionColumns": ["p"],
            "configuration": {},
            "createdTime": T0,
        }
    }
    protocol = {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}

    # ---- v0: delta-spark CREATE + WRITE -------------------------------
    add_a = _add("fileA", T0)
    add_b = _add("fileB", T0)
    _commit(
        0,
        [
            {
                "commitInfo": {
                    "timestamp": T0,
                    "operation": "WRITE",
                    "operationParameters": {
                        "mode": "ErrorIfExists",
                        "partitionBy": '["p"]',
                    },
                    "isolationLevel": "Serializable",
                    "isBlindAppend": True,
                    "operationMetrics": {
                        "numFiles": "2",
                        "numOutputRows": "10",
                    },
                    "engineInfo": "Apache-Spark/3.5.1 Delta-Lake/3.1.0",
                    "txnId": "f9b1f3a0-0000-4000-8000-000000000000",
                }
            },
            protocol,
            meta,
            add_a,
            add_b,
        ],
    )

    # ---- v1: delta-spark append ---------------------------------------
    add_c = _add("fileC", T0 + 60_000)
    _commit(
        1,
        [
            {
                "commitInfo": {
                    "timestamp": T0 + 60_000,
                    "operation": "WRITE",
                    "operationParameters": {"mode": "Append", "partitionBy": "[]"},
                    "isolationLevel": "Serializable",
                    "isBlindAppend": True,
                    "operationMetrics": {
                        "numFiles": "1",
                        "numOutputRows": "3",
                    },
                    "engineInfo": "Apache-Spark/3.5.1 Delta-Lake/3.1.0",
                    "txnId": "f9b1f3a0-0000-4000-8000-000000000001",
                }
            },
            add_c,
        ],
    )

    # ---- v2: delta-spark DELETE (rewrites fileB -> fileD) -------------
    add_d = _add("fileD", T0 + 120_000)
    _commit(
        2,
        [
            {
                "commitInfo": {
                    "timestamp": T0 + 120_000,
                    "operation": "DELETE",
                    "operationParameters": {"predicate": '["(id >= 8)"]'},
                    "isolationLevel": "Serializable",
                    "isBlindAppend": False,
                    "operationMetrics": {
                        "numDeletedRows": "2",
                        "numCopiedRows": "3",
                    },
                    "engineInfo": "Apache-Spark/3.5.1 Delta-Lake/3.1.0",
                    "txnId": "f9b1f3a0-0000-4000-8000-000000000002",
                }
            },
            {
                "remove": {
                    "path": add_b["add"]["path"],
                    "deletionTimestamp": T0 + 120_000,
                    "dataChange": True,
                    "extendedFileMetadata": True,
                    "partitionValues": {"p": "b"},
                    "size": add_b["add"]["size"],
                }
            },
            add_d,
        ],
    )

    # ---- classic checkpoint at v2 (spec: no commitInfo; one row per
    # action; remove tombstone retained) --------------------------------
    map_ss = pa.map_(pa.string(), pa.string())
    add_t = pa.struct(
        [
            ("path", pa.string()),
            ("partitionValues", map_ss),
            ("size", pa.int64()),
            ("modificationTime", pa.int64()),
            ("dataChange", pa.bool_()),
            ("stats", pa.string()),
            ("tags", map_ss),
        ]
    )
    remove_t = pa.struct(
        [
            ("path", pa.string()),
            ("deletionTimestamp", pa.int64()),
            ("dataChange", pa.bool_()),
            ("extendedFileMetadata", pa.bool_()),
            ("partitionValues", map_ss),
            ("size", pa.int64()),
        ]
    )
    meta_t = pa.struct(
        [
            ("id", pa.string()),
            ("name", pa.string()),
            ("description", pa.string()),
            (
                "format",
                pa.struct([("provider", pa.string()), ("options", map_ss)]),
            ),
            ("schemaString", pa.string()),
            ("partitionColumns", pa.list_(pa.string())),
            ("configuration", map_ss),
            ("createdTime", pa.int64()),
        ]
    )
    protocol_t = pa.struct(
        [("minReaderVersion", pa.int32()), ("minWriterVersion", pa.int32())]
    )
    txn_t = pa.struct(
        [("appId", pa.string()), ("version", pa.int64()), ("lastUpdated", pa.int64())]
    )

    def _ckpt_add(a: dict) -> dict:
        return {
            "path": a["path"],
            "partitionValues": list(a["partitionValues"].items()),
            "size": a["size"],
            "modificationTime": a["modificationTime"],
            "dataChange": False,
            "stats": a["stats"],
            "tags": None,
        }

    rows = [
        {
            "txn": None,
            "add": None,
            "remove": None,
            "metaData": {
                "id": "9b305f40-8b29-4c10-b4b0-d14e1e51a1f1",
                "name": None,
                "description": None,
                "format": {"provider": "parquet", "options": []},
                "schemaString": SCHEMA_STRING,
                "partitionColumns": ["p"],
                "configuration": [],
                "createdTime": T0,
            },
            "protocol": None,
        },
        {
            "txn": None,
            "add": None,
            "remove": None,
            "metaData": None,
            "protocol": {"minReaderVersion": 1, "minWriterVersion": 2},
        },
        {
            "txn": None,
            "add": None,
            "remove": {
                "path": add_b["add"]["path"],
                "deletionTimestamp": T0 + 120_000,
                "dataChange": False,
                "extendedFileMetadata": True,
                "partitionValues": [("p", "b")],
                "size": add_b["add"]["size"],
            },
            "metaData": None,
            "protocol": None,
        },
    ] + [
        {
            "txn": None,
            "add": _ckpt_add(a["add"]),
            "remove": None,
            "metaData": None,
            "protocol": None,
        }
        for a in (add_a, add_c, add_d)
    ]
    ckpt_schema = pa.schema(
        [
            ("txn", txn_t),
            ("add", add_t),
            ("remove", remove_t),
            ("metaData", meta_t),
            ("protocol", protocol_t),
        ]
    )
    ckpt = pa.Table.from_pylist(rows, schema=ckpt_schema)
    pq.write_table(
        ckpt,
        os.path.join(LOG, f"{2:020d}.checkpoint.parquet"),
        compression="snappy",
    )
    with open(os.path.join(LOG, "_last_checkpoint"), "w") as f:
        json.dump({"version": 2, "size": len(rows)}, f)

    # ---- v3: delta-rs append ------------------------------------------
    add_e = _add("fileE", T0 + 180_000)
    _commit(
        3,
        [
            {
                "commitInfo": {
                    "timestamp": T0 + 180_000,
                    "operation": "WRITE",
                    "operationParameters": {"mode": "Append"},
                    "clientVersion": "delta-rs.0.17.3",
                }
            },
            add_e,
        ],
    )
    print(f"wrote {ROOT}")


if __name__ == "__main__":
    main()
