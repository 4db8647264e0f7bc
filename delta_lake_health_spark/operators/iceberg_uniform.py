"""UniForm-style Iceberg metadata generation (D75, VERDICT r11 #9) —
emit an Apache Iceberg v1 metadata tree alongside the Delta log so an
Iceberg reader can scan the CURRENT live file set read-only, the same
interop shape as D56's symlink manifests but for the Iceberg protocol.

Everything here follows the PUBLIC Iceberg table spec
(https://iceberg.apache.org/spec/) and Avro 1.11 binary/container spec
(https://avro.apache.org/docs/):

- ``metadata/v{N}.metadata.json`` — format-version 1 table metadata:
  schema with assigned field-ids, partition-spec (identity transforms
  over the Delta partition columns), snapshot log, and the pointer to
  the current snapshot's manifest list;
- ``metadata/snap-{id}-manifest-list.avro`` — an Avro OCF listing the
  snapshot's manifest files (spec "Manifest Lists", v1 schema);
- ``metadata/manifest-{id}.avro`` — an Avro OCF of manifest entries,
  one per LIVE Delta data file, carrying file_path, file_format,
  typed partition values, record_count (from the Delta add stats) and
  file_size_in_bytes (spec "Manifests", v1 schema);
- ``metadata/version-hint.text`` — the HadoopTables current-version
  pointer.

The container ships no Avro library (and DuckDB's iceberg extension
can't be fetched offline), so the module implements the tiny subset of
the Avro spec the manifests need — zigzag-varint longs, length-prefixed
strings, records, nullable unions, and the object-container framing —
plus a symmetric reader used by the structural tests to prove the tree
round-trips and matches the Delta snapshot file-for-file.

Regeneration is idempotent per Delta version: each call inspects the
current snapshot and becomes a no-op when the tree already reflects it
(the ``delta.version`` property in the metadata JSON), so it composes
with a post-commit hook or a ``delta_tail`` maintenance stream.
Deletion vectors are a LOUD refusal — Iceberg v1 has no positional
deletes, and silently exporting a file whose rows are partly deleted
would serve wrong data to the foreign reader.
"""

from __future__ import annotations

import io
import json
import os
import struct
import time

# --------------------------------------------------------------------------
# Minimal Avro 1.11 binary encoding + object container framing.


def _zigzag(n: int) -> bytes:
    """Avro long: zigzag then base-128 varint, little-endian groups."""
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_zigzag(buf: io.BytesIO) -> int:
    shift, acc = 0, 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated avro varint")
        acc |= (b[0] & 0x7F) << shift
        if not b[0] & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _enc_str(s: str) -> bytes:
    raw = s.encode("utf-8")
    return _zigzag(len(raw)) + raw


def _read_str(buf: io.BytesIO) -> str:
    n = _read_zigzag(buf)
    return buf.read(n).decode("utf-8")


def _enc_value(schema, value) -> bytes:
    """Encode ``value`` per an Avro schema node (the subset manifests
    use: int/long/string/boolean/double, nullable unions, records)."""
    if isinstance(schema, list):  # union — [null, X] by construction
        if value is None:
            return _zigzag(schema.index("null"))
        idx = next(i for i, s in enumerate(schema) if s != "null")
        return _zigzag(idx) + _enc_value(schema[idx], value)
    if isinstance(schema, dict):
        if schema["type"] == "record":
            return b"".join(
                _enc_value(f["type"], value[f["name"]])
                for f in schema["fields"]
            )
        raise ValueError(f"unsupported avro complex type {schema['type']}")
    if schema in ("int", "long"):
        return _zigzag(int(value))
    if schema == "string":
        return _enc_str(str(value))
    if schema == "boolean":
        return b"\x01" if value else b"\x00"
    if schema == "double":
        return struct.pack("<d", float(value))
    raise ValueError(f"unsupported avro type {schema}")


def _dec_value(schema, buf: io.BytesIO):
    if isinstance(schema, list):
        idx = _read_zigzag(buf)
        branch = schema[idx]
        return None if branch == "null" else _dec_value(branch, buf)
    if isinstance(schema, dict):
        if schema["type"] == "record":
            return {
                f["name"]: _dec_value(f["type"], buf)
                for f in schema["fields"]
            }
        raise ValueError(f"unsupported avro complex type {schema['type']}")
    if schema in ("int", "long"):
        return _read_zigzag(buf)
    if schema == "string":
        return _read_str(buf)
    if schema == "boolean":
        return buf.read(1) == b"\x01"
    if schema == "double":
        return struct.unpack("<d", buf.read(8))[0]
    raise ValueError(f"unsupported avro type {schema}")


def write_avro_ocf(path: str, schema: dict, records: list, sync: bytes) -> int:
    """One-block Avro object container file (spec: magic, metadata map
    with avro.schema/avro.codec, 16-byte sync, then <count, size,
    data, sync> blocks). Returns the byte length written."""
    assert len(sync) == 16
    body = b"".join(_enc_value(schema, r) for r in records)
    meta_pairs = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": b"null",
    }
    out = bytearray(b"Obj\x01")
    out += _zigzag(len(meta_pairs))
    for k, v in meta_pairs.items():
        out += _enc_str(k) + _zigzag(len(v)) + v
    out += _zigzag(0)  # end of metadata map
    out += sync
    out += _zigzag(len(records)) + _zigzag(len(body)) + body + sync
    with open(path, "wb") as fh:
        fh.write(out)
    return len(out)


def read_avro_ocf(path: str) -> list:
    """Symmetric reader for the files this module writes (and any
    null-codec OCF using the supported type subset)."""
    with open(path, "rb") as fh:
        buf = io.BytesIO(fh.read())
    if buf.read(4) != b"Obj\x01":
        raise ValueError(f"{path}: not an avro object container file")
    schema = None
    n = _read_zigzag(buf)
    while n != 0:
        if n < 0:
            # spec: a negative block count is followed by the block's
            # byte size, then abs(n) items
            _read_zigzag(buf)
            n = -n
        for _ in range(n):
            key = _read_str(buf)
            vlen = _read_zigzag(buf)
            val = buf.read(vlen)
            if key == "avro.schema":
                schema = json.loads(val)
            elif key == "avro.codec" and val not in (b"null", b""):
                raise ValueError(f"unsupported avro codec {val!r}")
        n = _read_zigzag(buf)
    sync = buf.read(16)
    records = []
    while buf.tell() < len(buf.getvalue()):
        count = _read_zigzag(buf)
        _read_zigzag(buf)  # block byte size
        for _ in range(count):
            records.append(_dec_value(schema, buf))
        if buf.read(16) != sync:
            raise ValueError(f"{path}: sync marker mismatch")
    return records


# --------------------------------------------------------------------------
# Delta schema -> Iceberg schema (field-ids assigned in declaration
# order, the same rule UniForm uses for fresh exports).

_TYPE_MAP = {
    "byte": "int",
    "short": "int",
    "integer": "int",
    "long": "long",
    "float": "float",
    "double": "double",
    "string": "string",
    "boolean": "boolean",
    "binary": "binary",
    "date": "date",
    "timestamp": "timestamptz",
}


def _iceberg_schema(delta_schema: dict) -> tuple[dict, dict[str, int]]:
    fields, ids = [], {}
    next_id = 1
    for f in delta_schema.get("fields", []):
        t = f.get("type")
        if not isinstance(t, str) or t.split("(")[0] not in _TYPE_MAP:
            raise ValueError(
                f"iceberg export: column {f.get('name')!r} has type {t!r};"
                " only flat primitive columns are exported (nested/variant"
                " tables need a richer mapping — refuse, don't mis-type)"
            )
        ids[f["name"]] = next_id
        fields.append(
            {
                "id": next_id,
                "name": f["name"],
                "required": not f.get("nullable", True),
                "type": _TYPE_MAP[t],
            }
        )
        next_id += 1
    return (
        {"type": "struct", "schema-id": 0, "fields": fields},
        ids,
    )


def _partition_avro_type(delta_type: str):
    """Avro branch type for a partition value column (always nullable
    per the Iceberg manifest partition struct)."""
    if delta_type in ("byte", "short", "integer"):
        return "int"
    if delta_type == "long":
        return "long"
    if delta_type == "double":
        return "double"
    if delta_type == "string":
        return "string"
    if delta_type == "boolean":
        return "boolean"
    raise ValueError(
        f"iceberg export: partition type {delta_type!r} unsupported"
    )


def _coerce_partition(delta_type: str, raw: str | None):
    if raw is None:
        return None
    if delta_type in ("byte", "short", "integer", "long"):
        return int(raw)
    if delta_type == "double":
        return float(raw)
    if delta_type == "boolean":
        return raw.lower() == "true"
    return raw


# --------------------------------------------------------------------------
# Manifest / manifest-list Avro schemas (Iceberg spec v1, required
# fields plus the optional counts readers commonly expect).


def _manifest_schema(part_fields: list) -> dict:
    return {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {
                "name": "snapshot_id",
                "type": ["null", "long"],
                "default": None,
                "field-id": 1,
            },
            {
                "name": "data_file",
                "field-id": 2,
                "type": {
                    "type": "record",
                    "name": "r2",
                    "fields": [
                        {
                            "name": "file_path",
                            "type": "string",
                            "field-id": 100,
                        },
                        {
                            "name": "file_format",
                            "type": "string",
                            "field-id": 101,
                        },
                        {
                            "name": "partition",
                            "field-id": 102,
                            "type": {
                                "type": "record",
                                "name": "r102",
                                "fields": part_fields,
                            },
                        },
                        {
                            "name": "record_count",
                            "type": "long",
                            "field-id": 103,
                        },
                        {
                            "name": "file_size_in_bytes",
                            "type": "long",
                            "field-id": 104,
                        },
                        {
                            "name": "block_size_in_bytes",
                            "type": "long",
                            "field-id": 105,
                        },
                    ],
                },
            },
        ],
    }


_MANIFEST_LIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {
            "name": "added_snapshot_id",
            "type": ["null", "long"],
            "default": None,
            "field-id": 503,
        },
        {
            "name": "added_data_files_count",
            "type": ["null", "int"],
            "default": None,
            "field-id": 504,
        },
        {
            "name": "existing_data_files_count",
            "type": ["null", "int"],
            "default": None,
            "field-id": 505,
        },
        {
            "name": "deleted_data_files_count",
            "type": ["null", "int"],
            "default": None,
            "field-id": 506,
        },
    ],
}


# --------------------------------------------------------------------------


def _meta_dir(table_path: str) -> str:
    return os.path.join(table_path, "metadata")


def current_export_version(table_path: str) -> int | None:
    """The Delta version the existing Iceberg tree reflects, or None."""
    hint = os.path.join(_meta_dir(table_path), "version-hint.text")
    try:
        with open(hint) as fh:
            v = int(fh.read().strip())
        with open(
            os.path.join(_meta_dir(table_path), f"v{v}.metadata.json")
        ) as fh:
            meta = json.load(fh)
        return int(meta["properties"]["delta.version"])
    except (OSError, KeyError, ValueError):
        return None


def generate_iceberg_metadata(spark, table_path: str) -> dict:
    """Export the CURRENT Delta snapshot as an Iceberg v1 metadata tree
    under ``<table>/metadata/``. Idempotent per Delta version; returns
    ``{"delta_version", "snapshot_id", "metadata_file", "n_files",
    "skipped"}``. Metadata-scale only: one pass over the live add
    actions (driver-side |files| rows, the same class as checkpoint
    writes), no data files read or copied — the manifests point at the
    Delta parquet in place."""
    from delta_lake_health_spark.sources.delta_log import DeltaLog

    log = DeltaLog(spark, table_path)
    version = int(log.version())
    prior = current_export_version(table_path)
    meta_dir = _meta_dir(table_path)
    if prior == version:
        with open(os.path.join(meta_dir, "version-hint.text")) as fh:
            n = int(fh.read().strip())
        return {
            "delta_version": version,
            "snapshot_id": version + 1,
            "metadata_file": os.path.join(
                meta_dir, f"v{n}.metadata.json"
            ),
            "n_files": None,
            "skipped": True,
        }
    if log._live_dv_paths(log.active_files()):
        # LIVE-reconciled DVs only (r12 review): historical dv actions
        # whose files were since rewritten (REORG PURGE) are no-ops and
        # must not block the export — the documented remedy has to work
        raise ValueError(
            "iceberg export: table has live deletion vectors — Iceberg v1"
            " cannot express positional deletes; REORG PURGE first"
        )
    meta = log.metadata()
    if any(
        logical != physical
        for logical, physical in log.column_mapping(
            meta.get("schema")
        ).items()
    ):
        # column mapping is metadata-only: the parquet keeps PHYSICAL
        # names while the schema shows logical ones; an Iceberg v1
        # reader resolves by name (no field-ids in the files) and would
        # silently serve nulls for every renamed column — refuse
        raise ValueError(
            "iceberg export: table uses column mapping (renamed columns)"
            " — parquet physical names diverge from the logical schema"
            " and a by-name Iceberg reader would serve nulls; not"
            " exportable as v1"
        )
    schema, ids = _iceberg_schema(meta.get("schema") or {})
    part_cols = list(meta.get("partition_columns", []))
    delta_types = {
        f["name"]: f["type"]
        for f in (meta.get("schema") or {}).get("fields", [])
    }
    spec_fields = [
        {
            "name": c,
            "transform": "identity",
            "source-id": ids[c],
            "field-id": 1000 + i,
        }
        for i, c in enumerate(part_cols)
    ]
    part_avro_fields = [
        {
            "name": c,
            "type": ["null", _partition_avro_type(delta_types[c])],
            "default": None,
            "field-id": 1000 + i,
        }
        for i, c in enumerate(part_cols)
    ]

    live = log.live_add_actions()
    snapshot_id = version + 1  # deterministic, monotone per export
    os.makedirs(meta_dir, exist_ok=True)
    import hashlib

    sync = hashlib.sha256(
        f"{table_path}|{version}".encode()
    ).digest()[:16]
    entries = []
    for add in live:
        pv = add.get("partitionValues") or {}
        num_records = json.loads(add.get("stats") or "{}").get("numRecords")
        if num_records is None:
            # record_count is REQUIRED by the Iceberg spec and readers
            # answer COUNT(*) from it — exporting a guess would serve
            # wrong data to the foreign engine; refuse loudly instead
            # (backfill stats with OPTIMIZE first)
            raise ValueError(
                f"iceberg export: live file {add['path']!r} carries no"
                " numRecords stats — run a stats backfill (OPTIMIZE)"
                " before exporting"
            )
        entries.append(
            {
                "status": 1,  # ADDED (fresh snapshot)
                "snapshot_id": snapshot_id,
                "data_file": {
                    "file_path": os.path.join(table_path, add["path"]),
                    "file_format": "PARQUET",
                    "partition": {
                        c: _coerce_partition(delta_types[c], pv.get(c))
                        for c in part_cols
                    },
                    "record_count": int(num_records),
                    "file_size_in_bytes": int(add["size"]),
                    "block_size_in_bytes": 67108864,
                },
            }
        )
    manifest_path = os.path.join(
        meta_dir, f"manifest-{snapshot_id}.avro"
    )
    mlen = write_avro_ocf(
        manifest_path, _manifest_schema(part_avro_fields), entries, sync
    )
    mlist_path = os.path.join(
        meta_dir, f"snap-{snapshot_id}-manifest-list.avro"
    )
    write_avro_ocf(
        mlist_path,
        _MANIFEST_LIST_SCHEMA,
        [
            {
                "manifest_path": manifest_path,
                "manifest_length": mlen,
                "partition_spec_id": 0,
                "added_snapshot_id": snapshot_id,
                "added_data_files_count": len(entries),
                "existing_data_files_count": 0,
                "deleted_data_files_count": 0,
            }
        ],
        sync,
    )
    next_v = (
        max(
            (
                int(f[1:].split(".")[0])
                for f in os.listdir(meta_dir)
                if f.startswith("v") and f.endswith(".metadata.json")
            ),
            default=0,
        )
        + 1
    )
    now_ms = int(time.time() * 1000)
    table_meta = {
        "format-version": 1,
        "table-uuid": meta["id"],
        "location": table_path,
        "last-updated-ms": now_ms,
        "last-column-id": max(ids.values(), default=0),
        "schema": schema,
        "schemas": [schema],
        "current-schema-id": 0,
        "partition-spec": spec_fields,
        "partition-specs": [{"spec-id": 0, "fields": spec_fields}],
        "default-spec-id": 0,
        # the Delta parquet carries no Iceberg field IDs, so a conformant
        # reader (which projects by field ID) would serve NULL for every
        # column; the spec's sanctioned fallback is a name mapping
        # (spec §Column Projection / name-mapping.default) — emit one so
        # by-name resolution is spec-correct, not reader leniency
        "properties": {
            "delta.version": str(version),
            "schema.name-mapping.default": json.dumps(
                [
                    {"field-id": fid, "names": [name]}
                    for name, fid in sorted(ids.items())
                ]
            ),
        },
        "current-snapshot-id": snapshot_id,
        "snapshots": [
            {
                "snapshot-id": snapshot_id,
                "timestamp-ms": now_ms,
                "manifest-list": mlist_path,
                "summary": {
                    "operation": "append",
                    "added-data-files": str(len(entries)),
                },
            }
        ],
        "snapshot-log": [
            {"snapshot-id": snapshot_id, "timestamp-ms": now_ms}
        ],
    }
    metadata_file = os.path.join(meta_dir, f"v{next_v}.metadata.json")
    with open(metadata_file, "w") as fh:
        json.dump(table_meta, fh, indent=2)
    with open(
        os.path.join(meta_dir, "version-hint.text"), "w"
    ) as fh:
        fh.write(str(next_v))
    return {
        "delta_version": version,
        "snapshot_id": snapshot_id,
        "metadata_file": metadata_file,
        "n_files": len(entries),
        "skipped": False,
    }


def read_iceberg_file_set(table_path: str) -> list[dict]:
    """Walk the generated tree like an Iceberg reader: version-hint →
    metadata JSON → current snapshot → manifest list → manifests →
    data-file entries. Used by the structural tests (and as a
    reference for what a foreign reader sees)."""
    meta_dir = _meta_dir(table_path)
    with open(os.path.join(meta_dir, "version-hint.text")) as fh:
        v = int(fh.read().strip())
    with open(os.path.join(meta_dir, f"v{v}.metadata.json")) as fh:
        meta = json.load(fh)
    snap = next(
        s
        for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    files: list[dict] = []
    for mf in read_avro_ocf(snap["manifest-list"]):
        for entry in read_avro_ocf(mf["manifest_path"]):
            if entry["status"] != 2:  # not DELETED
                files.append(entry["data_file"])
    return files
