"""Distributed Delta transaction-log reader — no delta library.

The ``_delta_log`` of a Delta table is newline-delimited JSON (plus
optional parquet checkpoints): tiny relative to the data (GBs for a 100 TB
table), but still worth reading distributed — ``spark.read.json`` over the
commit files with an explicit action schema, version extracted from the
file name via ``_metadata.file_path``. Snapshot reconstruction is the
standard add/remove reconciliation: per path, the action with the highest
(version, add-wins) rank decides liveness — one shuffle over |files| rows.

Replaces the reference's delta-rs ``DeltaTable`` dependency
(src/delta_lake_health/health_analyzers/delta_python_analyzer.py:17-31,
109-133): same observable surface (active files, history, metadata,
record counts from add-file stats) re-expressed as DataFrame plans.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)
from pyspark.sql.window import Window

LOG_DIR = "_delta_log"

_STR_MAP = MapType(StringType(), StringType())

ACTION_SCHEMA = StructType(
    [
        StructField(
            "add",
            StructType(
                [
                    StructField("path", StringType()),
                    StructField("partitionValues", _STR_MAP),
                    StructField("size", LongType()),
                    StructField("modificationTime", LongType()),
                    StructField("dataChange", BooleanType()),
                    StructField("stats", StringType()),
                    # free-form writer tags (Delta spec add.tags):
                    # z-order incremental maintenance records its ZCUBE
                    # membership here
                    StructField("tags", _STR_MAP),
                    # Delta row tracking: this file's rows carry fresh
                    # row ids [baseRowId, baseRowId + numRecords - 1]
                    StructField("baseRowId", LongType()),
                    StructField("defaultRowCommitVersion", LongType()),
                ]
            ),
        ),
        StructField(
            "remove",
            StructType(
                [
                    StructField("path", StringType()),
                    StructField("deletionTimestamp", LongType()),
                    StructField("dataChange", BooleanType()),
                ]
            ),
        ),
        StructField(
            "metaData",
            StructType(
                [
                    StructField("id", StringType()),
                    StructField("name", StringType()),
                    StructField("schemaString", StringType()),
                    StructField("partitionColumns", ArrayType(StringType())),
                    StructField("configuration", _STR_MAP),
                    StructField("createdTime", LongType()),
                ]
            ),
        ),
        StructField(
            "protocol",
            StructType(
                [
                    StructField("minReaderVersion", IntegerType()),
                    StructField("minWriterVersion", IntegerType()),
                    StructField("readerFeatures", ArrayType(StringType())),
                    StructField("writerFeatures", ArrayType(StringType())),
                ]
            ),
        ),
        StructField(
            "commitInfo",
            StructType(
                [
                    StructField("timestamp", LongType()),
                    # Delta ICT: the monotonic commit-time authority for
                    # timestampAsOf (falls back to `timestamp` when absent)
                    StructField("inCommitTimestamp", LongType()),
                    StructField("operation", StringType()),
                    StructField("operationParameters", _STR_MAP),
                    StructField("operationMetrics", _STR_MAP),
                ]
            ),
        ),
        # Application transaction marker (Delta spec's txn action): a
        # writer records (appId, version) with each commit; an idempotent
        # writer (e.g. a streaming sink keyed by checkpoint dir + batch id)
        # skips any batch at or below the last recorded version.
        StructField(
            "txn",
            StructType(
                [
                    StructField("appId", StringType()),
                    StructField("version", LongType()),
                    StructField("lastUpdated", LongType()),
                ]
            ),
        ),
        # Change-data file (Delta spec's cdc action / AddCDCFile): a
        # parquet under _change_data/ carrying this commit's row-level
        # changes WITH their _change_type (update_preimage /
        # update_postimage), written when delta.enableChangeDataFeed is
        # set. Not part of table state (never checkpointed); CDF readers
        # prefer it over add/remove reconstruction for its commit.
        StructField(
            "cdc",
            StructType(
                [
                    StructField("path", StringType()),
                    StructField("partitionValues", _STR_MAP),
                    StructField("size", LongType()),
                    StructField("dataChange", BooleanType()),
                ]
            ),
        ),
        # Domain metadata (Delta spec's domainMetadata action): named,
        # system-maintained configuration that rides the log — the row
        # tracking high-water mark lives in domain "delta.rowTracking".
        StructField(
            "domainMetadata",
            StructType(
                [
                    StructField("domain", StringType()),
                    StructField("configuration", StringType()),
                    StructField("removed", BooleanType()),
                ]
            ),
        ),
        # Deletion vector: a position-delete sidecar (directory of parquet
        # with rel_path + row_index rows) that soft-deletes rows of live
        # files without rewriting them. Sidecar-file based like Iceberg
        # position deletes (the Delta spec's DVs use roaring bitmaps; the
        # log-level semantics here are the same).
        StructField(
            "dv",
            StructType(
                [
                    StructField("path", StringType()),
                    StructField("numDeletedRows", LongType()),
                ]
            ),
        ),
    ]
)


def checkpoint_file_names(info: dict) -> list[str]:
    """Checkpoint file names (relative to ``_delta_log``) for a
    ``_last_checkpoint`` record — single, multi-part, or the V2 UUID
    top-level. Stdlib-only so the streaming source and the writer's
    driver-side gates share ONE resolution of the layout (sidecar files
    are indexed inside the V2 top-level, not here)."""
    v = int(info["version"])
    if info.get("format") == "v2":
        return [info["path"]]
    parts = info.get("parts")
    # parts == 1 uses the classic single-file name (a foreign writer may
    # record "parts": 1 explicitly) — multi-part naming only when > 1,
    # matching DeltaLog._checkpoint_paths.
    if parts and int(parts) > 1:
        n = int(parts)
        return [
            f"{v:020d}.checkpoint.{i + 1:010d}.{n:010d}.parquet"
            for i in range(n)
        ]
    return [f"{v:020d}.checkpoint.parquet"]


def _conform_column(col, src_type, dst_type):
    """Align a checkpoint column to ACTION_SCHEMA's (possibly wider) type.

    Spark cannot cast a struct with FEWER fields to a wider struct
    (DATATYPE_MISMATCH), so a checkpoint written before a schema-widening
    engine upgrade (e.g. protocol gained readerFeatures/writerFeatures,
    commitInfo gained inCommitTimestamp) would make the table unreadable
    under a whole-struct cast. Structs are therefore rebuilt field by
    field — present subfields conformed recursively, missing ones
    null-filled — preserving NULL struct values as NULL (not a struct of
    nulls, which would resurrect e.g. an absent `remove` action)."""
    from pyspark.sql.types import StructType

    if col is None or src_type is None:
        return F.lit(None).cast(dst_type)
    if isinstance(dst_type, StructType):
        if not isinstance(src_type, StructType):
            return F.lit(None).cast(dst_type)
        src_fields = {f.name: f.dataType for f in src_type.fields}
        rebuilt = F.struct(
            *[
                _conform_column(
                    col.getField(f.name) if f.name in src_fields else None,
                    src_fields.get(f.name),
                    f.dataType,
                ).alias(f.name)
                for f in dst_type.fields
            ]
        )
        return F.when(col.isNull(), F.lit(None).cast(dst_type)).otherwise(
            rebuilt
        )
    return col.cast(dst_type)


# cross-instance metadata memo for DeltaLog._metadata_fast, keyed on
# (log_dir, checkpoint version, newest json version) — every commit
# changes the key, so a stale entry can never be served
_META_MEMO: dict[tuple, dict] = {}
_LIVE_MEMO: dict[tuple, list] = {}
_COMMIT_CACHE: dict[tuple, list] = {}


def _plainify(x):
    """pyarrow ``to_pylist`` renders map values as (key, value) tuple
    lists; the add-action consumers expect plain dicts (the JSON path's
    shape). Non-map values pass through."""
    if isinstance(x, list):
        return dict(x)
    return x


class DeltaLog:
    """Reader for one table's ``_delta_log``."""

    def __init__(self, spark: SparkSession, table_path: str):
        self.spark = spark
        self.table_path = os.path.abspath(table_path)
        self.log_dir = os.path.join(self.table_path, LOG_DIR)
        if not os.path.isdir(self.log_dir):
            raise FileNotFoundError(f"not a Delta table (no {LOG_DIR}): {table_path}")
        # per-instance plan cache: an instance reads the commit-file list
        # once, so the many derived reads (version, active files,
        # tombstones, history, stats) share one scan plan. A commit made
        # AFTER construction is seen by a NEW DeltaLog, which is how every
        # caller already behaves — the standard snapshot-isolation contract.
        self._actions_cache: dict[bool, DataFrame] = {}
        # driver-side result memos under the same snapshot-isolation
        # contract: metadata and DV-path lookups are collected repeatedly
        # by the analyzer / writers, and each collect is a whole Spark
        # job (~100 ms of scheduler overhead on a tiny log)
        self._meta_cache: dict | None = None
        self._dv_paths_cache: list[str] | None = None
        self._live_rows_cache: list | None = None
        self._protocol_cache: dict | None = None

    # -- raw actions -------------------------------------------------------

    def last_checkpoint(self) -> int | None:
        """Version of the newest checkpoint, from ``_last_checkpoint``."""
        info = self.last_checkpoint_info()
        return None if info is None else int(info["version"])

    def last_checkpoint_info(self) -> dict | None:
        """The ``_last_checkpoint`` record (version, size, and — for
        multi-part checkpoints — parts), or None."""
        lc = os.path.join(self.log_dir, "_last_checkpoint")
        if not os.path.isfile(lc):
            return None
        with open(lc) as f:
            return json.load(f)

    def _checkpoint_paths(self, version: int, parts: int | None) -> list[str]:
        """File list for a checkpoint: the classic single
        ``<v>.checkpoint.parquet`` or the Delta-spec multi-part
        ``<v>.checkpoint.<i>.<n>.parquet`` set."""
        if parts and parts > 1:
            return [
                os.path.join(
                    self.log_dir,
                    f"{version:020d}.checkpoint.{i:010d}.{parts:010d}.parquet",
                )
                for i in range(1, parts + 1)
            ]
        return [os.path.join(self.log_dir, f"{version:020d}.checkpoint.parquet")]

    def _read_v2_checkpoint(self, info: dict) -> DataFrame:
        """Resolve a V2 checkpoint: the UUID top-level file carries
        non-file actions plus ``sidecar`` index rows; the referenced
        sidecar parquet files under ``_sidecars/`` carry the add/remove
        state. Returns one DataFrame shaped like a V1 checkpoint."""
        top = self.spark.read.parquet(os.path.join(self.log_dir, info["path"]))
        side_names = [
            r.path
            for r in top.where(F.col("sidecar").isNotNull())
            .select("sidecar.path")
            .collect()
        ]
        others = top.where(
            F.col("sidecar").isNull() & F.col("checkpointMetadata").isNull()
        ).drop("checkpointMetadata", "sidecar")
        if not side_names:
            return others
        sides = self.spark.read.parquet(
            *[
                os.path.join(self.log_dir, "_sidecars", n)
                for n in side_names
            ]
        )
        return others.unionByName(sides, allowMissingColumns=True)

    def actions(self, use_checkpoint: bool = True) -> DataFrame:
        """All actions, tagged with their version.

        With a checkpoint present, reads the checkpoint parquet (the
        compacted state at version V) plus ONLY the commit JSONs after V —
        log-read cost is bounded by checkpoint interval, not table age.
        ``use_checkpoint=False`` replays the raw JSON commits instead
        (needed for time travel to versions at or before the checkpoint,
        which compacts away superseded adds).
        """
        cached = self._actions_cache.get(use_checkpoint)
        if cached is not None:
            return cached
        ckpt_info = self.last_checkpoint_info() if use_checkpoint else None
        ckpt_version = None if ckpt_info is None else int(ckpt_info["version"])
        json_files = sorted(
            f
            for f in os.listdir(self.log_dir)
            if f.endswith(".json") and f[:20].isdigit()
            and (ckpt_version is None or int(f[:20]) > ckpt_version)
        )
        parts = []
        if ckpt_version is not None:
            if ckpt_info.get("format") == "v2":
                ckpt = self._read_v2_checkpoint(ckpt_info)
            else:
                ckpt = self.spark.read.parquet(
                    *self._checkpoint_paths(ckpt_version, ckpt_info.get("parts"))
                )
            ver = (
                F.col("version").cast("long")
                if "version" in ckpt.columns
                else F.lit(ckpt_version).cast("long")
            )
            src_types = {f.name: f.dataType for f in ckpt.schema.fields}
            parts.append(
                ckpt.select(
                    *[
                        _conform_column(
                            F.col(c) if c in src_types else None,
                            src_types.get(c),
                            ACTION_SCHEMA[c].dataType,
                        ).alias(c)
                        for c in ACTION_SCHEMA.fieldNames()
                    ],
                    ver.alias("version"),
                )
            )
        if json_files:
            # FAILFAST: a truncated/corrupted commit line must error
            # loudly — the default PERMISSIVE mode turns it into an
            # all-null action row and the snapshot silently loses files
            df = (
                self.spark.read.schema(ACTION_SCHEMA)
                .option("mode", "FAILFAST")
                .json([os.path.join(self.log_dir, f) for f in json_files])
            )
            parts.append(
                df.withColumn(
                    "version",
                    F.regexp_extract(
                        F.col("_metadata.file_path"), r"(\d{20})\.json$", 1
                    ).cast("long"),
                )
            )
        if not parts:
            raise FileNotFoundError(f"empty delta log: {self.log_dir}")
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        self._actions_cache[use_checkpoint] = out
        return out

    def cached_actions(self):
        """Context manager that MATERIALIZES the actions DataFrame
        (``.cache()``) for its scope and unpersists on exit — for
        multi-metric consumers like the health analyzer, which otherwise
        launch a dozen jobs that each rescan the commit JSON. Bounded
        lifetime, so cached log blocks never accumulate across tables."""
        from contextlib import contextmanager

        @contextmanager
        def scope():
            df = self.actions().cache()
            self._actions_cache[True] = df
            try:
                yield self
            finally:
                df.unpersist()
                self._actions_cache.pop(True, None)

        return scope()

    def checkpoint(
        self,
        tombstone_retention_hours: float = 168.0,
        rows_per_part: int = 500_000,
        format: str = "v1",
    ) -> int:
        """Write a checkpoint parquet of the CURRENT reconciled state and
        update ``_last_checkpoint``; returns the checkpointed version.

        ``format="v2"`` writes the Delta V2-checkpoint layout instead:
        FILE actions (add/remove) land in sidecar parquet files under
        ``_delta_log/_sidecars/``, and a UUID-named top-level
        ``<v>.checkpoint.<uuid>.parquet`` holds the non-file actions plus
        one ``checkpointMetadata`` row and one ``sidecar`` row per
        sidecar file — the layout that lets a 100 TB table's checkpoint
        be INCREMENTALLY rewritten (a future checkpoint can reuse
        unchanged sidecars) and its state read selectively. Writing v2
        upgrades the table protocol to table features with
        ``v2Checkpoint`` in the same breath (readers without the feature
        must refuse, per the spec).

        Checkpoints with more than ``rows_per_part`` state rows are
        written MULTI-PART (``<v>.checkpoint.<i>.<n>.parquet`` per the
        Delta spec, recorded as ``parts`` in ``_last_checkpoint``) — a
        100 TB table's multi-million-file state is produced by N parallel
        writers instead of one coalesced task, and read back as a normal
        multi-file parquet scan. Small states stay a classic single
        ``<v>.checkpoint.parquet``.

        State = live adds + UNEXPIRED remove tombstones (as the Delta spec
        requires — dropping them would make a later ``vacuum`` age
        recently-removed files by file mtime and delete them inside the
        retention window) + latest metaData/protocol + all commitInfo
        entries (an extension over the Delta spec so history/op-count
        metrics survive checkpoint truncation), each row keeping its
        original ``version``. Tombstones older than
        ``tombstone_retention_hours`` are compacted away; keep this >= the
        vacuum retention you intend to use (same coupling as Delta's
        ``deletedFileRetentionDuration``).
        """
        import time as _time

        version = self.version()
        acts = self.actions()
        cols = [*ACTION_SCHEMA.fieldNames(), "version"]
        live = self.active_files()
        add_rows = acts.where(F.col("add").isNotNull()).join(
            live.select("path", F.col("version").alias("add_version")),
            (F.col("add.path") == F.col("path"))
            & (F.col("version") == F.col("add_version")),
            "left_semi",
        )
        tomb_cutoff_ms = int(
            (_time.time() - tombstone_retention_hours * 3600) * 1000
        )
        tomb_rows = (
            acts.where(F.col("remove").isNotNull())
            .join(
                self.tombstones().select(
                    "path", F.col("version").alias("rm_version")
                ),
                (F.col("remove.path") == F.col("path"))
                & (F.col("version") == F.col("rm_version")),
                "left_semi",
            )
            .where(
                F.col("remove.deletionTimestamp").isNull()
                | (F.col("remove.deletionTimestamp") >= tomb_cutoff_ms)
            )
        )
        meta = (
            acts.where(F.col("metaData").isNotNull())
            .orderBy(F.desc("version"))
            .limit(1)
        )
        proto = (
            acts.where(F.col("protocol").isNotNull())
            .orderBy(F.desc("version"))
            .limit(1)
        )
        infos = acts.where(F.col("commitInfo").isNotNull())
        # dv actions whose target files were all since rewritten (by
        # apply_deletion_vectors / compact / merge) are semantic no-ops;
        # carrying them forever would grow the broadcast anti-join set on
        # every snapshot read unboundedly over table lifetime. Keep only
        # vectors that still soft-delete at least one live file — like
        # expired tombstones, they compact away here (and vacuum may then
        # physically delete their sidecars).
        live_dv_paths = self._live_dv_paths(live)
        dvs = acts.where(
            F.col("dv").isNotNull() & F.col("dv.path").isin(live_dv_paths)
            if live_dv_paths
            else F.lit(False)
        )
        # latest txn per appId (per the Delta spec) so idempotent writers
        # keep their replay guard across checkpoint truncation
        w_txn = Window.partitionBy(F.col("txn.appId")).orderBy(
            F.desc("txn.version"), F.desc("version")
        )
        txns = (
            acts.where(F.col("txn").isNotNull())
            .withColumn("rn", F.row_number().over(w_txn))
            .where(F.col("rn") == 1)
            .drop("rn")
        )
        # latest domainMetadata per domain (Delta spec): the row-tracking
        # high-water mark must survive checkpoint truncation
        w_dom = Window.partitionBy(F.col("domainMetadata.domain")).orderBy(
            F.desc("version")
        )
        domains = (
            acts.where(F.col("domainMetadata").isNotNull())
            .withColumn("rn", F.row_number().over(w_dom))
            .where(F.col("rn") == 1)
            .drop("rn")
        )
        state = (
            add_rows.select(*cols)
            .unionByName(tomb_rows.select(*cols))
            .unionByName(meta.select(*cols))
            .unionByName(proto.select(*cols))
            .unionByName(infos.select(*cols))
            .unionByName(dvs.select(*cols))
            .unionByName(txns.select(*cols))
            .unionByName(domains.select(*cols))
        )
        import math
        import shutil
        import uuid

        if format == "v2":
            return self._checkpoint_v2(
                state, version, rows_per_part, tombstone_retention_hours
            )
        if format != "v1":
            raise ValueError(f"unknown checkpoint format {format!r}")
        n_rows = state.count()
        n_parts = max(1, math.ceil(n_rows / rows_per_part))
        tmp_dir = os.path.join(self.log_dir, f".ckpt-tmp-{uuid.uuid4().hex}")
        state.repartition(n_parts).write.parquet(tmp_dir)
        part_files = sorted(
            f for f in os.listdir(tmp_dir) if f.endswith(".parquet")
        )
        targets = self._checkpoint_paths(version, len(part_files))
        for tgt in targets + self._checkpoint_paths(version, None):
            if os.path.isdir(tgt):
                shutil.rmtree(tgt)
            elif os.path.isfile(tgt):
                os.remove(tgt)
        for src, tgt in zip(part_files, targets):
            os.rename(os.path.join(tmp_dir, src), tgt)
        shutil.rmtree(tmp_dir)
        info = {"version": version, "size": n_rows}
        if len(part_files) > 1:
            info["parts"] = len(part_files)
        with open(os.path.join(self.log_dir, "_last_checkpoint"), "w") as f:
            json.dump(info, f)
        return version

    def _checkpoint_v2(
        self,
        state: DataFrame,
        version: int,
        rows_per_part: int,
        tombstone_retention_hours: float,
    ) -> int:
        """The V2 layout half of ``checkpoint``: sidecar files carry the
        file actions (written by N parallel tasks), the UUID-named
        top-level file carries everything else plus the
        checkpointMetadata/sidecar index rows."""
        import math
        import shutil
        import uuid

        from delta_lake_health_spark.sources import delta_writer

        # same-commit protocol upgrade rule doesn't apply (a checkpoint
        # isn't a commit), so the upgrade is its own tiny commit FIRST —
        # a reader must never find a v2 checkpoint on a table whose
        # protocol doesn't announce it
        upgrade = delta_writer._protocol_upgrade_action(
            self.spark, self.table_path, "v2Checkpoint"
        )
        if upgrade is not None:
            version = delta_writer.current_version(self.table_path) + 1
            delta_writer._commit(
                self.table_path,
                version,
                [
                    upgrade,
                    delta_writer._commit_info(
                        "UPGRADE PROTOCOL", {"feature": "v2Checkpoint"}, {}
                    ),
                ],
            )
            # the upgrade commit must be part of the checkpointed state
            fresh = DeltaLog(self.spark, self.table_path)
            return fresh.checkpoint(
                tombstone_retention_hours=tombstone_retention_hours,
                rows_per_part=rows_per_part,
                format="v2",
            )

        sidecar_dir = os.path.join(self.log_dir, "_sidecars")
        os.makedirs(sidecar_dir, exist_ok=True)
        file_actions = state.where(
            F.col("add").isNotNull() | F.col("remove").isNotNull()
        )
        other = state.where(
            F.col("add").isNull() & F.col("remove").isNull()
        )
        n_files = file_actions.count()
        n_parts = max(1, math.ceil(n_files / rows_per_part))
        tmp_dir = os.path.join(self.log_dir, f".ckpt-tmp-{uuid.uuid4().hex}")
        file_actions.repartition(n_parts).write.parquet(tmp_dir)
        sidecars = []
        for src in sorted(
            f for f in os.listdir(tmp_dir) if f.endswith(".parquet")
        ):
            name = f"{uuid.uuid4().hex}.parquet"
            os.rename(
                os.path.join(tmp_dir, src), os.path.join(sidecar_dir, name)
            )
            sidecars.append(name)
        shutil.rmtree(tmp_dir)

        now = int(__import__("time").time() * 1000)
        # index rows are tiny (1 + |sidecars|); the non-file actions stay
        # a DataFrame end to end — a long-lived table's full commitInfo
        # history never materializes on the driver
        index_schema = StructType(
            [
                StructField(
                    "checkpointMetadata",
                    StructType([StructField("version", LongType())]),
                ),
                StructField(
                    "sidecar",
                    StructType(
                        [
                            StructField("path", StringType()),
                            StructField("sizeInBytes", LongType()),
                            StructField("modificationTime", LongType()),
                        ]
                    ),
                ),
            ]
        )
        index_rows = [((version,), None)]
        for name in sidecars:
            fp = os.path.join(sidecar_dir, name)
            index_rows.append(
                (None, (name, os.path.getsize(fp), now))
            )
        index_df = self.spark.createDataFrame(index_rows, index_schema)
        top = other.unionByName(index_df, allowMissingColumns=True)
        top_name = f"{version:020d}.checkpoint.{uuid.uuid4().hex}.parquet"
        top_tmp = os.path.join(self.log_dir, f".ckpt-tmp-{uuid.uuid4().hex}")
        top.coalesce(1).write.parquet(top_tmp)
        part = next(
            f for f in os.listdir(top_tmp) if f.endswith(".parquet")
        )
        os.rename(
            os.path.join(top_tmp, part), os.path.join(self.log_dir, top_name)
        )
        shutil.rmtree(top_tmp)
        info = {
            "version": version,
            "size": n_files + other.count() + len(index_rows),
            "format": "v2",
            "path": top_name,
        }
        with open(os.path.join(self.log_dir, "_last_checkpoint"), "w") as f:
            json.dump(info, f)
        return version

    # -- snapshot ----------------------------------------------------------

    def earliest_version(self) -> int:
        """Lowest commit JSON still on disk — 0 until
        ``maintenance.cleanup_log`` expires pre-checkpoint history."""
        vs = [
            int(f[:20])
            for f in os.listdir(self.log_dir)
            if f.endswith(".json") and f[:20].isdigit()
        ]
        return min(vs, default=0)

    def require_history_from(self, version: int) -> None:
        """Raise if raw-JSON replay starting at ``version`` is impossible
        because log cleanup expired earlier commits (Delta semantics:
        time travel / change feeds are bounded by log retention)."""
        earliest = self.earliest_version()
        if version < earliest:
            raise ValueError(
                f"log history before version {earliest} has been cleaned "
                f"up (requested {version}); time travel and change feeds "
                "are bounded by the log retention window"
            )

    def _as_of_source(self, as_of: int) -> bool:
        """Whether replay to ``as_of`` may read from the checkpoint
        (state at V + JSON tail is exact for any as_of >= V — and after
        log cleanup it is the ONLY exact source). Raises if neither the
        checkpoint nor retained JSON can reconstruct ``as_of``."""
        info = self.last_checkpoint_info()
        if info is not None and as_of >= int(info["version"]):
            return True
        self.require_history_from(0)
        return False

    def active_files(self, as_of: int | None = None) -> DataFrame:
        """One row per live data file: path, partitionValues, size,
        num_records, version (the commit that added it).

        Last-wins reconciliation: rank actions per path by (version desc,
        add-before-remove desc); a path is live iff its top-ranked action
        is an add. One shuffle over |files| rows. ``as_of`` reconstructs
        the state as of that committed version (time travel) by replaying
        only actions with version <= as_of from the raw JSON log.
        """
        use_ckpt = True if as_of is None else self._as_of_source(as_of)
        acts = self.actions(use_checkpoint=use_ckpt)
        if as_of is not None:
            acts = acts.where(F.col("version") <= as_of)
        adds = acts.where(F.col("add").isNotNull()).select(
            F.col("add.path").alias("path"),
            F.col("add.partitionValues").alias("partitionValues"),
            F.col("add.size").alias("size"),
            F.get_json_object("add.stats", "$.numRecords")
            .cast("long")
            .alias("num_records"),
            "version",
            F.lit(1).alias("is_add"),
        )
        removes = acts.where(F.col("remove").isNotNull()).select(
            F.col("remove.path").alias("path"),
            F.lit(None).cast(_STR_MAP).alias("partitionValues"),
            F.lit(None).cast("long").alias("size"),
            F.lit(None).cast("long").alias("num_records"),
            "version",
            F.lit(0).alias("is_add"),
        )
        # add outranks remove at the same version (add-wins, as documented:
        # a commit that removes and re-adds a path keeps the file live)
        w = Window.partitionBy("path").orderBy(F.desc("version"), F.desc("is_add"))
        return (
            adds.unionByName(removes)
            .withColumn("rn", F.row_number().over(w))
            .where((F.col("rn") == 1) & (F.col("is_add") == 1))
            .drop("rn", "is_add")
        )

    def live_files_rows(self, as_of: int | None = None) -> list:
        """``active_files().select(path, partitionValues).collect()`` with
        a per-instance memo for the current-version case — every snapshot
        path needs this exact list, and each collect is a whole job."""
        if as_of is None and self._live_rows_cache is not None:
            return self._live_rows_cache
        rows = None
        if as_of is None:
            fast = self._live_adds_fast()
            if fast is not None:
                from collections import namedtuple

                LiveFile = namedtuple("LiveFile", ["path", "partitionValues"])
                rows = [
                    LiveFile(a["path"], dict(a.get("partitionValues") or {}))
                    for a in fast
                ]
        if rows is None:
            rows = (
                self.active_files(as_of)
                .select("path", "partitionValues")
                .collect()
            )
        if as_of is None:
            self._live_rows_cache = rows
        return rows

    def live_add_actions(self) -> list[dict]:
        """Full add-action dicts (path, partitionValues, size,
        modificationTime, stats) for every live file — what SHALLOW CLONE
        copies into the new table's log. Metadata-sized collect."""
        fast = self._live_adds_fast()
        if fast is not None:
            return [
                {k: v for k, v in a.items() if k != "_v" and v is not None}
                for a in fast
            ]
        acts = self.actions()
        add_type = acts.schema["add"].dataType
        adds = acts.where(F.col("add").isNotNull()).select(
            F.col("add.path").alias("path"), F.col("add").alias("a"),
            "version", F.lit(1).alias("is_add"),
        )
        removes = acts.where(F.col("remove").isNotNull()).select(
            F.col("remove.path").alias("path"),
            F.lit(None).cast(add_type).alias("a"),
            "version", F.lit(0).alias("is_add"),
        )
        w = Window.partitionBy("path").orderBy(F.desc("version"), F.desc("is_add"))
        rows = (
            adds.unionByName(removes)
            .withColumn("rn", F.row_number().over(w))
            .where((F.col("rn") == 1) & (F.col("is_add") == 1))
            .select("a")
            .collect()
        )
        out = []
        for r in rows:
            d = r.a.asDict(recursive=True)
            out.append({k: v for k, v in d.items() if v is not None})
        return out

    def tombstones(self) -> DataFrame:
        """Files whose latest action is a remove (vacuum candidates)."""
        acts = self.actions()
        adds = acts.where(F.col("add").isNotNull()).select(
            F.col("add.path").alias("path"), "version",
            F.lit(None).cast("long").alias("deletionTimestamp"),
            F.lit(1).alias("is_add"),
        )
        removes = acts.where(F.col("remove").isNotNull()).select(
            F.col("remove.path").alias("path"), "version",
            F.col("remove.deletionTimestamp").alias("deletionTimestamp"),
            F.lit(0).alias("is_add"),
        )
        # add outranks remove at the same version (add-wins, as documented:
        # a commit that removes and re-adds a path keeps the file live)
        w = Window.partitionBy("path").orderBy(F.desc("version"), F.desc("is_add"))
        return (
            adds.unionByName(removes)
            .withColumn("rn", F.row_number().over(w))
            .where((F.col("rn") == 1) & (F.col("is_add") == 0))
            .select("path", "version", "deletionTimestamp")
        )

    # -- history / metadata ------------------------------------------------

    def history(self, limit: int | None = None) -> DataFrame:
        """DESCRIBE HISTORY equivalent: version, timestamp, operation,
        operationParameters, operationMetrics — newest first; ``limit``
        keeps only the most recent N commits (`DESCRIBE HISTORY ... LIMIT`).

        Sources BOTH the checkpoint-merged view and the retained commit
        JSONs, deduplicated by version. Spec-compliant foreign
        checkpoints carry NO commitInfo, so the checkpoint-merged view
        alone would lose every pre-checkpoint commit even though its
        JSON is still on disk — Delta's DeltaHistoryManager walks the
        commit files directly for the same reason (cost ∝ retained log
        window). Our own checkpoints RETAIN commitInfo rows, so after
        log cleanup (D49) expires pre-checkpoint JSONs the checkpoint
        side still serves the full operation history — strictly more
        than Delta preserves. Where both sources have a version, the
        rows are identical and the dedup picks either."""
        src = self.actions()
        if self.last_checkpoint() is not None:
            try:
                src = src.unionByName(self.actions(use_checkpoint=False))
            except FileNotFoundError:
                pass  # checkpoint-only log: no commit JSONs retained
        ci_fields = {
            f.name
            for f in src.schema["commitInfo"].dataType.fields  # type: ignore[union-attr]
        }
        # report the inCommitTimestamp when present (Delta's DESCRIBE
        # HISTORY does the same once ICT is enabled): the ICT is the
        # timestamp `timestampAsOf` resolution uses, so a history row's
        # timestamp must address ITS OWN version — the wall-clock
        # commitInfo.timestamp can trail the ICT by a millisecond and
        # then resolves to the predecessor
        ts_col = (
            F.coalesce(
                F.col("commitInfo.inCommitTimestamp"),
                F.col("commitInfo.timestamp"),
            )
            if "inCommitTimestamp" in ci_fields
            else F.col("commitInfo.timestamp")
        )
        out = (
            src.where(F.col("commitInfo").isNotNull())
            .dropDuplicates(["version"])
            .select(
                "version",
                ts_col.alias("timestamp"),
                F.col("commitInfo.operation").alias("operation"),
                F.col("commitInfo.operationParameters").alias("operationParameters"),
                F.col("commitInfo.operationMetrics").alias("operationMetrics"),
            )
            .orderBy(F.desc("version"))
        )
        return out.limit(limit) if limit is not None else out

    def version(self) -> int:
        # newest commit version straight from the log listing (every
        # commit writes a json; after cleanup the checkpoint floor
        # remains) — the Spark aggregate computed exactly this from the
        # filename-derived version column (r14)
        st = self._fast_scan_state()
        if st is not None:
            _, ckpt_version, versions, _ = st
            if versions:
                return versions[-1]
            if ckpt_version is not None:
                return ckpt_version
            # empty log dir: fall through so the Spark path raises the
            # same FileNotFoundError it always has
        row = self.actions().agg(F.max("version").alias("v")).collect()[0]
        return int(row.v) if row.v is not None else 0

    def _metadata_fast(self):
        """Driver-side ``metadata()`` for the current snapshot: the log
        JSONs are small local files, so scanning them BACKWARD in Python
        finds the newest metaData action in microseconds, where the
        Spark path paid a whole JSON-scan job (~0.2 s of scheduler
        overhead) — and the writer used to pay that job FIVE times per
        commit (r14 profile: 0.95 s of a 1.1 s small append). Falls back
        (returns None) for anything unusual — v2 / multi-part
        checkpoints, parse errors — so the Spark path stays the source
        of truth for the long tail. Memoized across DeltaLog instances
        keyed on (log_dir, checkpoint version, newest json version):
        the key changes with every commit, preserving the
        snapshot-isolation contract documented on __init__."""
        try:
            st = self._fast_scan_state()
            if st is None:
                return None
            ckpt_info, ckpt_version, versions, key = st
            if not versions and ckpt_version is None:
                return None  # empty log: Spark path raises, keep that
            hit = _META_MEMO.get(key)
            if hit is not None:
                return hit

            def _build(m: dict) -> dict:
                schema_str = m.get("schemaString")
                return {
                    "id": m.get("id"),
                    "name": m.get("name"),
                    "partition_columns": list(m.get("partitionColumns") or []),
                    "schema": json.loads(schema_str) if schema_str else None,
                    "configuration": dict(m.get("configuration") or {}),
                }

            out = None
            for v in reversed(versions):
                found = None
                for act in self._parsed_commit(v):
                    if act.get("metaData") is not None:
                        found = act["metaData"]  # last in the commit wins
                if found is not None:
                    out = _build(found)
                    break
            if out is None and ckpt_version is not None:
                if ckpt_info.get("format") == "v2" or (
                    ckpt_info.get("parts") or 1
                ) > 1:
                    return None  # rare shapes keep the Spark path
                import pyarrow.parquet as pq

                t = pq.read_table(
                    self._checkpoint_paths(ckpt_version, None)[0],
                    columns=["metaData"],
                )
                for m in t.column("metaData").to_pylist():
                    if m is not None and m.get("schemaString"):
                        out = _build(m)
                        break
            if out is None:
                out = {}
            if len(_META_MEMO) > 512:
                _META_MEMO.clear()
            _META_MEMO[key] = out
            return out
        except Exception:  # noqa: BLE001 — fast path only; Spark is truth
            return None

    def _fast_scan_state(self):
        """(ckpt_info, ckpt_version, post-ckpt json versions, memo key)
        for the driver-side fast paths, or None when the checkpoint has
        a shape the fast paths don't handle (v2 / multi-part)."""
        ckpt_info = self.last_checkpoint_info()
        ckpt_version = None if ckpt_info is None else int(ckpt_info["version"])
        if ckpt_info is not None and (
            ckpt_info.get("format") == "v2" or (ckpt_info.get("parts") or 1) > 1
        ):
            return None
        versions = sorted(
            int(f[:20])
            for f in os.listdir(self.log_dir)
            if f.endswith(".json") and f[:20].isdigit()
            and (ckpt_version is None or int(f[:20]) > ckpt_version)
        )
        # the newest log file's identity (size + mtime) joins the key:
        # a table rmtree'd and REBUILT at the same path with the same
        # version count must never be served the old table's memo
        # (r14 bench caught exactly that on a force-rebuilt fixture)
        newest = (
            os.path.join(self.log_dir, f"{versions[-1]:020d}.json")
            if versions
            else (
                self._checkpoint_paths(ckpt_version, None)[0]
                if ckpt_version is not None
                and (ckpt_info.get("parts") or 1) == 1
                else None
            )
        )
        stamp = None
        if newest is not None and os.path.exists(newest):
            st = os.stat(newest)
            stamp = (st.st_size, st.st_mtime_ns)
        key = (
            self.log_dir,
            ckpt_version,
            versions[-1] if versions else -1,
            stamp,
        )
        return ckpt_info, ckpt_version, versions, key

    def _parsed_commit(self, v: int) -> list[dict]:
        """Every action of commit ``v`` parsed with json.loads — a
        corrupted/truncated line RAISES (the fast paths then fall back
        to the Spark FAILFAST read, which fails loudly: silent action
        loss is the one failure mode the log reader must never have).
        Cached on (path, size, mtime)."""
        p = os.path.join(self.log_dir, f"{v:020d}.json")
        st = os.stat(p)
        key = (p, st.st_size, st.st_mtime_ns)
        hit = _COMMIT_CACHE.get(key)
        if hit is None:
            with open(p) as f:
                hit = [json.loads(line) for line in f if line.strip()]
            if len(_COMMIT_CACHE) > 4096:
                _COMMIT_CACHE.clear()
            _COMMIT_CACHE[key] = hit
        return hit

    def _live_adds_fast(self) -> list[dict] | None:
        """Driver-side last-wins log replay: the live add-action dicts
        (each with its commit version under ``_v``), or None to fall
        back to the Spark path. Same reconciliation as
        ``active_files()`` — rank (version DESC, add-before-remove),
        live iff top action is an add; replayed here as: checkpoint
        adds (already reconciled) -> per ascending commit, removes
        applied before adds (add wins within a commit). The consumers
        below (live_files_rows, live_add_actions, _active_rel_paths)
        all COLLECT this list anyway, so driver memory is unchanged —
        only the per-call Spark log-scan jobs disappear (r14: each was
        ~0.2-0.7 s of scheduler overhead on small logs; delete_with_dv
        paid three of them). Memoized like _metadata_fast."""
        try:
            st = self._fast_scan_state()
            if st is None:
                return None
            ckpt_info, ckpt_version, versions, key = st
            if not versions and ckpt_version is None:
                return None  # empty log: Spark path raises, keep that
            hit = _LIVE_MEMO.get(key)
            if hit is not None:
                return hit
            live: dict[str, dict] = {}
            if ckpt_version is not None:
                import pyarrow.parquet as pq

                t = pq.read_table(
                    self._checkpoint_paths(ckpt_version, None)[0],
                    columns=["add", "remove", "version"],
                )
                removes = t.column("remove").to_pylist()
                vers = t.column("version").to_pylist()
                adds = t.column("add").to_pylist()
                for r in removes:
                    if r is not None and r.get("path"):
                        live.pop(r["path"], None)
                for a, v in zip(adds, vers):
                    if a is not None and a.get("path"):
                        d = {k: _plainify(x) for k, x in a.items() if x is not None}
                        d["_v"] = int(v if v is not None else ckpt_version)
                        live[d["path"]] = d
            for v in versions:
                adds_j, removes_j = [], []
                for act in self._parsed_commit(v):
                    if act.get("add") is not None:
                        adds_j.append(act["add"])
                    elif act.get("remove") is not None:
                        removes_j.append(act["remove"])
                for r in removes_j:
                    if r.get("path"):
                        live.pop(r["path"], None)
                for a in adds_j:
                    if a.get("path"):
                        d = {k: x for k, x in a.items() if x is not None}
                        d["_v"] = v
                        live[d["path"]] = d
            out = sorted(live.values(), key=lambda d: d["path"])
            if len(_LIVE_MEMO) > 256:
                _LIVE_MEMO.clear()
            _LIVE_MEMO[key] = out
            return out
        except Exception:  # noqa: BLE001 — fast path only; Spark is truth
            return None

    def metadata(self, as_of: int | None = None) -> dict:
        if as_of is None and self._meta_cache is not None:
            return self._meta_cache
        if as_of is None:
            fast = self._metadata_fast()
            if fast is not None:
                self._meta_cache = fast
                return fast
        use_ckpt = True if as_of is None else self._as_of_source(as_of)
        acts = self.actions(use_checkpoint=use_ckpt)
        if as_of is not None:
            acts = acts.where(F.col("version") <= as_of)
        rows = (
            acts
            .where(F.col("metaData").isNotNull())
            .orderBy(F.desc("version"))
            .limit(1)
            .collect()
        )
        if not rows:
            out = {}
        else:
            m = rows[0].metaData
            out = {
                "id": m.id,
                "name": m.name,
                "partition_columns": list(m.partitionColumns or []),
                "schema": json.loads(m.schemaString) if m.schemaString else None,
                "configuration": dict(m.configuration or {}),
            }
        if as_of is None:
            self._meta_cache = out
        return out

    def partition_columns(self) -> list[str]:
        return self.metadata().get("partition_columns", [])

    @staticmethod
    def column_mapping(schema: dict | None) -> dict[str, str]:
        """{logical name: physical name} for fields carrying the Delta
        column-mapping key ``delta.columnMapping.physicalName``. Empty for
        never-renamed tables (physical == logical)."""
        out: dict[str, str] = {}
        for f in (schema or {}).get("fields", []):
            p = (f.get("metadata") or {}).get("delta.columnMapping.physicalName")
            if p and p != f["name"]:
                out[f["name"]] = p
        return out

    @staticmethod
    def physical_schema(schema: dict) -> dict:
        """The schema as written in data files: field names replaced by
        their physical names (RENAME COLUMN is metadata-only, so files —
        old and new — always carry physical names)."""
        fields = []
        for f in schema.get("fields", []):
            p = (f.get("metadata") or {}).get("delta.columnMapping.physicalName")
            fields.append({**f, "name": p} if p else f)
        return {"type": "struct", "fields": fields}

    def _rename_physical_to_logical(self, df: DataFrame, schema: dict) -> DataFrame:
        mapping = self.column_mapping(schema)
        if mapping:
            df = df.withColumnsRenamed({p: l for l, p in mapping.items()})
        return df

    # Reader features this engine actually implements; protocol gating
    # below refuses tables demanding anything else (Delta table-features
    # protocol: better a clear refusal than a silently wrong read).
    # timestampNtz only gates the TIMESTAMP_NTZ data type, which Spark 4
    # reads natively through the logged schema; vacuumProtocolCheck
    # mandates that VACUUM consult the protocol before touching files —
    # maintenance.vacuum() runs both gates.
    SUPPORTED_READER_FEATURES = frozenset(
        {"deletionVectors", "columnMapping", "v2Checkpoint",
         "timestampNtz", "vacuumProtocolCheck",
         # VARIANT data type: Spark 4 reads the shredded parquet
         # encoding natively through the logged schema
         "variantType"}
    )

    def _protocol_fast(self) -> dict | None:
        """Driver-side ``protocol()`` — same backward json scan (then
        checkpoint) as _metadata_fast; None falls back to Spark."""
        try:
            st = self._fast_scan_state()
            if st is None:
                return None
            ckpt_info, ckpt_version, versions, _ = st
            if not versions and ckpt_version is None:
                return None  # empty log: Spark path raises, keep that
            found = None
            for v in reversed(versions):
                for act in self._parsed_commit(v):
                    if act.get("protocol") is not None:
                        found = act["protocol"]
                if found is not None:
                    break
            if found is None and ckpt_version is not None:
                import pyarrow.parquet as pq

                t = pq.read_table(
                    self._checkpoint_paths(ckpt_version, None)[0],
                    columns=["protocol"],
                )
                for p in t.column("protocol").to_pylist():
                    if p is not None and p.get("minReaderVersion") is not None:
                        found = p
                        break
            if found is None:
                return {"minReaderVersion": 1, "minWriterVersion": 2,
                        "readerFeatures": [], "writerFeatures": []}
            return {
                "minReaderVersion": int(found["minReaderVersion"]),
                "minWriterVersion": int(found["minWriterVersion"]),
                "readerFeatures": list(found.get("readerFeatures") or []),
                "writerFeatures": list(found.get("writerFeatures") or []),
            }
        except Exception:  # noqa: BLE001 — fast path only; Spark is truth
            return None

    def protocol(self) -> dict:
        """Latest protocol action: {minReaderVersion, minWriterVersion,
        readerFeatures, writerFeatures} (feature lists empty for legacy
        version-only protocols)."""
        if getattr(self, "_protocol_cache", None) is not None:
            return self._protocol_cache
        fast = self._protocol_fast()
        if fast is not None:
            self._protocol_cache = fast
            return fast
        rows = (
            self.actions()
            .where(F.col("protocol").isNotNull())
            .orderBy(F.desc("version"))
            .limit(1)
            .collect()
        )
        if not rows:
            out = {"minReaderVersion": 1, "minWriterVersion": 2,
                   "readerFeatures": [], "writerFeatures": []}
        else:
            p = rows[0].protocol
            out = {
                "minReaderVersion": int(p.minReaderVersion),
                "minWriterVersion": int(p.minWriterVersion),
                "readerFeatures": list(getattr(p, "readerFeatures", None) or []),
                "writerFeatures": list(getattr(p, "writerFeatures", None) or []),
            }
        self._protocol_cache = out
        return out

    def require_readable(self) -> None:
        """Protocol gate (Delta spec): refuse to read a table whose
        protocol demands reader capabilities this engine lacks, instead
        of returning silently wrong data (e.g. unapplied deletion
        semantics of an unknown feature)."""
        p = self.protocol()
        r = p["minReaderVersion"]
        if r > 3:
            raise ValueError(
                f"unsupported Delta protocol: minReaderVersion={r} "
                "(this reader supports up to 3)"
            )
        if r == 3:
            unsupported = set(p["readerFeatures"]) - self.SUPPORTED_READER_FEATURES
            if unsupported:
                raise ValueError(
                    "unsupported Delta reader features: "
                    f"{sorted(unsupported)} (supported: "
                    f"{sorted(self.SUPPORTED_READER_FEATURES)})"
                )

    def version_checksum(self) -> dict | None:
        """The current version's ``.crc`` checksum (tableSizeBytes,
        numFiles) written incrementally at commit time, or None when
        absent (foreign log / unresolvable commit) — see
        delta_writer._write_version_checksum."""
        import json as _json
        import os as _os

        p = _os.path.join(
            self.table_path, "_delta_log", f"{self.version():020d}.crc"
        )
        try:
            with open(p) as f:
                c = _json.loads(f.read())
            if int(c.get("version", -1)) != self.version():
                return None
            return {
                "tableSizeBytes": int(c["tableSizeBytes"]),
                "numFiles": int(c["numFiles"]),
            }
        except (FileNotFoundError, KeyError, ValueError, TypeError):
            # accelerator only: a malformed/foreign .crc (e.g. null
            # fields) must fall back to replay, never crash detail()
            return None

    def detail(self) -> dict:
        """``DESCRIBE DETAIL`` equivalent (the fields the reference's
        Spark analyzer consumes — delta_spark_analyzer.py:116-189:
        sizeInBytes, numFiles, partitionColumns, location — plus the
        rest of Delta's detail row). Log-only aggregates, no data scan;
        size/count come from the version checksum when one exists (two
        numbers from one tiny file), replay otherwise."""
        meta = self.metadata()
        crc = self.version_checksum()
        stats = (
            {
                "data_file_count": crc["numFiles"],
                "table_size_bytes": crc["tableSizeBytes"],
            }
            if crc is not None
            else self.file_stats()
        )
        proto_rows = (
            self.actions()
            .where(F.col("protocol").isNotNull())
            .orderBy(F.desc("version"))
            .limit(1)
            .collect()
        )
        proto = proto_rows[0].protocol if proto_rows else None
        commit_ts = (
            self.actions()
            .where(F.col("commitInfo").isNotNull())
            .agg(
                F.min("commitInfo.timestamp").alias("created"),
                F.max("commitInfo.timestamp").alias("modified"),
            )
            .collect()[0]
        )
        return {
            "format": "delta",
            "id": meta.get("id"),
            "name": meta.get("name"),
            "location": self.table_path,
            "createdAt": commit_ts.created,
            "lastModified": commit_ts.modified,
            "partitionColumns": meta.get("partition_columns", []),
            "numFiles": stats["data_file_count"],
            "sizeInBytes": stats["table_size_bytes"],
            "properties": meta.get("configuration", {}),
            "minReaderVersion": getattr(proto, "minReaderVersion", None),
            "minWriterVersion": getattr(proto, "minWriterVersion", None),
        }

    def last_txn_version(self, app_id: str) -> int | None:
        """Highest ``txn.version`` recorded for ``app_id``, or None —
        the idempotent-writer replay guard (Delta spec txn action)."""
        row = (
            self.actions()
            .where(F.col("txn").isNotNull() & (F.col("txn.appId") == app_id))
            .agg(F.max("txn.version").alias("v"))
            .collect()[0]
        )
        return int(row.v) if row.v is not None else None

    # -- row tracking ------------------------------------------------------

    def domain_metadata(self, domain: str) -> dict | None:
        """Latest configuration for a ``domainMetadata`` domain (Delta
        spec), or None if never set / tombstoned (``removed=true``)."""
        rows = (
            self.actions()
            .where(F.col("domainMetadata.domain") == domain)
            .orderBy(F.desc("version"))
            .select("domainMetadata.configuration", "domainMetadata.removed")
            .limit(1)
            .collect()
        )
        if not rows or rows[0].removed:
            return None
        return json.loads(rows[0].configuration or "{}")

    def row_id_high_water_mark(self) -> int:
        """Highest assigned fresh row id (``delta.rowTracking`` domain),
        -1 when row tracking was never enabled."""
        cfg = self.domain_metadata("delta.rowTracking")
        if cfg is None:
            return -1
        return int(cfg.get("rowIdHighWaterMark", -1))

    def row_ids(self, as_of: int | None = None) -> DataFrame:
        """Snapshot plus Delta row-tracking lineage: ``_row_id`` =
        the file's ``baseRowId`` + the row's PHYSICAL index (fresh row
        ids per the spec — DV soft-deletes leave survivors' ids stable
        because the physical index is captured before the anti-join),
        and ``_row_commit_version`` = ``defaultRowCommitVersion``.

        Scale shape: the per-file (path, baseRowId) map is |files| rows
        and broadcasts; the data never shuffles."""
        base = self.snapshot_with_positions(as_of)
        use_ckpt = True if as_of is None else self._as_of_source(as_of)
        acts = self.actions(use_checkpoint=use_ckpt)
        if as_of is not None:
            acts = acts.where(F.col("version") <= as_of)
        adds = acts.where(F.col("add").isNotNull()).select(
            F.col("add.path").alias("_rel_path"),
            F.col("add.baseRowId").alias("_base_row_id"),
            F.col("add.defaultRowCommitVersion").alias("_row_commit_version"),
            "version",
        )
        w = Window.partitionBy("_rel_path").orderBy(F.desc("version"))
        latest = (
            adds.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .drop("rn", "version")
        )
        return (
            base.join(F.broadcast(latest), "_rel_path", "left")
            .withColumn(
                "_row_id", F.col("_base_row_id") + F.col("_row_index")
            )
            .drop("_base_row_id")
        )

    # -- deletion vectors --------------------------------------------------

    def _dv_paths_fast(self) -> list[str] | None:
        """Driver-side ``deletion_vector_paths()`` — checkpoint dv rows
        (pyarrow) then ascending post-checkpoint json dv actions, the
        same order the Spark union collects; None falls back."""
        try:
            st = self._fast_scan_state()
            if st is None:
                return None
            _, ckpt_version, versions, _ = st
            if not versions and ckpt_version is None:
                return None
            out: list[str] = []
            if ckpt_version is not None:
                import pyarrow.parquet as pq

                t = pq.read_table(
                    self._checkpoint_paths(ckpt_version, None)[0],
                    columns=["dv"],
                )
                out.extend(
                    d["path"]
                    for d in t.column("dv").to_pylist()
                    if d is not None and d.get("path")
                )
            for v in versions:
                for act in self._parsed_commit(v):
                    dv = act.get("dv")
                    if dv is not None and dv.get("path"):
                        out.append(dv["path"])
            return out
        except Exception:  # noqa: BLE001 — fast path only; Spark is truth
            return None

    def deletion_vector_paths(self, as_of: int | None = None) -> list[str]:
        if as_of is None and self._dv_paths_cache is not None:
            return self._dv_paths_cache
        if as_of is None:
            fast = self._dv_paths_fast()
            if fast is not None:
                self._dv_paths_cache = fast
                return fast
        use_ckpt = True if as_of is None else self._as_of_source(as_of)
        acts = self.actions(use_checkpoint=use_ckpt)
        if as_of is not None:
            acts = acts.where(F.col("version") <= as_of)
        out = [
            r.path
            for r in acts.where(F.col("dv").isNotNull())
            .select(F.col("dv.path").alias("path"))
            .collect()
        ]
        if as_of is None:
            self._dv_paths_cache = out
        return out

    def deletion_vectors(self, as_of: int | None = None) -> DataFrame | None:
        """(rel_path, row_index) of every soft-deleted row, or None when
        the table has no deletion vectors. Sidecars are tiny relative to
        the data (|deleted rows| x 2 columns)."""
        paths = self.deletion_vector_paths(as_of)
        if not paths:
            return None
        abs_paths = [os.path.join(self.table_path, p) for p in paths]
        return self.spark.read.parquet(*abs_paths)

    def _live_dv_paths(self, live: DataFrame) -> list[str]:
        """Sidecar rel paths of dv actions that still soft-delete at least
        one live file (``live`` = ``active_files()`` output). One scan over
        the tiny sidecars semi-joined with the live list; sidecar identity
        is recovered from the scan's file metadata."""
        from urllib.parse import unquote, urlparse

        paths = self.deletion_vector_paths()
        if not paths:
            return []
        abs_paths = [os.path.join(self.table_path, p) for p in paths]
        hits = (
            self.spark.read.parquet(*abs_paths)
            .withColumn("_sc_file", F.col("_metadata.file_path"))
            .join(
                live.select(F.col("path").alias("rel_path")),
                "rel_path",
                "left_semi",
            )
            .select("_sc_file")
            .distinct()
            .collect()
        )
        keep = set()
        for r in hits:
            fp = unquote(urlparse(r._sc_file).path)
            rel_dir = os.path.relpath(os.path.dirname(fp), self.table_path)
            keep.add(rel_dir.replace(os.sep, "/"))
        return sorted(keep)

    # -- data access -------------------------------------------------------

    def _read_with_logged_partitions(
        self, live, schema: dict | None, as_of: int | None = None,
        keep_lineage: bool = False,
    ) -> DataFrame:
        """Read live files by explicit path with partition columns taken
        from the LOG's partitionValues (the Delta-spec source of truth) —
        required when live files sit outside this table directory (shallow
        clones), where hive basePath inference cannot run. ``live`` is
        rows of (path, partitionValues). The per-file partition map is
        metadata-sized and broadcasts."""
        from pyspark.sql.types import StringType, StructField as SF

        part_cols = self.metadata(as_of).get("partition_columns", [])
        abs_of = lambda p: p if os.path.isabs(p) else os.path.join(self.table_path, p)  # noqa: E731
        abs_paths = [abs_of(r.path) for r in live]
        reader = self.spark.read
        if schema is not None:
            data_fields = [
                f
                for f in self.physical_schema(schema)["fields"]
                if f["name"] not in part_cols
            ]
            reader = reader.schema(
                StructType.fromJson({"type": "struct", "fields": data_fields})
            )
        df = reader.parquet(*abs_paths)
        if keep_lineage:
            df = df.withColumn("_rel_path", self._rel_path_expr()).withColumn(
                "_row_index", F.col("_metadata.row_index")
            )
        if not part_cols:
            return (
                self._rename_physical_to_logical(df, schema) if schema else df
            )
        decoded = F.url_decode(
            F.regexp_replace(F.col("_metadata.file_path"), r"\+", "%2B")
        )
        normalized = F.regexp_replace(decoded, r"^file:/+", "/")
        rows = []
        for r in live:
            pv = r.partitionValues
            # struct (raw JSON inference) or map (checkpoint cast) — both
            pv = {} if pv is None else (pv.asDict() if hasattr(pv, "asDict") else dict(pv))
            rows.append(tuple([abs_of(r.path)] + [pv.get(c) for c in part_cols]))
        pv_schema = StructType(
            [SF("_abs_path", StringType())]
            + [SF(f"_pv_{c}", StringType()) for c in part_cols]
        )
        pv_df = self.spark.createDataFrame(rows, pv_schema)
        df = (
            df.withColumn("_abs_path", normalized)
            .join(F.broadcast(pv_df), "_abs_path")
            .drop("_abs_path")
        )
        field_by_name = {f["name"]: f for f in (schema or {}).get("fields", [])}
        from pyspark.sql.types import StructField as SField

        for c in part_cols:
            if c in field_by_name:
                dtype = SField.fromJson(field_by_name[c]).dataType
                df = df.withColumn(c, F.col(f"_pv_{c}").cast(dtype))
            else:
                df = df.withColumn(c, F.col(f"_pv_{c}"))
            df = df.drop(f"_pv_{c}")
        return self._rename_physical_to_logical(df, schema) if schema else df

    def read_data_files(self, rel_paths: list[str]) -> DataFrame:
        """Read specific live data files WITH deletion vectors applied —
        the reader every file-rewriting operator (compact, delete,
        apply_deletion_vectors) must use: reading the raw parquet would
        resurrect soft-deleted positions into the rewritten files."""
        dv = self.deletion_vectors()
        if any(os.path.isabs(p) for p in rel_paths):
            want = set(rel_paths)
            live = [r for r in self.live_files_rows() if r.path in want]
            # lineage captured at scan: _apply_dv's _metadata reference
            # would be unresolvable after the partition-value join
            df = self._read_with_logged_partitions(
                live, self.metadata().get("schema"), keep_lineage=True
            )
            out_cols = [
                c for c in df.columns if c not in ("_rel_path", "_row_index")
            ]
            if dv is not None:
                df = df.join(
                    F.broadcast(
                        dv.select(
                            F.col("rel_path").alias("_rel_path"),
                            F.col("row_index").alias("_row_index"),
                        )
                    ),
                    ["_rel_path", "_row_index"],
                    "left_anti",
                )
            return df.select(*out_cols)
        abs_paths = [os.path.join(self.table_path, p) for p in rel_paths]
        schema = self.metadata().get("schema")
        reader = self.spark.read.option("basePath", self.table_path)
        if schema is not None:
            reader = reader.schema(
                StructType.fromJson(self.physical_schema(schema))
            )
        df = reader.parquet(*abs_paths)
        if dv is not None:
            out_cols = df.columns
            df = self._apply_dv(df, dv).select(*out_cols)
        if schema is not None:
            df = self._rename_physical_to_logical(df, schema)
        return df

    def commit_timestamps(self) -> list[tuple[int, int]]:
        """(version, adjusted_ts_millis) over the RETAINED log for
        ``timestampAsOf`` resolution. Commits written by this engine
        carry a monotonic ``inCommitTimestamp`` (Delta ICT — stamped at
        commit time, the authority when present); for foreign pre-ICT
        logs the wall-clock ``commitInfo.timestamp`` is used with
        Delta's reader-side monotonicity adjustment: a commit stamped
        earlier than its predecessor (clock skew) reads as
        predecessor + 1 ms, so timestamp -> version is well-defined
        either way."""
        acts = self.actions(use_checkpoint=False)
        ci_fields = {
            f.name
            for f in acts.schema["commitInfo"].dataType.fields  # type: ignore[union-attr]
        }
        ts_col = (
            F.coalesce(
                F.col("commitInfo.inCommitTimestamp"),
                F.col("commitInfo.timestamp"),
            )
            if "inCommitTimestamp" in ci_fields
            else F.col("commitInfo.timestamp")
        )
        rows = (
            acts.groupBy("version")
            .agg(F.max(ts_col).alias("ts"))
            .orderBy("version")
            .collect()
        )
        out: list[tuple[int, int]] = []
        prev = -1
        for r in rows:
            ts = r.ts
            if ts is None:
                # commitInfo is OPTIONAL per the Delta spec: a foreign
                # commit without one falls back to the commit FILE's
                # mtime (the same chain Delta and the delta_tail
                # timestamp resolution use) instead of becoming
                # invisible to timestamp addressing
                p = os.path.join(self.log_dir, f"{int(r.version):020d}.json")
                try:
                    ts = int(os.path.getmtime(p) * 1000)
                except OSError:
                    continue  # checkpoint-folded version without info
            ts = max(int(ts), prev + 1)
            out.append((int(r.version), ts))
            prev = ts
        return out

    @staticmethod
    def _to_millis(ts) -> int:
        import datetime as _dt

        if isinstance(ts, (int, float)):
            return int(ts)
        if isinstance(ts, str):
            ts = _dt.datetime.fromisoformat(ts)
        if isinstance(ts, _dt.datetime):
            if ts.tzinfo is None:
                ts = ts.replace(tzinfo=_dt.timezone.utc)
            return int(ts.timestamp() * 1000)
        raise TypeError(f"unsupported timestamp {ts!r}")

    def version_at_timestamp(self, ts) -> int:
        """Latest version committed at or before ``ts`` (epoch millis,
        ISO string, or datetime) — Delta's ``timestampAsOf``. Bounded by
        the retained log window after ``cleanup_log``, like Delta's
        retention-bounded timestamp travel."""
        target = self._to_millis(ts)
        pairs = self.commit_timestamps()
        candidates = [v for v, t in pairs if t <= target]
        if not candidates:
            lo = pairs[0][1] if pairs else None
            raise ValueError(
                f"no retained commit at or before {target} "
                f"(earliest retained commit timestamp: {lo})"
            )
        return max(candidates)

    def snapshot_at_timestamp(self, ts) -> DataFrame:
        """``timestampAsOf`` read: resolve the version, then time-travel."""
        return self.snapshot(as_of=self.version_at_timestamp(ts))

    def snapshot(self, as_of: int | None = None) -> DataFrame:
        """The table's data as a DataFrame — reads ONLY the live files
        (basePath option recovers hive-style partition columns). ``as_of``
        time-travels to the state after that committed version; superseded
        files stay readable until ``vacuum`` physically deletes them, so
        travel depth = vacuum retention, exactly like Delta's
        ``versionAsOf``.

        The live-file PATH LIST is collected to the driver to feed the
        parquet reader — deliberate: it is bounded by |files| (metadata,
        not data; ~100 bytes/file, so even a million-file table is
        ~100 MB, the same order every Delta/Iceberg driver-side planner
        holds), and passing explicit paths is what lets the scan skip
        dead files without a data-side filter."""
        self.require_readable()
        live = self.live_files_rows(as_of)
        paths = [r.path for r in live]
        schema = self.metadata(as_of).get("schema")
        if not paths:
            if schema is None:
                raise ValueError("empty table with no schema")
            return self.spark.createDataFrame(
                [], StructType.fromJson(schema)
            )
        dv = self.deletion_vectors(as_of)
        if any(os.path.isabs(p) for p in paths):
            # shallow-cloned table: some live files sit OUTSIDE this table
            # directory, so hive-style basePath inference can't run —
            # partition values come from the LOG instead (the Delta-spec
            # source of truth). Lineage is captured at scan because
            # _apply_dv's _metadata reference is unresolvable after the
            # partition-value join.
            df = self._read_with_logged_partitions(
                live, schema, as_of, keep_lineage=dv is not None
            )
            if dv is not None:
                out_cols = [
                    c for c in df.columns if c not in ("_rel_path", "_row_index")
                ]
                df = df.join(
                    F.broadcast(
                        dv.select(
                            F.col("rel_path").alias("_rel_path"),
                            F.col("row_index").alias("_row_index"),
                        )
                    ),
                    ["_rel_path", "_row_index"],
                    "left_anti",
                ).select(*out_cols)
        else:
            abs_paths = [os.path.join(self.table_path, p) for p in paths]
            reader = self.spark.read.option("basePath", self.table_path)
            if schema is not None:
                # read under the LOGGED schema — in PHYSICAL column names
                # (files always carry physical names; RENAME COLUMN is
                # metadata-only): after schema evolution, files written
                # before a column existed surface it as null instead of
                # the reader picking whichever file schema it samples
                # first
                reader = reader.schema(
                    StructType.fromJson(self.physical_schema(schema))
                )
            df = reader.parquet(*abs_paths)
            if dv is not None:
                # apply position deletes: anti-join on (file, row position)
                # — the dv side is tiny, so this broadcasts; data never
                # shuffles
                out_cols = df.columns
                df = self._apply_dv(df, dv).select(*out_cols)
            if schema is not None:
                df = self._rename_physical_to_logical(df, schema)
        if schema is not None:
            # the basePath reader appends hive partition columns at the
            # end; present columns in logged table-schema order
            df = df.select(*[f["name"] for f in schema["fields"]])
        return df

    def _rel_path_expr(self):
        """Log-relative path of the file behind each row, derived from
        ``_metadata.file_path``. The metadata column is a percent-encoded
        ``file:`` URI — a table path or partition value containing a
        character Spark encodes (space, ``#``, …) would never match the
        un-encoded log paths under a plain prefix strip, silently turning
        the DV anti-join into a no-op. So: decode first (protecting ``+``,
        which is literal in a URI path but form-decoded by ``url_decode``),
        normalize the scheme, then strip the table prefix."""
        decoded = F.url_decode(
            F.regexp_replace(F.col("_metadata.file_path"), r"\+", "%2B")
        )
        normalized = F.regexp_replace(decoded, r"^file:/+", "/")
        return F.replace(normalized, F.lit(self.table_path + "/"), F.lit(""))

    def _apply_dv(self, df: DataFrame, dv: DataFrame) -> DataFrame:
        """Anti-join soft-deleted positions; leaves ``_rel_path`` /
        ``_row_index`` lineage columns on the result."""
        return (
            df.withColumn("_rel_path", self._rel_path_expr())
            .withColumn("_row_index", F.col("_metadata.row_index"))
            .join(
                F.broadcast(
                    dv.select(
                        F.col("rel_path").alias("_rel_path"),
                        F.col("row_index").alias("_row_index"),
                    )
                ),
                ["_rel_path", "_row_index"],
                "left_anti",
            )
        )

    def snapshot_with_positions(
        self,
        as_of: int | None = None,
        rel_paths: list[str] | None = None,
    ) -> DataFrame:
        """Snapshot plus ``_rel_path`` / ``_row_index`` lineage columns —
        what DELETE-style operators need: ``_metadata`` is only resolvable
        directly on the scan, so any caller that joins or projects first
        must capture the position columns up front (the DV anti-join in
        ``snapshot`` does exactly that, which is why this exists).

        ``rel_paths`` restricts the scan to a SUBSET of live files at
        plan time (the file list itself, not a post-scan filter) — what
        incremental indexers need: touching only the files missing from
        their sidecar instead of rereading the table."""
        self.require_readable()
        live = self.live_files_rows(as_of)
        if rel_paths is not None:
            want = set(rel_paths)
            live = [r for r in live if r.path in want]
        paths = [r.path for r in live]
        schema = self.metadata(as_of).get("schema")
        if not paths:
            base = self.snapshot(as_of)
            if rel_paths is not None:
                base = base.where(F.lit(False))
            return base.withColumn(
                "_rel_path", F.lit(None).cast("string")
            ).withColumn("_row_index", F.lit(None).cast("long"))
        if any(os.path.isabs(p) for p in paths):
            # shallow clone: lineage columns captured on the scan inside
            # the helper (before the partition-value join)
            df = self._read_with_logged_partitions(
                live, schema, as_of, keep_lineage=True
            )
            dv = self.deletion_vectors(as_of)
            if dv is not None:
                df = df.join(
                    F.broadcast(
                        dv.select(
                            F.col("rel_path").alias("_rel_path"),
                            F.col("row_index").alias("_row_index"),
                        )
                    ),
                    ["_rel_path", "_row_index"],
                    "left_anti",
                )
        else:
            abs_paths = [os.path.join(self.table_path, p) for p in paths]
            reader = self.spark.read.option("basePath", self.table_path)
            if schema is not None:
                reader = reader.schema(
                    StructType.fromJson(self.physical_schema(schema))
                )
            df = reader.parquet(*abs_paths)
            dv = self.deletion_vectors(as_of)
            if dv is not None:
                df = self._apply_dv(df, dv)
            else:
                df = df.withColumn("_rel_path", self._rel_path_expr()).withColumn(
                    "_row_index", F.col("_metadata.row_index")
                )
            if schema is not None:
                df = self._rename_physical_to_logical(df, schema)
        if schema is not None:
            df = df.select(
                *[f["name"] for f in schema["fields"]], "_rel_path", "_row_index"
            )
        return df

    def changes(
        self, from_version: int = 0, to_version: int | None = None
    ) -> DataFrame:
        """CDC-style change feed from the log alone: one row per file-level
        change in [from_version, to_version] — (version, ts, change_type
        add|remove, path, num_records, size). File-granular like Delta's
        change-data-feed-without-CDF reads; a consumer incrementally
        processes exactly the files each commit touched instead of
        re-scanning the table."""
        self.require_history_from(from_version)
        acts = self.actions(use_checkpoint=False).where(
            F.col("version") >= from_version
        )
        if to_version is not None:
            acts = acts.where(F.col("version") <= to_version)
        adds = acts.where(F.col("add").isNotNull()).select(
            "version",
            F.lit("add").alias("change_type"),
            F.col("add.path").alias("path"),
            F.get_json_object("add.stats", "$.numRecords")
            .cast("long")
            .alias("num_records"),
            F.col("add.size").alias("size"),
        )
        removes = acts.where(F.col("remove").isNotNull()).select(
            "version",
            F.lit("remove").alias("change_type"),
            F.col("remove.path").alias("path"),
            F.lit(None).cast("long").alias("num_records"),
            F.lit(None).cast("long").alias("size"),
        )
        ts = acts.where(F.col("commitInfo").isNotNull()).select(
            "version", F.timestamp_millis(F.col("commitInfo.timestamp")).alias("ts")
        )
        return (
            adds.unionByName(removes)
            .join(ts, "version", "left")
            .select("version", "ts", "change_type", "path", "num_records", "size")
            .orderBy("version", "change_type", "path")
        )

    def pruned_files(self, column: str, lower, upper) -> DataFrame:
        """Data skipping: live files whose ``[minValues, maxValues]``
        interval for ``column`` intersects [lower, upper] — evaluated
        entirely on the log (one tiny filter over |files| rows). Files
        written before stats existed (no min/max) are conservatively
        kept. Z-order clustering narrows per-file intervals, which is
        exactly what makes this prune selective."""
        return self.pruned_files_multi([(column, lower, upper)])

    def pruned_files_multi(
        self,
        predicates: list[tuple],
        partition_filter: dict | None = None,
    ) -> DataFrame:
        """Conjunctive data skipping: live files passing EVERY
        ``(column, lower, upper)`` interval test AND the optional
        partition filter (``{col: value-or-list}`` on the logged
        partitionValues — pure partition pruning, no stats needed).
        Per-column missing stats are conservatively kept; the whole
        evaluation is one filter over |files| rows, never a data read —
        at 100 TB this is the difference between planning from GBs of
        log and listing/reading the table."""
        keep = F.lit(True)
        mapping = self.column_mapping(self.metadata().get("schema"))
        for column, lower, upper in predicates:
            # stats keys carry PHYSICAL column names (footer-derived)
            phys = mapping.get(column, column)
            lo_s = F.get_json_object(F.col("stats"), f"$.minValues.{phys}")
            hi_s = F.get_json_object(F.col("stats"), f"$.maxValues.{phys}")
            numeric = isinstance(lower, (int, float))
            lo = lo_s.cast("double") if numeric else lo_s
            hi = hi_s.cast("double") if numeric else hi_s
            keep = keep & (
                lo_s.isNull()
                | hi_s.isNull()
                | ((hi >= F.lit(lower)) & (lo <= F.lit(upper)))
            )
        for col, want in (partition_filter or {}).items():
            vals = [str(v) for v in (want if isinstance(want, (list, tuple, set)) else [want])]
            keep = keep & F.col("partitionValues")[col].isin(vals)
        return self._live_adds().where(keep).select("path")

    def _live_adds(self) -> DataFrame:
        """(path, stats, partitionValues) for every live file — the
        add-wins liveness rule (add outranks remove at the same
        version: a commit that removes and re-adds a path keeps the
        file live), shared by every log-level skipping path so the
        liveness semantics cannot silently diverge between them."""
        acts = self.actions()
        adds = acts.where(F.col("add").isNotNull()).select(
            F.col("add.path").alias("path"),
            F.col("add.stats").alias("stats"),
            F.col("add.partitionValues").alias("partitionValues"),
            "version",
            F.lit(1).alias("is_add"),
        )
        removes = acts.where(F.col("remove").isNotNull()).select(
            F.col("remove.path").alias("path"),
            F.lit(None).cast("string").alias("stats"),
            F.lit(None).cast(_STR_MAP).alias("partitionValues"),
            "version",
            F.lit(0).alias("is_add"),
        )
        w = Window.partitionBy("path").orderBy(
            F.desc("version"), F.desc("is_add")
        )
        return (
            adds.unionByName(removes)
            .withColumn("rn", F.row_number().over(w))
            .where((F.col("rn") == 1) & (F.col("is_add") == 1))
            .select("path", "stats", "partitionValues")
        )

    def live_file_intervals(
        self, column: str, partition_filter: dict | None = None
    ) -> DataFrame:
        """(path, lo, hi) for every live file — the per-file stats
        interval of ``column`` (nulls when the file carries no stats,
        which callers must treat as matching everything); numeric
        columns compare as doubles, string columns lexicographically
        (truncated max bounds are adjusted UP at write time, so the
        interval stays covering). The DISTRIBUTED form of data
        skipping: when the probe keys are too many to enumerate
        driver-side (a clip's thousands of fingerprint hashes, not
        three query terms), callers broadcast these |files| rows and
        range-join them against the key set — file pruning stays a
        metadata operation either way."""
        schema = self.metadata().get("schema")
        mapping = self.column_mapping(schema)
        phys = mapping.get(column, column)
        col_type = next(
            (
                f.get("type")
                for f in (schema or {}).get("fields", [])
                if f.get("name") == column
            ),
            None,
        )
        # typed interval compare, or a LOUD refusal: a decimal compared
        # lexicographically or a >2^53 long squeezed into a double would
        # silently SKIP files that contain the key — wrong results, not
        # an error — so only types with a faithful comparison are served
        if col_type in ("byte", "short", "integer", "long"):
            cast_to = "long"
        elif col_type in ("float", "double"):
            cast_to = "double"
        elif col_type == "string":
            cast_to = None  # string stats compare lexicographically
        else:
            raise ValueError(
                f"live_file_intervals: column {column!r} has type "
                f"{col_type!r}; interval pruning supports integer, "
                "float, and string keys only"
            )
        lo = F.get_json_object(F.col("stats"), f"$.minValues.{phys}")
        hi = F.get_json_object(F.col("stats"), f"$.maxValues.{phys}")
        if cast_to is not None:
            lo, hi = lo.cast(cast_to), hi.cast(cast_to)
        live = self._live_adds()
        for col, want in (partition_filter or {}).items():
            vals = [
                str(v)
                for v in (
                    want
                    if isinstance(want, (list, tuple, set))
                    else [want]
                )
            ]
            live = live.where(F.col("partitionValues")[col].isin(vals))
        return live.select("path", lo.alias("lo"), hi.alias("hi"))

    def pruned_files_for_keys(
        self,
        keys: DataFrame,
        column: str,
        partition_filter: dict | None = None,
    ) -> list:
        """Live files whose ``column`` stats interval contains at least
        one value of ``keys`` (a single-column DataFrame) — the
        disjunctive, key-SET form of data skipping, evaluated as a
        broadcast range join (|files| broadcast side, keys stay
        distributed). Only the touched PATHS reach the driver, bounded
        by |files|."""
        intervals = self.live_file_intervals(column, partition_filter)
        key_col = F.col(keys.columns[0])
        hit = (
            F.col("lo").isNull()
            | F.col("hi").isNull()
            | ((key_col >= F.col("lo")) & (key_col <= F.col("hi")))
        )
        rows = (
            keys.distinct()
            .join(F.broadcast(intervals), hit)
            .select("path")
            .distinct()
            .collect()
        )
        return sorted(r.path for r in rows)

    def scan(self, column: str, lower, upper) -> DataFrame:
        """Snapshot restricted by data skipping on ``column`` — reads only
        files whose stats interval intersects [lower, upper]. The caller
        still applies the row-level filter; this prunes at FILE
        granularity, like Delta's stats-based skipping."""
        paths = [r.path for r in self.pruned_files(column, lower, upper).collect()]
        if not paths:
            schema = self.metadata().get("schema")
            if schema is None:
                raise ValueError("empty scan with no schema")
            return self.spark.createDataFrame([], StructType.fromJson(schema))
        abs_paths = [os.path.join(self.table_path, p) for p in paths]
        return self.spark.read.option("basePath", self.table_path).parquet(*abs_paths)

    # -- log-only aggregates (no data scan) --------------------------------

    def record_count(self) -> int:
        """Sum of add-file stats.numRecords minus soft-deleted positions
        in still-live files; falls back to a scan only if any live file
        lacks stats."""
        active = self.active_files()
        row = active.agg(
            F.sum("num_records").alias("n"),
            F.sum(F.when(F.col("num_records").isNull(), 1).otherwise(0)).alias(
                "missing"
            ),
        ).collect()[0]
        if row.missing and row.missing > 0:
            return self.snapshot().count()
        total = int(row.n or 0)
        dv = self.deletion_vectors()
        if dv is not None:
            # DV entries whose target file was since rewritten are no-ops
            total -= (
                dv.join(
                    F.broadcast(active.select(F.col("path").alias("rel_path"))),
                    "rel_path",
                    "left_semi",
                ).count()
            )
        return total

    def file_stats(self) -> dict:
        """data_file_count, table_size_bytes, avg_file_size_bytes — one
        tiny aggregate over the live file list."""
        row = self.active_files().agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("size").alias("total"),
            F.avg("size").alias("avg"),
        ).collect()[0]
        return {
            "data_file_count": int(row.n or 0),
            "table_size_bytes": int(row.total or 0),
            "avg_file_size_bytes": int(row.avg or 0),
        }

    def operation_counts(self) -> dict:
        """{'WRITE': n, 'DELETE': n, 'OPTIMIZE': n, 'MERGE': n} from
        commitInfo history."""
        rows = (
            self.history()
            .groupBy("operation")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        return {r.operation: r.n for r in rows if r.operation}
