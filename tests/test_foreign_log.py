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
