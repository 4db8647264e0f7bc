"""SparkSession factory tuned for this engine.

Local testing runs on ``local[N]``; the configs below are the ones that
matter at cluster scale too (AQE, broadcast threshold, partition sizing).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "delta-lake-health-spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # AQE: runtime coalescing, skew-join splitting, dynamic join strategy.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # One shuffle partition per core locally; a real cluster would size
        # this to ~2-3x total cores (AQE coalesces the excess).
        .config("spark.sql.shuffle.partitions", "32")
        # Dim tables (region/nation/supplier/part/customer) stay broadcastable.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Push MIN/MAX/COUNT of unfiltered scans into parquet footers —
        # a metadata read instead of a table scan (off by default).
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # Arrow for every pandas_udf / mapInPandas exchange.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # INT64 micros, not legacy INT96: the parquet spec defines no
        # sort order for INT96, so writers omit its min/max stats and
        # timestamp columns lose data skipping entirely. Micros is what
        # Delta writers emit.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
