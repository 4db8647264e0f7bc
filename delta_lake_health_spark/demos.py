"""Sample-table population & cleanup (reference:
src/delta_lake_health/demos/populate_sample_delta.py, clean_delta_data.py).

Creates simple / skewed / complex Delta tables with our own writer so the
analyzer, maintenance, and report operators have realistic inputs. All data
is deterministic (hash-derived, no RNG) so demo metrics are reproducible.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from delta_lake_health_spark.operators import maintenance
from delta_lake_health_spark.sources import delta_writer

SAMPLE_DIR_DEFAULT = "/tmp/delta_lake_health_spark/tables"

DAYS_EVEN = ["Mon", "Tue", "Wed", "Thu", "Fri"]


def _rows_df(spark, n: int, day_weights: list[int], offset: int = 0):
    """Deterministic rows: id, value, day, category."""
    total_w = sum(day_weights)
    df = spark.range(offset, offset + n).select(
        F.col("id"),
        (100 + (F.col("id") * 37 % 61) - 30.0).alias("value"),
        F.lit(None).alias("_w"),
    )
    # cumulative weight bucketing on id % total_w → day
    bounds = []
    acc = 0
    for d, w in zip(DAYS_EVEN, day_weights):
        bounds.append((acc, acc + w, d))
        acc += w
    day = F.col("id") % total_w
    expr = F.lit(DAYS_EVEN[-1])
    for lo, hi, d in reversed(bounds):
        expr = F.when((day >= lo) & (day < hi), d).otherwise(expr)
    return df.select(
        "id",
        "value",
        expr.alias("day"),
        F.when(F.col("id") % 3 == 0, "A")
        .when(F.col("id") % 3 == 1, "B")
        .otherwise("C")
        .alias("category"),
    )


def populate_sample_tables(
    spark: SparkSession, base_dir: str = SAMPLE_DIR_DEFAULT
) -> dict[str, str]:
    simple = os.path.join(base_dir, "simple_delta")
    skewed = os.path.join(base_dir, "skewed_delta")
    complex_ = os.path.join(base_dir, "complex_delta")
    clean(base_dir)

    # simple: even distribution, one write + one append
    delta_writer.write(spark, _rows_df(spark, 1000, [1, 1, 1, 1, 1]), simple,
                       mode="overwrite", partition_by=["day"])
    delta_writer.write(spark, _rows_df(spark, 500, [1, 1, 1, 1, 1], offset=1000),
                       simple, mode="append", partition_by=["day"])

    # skewed: 60/20/10/5/5 distribution, multiple appends
    delta_writer.write(spark, _rows_df(spark, 1000, [12, 4, 2, 1, 1]), skewed,
                       mode="overwrite", partition_by=["day"])
    delta_writer.write(spark, _rows_df(spark, 500, [35, 10, 3, 1, 1], offset=1000),
                       skewed, mode="append", partition_by=["day"])

    # complex: appends + delete + compact (history with every op type)
    delta_writer.write(spark, _rows_df(spark, 1000, [1, 1, 1, 1, 1]), complex_,
                       mode="overwrite", partition_by=["day"])
    for k in range(3):
        delta_writer.write(
            spark, _rows_df(spark, 200, [1, 1, 1, 1, 1], offset=1000 + 200 * k),
            complex_, mode="append", partition_by=["day"],
        )
    delta_writer.delete(spark, complex_, "value > 120")
    maintenance.compact(spark, complex_)
    return {"simple": simple, "skewed": skewed, "complex": complex_}


def clean(base_dir: str = SAMPLE_DIR_DEFAULT) -> None:
    if os.path.isdir(base_dir):
        shutil.rmtree(base_dir)


def demo_health_report(
    spark: SparkSession, base_dir: str = SAMPLE_DIR_DEFAULT
) -> dict:
    """The reference's end-to-end demo flow: build the sample tables,
    analyze each, print the formatted report (the reference's
    ``metrics.print_results()`` front door), return the metrics."""
    from delta_lake_health_spark.analyzer import DeltaAnalyzer

    tables = populate_sample_tables(spark, base_dir)
    analyzer = DeltaAnalyzer(spark=spark)
    out = {}
    for name, path in tables.items():
        metrics = analyzer.analyze(table_path=path)
        print(f"\n=== {name} ({path}) ===")
        metrics.print_results()
        out[name] = metrics
    return out


def curate_corpus_to_delta(
    spark, sf_dir: str, out_path: str, batch_id: int = 0
) -> dict:
    """End-to-end LLM-corpus curation INTO a Delta table — the two
    halves of this engine composed: the pipeline side selects the kept
    documents (``plans.dedup.curated_documents`` — the same definition
    the oracle-checked ``pipeline_corpus_build`` census aggregates) and
    the Delta side lands them split-partitioned with a ``txn`` replay
    guard, so re-running a batch (restart, retried orchestrator) is a
    no-op instead of a duplicate corpus. Returns the committed version
    and per-split counts derived from the table's LOG alone (add-action
    partitionValues + stats.numRecords — no data scan)."""
    from pyspark.sql import functions as F

    from delta_lake_health_spark.plans.dedup import curated_documents
    from delta_lake_health_spark.sources import delta_writer
    from delta_lake_health_spark.sources.delta_log import DeltaLog

    curated = curated_documents(spark, sf_dir)
    version = delta_writer.write(
        spark,
        curated,
        out_path,
        mode="append",
        partition_by=["split"],
        txn_app_id="corpus_curation",
        txn_version=batch_id,
    )
    log = DeltaLog(spark, out_path)
    counts = {
        r.split: r.n
        for r in log.active_files()
        .select(
            F.col("partitionValues")["split"].alias("split"),
            F.col("num_records").alias("nr"),
        )
        .groupBy("split")
        .agg(F.sum("nr").alias("n"))
        .collect()
    }
    return {"version": version, "splits": counts,
            "total_docs": sum(counts.values())}


def generate_visual_report(
    spark: SparkSession, base_dir: str = SAMPLE_DIR_DEFAULT
) -> dict:
    """The reference's notebook walkthrough (notebooks/example.ipynb +
    the visualization/notebook dashboards) as ONE composable call:
    build the sample tables, run the analyzer on each, inspect the log
    the way the notebook inspects ``DeltaTable`` (history / metadata /
    add actions / file URIs), and render every dashboard to a
    plotly-schema dict (``Figure.to_dict()`` — displayable via
    ``to_plotly()`` where the plotly package exists).

    Returns ``{table_name: {"metrics": HealthMetrics,
    "history_ops": {op: count}, "metadata": dict, "n_files": int,
    "file_uris": [str], "figures": {figure_name: plotly dict}}}``.
    """
    from delta_lake_health_spark.analyzer import DeltaAnalyzer
    from delta_lake_health_spark.operators.report import historical_trends
    from delta_lake_health_spark.sources.delta_log import DeltaLog
    from delta_lake_health_spark.visualization.delta_operations import (
        visualize_delta_operations,
    )
    from delta_lake_health_spark.visualization.detailed_history_metrics import (
        visualize_historical_trends,
    )
    from delta_lake_health_spark.visualization.file_distribution import (
        analyze_file_distribution,
    )
    from delta_lake_health_spark.visualization.health_dashboard import (
        create_health_dashboard,
    )
    from delta_lake_health_spark.visualization.skew_analysis import (
        visualize_skew_analysis,
    )

    tables = populate_sample_tables(spark, base_dir)
    analyzer = DeltaAnalyzer(spark=spark)
    report: dict = {}
    for name, path in tables.items():
        metrics = analyzer.analyze(table_path=path)
        log = DeltaLog(spark, path)
        uris = [r.path for r in log.active_files().select("path").collect()]
        dist_fig, _files = analyze_file_distribution(spark, path,
                                                     analyzer=analyzer)
        figures = {
            "health_dashboard": create_health_dashboard(metrics),
            "skew_analysis": visualize_skew_analysis(metrics),
            "file_distribution": dist_fig,
            "delta_operations": visualize_delta_operations(spark, path),
            "historical_trends": visualize_historical_trends(
                historical_trends(spark, path)
            ),
        }
        report[name] = {
            "metrics": metrics,
            "history_ops": log.operation_counts(),
            "metadata": log.metadata(),
            "n_files": len(uris),
            "file_uris": uris,
            "figures": {k: f.to_dict() for k, f in figures.items()},
        }
    return report
