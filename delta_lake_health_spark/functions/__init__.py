"""Reusable JVM-side column-expression builders.

Everything here returns Spark Column expressions built from
``pyspark.sql.functions`` / SQL higher-order functions — no UDFs — so any
plan composed from them stays on the JVM hot path.
"""

from delta_lake_health_spark.functions.vector import (  # noqa: F401
    as_double_array,
    cosine,
    dot,
    l2_norm,
)
