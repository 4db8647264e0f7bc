"""PySpark-native analytics + Delta Lake health engine.

Re-expresses the capabilities of the reference toolkit
``alvaromoureupm/delta-lake-health`` (see /root/reference) Spark-first:

- ``sources``   — parquet catalog, Delta transaction-log reader/writer
- ``operators`` — health analysis, skew, maintenance, dedup, similarity,
                  text analysis, multimodal plumbing
- ``functions`` — shared JVM-side column expressions
- ``plans``     — the query library exposed through ``__spark_entry__``
- ``streaming`` — Structured Streaming jobs
"""

__version__ = "0.1.0"
