"""pypeline_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of StarOfService/pypeline, rebuilt Spark-first.

The reference (see /root/reference/pypeline/Pype.py, Pypeline.py) is a batch
ETL orchestrator: SQL extract -> row-wise Python transform chain -> keyed
sink (upsert/update/delete) -> post SQL, sequenced by a YAML config.  This
package re-expresses that surface on Spark DataFrames:

- ``pypeline_spark.session``    SparkSession builder + parquet catalog.
- ``pypeline_spark.pipeline``   Layer A: YAML pipeline spec, placeholder
  hydration, dynamic transformer chain, sequential runner.
- ``pypeline_spark.sinks``      Keyed upsert / update / delete merge sinks.
- ``pypeline_spark.operators``  Layer B: the delegated relational operator
  surface (joins, aggs, windows, set ops, subqueries, ...) made native.
- ``pypeline_spark.functions``  Text analysis, dedup (exact / MinHash-LSH /
  SimHash / Jaccard), vector similarity search, multimodal column plumbing.
- ``pypeline_spark.streaming``  Structured Streaming windows/watermarks with
  batch-equivalent formulations for differential testing.
"""

__version__ = "0.1.0"

from pypeline_spark.session import get_spark, register_tables  # noqa: F401
