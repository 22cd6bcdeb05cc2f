"""Format readers/writers: parquet, csv, json, orc, jdbc.

Design rules (100 TB):
- parquet/orc are the only formats for hot paths — columnar, splittable,
  predicate/column pushdown.  csv/json exist for ingest/egress edges.
- Explicit schemas everywhere: ``inferSchema`` is a full extra pass over
  the data and non-deterministic under dirty input — production reads
  must pin schemas (csv/json readers here take one).
- JDBC reads map the reference's ``bulk_size`` (ref:
  /root/reference/pypeline/Pype.py:17,41) to ``fetchsize`` and
  parallelize with partitionColumn/lowerBound/upperBound/numPartitions;
  without a partition column a JDBC read is a single task regardless of
  cluster size.
"""

from __future__ import annotations

from typing import Mapping, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

READ_FORMATS = ("parquet", "csv", "json", "orc", "jdbc")
WRITE_FORMATS = ("parquet", "csv", "json", "orc", "jdbc", "noop")


def read_source(
    spark: SparkSession,
    fmt: str,
    path_or_url: str,
    schema: Optional[StructType | str] = None,
    options: Optional[Mapping[str, str]] = None,
    bulk_size: Optional[int] = None,
    partition_column: Optional[str] = None,
    num_partitions: Optional[int] = None,
    bounds: Optional[tuple[int, int]] = None,
) -> DataFrame:
    """Read one source into a DataFrame.

    For jdbc, ``path_or_url`` is the JDBC URL and ``options`` must carry
    ``dbtable`` or ``query``; ``bulk_size`` becomes fetchsize and the
    partition_column/bounds/num_partitions triple enables parallel
    range-partitioned extraction.
    """
    if fmt not in READ_FORMATS:
        raise ValueError(f"unsupported source format {fmt!r}; one of {READ_FORMATS}")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    opts = dict(options or {})
    if fmt == "jdbc":
        opts["url"] = path_or_url
        if bulk_size:
            opts.setdefault("fetchsize", str(bulk_size))
        if partition_column:
            if bounds is None or num_partitions is None:
                raise ValueError("jdbc partitioning needs bounds and num_partitions")
            opts.update(
                partitionColumn=partition_column,
                lowerBound=str(bounds[0]),
                upperBound=str(bounds[1]),
                numPartitions=str(num_partitions),
            )
        return reader.format("jdbc").options(**opts).load()
    if fmt == "csv":
        opts.setdefault("header", "true")
    return reader.format(fmt).options(**opts).load(path_or_url)


def write_sink(
    df: DataFrame,
    fmt: str,
    path_or_url: str,
    mode: str = "overwrite",
    options: Optional[Mapping[str, str]] = None,
    partition_by: Optional[list[str]] = None,
    bulk_size: Optional[int] = None,
) -> None:
    """Write a DataFrame to a sink.

    ``partition_by`` produces hive-style directory partitioning — the
    scan-pruning layout for downstream readers.  For jdbc, ``bulk_size``
    maps to batchsize (the reference's one-statement-per-batch load,
    ref: Pype.py:147-148, becomes executor-parallel batched inserts).
    """
    if fmt not in WRITE_FORMATS:
        raise ValueError(f"unsupported sink format {fmt!r}; one of {WRITE_FORMATS}")
    writer = df.write.mode(mode)
    opts = dict(options or {})
    if fmt == "jdbc":
        opts["url"] = path_or_url
        if bulk_size:
            opts.setdefault("batchsize", str(bulk_size))
        writer.format("jdbc").options(**opts).save()
        return
    if fmt == "csv":
        opts.setdefault("header", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "noop":
        writer.format("noop").save()
        return
    writer.format(fmt).options(**opts).save(path_or_url)
