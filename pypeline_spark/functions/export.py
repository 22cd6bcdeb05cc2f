"""Training-data export: deterministic global shuffle + shard assignment.

The last mile of a training-corpus pipeline: examples must be (a)
well-shuffled — no source/time locality inside a shard, (b) split into
fixed shard files a data loader streams, (c) REPRODUCIBLE — re-running
the export yields byte-identical shards, or training runs can't be
compared.  TABLESAMPLE/rand() fail (c); the standard fix is to order by
a content hash and deal shards round-robin, which is pure deterministic
column math:

- ``shuffle_key`` = md5(doc_id) — engine-portable (the md5-prefix trick
  shared with sampling/MinHash in this repo), uniform, and stable.
- ``shard``       = first hex nibbles of the key mod n_shards — rows
  land in shards independent of cluster layout.
- ``pos``         = rank of the key within the shard — the read order a
  loader sees, again layout-independent.

At 100 TB the write is ``df.repartition(n, shard).sortWithinPartitions
(shuffle_key).write...`` — one shuffle keyed by shard; the window here
computes the same positions in a differentially-testable form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from pypeline_spark.registry import query
from pypeline_spark.session import load_table

N_TRAIN_SHARDS = 8


def train_shards(
    docs: DataFrame, id_col: str = "doc_id", n_shards: int = N_TRAIN_SHARDS
) -> DataFrame:
    """(id, shard, pos): deterministic shuffled shard layout."""
    key = F.md5(F.col(id_col).cast("string"))
    shard = (
        F.conv(F.substring(key, 1, 8), 16, 10).cast("bigint") % n_shards
    ).cast("int")
    w = W.partitionBy("shard").orderBy("shuffle_key")
    return (
        docs.select(
            F.col(id_col),
            key.alias("shuffle_key"),
            shard.alias("shard"),
        )
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .select(id_col, "shard", "pos")
    )


@query(
    "q_train_shards",
    oracle=f"""
    WITH keyed AS (
        SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS shuffle_key,
               CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % {N_TRAIN_SHARDS} AS INT) AS shard
        FROM documents
    )
    SELECT doc_id, shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY shuffle_key)
                AS BIGINT) AS pos
    FROM keyed
    """,
)
def q_train_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible shuffled shard layout for the documents corpus."""
    d = load_table(spark, sf_dir, "documents")
    return train_shards(d)
