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


PACK_BUDGET = 512  # tokens per packed training sequence


def pack_sequences(
    docs: DataFrame,
    budget: int = PACK_BUDGET,
    n_shards: int = N_TRAIN_SHARDS,
) -> DataFrame:
    """Greedy sequence packing: (doc_id, shard, pack_id, n_tokens).

    Training loaders want fixed-budget token sequences with minimal
    padding; the standard approach packs documents greedily into bins.
    A global greedy pack is inherently sequential, so the scale shape
    is pack-within-shard: the deterministic md5 shard layout bounds
    each packing problem to one Arrow batch, and applyInPandas runs the
    greedy fold per shard in parallel.  Decisions depend only on the
    shard's doc order (doc_id asc), so the result is layout-independent
    and a recursive-CTE oracle can replay it row by row.  Oversized
    docs (> budget) get a pack of their own, as loaders truncate.

    Scale note: one shard = one Arrow batch, so ``n_shards`` must grow
    with the corpus (target the loader's file size, ~100-500 MB of
    tokens per shard); the fixture's 8 shards are a test-scale choice,
    not a constant to keep at 100 TB.
    """
    import pandas as pd

    from pypeline_spark.functions.text import tokens

    keyed = docs.select(
        "doc_id",
        F.size(tokens(F.col("text"))).alias("n_tokens"),
        (
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("bigint") % n_shards
        ).cast("int").alias("shard"),
    )

    def pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        pack_ids, cur_id, cur_tok = [], 0, 0
        for n in pdf["n_tokens"]:
            n = int(n)
            if cur_tok > 0 and cur_tok + n > budget:
                cur_id += 1
                cur_tok = 0
            cur_tok += n
            pack_ids.append(cur_id)
        out = pdf[["doc_id", "shard", "n_tokens"]].copy()
        out["pack_id"] = pd.array(pack_ids, dtype="int64")
        return out[["doc_id", "shard", "pack_id", "n_tokens"]]

    return keyed.groupBy("shard").applyInPandas(
        pack, schema="doc_id bigint, shard int, pack_id bigint, n_tokens int"
    )


@query(
    "q_pack_sequences",
    # Recursive CTE replays the greedy fold row-by-row per shard: the
    # recursion walks rows in doc_id order carrying (pack_id, running
    # token count) — exactly the loop the Arrow batch runs.
    oracle=f"""
    WITH RECURSIVE keyed AS (
        SELECT doc_id,
               len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
               CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % {N_TRAIN_SHARDS} AS INT) AS shard
        FROM documents
    ),
    numbered AS (
        SELECT doc_id, shard, n_tokens,
               ROW_NUMBER() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
        FROM keyed
    ),
    walk AS (
        SELECT doc_id, shard, n_tokens, rn,
               CAST(0 AS BIGINT) AS pack_id, n_tokens AS running
        FROM numbered WHERE rn = 1
        UNION ALL
        SELECT n.doc_id, n.shard, n.n_tokens, n.rn,
               CASE WHEN w.running + n.n_tokens > {PACK_BUDGET}
                    THEN w.pack_id + 1 ELSE w.pack_id END,
               CASE WHEN w.running + n.n_tokens > {PACK_BUDGET}
                    THEN n.n_tokens ELSE w.running + n.n_tokens END
        FROM numbered n JOIN walk w
          ON n.shard = w.shard AND n.rn = w.rn + 1
    )
    SELECT doc_id, shard, pack_id, CAST(n_tokens AS INT) AS n_tokens FROM walk
    """,
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy per-shard sequence packing of the documents corpus."""
    d = load_table(spark, sf_dir, "documents")
    return pack_sequences(d)


TRAIN_PCT, VAL_PCT = 80, 10  # test = remaining 10


def split_of(col) -> "F.Column":
    """Deterministic train/val/test label from a content hash of the id
    (same md5-bucket trick as the samplers): stable under re-runs,
    engine-portable, and monotone — growing TRAIN_PCT only promotes
    rows from val/test, never reshuffles existing assignments."""
    h = F.conv(F.substring(F.md5(F.concat_ws("_", col)), 1, 15), 16, 10).cast(
        "bigint"
    ) % 100
    return (
        F.when(h < TRAIN_PCT, F.lit("train"))
        .when(h < TRAIN_PCT + VAL_PCT, F.lit("val"))
        .otherwise(F.lit("test"))
    )


@query(
    "q_train_val_split",
    oracle=f"""
    SELECT source, split, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM (
        SELECT source, n_chars,
               CASE WHEN h < {TRAIN_PCT} THEN 'train'
                    WHEN h < {TRAIN_PCT + VAL_PCT} THEN 'val'
                    ELSE 'test' END AS split
        FROM (
            SELECT source, n_chars,
                   CAST(('0x' || substr(md5(concat_ws('_', doc_id)), 1, 15))
                        AS BIGINT) % 100 AS h
            FROM documents
        )
    )
    GROUP BY source, split
    """,
)
def q_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split of the corpus with
    per-(source, split) counts — the audit view a training pipeline
    materializes to prove no split leakage across re-runs and that no
    source is skewed into one split.

    Scale: hash + CASE are map-side; the audit aggregate shuffles only
    (source, split) groups.  The split LABEL itself never shuffles —
    a 100 TB export filters `split = 'train'` as a pushed-down
    predicate, same as the samplers.
    """
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("source", "n_chars", split_of(F.col("doc_id")).alias("split"))
        .groupBy("source", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


@query(
    "q_shard_balance",
    oracle=f"""
    WITH keyed AS (
        SELECT doc_id,
               CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % {N_TRAIN_SHARDS} AS INT) AS shard,
               len(string_split_regex(trim(text), '\\s+')) AS n_toks
        FROM documents
    )
    SELECT shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_toks) AS BIGINT) AS n_tokens
    FROM keyed GROUP BY shard
    """,
)
def q_shard_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard doc and token counts for the training-shard layout —
    the balance audit run before a data loader trusts the shards
    (a skewed shard becomes the epoch's straggler).

    Scale: one map-side aggregate on the shard key; token counts come
    from the same tokenizer expression the packing step uses, so the
    audit measures exactly what the loader will see.  The md5 shard
    assignment makes imbalance purely statistical (multinomial), so
    at real shard counts this readout should be near-uniform — drift
    here means the id space or the hash changed.
    """
    from pypeline_spark.functions.text import tokens

    d = load_table(spark, sf_dir, "documents")
    keyed = d.select(
        (
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("bigint")
            % N_TRAIN_SHARDS
        )
        .cast("int")
        .alias("shard"),
        F.size(tokens(F.col("text"))).alias("n_toks"),
    )
    return keyed.groupBy("shard").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_toks").cast("bigint").alias("n_tokens"),
    )


DOMAIN_CAP = 40  # max docs kept per source domain (corpus balancing)


@query(
    "q_domain_cap",
    oracle=f"""
    WITH keyed AS (
        SELECT doc_id, source,
               md5(source || '|' || CAST(doc_id AS VARCHAR)) AS k
        FROM documents
    )
    SELECT doc_id, source,
           CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY k, doc_id)
                AS BIGINT) AS rk,
           CAST(CASE WHEN ROW_NUMBER() OVER (PARTITION BY source
                                             ORDER BY k, doc_id)
                          <= {DOMAIN_CAP}
                THEN 1 ELSE 0 END AS INT) AS kept
    FROM keyed
    """,
)
def q_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap: keep at most DOMAIN_CAP docs per source,
    chosen by deterministic hash order — the corpus-balancing gate that
    stops one crawl domain from dominating the training mixture (the
    same role as per-domain caps in public corpus recipes).

    Scale: one shuffle keyed by source; the hash order makes the kept
    subset reproducible AND monotone (a higher cap keeps a superset),
    so staged corpus sizes compose.  Skewed domains are exactly the
    point here — the window sort is per-domain, and a pathologically
    hot domain can pre-aggregate via the salted-counts pattern before
    ranking only its own rows.
    """
    d = load_table(spark, sf_dir, "documents")
    k = F.md5(F.concat_ws("|", F.col("source"), F.col("doc_id").cast("string")))
    w = W.partitionBy("source").orderBy("k", "doc_id")
    return (
        d.select("doc_id", "source", k.alias("k"))
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
        .select(
            "doc_id",
            "source",
            "rk",
            (F.col("rk") <= DOMAIN_CAP).cast("int").alias("kept"),
        )
    )


N_EPOCHS = 3  # epochs whose training order is laid out


@query(
    "q_epoch_shuffle",
    oracle=f"""
    WITH e AS (SELECT CAST(unnest(range({N_EPOCHS})) AS INT) AS epoch),
    keyed AS (
        SELECT d.doc_id, e.epoch,
               md5(CAST(e.epoch AS VARCHAR) || ':'
                   || CAST(d.doc_id AS VARCHAR)) AS k,
               CAST(CAST(('0x' || substr(md5(CAST(e.epoch AS VARCHAR) || ':'
                              || CAST(d.doc_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % {N_TRAIN_SHARDS} AS INT) AS shard
        FROM documents d CROSS JOIN e
    )
    SELECT doc_id, epoch, shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY epoch, shard ORDER BY k)
                AS BIGINT) AS pos
    FROM keyed
    """,
)
def q_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-epoch training order: every epoch gets an independent
    deterministic permutation (epoch-salted md5 into shard + position),
    so consecutive epochs present the corpus in decorrelated orders —
    the data-loader shuffle, computed once as a layout instead of at
    read time.

    Scale: NO global sort anywhere — position is per (epoch, shard),
    matching how loaders actually consume data (files read in shard
    order, rows in position order).  A global ROW_NUMBER would be a
    single-reducer sort; the sharded layout is embarrassingly parallel
    and each epoch's layout job is independent.
    """
    d = load_table(spark, sf_dir, "documents")
    epochs = F.explode(F.sequence(F.lit(0), F.lit(N_EPOCHS - 1))).alias("epoch")
    keyed = d.select("doc_id").select("doc_id", epochs)
    salt = F.concat_ws(
        ":", F.col("epoch").cast("string"), F.col("doc_id").cast("string")
    )
    k = F.md5(salt)
    shard = (
        F.conv(F.substring(k, 1, 8), 16, 10).cast("bigint") % N_TRAIN_SHARDS
    ).cast("int")
    w = W.partitionBy("epoch", "shard").orderBy("k")
    return (
        keyed.select("doc_id", "epoch", k.alias("k"), shard.alias("shard"))
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .select("doc_id", "epoch", "shard", "pos")
    )
