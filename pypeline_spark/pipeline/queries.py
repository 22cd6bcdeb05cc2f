"""End-to-end pipeline runs as oracle-checked queries (Layer A proof).

Each query builds a PipelineConfig in code (the YAML path is covered in
tests), runs it through the full hydrate -> spark.sql extract ->
mapInPandas transformer chain -> keyed sink -> post-query lifecycle,
and returns the final target table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pypeline_spark.pipeline.runner import Pypeline
from pypeline_spark.pipeline.spec import PipelineConfig
from pypeline_spark.registry import query
from pypeline_spark.session import register_tables

_ETL_CONFIG = {
    "pypes": {
        "load_customers": {
            "extract_query": (
                "SELECT c_custkey, c_name, c_acctbal FROM customer "
                "WHERE c_custkey <= {max_key}"
            ),
            "target_table": "dim_customer",
            "type": "upsert",
            "key_columns": ["c_custkey"],
            "transformers": [
                "pypeline_spark.pipeline.sample_transformers.UppercaseNameTransformer",
                "pypeline_spark.pipeline.sample_transformers.AddTierTransformer",
            ],
            "transformer_schema": (
                "c_custkey bigint, c_name string, c_acctbal double, tier string"
            ),
        },
        "boost_low_tier": {
            "extract_query": (
                "SELECT c_custkey, c_name, c_acctbal + 500.0 AS c_acctbal, tier "
                "FROM dim_customer WHERE tier = 'LOW'"
            ),
            "target_table": "dim_customer",
            "type": "update",
            "key_columns": ["c_custkey"],
        },
    },
    "pypelines": {"customer_etl": ["load_customers", "boost_low_tier"]},
}


@query(
    "q_pipeline_etl",
    oracle="""
    WITH base AS (
        SELECT c_custkey, UPPER(c_name) AS c_name, c_acctbal,
               CASE WHEN c_acctbal > 5000 THEN 'HIGH' ELSE 'LOW' END AS tier
        FROM customer WHERE c_custkey <= 600
    )
    SELECT c_custkey, c_name,
           CASE WHEN tier = 'LOW' THEN c_acctbal + 500.0 ELSE c_acctbal END AS c_acctbal,
           tier
    FROM base
    """,
)
def q_pipeline_etl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-step pipeline: upsert-create with a Python transformer chain,
    then an update step reading back from the target — the reference's
    inter-step dataflow-through-database-state, here via temp views."""
    register_tables(spark, sf_dir, only=("customer",))
    config = PipelineConfig.from_dict(_ETL_CONFIG)
    pipeline = Pypeline(spark, config, placeholders={"max_key": 600})
    pipeline.run("customer_etl")
    return pipeline.catalog.get("dim_customer")


_CDC_CONFIG = {
    "pypes": {
        "seed_accounts": {
            "extract_query": (
                "SELECT c_custkey AS custkey, c_acctbal AS acctbal, "
                "c_mktsegment AS segment FROM customer WHERE c_custkey <= {max_key}"
            ),
            "target_table": "accounts",
            "type": "overwrite",
        },
        "apply_changes": {
            "extract_query": (
                "SELECT o_custkey AS custkey, o_orderkey AS seq, "
                "CASE WHEN o_orderkey % 5 = 0 THEN 'delete' ELSE 'upsert' END AS op, "
                "ROUND(o_totalprice, 2) AS acctbal, "
                "'CDC_' || o_orderstatus AS segment "
                "FROM orders WHERE o_orderkey % 3 != 0"
            ),
            "target_table": "accounts",
            "type": "cdc",
            "key_columns": ["custkey"],
        },
    },
    "pypelines": {"account_sync": ["seed_accounts", "apply_changes"]},
}


# The oracle composes the SAME base/ops SQL the direct q_cdc_apply
# oracle uses (sinks/history constants) — the two replays cannot
# drift, and the hash match doubles as "pipeline path == direct
# cdc_apply" equivalence.
from pypeline_spark.sinks.history import _CDC_BASE_SQL, _CDC_OPS_SQL  # noqa: E402


@query(
    "q_pipeline_cdc",
    oracle=f"""
    WITH base AS ({_CDC_BASE_SQL}),
    ops AS ({_CDC_OPS_SQL}),
    last AS (
        SELECT custkey, op, acctbal, segment
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY custkey
                                           ORDER BY seq DESC, op) AS rn
              FROM ops)
        WHERE rn = 1
    )
    SELECT b.custkey, b.acctbal, b.segment
    FROM base b LEFT JOIN last l USING (custkey) WHERE l.custkey IS NULL
    UNION ALL
    SELECT custkey, acctbal, segment FROM last WHERE op != 'delete'
    """,
)
def q_pipeline_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layer-A pipeline with the ``cdc`` step type: seed a base table
    (overwrite), then apply a sequenced upsert/delete change log
    through ``sinks.history.cdc_apply`` — the reference's DB-sync
    loop upgraded to real change-log semantics, driven entirely from
    the validated YAML-shaped config."""
    register_tables(spark, sf_dir, only=("customer", "orders"))
    config = PipelineConfig.from_dict(_CDC_CONFIG)
    pipeline = Pypeline(spark, config, placeholders={"max_key": 1000})
    pipeline.run("account_sync")
    return pipeline.catalog.get("accounts")


_DEDUP_SEED_SQL = "SELECT doc_id, text, lang, source FROM documents WHERE doc_id < 300"
_DEDUP_BATCH_SQL = (
    "SELECT doc_id, text, lang, source FROM documents WHERE doc_id >= 250 "
    "UNION ALL "
    "SELECT doc_id + 1000 AS doc_id, text, lang, source "
    "FROM documents WHERE doc_id >= 450"
)

_DEDUP_CONFIG = {
    "pypes": {
        "seed_corpus": {
            "extract_query": _DEDUP_SEED_SQL,
            "target_table": "corpus",
            "type": "overwrite",
        },
        "ingest_batch": {
            "extract_query": _DEDUP_BATCH_SQL,
            "target_table": "corpus",
            "type": "dedup",
            "dedup_method": "exact",
            "key_columns": ["doc_id"],
            "text_column": "text",
        },
    },
    "pypelines": {"corpus_ingest": ["seed_corpus", "ingest_batch"]},
}


@query(
    "q_pipeline_dedup",
    # same seed/batch SQL strings as the config — the replays can't
    # drift.  The batch overlaps the seed (ids 250-299: identical
    # text, dropped by the standing-corpus fingerprint probe) and
    # contains internal copies (ids 1450-1999 re-keyed from 450-499:
    # dropped by keep-min-key), so both dedup paths are exercised.
    oracle=f"""
    WITH seed AS ({_DEDUP_SEED_SQL}),
    batch AS ({_DEDUP_BATCH_SQL}),
    internal AS (
        SELECT doc_id, text, lang, source FROM (
            SELECT b.*, MIN(doc_id) OVER (
                PARTITION BY md5(lower(trim(text)))) AS keep
            FROM batch b)
        WHERE doc_id = keep
    ),
    survivors AS (
        SELECT i.* FROM internal i
        WHERE NOT EXISTS (
            SELECT 1 FROM seed s
            WHERE md5(lower(trim(s.text))) = md5(lower(trim(i.text))))
    )
    SELECT * FROM seed UNION ALL SELECT * FROM survivors
    """,
)
def q_pipeline_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layer-A pipeline with the ``dedup`` step type: seed a corpus,
    then ingest a batch that is deduplicated against the standing
    corpus (content fingerprint) and against itself (keep-min-key)
    before appending — exact-dedup ingestion as a declarative YAML
    step; ``dedup_method: minhash`` swaps in the near-dup probe of
    q_dedup_incremental (asserted in tests/test_pipeline.py).

    Scale: the fingerprint probe is a digest-keyed anti join (the
    q_dedup_exact shuffle shape); the standing corpus side projects to
    its digest only.  The minhash method probes the persisted band
    index, shuffling the batch — never rescanning the corpus.
    """
    register_tables(spark, sf_dir, only=("documents",))
    config = PipelineConfig.from_dict(_DEDUP_CONFIG)
    pipeline = Pypeline(spark, config)
    pipeline.run("corpus_ingest")
    return pipeline.catalog.get("corpus")


_LAKEHOUSE_CONFIG = {
    "pypes": {
        "sync_orders": {
            "extract_query": (
                "SELECT o_custkey AS c_custkey, "
                "CAST(SUM(FLOOR(o_totalprice)) AS DOUBLE) AS c_acctbal, "
                "'FROMORD' AS c_mktsegment "
                "FROM orders WHERE o_custkey <= {max_key} GROUP BY o_custkey"
            ),
            "target_table": "accounts",
            "type": "lakehouse",
            "lakehouse_op": "upsert",
            "key_columns": ["c_custkey"],
            "fields_excluded_from_update": ["c_mktsegment"],
            "batch_id": "orders-{seq}",
        },
        "flag_whales": {
            # inter-step dataflow: reads the RESOLVED view step 1
            # registered (the reference's dataflow-through-target,
            # Pype.py:36), matched-only merge back onto the table
            "extract_query": (
                "SELECT c_custkey, 'WHALE' AS c_mktsegment "
                "FROM accounts WHERE c_acctbal > 100000"
            ),
            "target_table": "accounts",
            "type": "lakehouse",
            "lakehouse_op": "update",
            "key_columns": ["c_custkey"],
            "batch_id": "whales-{seq}",
        },
        "purge_ninths": {
            "extract_query": (
                "SELECT c_custkey FROM accounts WHERE c_custkey % 9 = 0"
            ),
            "target_table": "accounts",
            "type": "lakehouse",
            "lakehouse_op": "delete",
            "identifier": "c_custkey",
            "batch_id": "purge-{seq}",
        },
    },
    "pypelines": {"account_lakehouse": ["sync_orders", "flag_whales", "purge_ninths"]},
}


@query(
    "q_pipeline_lakehouse",
    # Replays the three steps as set algebra; the three structural
    # proofs are pinned TRUE: the pre-pipeline base file list survives
    # as a prefix across ALL THREE steps (every write ran in
    # deletion-vector mode — nothing rewritten), the outstanding
    # merge-on-read delta fileset carries through verbatim, and a
    # SECOND run of the whole pipeline with the same batch ids is a
    # version-level no-op (the exactly-once ledger absorbing a
    # restart-driven replay through the YAML surface).
    oracle="""
    WITH tgt AS (
        SELECT c_custkey, c_acctbal, c_mktsegment FROM customer
        WHERE c_custkey % 2 = 1
    ),
    src AS (
        SELECT o_custkey AS k,
               CAST(SUM(FLOOR(o_totalprice)) AS DOUBLE) AS spend
        FROM orders WHERE o_custkey <= 800 GROUP BY o_custkey
    ),
    after_upsert AS (
        SELECT t.c_custkey,
               CASE WHEN s.k IS NOT NULL THEN s.spend
                    ELSE t.c_acctbal END AS c_acctbal,
               t.c_mktsegment
        FROM tgt t LEFT JOIN src s ON t.c_custkey = s.k
        UNION ALL
        SELECT s.k, s.spend, 'FROMORD' FROM src s
        WHERE s.k NOT IN (SELECT c_custkey FROM tgt)
    ),
    after_update AS (
        SELECT c_custkey, c_acctbal,
               CASE WHEN c_acctbal > 100000 THEN 'WHALE'
                    ELSE c_mktsegment END AS c_mktsegment
        FROM after_upsert
    ),
    final AS (SELECT * FROM after_update WHERE c_custkey % 9 <> 0)
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_cents,
           TRUE AS files_intact,
           TRUE AS deltas_kept,
           TRUE AS replay_noop
    FROM final GROUP BY c_mktsegment
    """,
)
def q_pipeline_lakehouse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The YAML pipeline landing on the ACID lakehouse tier (r17
    directive #2): three ``type: lakehouse`` steps — a keyed upsert
    (MERGE with WHEN MATCHED UPDATE honouring
    ``fields_excluded_from_update`` + WHEN NOT MATCHED INSERT), a
    matched-only update merge reading the resolved view the previous
    step registered, and a keyed delete merge — against a
    ManifestTable that enters the pipeline MESSY: prior deletion
    vectors AND outstanding merge-on-read deltas (the state the
    copy-on-write forms refuse).  Every step auto-selects
    ``mode='dv'``, so the pipeline never forces the mid-ingest
    compact a 100 TB streaming table can't afford; each step's
    hydrated ``batch_id`` lands in the bounded exactly-once ledger,
    and the whole pipeline is RE-RUN with the same ids to prove the
    replay is a version-level no-op (``replay_noop``).

    Scale: write cost of every step is O(changed rows) however the
    matches scatter (deletion vectors, no base rewrites —
    ``files_intact``); the extract/merge joins shuffle on the table
    key only; reads pay a broadcast anti-join until the next
    scheduled OPTIMIZE."""
    import shutil
    import tempfile

    from pypeline_spark.pipeline.lakehouse import LakehouseCatalog
    from pypeline_spark.sinks.manifest import ManifestTable

    register_tables(spark, sf_dir, only=("customer", "orders"))
    from pyspark.sql import functions as F

    from pypeline_spark.session import load_table

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    scratch = tempfile.mkdtemp(prefix="pipelh_")
    try:
        cat = LakehouseCatalog(scratch)
        t = cat.table("accounts")
        # the table enters the pipeline messy: v1 all customers,
        # v2 dv-deletes the even slice (zero rewrites), v3 an
        # outstanding delta re-upserting IDENTICAL rows (keys with
        # two stored images that resolution folds — content unchanged)
        t.commit_overwrite(
            c.repartitionByRange(8, "c_custkey"),
            batch_id="seed",
            stats_cols=["c_custkey"],
        )
        t.delete_where(
            spark, "c_custkey % 2 = 0", batch_id="trim", mode="dv"
        )
        t.commit_delta(
            c.filter(
                (F.col("c_custkey") % 2 == 1) & (F.col("c_custkey") % 5 == 2)
            ),
            ["c_custkey"],
            batch_id="reup",
            stats_cols=["c_custkey"],
        )
        m0 = t._read_manifest()
        config = PipelineConfig.from_dict(_LAKEHOUSE_CONFIG)
        pipeline = Pypeline(
            spark, config, placeholders={"max_key": 800, "seq": 1},
            lakehouse=cat,
        )
        pipeline.run("account_lakehouse")
        v_first = t.version()
        m1 = t._read_manifest()
        files_intact = m1["files"][: len(m0["files"])] == m0["files"]
        deltas_kept = m1.get("deltas") == m0.get("deltas")
        # restart replay: the SAME pipeline again, same batch ids —
        # every step must be a ledger no-op
        pipeline.run("account_lakehouse")
        replay_noop = t.version() == v_first
        out = (
            t.read(spark)
            .groupBy("c_mktsegment")
            .agg(
                F.count("*").cast("bigint").alias("n_rows"),
                F.sum(F.floor(F.col("c_acctbal") * 100 + 0.5).cast("bigint"))
                .cast("bigint").alias("sum_cents"),
            )
            .select(
                "c_mktsegment",
                "n_rows",
                "sum_cents",
                F.lit(bool(files_intact)).alias("files_intact"),
                F.lit(bool(deltas_kept)).alias("deltas_kept"),
                F.lit(bool(replay_noop)).alias("replay_noop"),
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "q_lakehouse_append",
    # Replays the ingest as set algebra (seed customers + every order
    # batch row); the structural proofs are pinned TRUE: every
    # post-seed commit classified kind='append' (no base file read or
    # rewritten — the O(batch) ingest shape), a full pipeline re-run
    # from the same streaming checkpoint lands ZERO new versions
    # (restart exactly-once), and a direct post-crash replay of an
    # already-applied epoch's commit is a ledger no-op.
    oracle="""
    WITH seed AS (
        SELECT c_custkey AS k, 'CUST' AS src,
               CAST(FLOOR(c_acctbal) AS DOUBLE) AS amount
        FROM customer WHERE c_custkey % 2 = 0
    ),
    batches AS (
        SELECT o_orderkey AS k, 'ORD' AS src,
               CAST(FLOOR(o_totalprice) AS DOUBLE) AS amount
        FROM orders WHERE o_orderkey % 4 <> 0
    ),
    final AS (SELECT * FROM seed UNION ALL SELECT * FROM batches)
    SELECT src,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(FLOOR(amount * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_cents,
           TRUE AS appends_only,
           TRUE AS restart_noop,
           TRUE AS ledger_noop
    FROM final GROUP BY src
    """,
)
def q_lakehouse_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full declarative ingest lifecycle (r18 directive #2): a
    YAML pipeline whose first step seeds the table through the
    lakehouse ``overwrite`` op and whose second step binds a
    STREAMING source — three parquet files micro-batched one per
    trigger — to the lakehouse ``append`` op via ``foreachBatch``,
    each epoch committing NEW base files through the bounded
    exactly-once ledger under a ``stream-{seq}``-shaped batch id.
    Exactly-once is proven twice: the whole pipeline re-runs from the
    same Structured Streaming checkpoint (a restart) and lands zero
    new versions, and a direct replay of an already-applied epoch's
    ``commit_append`` (what a foreachBatch retry does after a crash
    between commit and checkpoint advance) is a version-level no-op.
    Every ingest commit is structurally classified ``kind='append'``
    — the parent file list survives as a prefix, so the change feed
    and the streaming CDF source read straight through the whole run.

    Scale: each micro-batch costs one fileset write plus one O(1)
    manifest publish — no base file is ever read or rewritten,
    whatever the table size; per-file skipping stats on the ingest
    key ride each commit, and blind-append OCC lets concurrent
    appenders serialize without aborts."""
    import shutil
    import tempfile

    from pypeline_spark.pipeline.lakehouse import LakehouseCatalog
    from pypeline_spark.session import load_table

    register_tables(spark, sf_dir, only=("customer", "orders"))
    from pyspark.sql import functions as F

    o = load_table(spark, sf_dir, "orders")
    seed_sql = (
        "SELECT c_custkey AS k, 'CUST' AS src, "
        "CAST(FLOOR(c_acctbal) AS DOUBLE) AS amount "
        "FROM customer WHERE c_custkey % 2 = 0"
    )
    batches = o.filter(F.col("o_orderkey") % 4 != 0).select(
        F.col("o_orderkey").alias("k"),
        F.lit("ORD").alias("src"),
        F.floor("o_totalprice").cast("double").alias("amount"),
    )
    scratch = tempfile.mkdtemp(prefix="lhappend_")
    try:
        stream_dir = f"{scratch}/in"
        for i in range(3):
            batches.filter(F.pmod(F.col("k"), 3) == i).write.mode(
                "overwrite"
            ).parquet(f"{stream_dir}/b{i}")
        spark.readStream.schema(batches.schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(f"{stream_dir}/b*").createOrReplaceTempView(
            "order_stream"
        )
        config = PipelineConfig.from_dict({
            "pypes": {
                "seed_ledger": {
                    "extract_query": seed_sql,
                    "target_table": "ledger",
                    "type": "lakehouse",
                    "lakehouse_op": "overwrite",
                    "key_columns": ["k"],
                    "batch_id": "seed-{seq}",
                },
                "ingest_orders": {
                    "extract_query": "SELECT * FROM order_stream",
                    "target_table": "ledger",
                    "type": "lakehouse",
                    "lakehouse_op": "append",
                    "key_columns": ["k"],
                    "batch_id": "stream-{seq}",
                    "checkpoint_dir": f"{scratch}/ckpt",
                },
            },
            "pypelines": {"order_ingest": ["seed_ledger", "ingest_orders"]},
        })
        cat = LakehouseCatalog(scratch)
        pipeline = Pypeline(
            spark, config, placeholders={"seq": 1}, lakehouse=cat
        )
        pipeline.run("order_ingest")
        t = cat.table("ledger")
        v_first = t.version()
        # every post-seed commit is a structural 'append' (no base
        # file read or rewritten — the O(batch) ingest shape)
        kinds = {
            t._load_record(v).get("kind") for v in range(2, v_first + 1)
        }
        appends_only = kinds == {"append"} and v_first == 1 + 3
        # restart: the WHOLE pipeline again — the seed replays through
        # the ledger, the stream resumes from its checkpoint with no
        # new files; zero new versions
        pipeline.run("order_ingest")
        restart_noop = t.version() == v_first
        # post-crash foreachBatch retry: re-commit an already-applied
        # epoch directly — the ledger absorbs it
        b0 = spark.read.parquet(f"{stream_dir}/b0")
        ledger_noop = (
            t.commit_append(b0, batch_id="stream-0") == v_first
            and t.version() == v_first
        )
        out = (
            t.read(spark)
            .groupBy("src")
            .agg(
                F.count("*").cast("bigint").alias("n_rows"),
                F.sum(F.floor(F.col("amount") * 100 + 0.5).cast("bigint"))
                .cast("bigint").alias("sum_cents"),
            )
            .select(
                "src",
                "n_rows",
                "sum_cents",
                F.lit(bool(appends_only)).alias("appends_only"),
                F.lit(bool(restart_noop)).alias("restart_noop"),
                F.lit(bool(ledger_noop)).alias("ledger_noop"),
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
