"""Incremental view maintenance for algebraic rollups.

A 100 TB deployment never recomputes a continuous aggregate from
scratch — it maintains the materialized rollup by merging in each new
batch's partial rollup (the "hypertable continuous aggregate" /
materialized-view-refresh pattern).  That merge is exact for
algebraic aggregates: COUNT and SUM add, MIN/MAX combine, and any
average derives from (sum, count) at read time.

``q_ivm_rollup`` PROVES the maintenance path: Spark builds the rollup
incrementally (pre-cutoff rollup merged with the post-cutoff delta
rollup) while the DuckDB oracle computes the direct rollup over all
events — the hash match is the equivalence check that incremental ==
recompute.  Value math is exact integer cents so the proof is not at
the mercy of float summation order (the repo-wide determinism move).

Scale: each side is one partial-aggregated groupBy at the rollup
grain; the merge is a grain-keyed full-outer join of two tiny
relations (rollup cardinality, not event cardinality).  The standing
rollup never rescans history — per batch you aggregate only the
delta, exactly like the mergeable HLL sketches in operators/stats.py
do for distinct counts.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pypeline_spark.registry import query
from pypeline_spark.session import load_table

IVM_CUTOFF = "2024-02-01"  # delta = events on/after this day


def rollup_events(e: DataFrame) -> DataFrame:
    """(event_type, day) -> n, sum/min/max of integer cents."""
    cents = F.floor(F.col("value") * 100).cast("bigint")
    return (
        e.select("event_type", F.to_date("ts").alias("day"), cents.alias("c"))
        .groupBy("event_type", "day")
        .agg(
            F.count("*").alias("n"),
            F.sum("c").cast("bigint").alias("sum_cents"),
            F.min("c").cast("bigint").alias("min_cents"),
            F.max("c").cast("bigint").alias("max_cents"),
        )
    )


def ivm_merge(a: DataFrame, b: DataFrame, keys=("event_type", "day")) -> DataFrame:
    """Merge two partial rollups of the same grain: counts/sums add,
    min/max combine.  Exact for these algebraic aggregates — merging
    is associative and commutative, so batches can land in any order."""
    keys = list(keys)
    bb = b.select(
        *keys,
        F.col("n").alias("__n"),
        F.col("sum_cents").alias("__s"),
        F.col("min_cents").alias("__mn"),
        F.col("max_cents").alias("__mx"),
    )
    return (
        a.join(bb, keys, "full_outer")
        .select(
            *keys,
            (F.coalesce("n", F.lit(0)) + F.coalesce("__n", F.lit(0))).alias("n"),
            (
                F.coalesce("sum_cents", F.lit(0)) + F.coalesce("__s", F.lit(0))
            )
            .cast("bigint")
            .alias("sum_cents"),
            F.least(
                F.coalesce("min_cents", F.col("__mn")),
                F.coalesce("__mn", F.col("min_cents")),
            )
            .cast("bigint")
            .alias("min_cents"),
            F.greatest(
                F.coalesce("max_cents", F.col("__mx")),
                F.coalesce("__mx", F.col("max_cents")),
            )
            .cast("bigint")
            .alias("max_cents"),
        )
    )


@query(
    "q_ivm_rollup",
    # The oracle computes the DIRECT rollup over all events; the Spark
    # side computes it INCREMENTALLY (pre-cutoff rollup + delta merge).
    # The hash match is the incremental == recompute equivalence proof.
    oracle="""
    SELECT event_type, CAST(ts AS DATE) AS day,
           COUNT(*) AS n,
           CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
           CAST(MIN(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS min_cents,
           CAST(MAX(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS max_cents
    FROM events
    GROUP BY event_type, day
    """,
)
def q_ivm_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate maintenance: the standing pre-cutoff rollup
    merged with the delta batch's partial rollup, hash-proven equal to
    a from-scratch recompute (the DuckDB oracle).

    Both branches scan through ``load_events`` so the cutoff bound
    filters the RAW nanos column and reaches PushedFilters —
    ``to_date(ts) < cutoff`` over ``load_table`` would full-scan (the
    µs conversion hides the predicate from the parquet reader).  A
    midnight cutoff makes ``ts < cutoff`` ⟺ ``to_date(ts) < cutoff``,
    so the pruned formulation is value-identical.  At 100 TB the
    standing side is the materialized rollup table; only the delta —
    the time-bounded branch — rescans raw events per batch.
    """
    from pypeline_spark.session import load_events

    standing = rollup_events(load_events(spark, sf_dir, until=IVM_CUTOFF))
    delta = rollup_events(load_events(spark, sf_dir, since=IVM_CUTOFF))
    return ivm_merge(standing, delta)


@query(
    "q_merge_variance",
    # Exact integer partials (n, sum_cents, sumsq_cents) merge across
    # months; only the FINAL variance formula touches doubles — a
    # handful of ops on exact integers, bit-identical in both engines.
    # sumsq fits bigint: (1e7 cents)^2 * 6e6 rows ~ 6e20 would not, but
    # extendedprice < 1e5 dollars => cents < 1e7, squared 1e14, summed
    # over per-flag rows at any test SF stays < 2^63; at warehouse
    # scale promote the partial to DECIMAL(38,0).
    oracle="""
    WITH parts AS (
        SELECT l_returnflag,
               date_trunc('month', l_shipdate) AS m,
               COUNT(*) AS n,
               SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS s,
               SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
                   * CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS ss
        FROM lineitem GROUP BY l_returnflag, m
    )
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_partials,
           CAST(SUM(n) AS BIGINT) AS n_rows,
           CAST(SUM(s) AS BIGINT) AS sum_cents,
           CAST(FLOOR((CAST(SUM(ss) AS DOUBLE)
                  - CAST(SUM(s) AS DOUBLE) * CAST(SUM(s) AS DOUBLE)
                    / CAST(SUM(n) AS DOUBLE))
                 / (CAST(SUM(n) AS DOUBLE) - 1) / 10000.0 * 100 + 0.5)
               AS BIGINT) AS var_x100
    FROM parts GROUP BY l_returnflag
    """,
)
def q_merge_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable variance: per-month partials (n, sum, sum-of-squares
    in integer cents) combined upward to per-flag sample variance —
    the IVM/continuous-aggregate treatment of a NON-additive statistic
    (variance itself cannot be summed; its moment partials can).

    Scale: this is how a maintained stats table works at 100 TB — each
    maintenance batch updates a few (flag, month) partial rows, and any
    coarser variance is a tiny rollup over partials instead of a raw
    rescan.  Exactly the q_ivm_rollup contract extended to second
    moments; the merged result provably equals the direct computation
    (the oracle recomputes from raw rows through the same partials).
    """
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("bigint")
    parts = li.groupBy(
        "l_returnflag", F.date_trunc("month", "l_shipdate").alias("m")
    ).agg(
        F.count("*").alias("n"),
        F.sum(cents).alias("s"),
        F.sum(cents * cents).alias("ss"),
    )
    n, s, ss = (
        F.sum("n").cast("double"),
        F.sum("s").cast("double"),
        F.sum("ss").cast("double"),
    )
    # Integer emission (FLOOR(x*100+0.5), the repo-wide convention): the
    # variance is derived from exact integer partials through identical
    # IEEE double ops in both engines, but ROUND's decimal tie behavior
    # diverges across engines on representable .xx5 midpoints — FLOOR of
    # the scaled value is engine-independent.  Variance >= 0, so no
    # negative-zero guard needed.
    var = (ss - s * s / n) / (n - F.lit(1.0)) / 10000.0
    return parts.groupBy("l_returnflag").agg(
        F.count("*").cast("bigint").alias("n_partials"),
        F.sum("n").cast("bigint").alias("n_rows"),
        F.sum("s").cast("bigint").alias("sum_cents"),
        F.floor(var * 100 + 0.5).cast("bigint").alias("var_x100"),
    )


def _scratch_manifest(spark: SparkSession, sf_dir: str):
    """(scratch_dir, ManifestTable, customer projection) for the
    manifest-backed queries: key-range-clustered commit with footer
    stats on c_custkey so file pruning has disjoint ranges to skip."""
    import tempfile

    from pypeline_spark.sinks.manifest import ManifestTable

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    scratch = tempfile.mkdtemp(prefix="manifest_prune_")
    table = ManifestTable(scratch)
    table.commit_overwrite(
        c.repartitionByRange(8, "c_custkey"),
        batch_id="seed",
        stats_cols=["c_custkey"],
    )
    return scratch, table, c


@query(
    "q_manifest_prune",
    # The oracle recomputes the filtered aggregate straight from the
    # source table; the Spark side reads it through the manifest's
    # stats-pruned path (files skipped by [min, max] metadata, never
    # opened) — the hash match proves pruning is lossless.  Key range
    # [10, 99] is populated at every fixture SF (custkey is dense
    # from 0).
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS sum_cents
    FROM customer
    WHERE c_custkey BETWEEN 10 AND 99
    GROUP BY c_mktsegment
    """,
)
def q_manifest_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stats-pruned snapshot read: the manifest records per-file
    [min, max] from the parquet footers (the Iceberg/Delta
    data-skipping layout); a key-range read plans its file list from
    that metadata alone and never opens non-overlapping files, then
    applies the predicate within the survivors.

    Scale: at 100 TB this is the difference between opening every
    object and opening the handful whose stats overlap — file skipping
    composes with row-group pushdown inside each survivor.  Pruning
    effectiveness (files skipped > 0) is pinned in
    tests/test_manifest.py; this query hash-proves losslessness.
    """
    import shutil

    scratch, table, _ = _scratch_manifest(spark, sf_dir)
    try:
        pruned = table.read_pruned(spark, "c_custkey", 10, 99)
        cents = F.floor(F.col("c_acctbal") * 100 + 0.5).cast("bigint")
        out = pruned.groupBy("c_mktsegment").agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum(cents).cast("bigint").alias("sum_cents"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "q_manifest_merge_prune",
    # The oracle applies the update predicate from first principles;
    # the Spark side routes it through the FILE-PRUNED copy-on-write
    # MERGE (only key-overlapping files read + rewritten, the rest
    # carried over by manifest entry).  Hash match == the pruned merge
    # is exactly the unpruned merge.
    oracle="""
    WITH v2 AS (
        SELECT c_custkey,
               CAST(FLOOR(
                   CASE WHEN c_custkey BETWEEN 10 AND 99
                        THEN c_acctbal + 50.0 ELSE c_acctbal END * 100 + 0.5
               ) AS BIGINT) AS cents
        FROM customer
    )
    SELECT CAST(c_custkey % 8 AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM v2 GROUP BY bucket
    """,
)
def q_manifest_merge_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-pruned lakehouse MERGE: a narrow update batch (keys 10-99)
    against the key-clustered manifest table rewrites ONLY the files
    whose stats overlap the batch's key range — every other file's
    manifest entry carries over verbatim (asserted file-by-file in
    tests/test_manifest.py).  This is the MERGE INTO + data-skipping
    shape Delta/Iceberg run, executed end to end on the no-jar manifest
    table; the DuckDB oracle recomputes the merged table from first
    principles and the hash match proves the pruned merge exact.
    """
    import shutil

    scratch, table, c = _scratch_manifest(spark, sf_dir)
    try:
        updates = c.filter(F.col("c_custkey").between(10, 99)).withColumn(
            "c_acctbal", F.col("c_acctbal") + 50.0
        )
        table.commit_merge(
            spark,
            updates,
            ["c_custkey"],
            batch_id="b1",
            stats_cols=["c_custkey"],
            prune_col="c_custkey",
        )
        cents = F.floor(F.col("c_acctbal") * 100 + 0.5).cast("bigint")
        out = (
            table.read(spark)
            .groupBy(F.pmod("c_custkey", F.lit(8)).cast("bigint").alias("bucket"))
            .agg(
                F.count("*").cast("bigint").alias("n_rows"),
                F.sum(cents).cast("bigint").alias("sum_cents"),
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "q_manifest_mor",
    # The oracle composes the three delta batches last-writer-wins from
    # first principles (CASE ordered newest batch first: each batch's
    # rows were derived from the ORIGINAL table, and resolution picks
    # the latest batch's row wholesale).  The Spark side routes them
    # through merge-on-read delta commits + single-shuffle resolution,
    # then COMPACTS and re-aggregates from the folded base files — the
    # duplicated column pair hash-proves read_resolved == compact ==
    # the first-principles merge in one query.
    oracle="""
    WITH v AS (
        SELECT c_custkey,
               CAST(FLOOR(
                   CASE WHEN c_custkey % 2 = 0 THEN c_acctbal + 100.0
                        WHEN c_custkey BETWEEN 10 AND 99
                             THEN c_acctbal + 50.0
                        WHEN c_custkey % 5 = 0 THEN c_acctbal + 10.0
                        ELSE c_acctbal END * 100 + 0.5) AS BIGINT) AS cents
        FROM customer
    )
    SELECT CAST(c_custkey % 8 AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS sum_cents,
           CAST(COUNT(*) AS BIGINT) AS n_rows_compacted,
           CAST(SUM(cents) AS BIGINT) AS sum_cents_compacted
    FROM v GROUP BY bucket
    """,
)
def q_manifest_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read lakehouse upserts: three overlapping update
    batches land as DELTA commits (O(batch) append, zero base-file
    rewrites — the high-frequency-sink shape copy-on-write can't
    afford), the resolved view merges base ∪ deltas with ONE shuffle
    on the key, and scheduled compaction folds the deltas back into
    base files.  The query aggregates the resolved view AND the
    post-compaction table; the DuckDB oracle recomputes the
    last-writer-wins composition from first principles, so the hash
    match proves merge-on-read ≡ compaction ≡ copy-on-write semantics
    (the q_manifest_merge_prune discipline, applied to the MOR path).
    """
    import shutil

    scratch, table, c = _scratch_manifest(spark, sf_dir)
    try:
        batches = (
            c.filter(F.col("c_custkey") % 5 == 0).withColumn(
                "c_acctbal", F.col("c_acctbal") + 10.0
            ),
            c.filter(F.col("c_custkey").between(10, 99)).withColumn(
                "c_acctbal", F.col("c_acctbal") + 50.0
            ),
            c.filter(F.col("c_custkey") % 2 == 0).withColumn(
                "c_acctbal", F.col("c_acctbal") + 100.0
            ),
        )
        for i, b in enumerate(batches, 1):
            table.commit_delta(
                b, ["c_custkey"], batch_id=f"d{i}", stats_cols=["c_custkey"]
            )
        cents = F.floor(F.col("c_acctbal") * 100 + 0.5).cast("bigint")

        def agg(df: DataFrame, suffix: str = "") -> DataFrame:
            return df.groupBy(
                F.pmod("c_custkey", F.lit(8)).cast("bigint").alias("bucket")
            ).agg(
                F.count("*").cast("bigint").alias(f"n_rows{suffix}"),
                F.sum(cents).cast("bigint").alias(f"sum_cents{suffix}"),
            )

        live = agg(table.read_resolved(spark)).localCheckpoint(eager=True)
        table.compact(spark, stats_cols=["c_custkey"])
        compacted = agg(table.read(spark), "_compacted").localCheckpoint(
            eager=True
        )
        return live.join(compacted, "bucket")
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "q_manifest_zorder",
    # The oracle recomputes the doubly-filtered aggregate straight from
    # the source table; the Spark side reads it through a Z-ORDER
    # clustered manifest commit pruned on BOTH dimensions at once
    # (conjunctive inclusive projection over per-file [min,max] stats).
    # The hash match proves two-column file skipping is lossless; the
    # skipping EFFECTIVENESS (either single-column predicate alone
    # skips files on the z-ordered layout, unlike a one-key layout) is
    # pinned in tests/test_manifest.py.
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_cents
    FROM orders
    WHERE o_custkey BETWEEN 10 AND 99
      AND FLOOR(o_totalprice * 100 + 0.5) BETWEEN 1000000 AND 2000000
    GROUP BY o_orderstatus
    """,
)
def q_manifest_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-dimensional data skipping: the orders table is committed to
    a ManifestTable clustered by the Morton (Z-order) interleave of
    (custkey, price-bucket) — every file's stats envelope is narrow in
    BOTH columns — and a conjunctive range read prunes files on the
    two dimensions simultaneously from manifest metadata alone (the
    lakehouse `OPTIMIZE ... ZORDER BY` + inclusive-projection shape,
    end to end without jars).

    Scale: the clustering costs ONE range shuffle at write (identical
    to a global sort); after that, predicates on either hot column
    skip files for every reader — a single-key layout prunes only its
    own key and full-scans on the other.
    """
    import shutil
    import tempfile

    from pypeline_spark.operators.multidim import zbucket, zvalue
    from pypeline_spark.sinks.manifest import ManifestTable

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("cents"),
    )
    # both dims scaled into the z domain from their data bounds (one
    # broadcast 1-row min/max aggregate — the OPTIMIZE-command shape);
    # the z column is layout-only: stats and predicates use the REAL
    # columns
    b = o.agg(
        F.min("o_custkey").alias("ck_lo"), F.max("o_custkey").alias("ck_hi"),
        F.min("cents").alias("c_lo"), F.max("cents").alias("c_hi"),
    )
    z = zvalue(
        zbucket(F.col("o_custkey"), F.col("ck_lo"), F.col("ck_hi")),
        zbucket(F.col("cents"), F.col("c_lo"), F.col("c_hi")),
    )
    scratch = tempfile.mkdtemp(prefix="manifest_zorder_")
    try:
        table = ManifestTable(scratch)
        table.commit_overwrite(
            o.crossJoin(F.broadcast(b))
            .withColumn("__z", z)
            .drop("ck_lo", "ck_hi", "c_lo", "c_hi")
            .repartitionByRange(16, "__z")
            .sortWithinPartitions("__z"),
            batch_id="seed",
            stats_cols=["o_custkey", "cents"],
        )
        pruned = table.read_pruned_multi(
            spark,
            {"o_custkey": (10, 99), "cents": (1_000_000, 2_000_000)},
        )
        out = pruned.groupBy("o_orderstatus").agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum("cents").cast("bigint").alias("sum_cents"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "q_manifest_bloom",
    # The oracle recomputes the point lookup from first principles
    # (self-join on the probe document's content hash); the Spark side
    # routes it through the manifest's per-file BLOOM index — the
    # equality-skipping shape for hashed keys whose [min, max] envelope
    # spans the whole keyspace and range-prunes nothing.  Hash match ==
    # bloom skipping is lossless; skipping effectiveness (and the
    # min/max-can't-help contrast) is pinned in tests/test_manifest.py.
    oracle="""
    SELECT d.doc_id, md5(d.text) AS fingerprint,
           CAST(d.n_chars AS BIGINT) AS n_chars
    FROM documents d
    WHERE md5(d.text) = (SELECT md5(text) FROM documents WHERE doc_id = 42)
    """,
)
def q_manifest_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-indexed point lookup: the documents table is committed
    hash-partitioned on a content fingerprint (md5 — a key whose
    per-file min/max envelope covers the whole keyspace, so range
    stats skip NOTHING), with a per-file Bloom bitset recorded in the
    manifest at write time.  An equality probe then opens only the
    file(s) whose bloom may contain the key — the Iceberg-puffin /
    Delta bloom-index shape, end to end without jars.

    Scale: the index costs one single-column read per file at write
    and 1 KiB of manifest metadata per file per column; the lookup is
    O(files) bit-tests on the driver plus ~1 opened file, versus a
    full-table scan for any engine relying on min/max alone.
    """
    import shutil
    import tempfile

    from pypeline_spark.sinks.manifest import ManifestTable

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(F.col("text")).alias("fingerprint"),
        F.col("n_chars").cast("bigint").alias("n_chars"),
    )
    scratch = tempfile.mkdtemp(prefix="manifest_bloom_")
    try:
        table = ManifestTable(scratch)
        table.commit_overwrite(
            d.repartition(16, "fingerprint"),
            batch_id="seed",
            stats_cols=["fingerprint"],
            bloom_cols=["fingerprint"],
        )
        probe = (
            d.filter(F.col("doc_id") == 42).select("fingerprint").first()[0]
        )
        out = table.read_pruned_eq(spark, "fingerprint", probe)
        return out.select("doc_id", "fingerprint", "n_chars").localCheckpoint(
            eager=True
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "q_time_travel_diff",
    # The oracle recomputes both snapshots directly from the source
    # table (v1 = seed predicate, v2 = keyed upsert of the update
    # batch), so the manifest table's commit + time-travel machinery is
    # value-hashed against first principles.
    # SF-relative predicates (key modulo, not absolute ranges) so all
    # three change classes are populated at every fixture scale:
    # v1 = keys not divisible by 3; update batch = even keys (+100).
    oracle="""
    WITH v1 AS (
        SELECT c_custkey,
               CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
        FROM customer WHERE c_custkey % 3 <> 0
    ),
    v2 AS (
        SELECT c_custkey,
               CAST(FLOOR(
                   CASE WHEN c_custkey % 2 = 0
                        THEN c_acctbal + 100.0 ELSE c_acctbal END * 100 + 0.5
               ) AS BIGINT) AS cents
        FROM customer WHERE c_custkey % 3 <> 0 OR c_custkey % 2 = 0
    )
    SELECT CASE WHEN v1.c_custkey IS NULL THEN 'added'
                WHEN v1.cents <> v2.cents THEN 'changed'
                ELSE 'same' END AS change_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(v2.cents) AS BIGINT) AS sum_cents
    FROM v2 LEFT JOIN v1 USING (c_custkey)
    GROUP BY change_type
    """,
)
def q_time_travel_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-travel snapshot diff: commit a seed version and a keyed
    upsert to a real ManifestTable (atomic pointer-swap commits,
    sinks/manifest.py), read BOTH versions back by version number, and
    classify every current row as added / changed / same — the audit
    query a lakehouse change review runs between two table versions.

    Scale: the diff is one key-partitioned join of two snapshot scans;
    each snapshot's file list is pinned by its manifest, so the join
    reads exactly two immutable filesets regardless of concurrent
    writers.  The commit machinery itself is exercised for real (two
    versions written to a scratch dir per call).
    """
    import shutil
    import tempfile

    from pypeline_spark.sinks.manifest import ManifestTable

    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    # mkdtemp (unique per call, concurrency-safe across parallel sweep
    # processes) + try/finally rmtree: the 3-row aggregate is eagerly
    # localCheckpoint-ed before cleanup, so the returned DataFrame has no
    # lineage into the scratch files and repeated harness runs leak
    # nothing.
    scratch = tempfile.mkdtemp(prefix="snapdiff_")
    try:
        table = ManifestTable(scratch)
        table.commit_overwrite(
            c.filter(F.col("c_custkey") % 3 != 0), batch_id="seed"
        )
        updates = c.filter(F.col("c_custkey") % 2 == 0).withColumn(
            "c_acctbal", F.col("c_acctbal") + 100.0
        )
        v2_no = table.commit_merge(spark, updates, ["c_custkey"], batch_id="b1")
        cents = lambda col: F.floor(col * 100 + 0.5).cast("bigint")  # noqa: E731
        v1 = table.read(spark, version=v2_no - 1).select(
            "c_custkey", cents(F.col("c_acctbal")).alias("cents_v1")
        )
        v2 = table.read(spark, version=v2_no).select(
            "c_custkey", cents(F.col("c_acctbal")).alias("cents_v2")
        )
        diff = v2.join(v1, "c_custkey", "left_outer")
        change = (
            F.when(F.col("cents_v1").isNull(), "added")
            .when(F.col("cents_v1") != F.col("cents_v2"), "changed")
            .otherwise("same")
        )
        out = diff.select(change.alias("change_type"), "cents_v2").groupBy(
            "change_type"
        ).agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum("cents_v2").cast("bigint").alias("sum_cents"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "q_manifest_optimize",
    # The oracle recomputes the content aggregate straight from the
    # source table and the post-OPTIMIZE file count from the same
    # bin-packing arithmetic (ceil(rows / target)); the Spark side
    # reads the table back through the rewritten manifest and reports
    # the ACTUAL file count — the hash match proves the bin-packing
    # rewrite is content-lossless AND lands exactly the predicted
    # number of files at every fixture scale.
    oracle="""
    SELECT CAST(c_custkey % 8 AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_cents,
           CAST((SELECT CEIL(COUNT(*) / 500.0) FROM customer) AS BIGINT)
               AS n_files
    FROM customer
    GROUP BY bucket
    """,
)
def q_manifest_optimize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file bin-packing (the lakehouse ``OPTIMIZE`` command):
    the customer table is committed deliberately fragmented (24-way
    round-robin — the shape a high-frequency ingest leaves behind),
    then ``ManifestTable.optimize`` rewrites it to
    ceil(rows / target_rows) evenly sized files.  The query aggregates
    the post-OPTIMIZE table and reports the manifest's actual file
    count; the oracle predicts both from first principles.

    Scale: file count is the unit of planning cost and scan
    parallelism — without scheduled bin-packing a CDC/streaming ingest
    degrades a 100 TB table into millions of KB files.  The rewrite is
    one round-robin shuffle; stats/bloom index rebuilds run as
    distributed jobs (index preservation pinned in
    tests/test_manifest.py).
    """
    import shutil
    import tempfile

    from pypeline_spark.sinks.manifest import ManifestTable

    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    scratch = tempfile.mkdtemp(prefix="manifest_opt_")
    try:
        table = ManifestTable(scratch)
        table.commit_overwrite(
            c.repartition(24), batch_id="seed", stats_cols=["c_custkey"]
        )
        table.optimize(
            spark, target_rows=500, batch_id="opt", stats_cols=["c_custkey"]
        )
        n_files = len(table._read_manifest()["files"])
        out = (
            table.read(spark)
            .groupBy(F.pmod("c_custkey", F.lit(8)).cast("bigint").alias("bucket"))
            .agg(
                F.count("*").cast("bigint").alias("n_rows"),
                F.sum(F.floor(F.col("c_acctbal") * 100 + 0.5).cast("bigint"))
                .cast("bigint")
                .alias("sum_cents"),
            )
            .withColumn("n_files", F.lit(n_files).cast("bigint"))
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "q_manifest_optimize_zorder",
    # The oracle recomputes the doubly-filtered aggregate straight from
    # the source table; the Spark side first FRAGMENTS the table
    # (arrival-ordered 24-way commit), then OPTIMIZEs it with
    # cluster_by — the `OPTIMIZE ... ZORDER BY` shape — and reads it
    # back through a conjunctive two-column prune over the rewritten
    # manifest.  The hash match proves the clustered rewrite is
    # content-lossless AND that two-dimensional pruning over the
    # post-OPTIMIZE stats envelopes is exact; skipping EFFECTIVENESS
    # (either single-column predicate alone skips files after the
    # clustered rewrite, while a round-robin rewrite skips on neither)
    # is pinned in tests/test_manifest.py::TestClusteredOptimize.
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_cents
    FROM orders
    WHERE o_custkey BETWEEN 10 AND 99
      AND FLOOR(o_totalprice * 100 + 0.5) BETWEEN 1000000 AND 2000000
    GROUP BY o_orderstatus
    """,
)
def q_manifest_optimize_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustered OPTIMIZE (``OPTIMIZE ... ZORDER BY``): the orders
    table is committed deliberately fragmented and arrival-ordered —
    the layout a high-frequency ingest leaves behind, where every
    file's stats envelope spans both domains and no predicate skips
    anything — then ``ManifestTable.optimize(cluster_by=(custkey,
    cents))`` bin-packs it with a Morton-interleaved range clustering.
    The query reads the rewritten table through a conjunctive
    two-column manifest prune and aggregates.

    Scale: this is the maintenance pairing a 100 TB table needs —
    plain round-robin OPTIMIZE fixes the file count but DESTROYS any
    clustering (every rewritten envelope goes wide, trading skipping
    for compaction); cluster_by makes the same single range-shuffle
    rewrite restore both.  The cluster bounds come from the manifest's
    recorded per-file stats (pure metadata — no extra scan before the
    rewrite shuffle), and the z key is layout-only: the table schema
    is unchanged.
    """
    import shutil
    import tempfile

    from pypeline_spark.sinks.manifest import ManifestTable

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("cents"),
    )
    scratch = tempfile.mkdtemp(prefix="manifest_optz_")
    try:
        table = ManifestTable(scratch)
        table.commit_overwrite(
            o.repartition(24),
            batch_id="seed",
            stats_cols=["o_custkey", "cents"],
        )
        table.optimize(
            spark,
            target_rows=500,
            batch_id="optz",
            stats_cols=["o_custkey", "cents"],
            cluster_by=("o_custkey", "cents"),
        )
        pruned = table.read_pruned_multi(
            spark,
            {"o_custkey": (10, 99), "cents": (1_000_000, 2_000_000)},
        )
        out = pruned.groupBy("o_orderstatus").agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum("cents").cast("bigint").alias("sum_cents"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "q_manifest_vacuum",
    # The oracle recomputes the two RETAINED snapshots from first
    # principles (v2 = full table, v3 = even keys only) and pins the
    # retained-manifest count at the vacuum's keep_versions=2; the
    # Spark side reads one snapshot by time travel and one as current
    # AFTER vacuuming the oldest version's files — the hash match
    # proves retention removes only what no retained version
    # references.  Physical file deletion and the vacuumed-version
    # read refusal are pinned in tests/test_manifest.py.
    oracle="""
    WITH v2 AS (
        SELECT CAST(c_custkey % 8 AS BIGINT) AS bucket,
               CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
        FROM customer
    ),
    v3 AS (
        SELECT CAST(c_custkey % 8 AS BIGINT) AS bucket,
               CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
        FROM customer WHERE c_custkey % 2 = 0
    )
    SELECT 'previous' AS snapshot, bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS sum_cents,
           CAST(2 AS BIGINT) AS n_manifests
    FROM v2 GROUP BY bucket
    UNION ALL
    SELECT 'current' AS snapshot, bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS sum_cents,
           CAST(2 AS BIGINT) AS n_manifests
    FROM v3 GROUP BY bucket
    """,
)
def q_manifest_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention vacuum: three overwrite commits build a version
    history, ``vacuum(keep_versions=2)`` physically removes the data
    files referenced only by the expired oldest version, and the query
    aggregates BOTH retained snapshots — the newest read as current,
    the prior one by time travel — proving reads of every retained
    version survive the cleanup intact.

    Scale: vacuum cost is O(manifests × files) pure metadata — set
    arithmetic over file-name lists, no data I/O — so retention on a
    100 TB table is a driver-side sweep plus unlink calls that object
    stores batch; readers are never blocked because retained manifests
    pin immutable file sets (the Delta VACUUM / Iceberg
    expire_snapshots contract).
    """
    import os as _os
    import shutil
    import tempfile

    from pypeline_spark.sinks.manifest import ManifestTable

    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    scratch = tempfile.mkdtemp(prefix="manifest_vac_")
    try:
        table = ManifestTable(scratch)
        table.commit_overwrite(
            c.filter(F.col("c_custkey") % 3 != 0), batch_id="v1"
        )
        table.commit_overwrite(c, batch_id="v2")
        v3 = table.commit_overwrite(
            c.filter(F.col("c_custkey") % 2 == 0), batch_id="v3"
        )
        table.vacuum(keep_versions=2)
        n_manifests = sum(
            1
            for f in _os.listdir(scratch)
            if f.startswith("_manifest.v") and f.endswith(".json")
        )
        cents = F.floor(F.col("c_acctbal") * 100 + 0.5).cast("bigint")

        def snap(df: DataFrame, tag: str) -> DataFrame:
            return df.groupBy(
                F.pmod("c_custkey", F.lit(8)).cast("bigint").alias("bucket")
            ).agg(
                F.count("*").cast("bigint").alias("n_rows"),
                F.sum(cents).cast("bigint").alias("sum_cents"),
            ).select(F.lit(tag).alias("snapshot"), "*")

        out = snap(table.read(spark, version=v3 - 1), "previous").unionByName(
            snap(table.read(spark), "current")
        ).withColumn("n_manifests", F.lit(n_manifests).cast("bigint"))
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "q_manifest_analyze",
    # The oracle recomputes the profile's EXACT fields (row count, null
    # count, min, max) from first principles per analyzed column; the
    # Spark side commits the table, runs ANALYZE (one distributed
    # aggregation pass persisted as a metadata-only manifest commit),
    # and emits the PERSISTED profile back as literals — the hash
    # match proves the stats in the manifest are the true table stats.
    # The approximate NDV is certified as a banded boolean (within 10%
    # of the exact distinct count, computed distributed); both sides
    # assert TRUE.  Metadata-only-ness (no new data files, version
    # bump, carry/invalidation rules, suggest_bloom_bits arithmetic)
    # is pinned in tests/test_manifest.py::TestAnalyze.
    oracle="""
    SELECT 'c_custkey' AS col,
           CAST(COUNT(*) AS BIGINT) AS row_count,
           CAST(0 AS BIGINT) AS n_nulls,
           CAST(MIN(c_custkey) AS BIGINT) AS min_v,
           CAST(MAX(c_custkey) AS BIGINT) AS max_v,
           TRUE AS ndv_within_10pct
    FROM customer
    UNION ALL
    SELECT 'cents' AS col,
           CAST(COUNT(*) AS BIGINT) AS row_count,
           CAST(0 AS BIGINT) AS n_nulls,
           CAST(MIN(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) AS min_v,
           CAST(MAX(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) AS max_v,
           TRUE AS ndv_within_10pct
    FROM customer
    """,
)
def q_manifest_analyze(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ANALYZE TABLE .. COMPUTE STATISTICS FOR COLUMNS`` over a
    manifest table: one distributed aggregation pass computes
    per-column NDV / null count / min / max plus the row count and
    persists them as a METADATA-ONLY commit; the query reads the
    persisted profile back and certifies the exact fields against a
    first-principles oracle (the approximate NDV as a 10% band vs the
    exact distinct count).

    Scale: the profile turns downstream planning from data passes
    into manifest reads — ``suggest_bloom_bits`` sizes a runtime
    bloom filter for a 100 TB join from the persisted NDV instead of
    an in-plan sizing aggregate, and null/min/max feed the same
    decisions engine catalogs (Delta/Iceberg column stats, CBO) make.
    The ANALYZE itself is one map-side-combined aggregate; the driver
    handles a single row of numbers.
    """
    import shutil
    import tempfile

    from pypeline_spark.sinks.manifest import ManifestTable

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.floor(F.col("c_acctbal") * 100 + 0.5).cast("bigint").alias("cents"),
    )
    scratch = tempfile.mkdtemp(prefix="manifest_analyze_")
    try:
        table = ManifestTable(scratch)
        table.commit_overwrite(c.repartition(8), batch_id="seed")
        table.analyze(spark, ["c_custkey", "cents"], batch_id="an1")
        cs = table.column_stats()
        exact = c.agg(
            F.count(F.lit(1)).alias("rc"),
            F.count_distinct("c_custkey").alias("e_custkey"),
            F.count_distinct("cents").alias("e_cents"),
        )

        def profile_row(col: str, exact_ndv_col: str) -> DataFrame:
            p = cs["columns"][col]
            band = (
                F.abs(F.lit(p["ndv"]) - F.col(exact_ndv_col))
                <= 0.1 * F.col(exact_ndv_col)
            )
            return exact.select(
                F.lit(col).alias("col"),
                F.lit(cs["row_count"]).cast("bigint").alias("row_count"),
                F.lit(p["nulls"]).cast("bigint").alias("n_nulls"),
                F.lit(p["min"]).cast("bigint").alias("min_v"),
                F.lit(p["max"]).cast("bigint").alias("max_v"),
                band.alias("ndv_within_10pct"),
            )

        out = profile_row("c_custkey", "e_custkey").unionByName(
            profile_row("cents", "e_cents")
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "q_partition_evolution",
    # The oracle recomputes the content aggregate straight from the
    # source and pins the evolution bookkeeping from first principles:
    # a 24-file arrival-ordered table re-clustered at
    # max_files_per_step=10 converges in exactly ceil(24/10) = 3
    # bounded commits rewriting all 24 original files once each (newly
    # written files carry the clustering tag, so no file is ever
    # rewritten twice), and a 4th call is a metadata no-op.  The hash
    # match proves every intermediate snapshot stayed content-lossless
    # while the table was re-clustered LIVE; skipping effectiveness
    # after convergence is pinned in
    # tests/test_manifest.py::TestPartitionEvolution.
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_cents,
           CAST(3 AS BIGINT) AS n_steps,
           CAST(24 AS BIGINT) AS files_rewritten,
           TRUE AS converged
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_partition_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition evolution: re-cluster a LIVE manifest table onto a new
    (custkey, cents) Z-order key in bounded maintenance steps instead
    of one stop-the-world rewrite.  A 24-file arrival-ordered commit
    evolves at ``max_files_per_step=10``: each call rewrites at most
    10 not-yet-clustered files (decided from the per-file ``clustered``
    filemeta tag — pure metadata) and carries the rest verbatim, so
    readers keep snapshot isolation throughout and the rewrite
    amplification per commit is capped.  The query reports the
    converged table's aggregate plus the step/rewrite counts.

    Scale: a one-shot re-cluster of 100 TB is a full-table shuffle no
    maintenance window tolerates, and a crash burns the whole attempt;
    evolution amortizes the same work into crash-isolated commits of
    bounded size — the Iceberg partition-evolution / incremental-ZORDER
    operational shape — while z-bounds taken from WHOLE-table manifest
    stats keep buckets comparable across steps.
    """
    import shutil
    import tempfile

    from pypeline_spark.sinks.manifest import ManifestTable

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("cents"),
    )
    scratch = tempfile.mkdtemp(prefix="partition_evolution_")
    try:
        table = ManifestTable(scratch)
        table.commit_overwrite(
            o.repartition(24),
            batch_id="seed",
            stats_cols=["o_custkey", "cents"],
        )
        n = o.count()
        target = max(1, -(-n // 12))
        steps = 0
        rewritten = 0
        while True:
            _, k = table.evolve_clustering(
                spark,
                ("o_custkey", "cents"),
                target_rows=target,
                batch_id=f"evolve-{steps}",
                max_files_per_step=10,
                stats_cols=["o_custkey", "cents"],
            )
            if k == 0:
                break
            steps += 1
            rewritten += k
        out = (
            table.read(spark)
            .groupBy("o_orderstatus")
            .agg(
                F.count("*").cast("bigint").alias("n_rows"),
                F.sum("cents").cast("bigint").alias("sum_cents"),
            )
            .withColumn("n_steps", F.lit(steps).cast("bigint"))
            .withColumn("files_rewritten", F.lit(rewritten).cast("bigint"))
            .withColumn("converged", F.lit(steps > 0) & F.lit(rewritten == 24))
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "q_manifest_changes",
    # The oracle recomputes each commit's change set from the same key
    # slices the Spark side committed: version 2 upserted the even
    # %3==0 keys at +100, version 4 the odd ones at +200, and version
    # 3 (a metadata-only ANALYZE commit) contributes NOTHING — the
    # hash match proves the feed returns exactly the rows each delta
    # commit appended, tagged with the right version, reading ONLY
    # those commits' files.  Rewrite-refusal, bounds, and empty-range
    # edges are pinned in tests/test_manifest.py::TestChangeFeed.
    oracle="""
    SELECT CAST(2 AS BIGINT) AS commit_version,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(FLOOR((c_acctbal + 100) * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_cents
    FROM customer WHERE c_custkey % 3 = 0 AND c_custkey % 2 = 0
    UNION ALL
    SELECT CAST(4 AS BIGINT) AS commit_version,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(FLOOR((c_acctbal + 200) * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_cents
    FROM customer WHERE c_custkey % 3 = 0 AND c_custkey % 2 = 1
    """,
)
def q_manifest_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental change feed (Delta CDF / Iceberg incremental-read
    shape): a manifest table takes two merge-on-read delta commits
    (with a metadata-only ANALYZE commit between them), and
    ``changes(since_version=1)`` returns exactly the upserted rows
    each commit appended, tagged with ``_commit_version`` — reading
    ONLY the files those commits added, never a table scan or
    snapshot diff.

    Scale: this is how a downstream consumer (search index, replica,
    maintained aggregate) follows a 100 TB table — the feed's read
    cost is O(changed rows) per sync because a delta commit's fileset
    IS its change set; the metadata-only commit in the middle proves
    non-content commits never pollute the feed.
    """
    import shutil
    import tempfile

    from pypeline_spark.sinks.manifest import ManifestTable

    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    scratch = tempfile.mkdtemp(prefix="manifest_changes_")
    try:
        table = ManifestTable(scratch)
        table.commit_overwrite(
            c.filter(F.col("c_custkey") % 3 != 0), batch_id="seed"
        )  # v1
        upd = c.filter(F.col("c_custkey") % 3 == 0)
        table.commit_delta(
            upd.filter(F.col("c_custkey") % 2 == 0).withColumn(
                "c_acctbal", F.col("c_acctbal") + 100.0
            ),
            ["c_custkey"],
            batch_id="d1",
        )  # v2
        table.analyze(spark, ["c_custkey"], batch_id="an1")  # v3: metadata
        table.commit_delta(
            upd.filter(F.col("c_custkey") % 2 == 1).withColumn(
                "c_acctbal", F.col("c_acctbal") + 200.0
            ),
            ["c_custkey"],
            batch_id="d2",
        )  # v4
        feed = table.changes(spark, since_version=1)
        out = (
            feed.groupBy(
                F.col("_commit_version").alias("commit_version")
            )
            .agg(
                F.count("*").cast("bigint").alias("n_rows"),
                F.sum(
                    F.floor(F.col("c_acctbal") * 100 + 0.5).cast("bigint")
                ).cast("bigint").alias("sum_cents"),
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "q_manifest_restore",
    # The oracle recomputes the restored snapshot (the seed slice —
    # every even key at its ORIGINAL balance) from first principles
    # and pins the rollback bookkeeping as constants: restore is one
    # metadata commit (versions 1 seed + 2 bad merge + 3 restore), and
    # a post-restore replay of the rolled-back batch id is STILL
    # ledger-skipped (replay_skipped TRUE) — content undo never
    # reopens exactly-once.  The hash match proves the restore
    # republished the old content exactly; metadata-only-ness, stats
    # restoration, MoR restore and vacuum interplay are pinned in
    # tests/test_manifest.py::TestRestore.
    oracle="""
    SELECT CAST(c_custkey % 8 AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_cents,
           CAST(3 AS BIGINT) AS n_versions,
           TRUE AS replay_skipped
    FROM customer WHERE c_custkey % 2 = 0
    GROUP BY bucket
    """,
)
def q_manifest_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``RESTORE TABLE .. TO VERSION`` (the Delta/Iceberg rollback
    shape): a bad copy-on-write merge poisons the table, ``restore``
    republishes version 1's exact content as a new commit — ONE
    manifest write, no data file read, written or deleted — and the
    query proves the rollback: content hash-matches the pre-incident
    snapshot, and replaying the rolled-back batch id afterwards is
    still skipped by the ledger (a restore undoes CONTENT, never
    exactly-once bookkeeping).

    Scale: rolling back a 100 TB table by rewriting it costs a full
    write pass and a window of unavailability; manifest RESTORE costs
    one metadata operation, keeps every version time-travelable until
    vacuum, and a crash mid-restore leaves the old pointer — the
    operational undo a production lakehouse cannot run without.
    """
    import shutil
    import tempfile

    from pypeline_spark.sinks.manifest import ManifestTable

    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    scratch = tempfile.mkdtemp(prefix="manifest_restore_")
    try:
        table = ManifestTable(scratch)
        good = c.filter(F.col("c_custkey") % 2 == 0)
        table.commit_overwrite(good, batch_id="seed")  # v1
        bad = good.limit(50).withColumn("c_acctbal", F.lit(-1.0))
        table.commit_merge(spark, bad, ["c_custkey"], batch_id="oops")  # v2
        table.restore(1, batch_id="undo")  # v3: metadata-only rollback
        v = table.version()
        # the rolled-back batch must STILL be ledger-skipped
        replay_skipped = (
            table.commit_merge(spark, bad, ["c_custkey"], batch_id="oops")
            == v
            and table.version() == v
        )
        out = (
            table.read(spark)
            .groupBy(
                F.pmod("c_custkey", F.lit(8)).cast("bigint").alias("bucket")
            )
            .agg(
                F.count("*").cast("bigint").alias("n_rows"),
                F.sum(
                    F.floor(F.col("c_acctbal") * 100 + 0.5).cast("bigint")
                ).cast("bigint").alias("sum_cents"),
            )
            .withColumn("n_versions", F.lit(v).cast("bigint"))
            .withColumn("replay_skipped", F.lit(bool(replay_skipped)))
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "q_manifest_ndv",
    # The oracle recomputes the exact distinct count and the content
    # aggregate from first principles; the Spark side builds the table
    # in THREE content commits with NDV tracking on (`ndv_cols`), so
    # each commit folds ONE O(batch) HLL pass into the persisted
    # sketch, and then reads the maintained estimate back as pure
    # metadata (ndv_estimate — zero jobs).  Both sides assert the
    # estimate lands within 10% of the exact count (HLL's default rsd
    # is 5%, so the band has margin at every fixture SF).  Sketch
    # mechanics (carry/reset rules, empty batches, upper-bound
    # semantics, suggest_bloom_bits preference) are pinned in
    # tests/test_manifest.py::TestNdvSketch.
    oracle="""
    SELECT 'c_custkey' AS col,
           CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS exact_ndv,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           TRUE AS ndv_within_10pct,
           CAST(3 AS BIGINT) AS n_content_commits
    FROM customer
    """,
)
def q_manifest_ndv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental NDV sketches: a manifest table built across three
    content commits (overwrite + two merge-on-read deltas) with
    ``ndv_cols`` tracking maintains a mergeable HLL sketch per tracked
    column — ONE O(batch) pass per commit, never a table rescan — and
    materializes the current cardinality estimate into the manifest,
    so reading it back (``ndv_estimate``) is pure metadata.

    Scale: this is the Iceberg-puffin / engine-catalog NDV story — at
    100 TB a full ANALYZE pass per maintenance window is a luxury;
    commit-time sketch folding keeps the estimate perpetually fresh
    for O(batch) cost, and ``suggest_bloom_bits`` sizes runtime bloom
    filters from it with zero jobs and zero staleness scaling.
    """
    import shutil
    import tempfile

    from pypeline_spark.sinks.manifest import ManifestTable

    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    scratch = tempfile.mkdtemp(prefix="manifest_ndv_")
    try:
        table = ManifestTable(scratch)
        table.commit_overwrite(
            c.filter(F.col("c_custkey") % 3 == 1),
            batch_id="seed",
            ndv_cols=["c_custkey"],
        )
        table.commit_delta(
            c.filter(F.col("c_custkey") % 3 == 2), ["c_custkey"], batch_id="d1"
        )
        table.commit_delta(
            c.filter(F.col("c_custkey") % 3 == 0), ["c_custkey"], batch_id="d2"
        )
        est = table.ndv_estimate("c_custkey")
        out = c.agg(
            F.count_distinct("c_custkey").cast("bigint").alias("exact_ndv"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        ).select(
            F.lit("c_custkey").alias("col"),
            "exact_ndv",
            "n_rows",
            (
                F.abs(F.lit(est) - F.col("exact_ndv"))
                <= 0.1 * F.col("exact_ndv")
            ).alias("ndv_within_10pct"),
            F.lit(3).cast("bigint").alias("n_content_commits"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "q_manifest_cdf",
    # The oracle recomputes every change-event slice AND the final
    # resolved snapshot from the same modular key slices the Spark side
    # committed: v2 typed-CDC upserts of the even keys at +100 split
    # into inserts (k%6==0 — absent from the k%3!=0 seed) and updates
    # (even, k%3!=0); v3 upserts k%4==2 at +200 (all 'update' — every
    # even key exists after v2) and tombstones k%4==1 ('delete', value
    # columns null => cents 0).  The 'resolved' row proves tombstoned
    # keys are gone and last-writer-wins held: alive = evens (+100,
    # then +200 where k%4==2) plus k%4==3 seed survivors at original
    # balance.  Feed mechanics edges (legacy 'upsert' typing, schema
    # evolution, vacuum retention, resurrect-after-delete) are pinned
    # in tests/test_manifest.py::TestTombstonesAndTypedFeed.
    oracle="""
    WITH c AS (SELECT c_custkey AS k, c_acctbal AS bal FROM customer)
    SELECT CAST(2 AS BIGINT) AS commit_version, 'insert' AS change_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(k) AS BIGINT) AS sum_keys,
           CAST(SUM(CAST(FLOOR((bal + 100) * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_cents
    FROM c WHERE k % 6 = 0
    UNION ALL
    SELECT CAST(2 AS BIGINT), 'update', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(k) AS BIGINT),
           CAST(SUM(CAST(FLOOR((bal + 100) * 100 + 0.5) AS BIGINT))
                AS BIGINT)
    FROM c WHERE k % 2 = 0 AND k % 3 <> 0
    UNION ALL
    SELECT CAST(3 AS BIGINT), 'update', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(k) AS BIGINT),
           CAST(SUM(CAST(FLOOR((bal + 200) * 100 + 0.5) AS BIGINT))
                AS BIGINT)
    FROM c WHERE k % 4 = 2
    UNION ALL
    SELECT CAST(3 AS BIGINT), 'delete', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(k) AS BIGINT), CAST(0 AS BIGINT)
    FROM c WHERE k % 4 = 1
    UNION ALL
    SELECT CAST(0 AS BIGINT), 'resolved', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(k) AS BIGINT),
           CAST(SUM(CAST(FLOOR(
               (CASE WHEN k % 4 = 2 THEN bal + 200
                     WHEN k % 2 = 0 THEN bal + 100
                     ELSE bal END) * 100 + 0.5) AS BIGINT)) AS BIGINT)
    FROM c WHERE k % 2 = 0 OR (k % 4 = 3 AND k % 3 <> 0)
    """,
)
def q_manifest_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed change-data feed (Delta CDF parity): a merge-on-read table
    takes a typed-CDC upsert commit (``cdc=True`` — one column-pruned
    existence probe attributes each row 'insert' vs 'update') and a
    mixed upsert+DELETE commit (tombstone rows), and ``changes()``
    returns every change event tagged with ``_commit_version`` and
    ``_change_type`` — reading ONLY the delta filesets those commits
    appended.  The query certifies the full event stream (per
    version×type counts, key sums, value sums) AND the resolved
    snapshot (tombstoned keys gone, last writer wins) in one output.

    Scale: deletes ride the same O(batch) blind-append path as upserts
    — no base rewrite — and the feed stays O(changed rows) per sync;
    typed attribution costs one key-column-pruned probe at commit time
    (the price Delta pays inside MERGE to emit CDC files), and
    consumers that don't need it keep the probe-free 'upsert' typing.
    """
    import shutil
    import tempfile

    from pypeline_spark.sinks.manifest import ManifestTable

    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    k = F.col("c_custkey")
    scratch = tempfile.mkdtemp(prefix="manifest_cdf_")
    try:
        table = ManifestTable(scratch)
        table.commit_overwrite(c.filter(k % 3 != 0), batch_id="seed")  # v1
        table.commit_delta(
            c.filter(k % 2 == 0).withColumn(
                "c_acctbal", F.col("c_acctbal") + 100.0
            ),
            ["c_custkey"],
            batch_id="d1",
            cdc=True,
        )  # v2
        table.commit_delta(
            c.filter(k % 4 == 2).withColumn(
                "c_acctbal", F.col("c_acctbal") + 200.0
            ),
            ["c_custkey"],
            batch_id="d2",
            deletes=c.filter(k % 4 == 1),
            cdc=True,
        )  # v3
        feed = table.changes(spark, since_version=1)
        cents = F.floor(F.col("c_acctbal") * 100 + 0.5).cast("bigint")
        agg = [
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum("c_custkey").cast("bigint").alias("sum_keys"),
            F.sum(F.coalesce(cents, F.lit(0))).cast("bigint").alias("sum_cents"),
        ]
        events = feed.groupBy(
            F.col("_commit_version").alias("commit_version"),
            F.col("_change_type").alias("change_type"),
        ).agg(*agg)
        snapshot = table.read_resolved(spark).agg(*agg).select(
            F.lit(0).cast("bigint").alias("commit_version"),
            F.lit("resolved").alias("change_type"),
            "n_rows", "sum_keys", "sum_cents",
        )
        return events.unionByName(snapshot).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "q_cdf_through_optimize",
    # The oracle recomputes every change event the feed must deliver
    # ACROSS TWO REORG COMMITS from the same modular slices the table
    # committed: v2 typed-CDC upserts of the evens at +100 (insert
    # where k%6==0 — absent from the k%3!=0 seed — else update), v3
    # OPTIMIZE (reorg: contributes NOTHING), v4 tombstones of the
    # k%4==1 keys (value columns null => cents 0), v5 compact (reorg:
    # nothing), v6 typed-CDC upserts of the k%5==0 keys at +250 —
    # typed against the v5 resolved snapshot alive set
    # ((k%3<>0 AND k%4<>1) OR k%2=0), which pins that reorgs preserved
    # the resolved row set the probe sees.  The 'resolved' row proves
    # the final table: alive = that set plus the v6-resurrected
    # k%5==0 keys, values last-writer-wins.  Feed mechanics
    # (read-through versions {2,4,6} only, content-rewrite refusal)
    # are pinned in tests/test_manifest.py::TestChangeFeed.
    oracle="""
    WITH c AS (SELECT c_custkey AS k, c_acctbal AS bal FROM customer)
    SELECT CAST(2 AS BIGINT) AS commit_version, 'insert' AS change_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(k) AS BIGINT) AS sum_keys,
           CAST(SUM(CAST(FLOOR((bal + 100) * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_cents
    FROM c WHERE k % 6 = 0
    UNION ALL
    SELECT CAST(2 AS BIGINT), 'update', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(k) AS BIGINT),
           CAST(SUM(CAST(FLOOR((bal + 100) * 100 + 0.5) AS BIGINT))
                AS BIGINT)
    FROM c WHERE k % 2 = 0 AND k % 3 <> 0
    UNION ALL
    SELECT CAST(4 AS BIGINT), 'delete', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(k) AS BIGINT), CAST(0 AS BIGINT)
    FROM c WHERE k % 4 = 1
    UNION ALL
    SELECT CAST(6 AS BIGINT), 'insert', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(k) AS BIGINT),
           CAST(SUM(CAST(FLOOR((bal + 250) * 100 + 0.5) AS BIGINT))
                AS BIGINT)
    FROM c WHERE k % 5 = 0 AND k % 2 <> 0 AND (k % 3 = 0 OR k % 4 = 1)
    UNION ALL
    SELECT CAST(6 AS BIGINT), 'update', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(k) AS BIGINT),
           CAST(SUM(CAST(FLOOR((bal + 250) * 100 + 0.5) AS BIGINT))
                AS BIGINT)
    FROM c WHERE k % 5 = 0 AND ((k % 3 <> 0 AND k % 4 <> 1) OR k % 2 = 0)
    UNION ALL
    SELECT CAST(0 AS BIGINT), 'resolved', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(k) AS BIGINT),
           CAST(SUM(CAST(FLOOR(
               (CASE WHEN k % 5 = 0 THEN bal + 250
                     WHEN k % 2 = 0 THEN bal + 100
                     ELSE bal END) * 100 + 0.5) AS BIGINT)) AS BIGINT)
    FROM c WHERE (k % 3 <> 0 AND k % 4 <> 1) OR k % 2 = 0 OR k % 5 = 0
    """,
)
def q_cdf_through_optimize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-feed continuity across data-reorganization commits (the
    r13 verdict's #1 remaining protocol trap): a merge-on-read table
    takes typed upserts, an OPTIMIZE, tombstones, a compaction, and
    post-maintenance typed upserts — and ONE ``changes()`` read spans
    the whole history, reading straight THROUGH both reorg commits
    (Delta CDF's rule: data reorganization emits no CDF rows).  The
    query certifies the exact event stream (reorgs contribute zero
    rows; the pre-reorg delta filesets stay readable from their own
    manifests) plus the final resolved snapshot, including typed-CDC
    attribution computed against a post-reorg snapshot — proof the
    reorgs preserved the resolved row set.

    Scale: maintenance is CONTINUOUS on a 100 TB table (bin-packing,
    clustering, delta folding); if every OPTIMIZE forced every
    downstream consumer to re-snapshot, the feed would be unusable —
    this is what makes cursors survive scheduled maintenance, and the
    same classification lets blind appends and ANALYZE rebase over
    concurrent maintenance instead of aborting.
    """
    import shutil
    import tempfile

    from pypeline_spark.sinks.manifest import ManifestTable

    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    k = F.col("c_custkey")
    scratch = tempfile.mkdtemp(prefix="cdf_reorg_")
    try:
        table = ManifestTable(scratch)
        table.commit_overwrite(c.filter(k % 3 != 0), batch_id="seed")  # v1
        table.commit_delta(
            c.filter(k % 2 == 0).withColumn(
                "c_acctbal", F.col("c_acctbal") + 100.0
            ),
            ["c_custkey"], batch_id="d1", cdc=True,
        )  # v2
        table.optimize(spark, target_rows=100_000, batch_id="o1")  # v3 reorg
        table.commit_delta(
            None, ["c_custkey"], batch_id="d2",
            deletes=c.filter(k % 4 == 1),
        )  # v4
        table.compact(spark, batch_id="c1")  # v5 reorg
        table.commit_delta(
            c.filter(k % 5 == 0).withColumn(
                "c_acctbal", F.col("c_acctbal") + 250.0
            ),
            ["c_custkey"], batch_id="d3", cdc=True,
        )  # v6
        feed = table.changes(spark, since_version=1)
        cents = F.floor(F.col("c_acctbal") * 100 + 0.5).cast("bigint")
        agg = [
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum("c_custkey").cast("bigint").alias("sum_keys"),
            F.sum(F.coalesce(cents, F.lit(0))).cast("bigint").alias("sum_cents"),
        ]
        events = feed.groupBy(
            F.col("_commit_version").alias("commit_version"),
            F.col("_change_type").alias("change_type"),
        ).agg(*agg)
        snapshot = table.read_resolved(spark).agg(*agg).select(
            F.lit(0).cast("bigint").alias("commit_version"),
            F.lit("resolved").alias("change_type"),
            "n_rows", "sum_keys", "sum_cents",
        )
        return events.unionByName(snapshot).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "q_cdf_schema_evolve",
    # The oracle recomputes the full change stream ACROSS A METADATA-
    # ONLY SCHEMA EVOLUTION from the same modular slices: v2 typed-CDC
    # upserts of the evens at +100 (insert where k%6==0, else update)
    # — committed BEFORE the 'tier' column existed, so their feed rows
    # null-fill it (n_tier = 0); v3 evolve_schema (contributes
    # nothing); v4 typed-CDC upserts of the k%7==0 keys at +30
    # carrying tier — typed against the v3 snapshot alive set
    # (k%3<>0 OR k%2=0), n_tier = every row.  The 'resolved' row pins
    # the final table under the evolved schema: alive = that set plus
    # the v4-inserted k%7==0 keys, tier non-null exactly on k%7==0,
    # values last-writer-wins.  Guard rails (additive-only, untracked
    # refusal, zero data writes, OCC rebase) are pinned in
    # tests/test_manifest.py::TestEvolveSchemaCommit.
    oracle="""
    WITH c AS (SELECT c_custkey AS k, c_acctbal AS bal FROM customer)
    SELECT CAST(2 AS BIGINT) AS commit_version, 'insert' AS change_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(k) AS BIGINT) AS sum_keys,
           CAST(SUM(CAST(FLOOR((bal + 100) * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_cents,
           CAST(0 AS BIGINT) AS n_tier
    FROM c WHERE k % 6 = 0
    UNION ALL
    SELECT CAST(2 AS BIGINT), 'update', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(k) AS BIGINT),
           CAST(SUM(CAST(FLOOR((bal + 100) * 100 + 0.5) AS BIGINT))
                AS BIGINT),
           CAST(0 AS BIGINT)
    FROM c WHERE k % 2 = 0 AND k % 3 <> 0
    UNION ALL
    SELECT CAST(4 AS BIGINT), 'insert', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(k) AS BIGINT),
           CAST(SUM(CAST(FLOOR((bal + 30) * 100 + 0.5) AS BIGINT))
                AS BIGINT),
           CAST(COUNT(*) AS BIGINT)
    FROM c WHERE k % 7 = 0 AND k % 2 <> 0 AND k % 3 = 0
    UNION ALL
    SELECT CAST(4 AS BIGINT), 'update', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(k) AS BIGINT),
           CAST(SUM(CAST(FLOOR((bal + 30) * 100 + 0.5) AS BIGINT))
                AS BIGINT),
           CAST(COUNT(*) AS BIGINT)
    FROM c WHERE k % 7 = 0 AND (k % 3 <> 0 OR k % 2 = 0)
    UNION ALL
    SELECT CAST(0 AS BIGINT), 'resolved', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(k) AS BIGINT),
           CAST(SUM(CAST(FLOOR(
               (CASE WHEN k % 7 = 0 THEN bal + 30
                     WHEN k % 2 = 0 THEN bal + 100
                     ELSE bal END) * 100 + 0.5) AS BIGINT)) AS BIGINT),
           CAST(SUM(CASE WHEN k % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT)
    FROM c WHERE k % 3 <> 0 OR k % 2 = 0 OR k % 7 = 0
    """,
)
def q_cdf_schema_evolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change feed × schema evolution: ``evolve_schema`` widens the
    tracked table schema by METADATA ONLY (the lakehouse ALTER TABLE
    ADD COLUMN — zero data rewrites on a 100 TB table), and one
    ``changes()`` read spanning the evolution emits every row under
    the EVOLVED superset schema — pre-evolution rows null-fill the
    new column, the evolution commit itself contributes nothing, and
    the output column set is the table's (deterministic), never an
    artifact of which delta files were in range.  The query certifies
    the typed event stream on both sides of the evolution plus the
    resolved snapshot under the evolved schema.

    Scale: schema changes and change-data consumers coexist on a live
    table — a feed that raised (or emitted range-dependent schemas)
    across an ALTER TABLE would force every downstream replica to
    re-snapshot on every column addition.
    """
    import shutil
    import tempfile

    from pypeline_spark.sinks.manifest import ManifestTable

    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    k = F.col("c_custkey")
    scratch = tempfile.mkdtemp(prefix="cdf_evolve_")
    try:
        table = ManifestTable(scratch)
        table.commit_overwrite(c.filter(k % 3 != 0), batch_id="seed")  # v1
        table.commit_delta(
            c.filter(k % 2 == 0).withColumn(
                "c_acctbal", F.col("c_acctbal") + 100.0
            ),
            ["c_custkey"], batch_id="d1", cdc=True,
        )  # v2: pre-evolution typed upserts
        table.evolve_schema("tier string", batch_id="e1")  # v3: metadata
        table.commit_delta(
            c.filter(k % 7 == 0)
            .withColumn("c_acctbal", F.col("c_acctbal") + 30.0)
            .withColumn(
                "tier",
                F.when(k % 2 == 0, F.lit("gold")).otherwise(F.lit("silver")),
            ),
            ["c_custkey"], batch_id="d2", cdc=True,
        )  # v4: post-evolution typed upserts carrying the new column
        feed = table.changes(spark, since_version=1)
        cents = F.floor(F.col("c_acctbal") * 100 + 0.5).cast("bigint")
        agg = [
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum("c_custkey").cast("bigint").alias("sum_keys"),
            F.sum(F.coalesce(cents, F.lit(0))).cast("bigint").alias("sum_cents"),
            F.count("tier").cast("bigint").alias("n_tier"),
        ]
        events = feed.groupBy(
            F.col("_commit_version").alias("commit_version"),
            F.col("_change_type").alias("change_type"),
        ).agg(*agg)
        snapshot = table.read_resolved(spark).agg(*agg).select(
            F.lit(0).cast("bigint").alias("commit_version"),
            F.lit("resolved").alias("change_type"),
            "n_rows", "sum_keys", "sum_cents", "n_tier",
        )
        return events.unionByName(snapshot).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "q_column_mapping",
    # The oracle recomputes the final table from first principles over
    # the same modular slices, under the RENAMED/RE-ADDED logical
    # schema: balance (née c_acctbal — renamed at v3, a metadata-only
    # commit) = bal+7 where k%7==0 (v7, last writer), else bal+100 for
    # evens (v4, committed under the NEW logical name but written
    # physically as the original), else seed bal.  c_mktsegment was
    # DROPPED at v5 and RE-ADDED at v6 with a fresh column id, so the
    # original segment bytes are unreachable — n_seg counts exactly
    # the k%7==0 rows whose v7 upsert wrote the new incarnation.
    # stats_alive pins that the per-file [min,max] stats (keyed by
    # physical name) still prune under the renamed logical name.
    # The full battery (physical file names, key-column renames,
    # guard rails) is tests/test_manifest.py::TestColumnMapping.
    oracle="""
    WITH c AS (SELECT c_custkey AS k, c_acctbal AS bal FROM customer)
    SELECT CAST(k % 4 AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(FLOOR((CASE WHEN k % 7 = 0 THEN bal + 7
                                     WHEN k % 2 = 0 THEN bal + 100
                                     ELSE bal END) * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_cents,
           CAST(SUM(CASE WHEN k % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_seg,
           CAST(3 AS BIGINT) AS n_cols,
           TRUE AS stats_alive
    FROM c GROUP BY bucket
    """,
)
def q_column_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column mapping: rename and drop/re-add evolution with ZERO data
    rewrites (the Delta columnMapping.mode='name' / Iceberg field-id
    design).  Every tracked column carries an immutable id + physical
    name; a RENAME changes only the logical name (per-file stats and
    bloom indexes, keyed by physical name, keep pruning), a DROP
    retires the (id, physical) pair, and RE-ADDING the same logical
    name mints a fresh id so the dropped bytes can never resurrect.
    Writers translate logical→physical at the file boundary, readers
    map back.  The query drives rename → upsert-under-new-name →
    drop → re-add → upsert across copy-on-write AND merge-on-read
    commits and certifies the final resolved content plus live
    pruning on the renamed column.

    Scale: renaming or dropping a column on a 100 TB table must cost
    one manifest write, not a full-table rewrite — and the indexes
    must survive, or every rename silently degrades scans from
    file-skipping to full enumeration.
    """
    import shutil
    import tempfile

    from pypeline_spark.sinks.manifest import ManifestTable

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    k = F.col("c_custkey")
    scratch = tempfile.mkdtemp(prefix="colmap_")
    try:
        table = ManifestTable(scratch)
        table.commit_overwrite(
            c.repartitionByRange(8, "c_acctbal"),
            batch_id="seed",
            stats_cols=["c_custkey", "c_acctbal"],
        )  # v1
        table.enable_column_mapping(batch_id="cm")  # v2
        table.rename_column("c_acctbal", "balance", batch_id="rn")  # v3
        # stats recorded pre-rename still prune under the new name
        kept, total = table.prune_plan("balance", lo=-1000.0, hi=0.0)
        stats_alive = total == 8 and len(kept) < total
        table.commit_delta(
            c.filter(k % 2 == 0).select(
                "c_custkey",
                (F.col("c_acctbal") + 100.0).alias("balance"),
                "c_mktsegment",
            ),
            ["c_custkey"], batch_id="d1",
        )  # v4: upsert under the NEW logical name
        table.drop_column("c_mktsegment", batch_id="dr")  # v5
        table.evolve_schema("c_mktsegment string", batch_id="re")  # v6
        table.commit_delta(
            c.filter(k % 7 == 0).select(
                "c_custkey",
                (F.col("c_acctbal") + 7.0).alias("balance"),
                F.lit("NEW").alias("c_mktsegment"),
            ),
            ["c_custkey"], batch_id="d2",
        )  # v7: writes the re-added incarnation
        got = table.read_resolved(spark)
        out = (
            got.groupBy(
                F.pmod("c_custkey", F.lit(4)).cast("bigint").alias("bucket")
            )
            .agg(
                F.count("*").cast("bigint").alias("n_rows"),
                F.sum(
                    F.floor(F.col("balance") * 100 + 0.5).cast("bigint")
                ).cast("bigint").alias("sum_cents"),
                F.count("c_mktsegment").cast("bigint").alias("n_seg"),
            )
            .withColumn("n_cols", F.lit(len(got.columns)).cast("bigint"))
            .withColumn("stats_alive", F.lit(bool(stats_alive)))
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


class FeedRollupMaintainer:
    """Feed-driven incremental view maintenance: keeps a standing
    group-grain rollup of a
    :class:`~pypeline_spark.sinks.manifest.ManifestTable` synchronized
    from its change feed — the consumer story ``changes()`` exists
    for.  The aggregate spec defaults to the original
    (``n_rows`` count, ``sum_cents``) pair; pass ``aggs=[(fn, col,
    alias), ...]`` with fn in count/sum/min/max/avg/sum_cents for a
    multi-aggregate view (r15 directive 6) — min/max/avg are exact
    here even though they are not delta-mergeable, because every sync
    RESCANS affected groups from the snapshot instead of merging
    deltas into standing values.

    ``q_ivm_rollup`` maintains an APPEND-ONLY aggregate by pure delta
    merge; updates and deletes can't be merged that way (a SUM can't
    be decremented without the preimage), so each ``sync`` does the
    standard partial recompute instead:

    1. read the feed since the cursor — O(changed rows);
    2. affected groups = groups named by the feed's upsert rows UNION
       the PREIMAGE groups of every changed key (a key semi-join
       against the cursor-version snapshot — catches group moves and
       deletes, whose tombstones carry no group value).  Group sets
       are tiny and broadcast;
    3. recompute ONLY the affected groups from the current snapshot
       and splice them over the standing rollup (groups that emptied
       drop out).

    Maintenance commits (compact / OPTIMIZE / clustering evolution)
    are reorg-tagged and the feed reads straight THROUGH them (r14) —
    a scheduled compaction costs this maintainer nothing.  Predicate
    DML commits carry their own typed CDC and RESTOREs synthesize
    their events from the rolled-away range (r15), so both stay pure
    feed too.  Only a genuinely underivable CONTENT rewrite inside
    the range (overwrite / copy-on-write merge, or a restore across
    one) makes ``changes()`` refuse — the maintainer then falls back
    to one snapshot recompute (``full_refreshes`` counts them).

    Scale: per sync this reads the feed (O(changed rows)), probes
    preimages (key semi-join, prunable by manifest key stats/blooms),
    and rescans only affected groups' rows — on a table clustered by
    the group column that scan file-prunes to the touched groups.  The
    standing rollup itself is group-cardinality small.  Requires the
    cursor version to remain un-vacuumed between syncs (or swap the
    preimage probe for a maintained key→group replica).
    """

    #: supported aggregate functions for a multi-agg spec.  min/max
    #: (and avg) are NOT delta-mergeable, but this maintainer never
    #: merges deltas into standing values — it RESCANS every affected
    #: group from the snapshot and splices, so any per-group aggregate
    #: is exact by construction (the r15 directive-6 generalization).
    _AGG_FNS = ("count", "sum", "min", "max", "avg", "sum_cents")

    def __init__(
        self,
        table,
        key_cols,
        group_col: str,
        value_col: Optional[str] = None,
        aggs: Optional[Sequence[tuple]] = None,
    ):
        self.table = table
        self.keys = list(key_cols)
        self.group = group_col
        self.value = value_col
        if aggs is None:
            if value_col is None:
                raise ValueError("pass value_col or an aggs spec")
            # the original two-aggregate shape, unchanged
            aggs = [
                ("count", None, "n_rows"),
                ("sum_cents", value_col, "sum_cents"),
            ]
        self.aggs = [tuple(a) for a in aggs]
        seen: set = set()
        for fn, col, alias in self.aggs:
            if fn not in self._AGG_FNS:
                raise ValueError(
                    f"unsupported aggregate {fn!r} (one of {self._AGG_FNS})"
                )
            if fn != "count" and col is None:
                raise ValueError(f"aggregate {fn!r} needs a column")
            if alias in seen or alias == group_col:
                raise ValueError(f"duplicate/colliding alias {alias!r}")
            seen.add(alias)
        self.cursor = 0
        self.rollup: DataFrame | None = None
        self.full_refreshes = 0
        self.syncs = 0

    def _agg_exprs(self) -> list:
        out = []
        for fn, col, alias in self.aggs:
            if fn == "count":
                e = F.count("*").cast("bigint")
            elif fn == "sum_cents":
                # integer-cents sum (hash-stable across engines)
                e = F.sum(
                    F.floor(F.col(col) * 100 + 0.5).cast("bigint")
                ).cast("bigint")
            elif fn == "sum":
                e = F.sum(col)
            elif fn == "min":
                e = F.min(col)
            elif fn == "max":
                e = F.max(col)
            else:  # avg
                e = F.avg(col)
            out.append(e.alias(alias))
        return out

    def _recompute_at(self, spark: SparkSession, version: int) -> DataFrame:
        """Full rollup recompute pinned to ``version`` (pinning keeps
        concurrent commits from smearing past the cursor)."""
        cur = self.table.read_resolved(spark, version=version)
        if cur is None:
            raise ValueError("nothing to maintain: table has no data")
        return cur.groupBy(self.group).agg(*self._agg_exprs())

    def sync(self, spark: SparkSession) -> DataFrame:
        """Advance the rollup to the table tip; returns the rollup."""
        self.syncs += 1
        tip = self.table.version()
        if self.rollup is None:
            self.rollup = self._recompute_at(spark, tip).localCheckpoint(
                eager=True
            )
            self.cursor = tip
            return self.rollup
        if tip == self.cursor:
            return self.rollup
        try:
            feed = self.table.changes(
                spark, self.cursor, until_version=tip
            )
        except ValueError:
            # CONTENT-rewriting commit in range (overwrite / CoW merge
            # / restore): row-level changes are underivable — fall back
            # to one snapshot recompute.  Reorg commits (compact /
            # OPTIMIZE / clustering) no longer land here: the feed
            # reads straight through them (r14), so scheduled
            # maintenance never costs consumers a refresh.
            self.full_refreshes += 1
            self.rollup = self._recompute_at(spark, tip).localCheckpoint(
                eager=True
            )
            self.cursor = tip
            return self.rollup
        if feed is None:
            # empty range over an empty table (nothing ever committed
            # content): nothing to splice
            self.cursor = tip
            return self.rollup
        parts = []
        if self.group in feed.columns:
            # a delete-only range carries no group column at all
            # (tombstones are key columns + marker); upsert rows
            # always do
            parts.append(
                feed.filter(F.col("_change_type") != "delete")
                .select(self.group)
                .distinct()
            )
        prev = self.table.read_resolved(spark, version=self.cursor)
        if prev is not None:
            changed_keys = feed.select(*self.keys).distinct()
            parts.append(
                prev.join(changed_keys, self.keys, "left_semi")
                .select(self.group)
                .distinct()
            )
        if not parts:
            self.cursor = tip
            return self.rollup
        affected = parts[0]
        for p in parts[1:]:
            affected = affected.unionByName(p)
        affected = affected.distinct()
        # pinned to the SAME tip the feed range ended at: an unpinned
        # read here would smear a commit landing mid-sync past the
        # cursor — its rows spliced in now AND replayed by the next
        # sync (ADVICE r13)
        cur = self.table.read_resolved(spark, version=tip)
        kept = self.rollup.join(
            F.broadcast(affected), [self.group], "left_anti"
        )
        if cur is None:
            # every key tombstoned: the affected groups simply drop out
            self.rollup = kept.localCheckpoint(eager=True)
            self.cursor = tip
            return self.rollup
        recomputed = (
            cur.join(F.broadcast(affected), [self.group], "left_semi")
            .groupBy(self.group)
            .agg(*self._agg_exprs())
        )
        self.rollup = kept.unionByName(recomputed).localCheckpoint(
            eager=True
        )
        self.cursor = tip
        return self.rollup


class DurableRollupMaintainer(FeedRollupMaintainer):
    """:class:`FeedRollupMaintainer` with DURABLE state: the standing
    rollup is itself a :class:`~pypeline_spark.sinks.manifest.
    ManifestTable` (the materialized view's storage), and the feed
    cursor is persisted in that table's manifest ``properties`` —
    committed ATOMICALLY with the rollup content it describes, so a
    process restart resumes exactly-once:

    - every successful ``sync`` publishes the new rollup via
      ``commit_overwrite(batch_id=f"sync@{tip}",
      properties={"mv_cursor": tip})`` — content and cursor land in
      ONE atomic manifest publish;
    - a crash BEFORE the publish leaves the old (rollup, cursor) pair
      intact: the restarted maintainer re-reads the same feed range
      and recomputes the same splice (syncs are deterministic given a
      cursor and a tip) — re-applying is rebuilding, not
      double-counting, because the splice REPLACES affected groups
      rather than incrementing them;
    - a crash AFTER the publish is detected by the batch-id ledger:
      the replayed ``sync@tip`` commit is a no-op.

    ``run_streaming`` wires the maintainer as a consumer of the
    ``manifest_changes`` stream (foreachBatch): the stream is the
    exactly-once NOTIFICATION channel (restart-safe offsets), while
    the maintainer's own persisted cursor governs state updates — so
    even a replayed micro-batch cannot double-apply.  This is the
    standing-materialized-view-over-a-live-table composition the
    change feed and the streaming source exist for.

    Scale: identical per-sync cost shape to the in-memory maintainer
    (O(changed rows) feed + affected-group rescan) plus one
    group-cardinality-sized overwrite of the MV table — the durable
    artifact any downstream query reads without recomputation.
    """

    _CURSOR = "mv_cursor"

    def __init__(
        self,
        table,
        mv_root: str,
        key_cols,
        group_col: str,
        value_col: Optional[str] = None,
        aggs: Optional[Sequence[tuple]] = None,
    ):
        from pypeline_spark.sinks.manifest import ManifestTable

        super().__init__(table, key_cols, group_col, value_col, aggs=aggs)
        self.mv = ManifestTable(mv_root)
        props = self.mv.table_properties()
        self.cursor = int(props.get(self._CURSOR, 0))
        self.full_refreshes = int(props.get("mv_full_refreshes", 0))

    def sync(self, spark: SparkSession) -> DataFrame:
        if self.rollup is None and self.cursor > 0:
            # restart: rehydrate the standing rollup from the MV table
            self.rollup = self.mv.read(spark)
        out = super().sync(spark)
        # persist rollup + cursor atomically; a replayed sync at the
        # same tip is deduplicated by the ledger
        self.mv.commit_overwrite(
            out,
            batch_id=f"sync@{self.cursor}",
            properties={
                self._CURSOR: self.cursor,
                "mv_full_refreshes": self.full_refreshes,
            },
        )
        return out

    def run_streaming(self, spark: SparkSession, checkpoint: str):
        """Follow the source table live: one ``manifest_changes``
        micro-batch per commit group triggers one ``sync``.  Returns
        the StreamingQuery (caller awaits/stops).  The batch DataFrame
        itself is only the trigger — ``sync`` reads the feed under its
        own persisted cursor, which is what makes a replayed batch
        harmless.

        The stream subscribes with ``on_rewrite='skip'`` (ADVICE r14):
        a CONTENT rewrite on the source (overwrite / CoW merge /
        restore) would otherwise kill the query at offset planning,
        even though ``sync`` itself handles exactly that case via its
        snapshot-recompute fallback.  Skipping is sound precisely
        because the rows are never consumed — the rewrite commit still
        fires a (row-less) trigger, ``sync`` sees the rewrite in ITS
        OWN feed read under the persisted cursor, falls back to one
        pinned recompute (``full_refreshes`` counts it), and the
        maintainer keeps following the table instead of silently
        stopping."""
        from pypeline_spark.sources.manifest_stream import register

        register(spark)
        since = max(1, self.cursor)
        return (
            spark.readStream.format("manifest_changes")
            .option("path", self.table.root)
            .option("since_version", str(since))
            .option("on_rewrite", "skip")
            .load()
            .writeStream.foreachBatch(lambda _df, _id: self.sync(spark))
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )


@query(
    "q_ivm_durable",
    # The oracle recomputes the FINAL persisted materialized view from
    # first principles over the same modular slices, which the Spark
    # side maintained across a PROCESS RESTART: alive keys = evens (v2
    # upserts at +100) plus k%4==3 keys seeded (k%3<>0) or v4-upserted
    # (k%8==3, at +300); k%4==1 keys tombstoned at v3.  resumed_at = 2
    # pins that the restarted maintainer picked up the cursor the
    # FIRST instance persisted (v2) — not 0 (it did not re-init) and
    # not the tip (it had real catch-up to do); mv_versions = 3 pins
    # one atomic (rollup, cursor) publish per effective sync with no
    # duplicate commits; full_refreshes = 0 pins that the catch-up ran
    # from the feed alone.  The hash match proves restart-resumed
    # incremental maintenance == from-scratch recompute.
    oracle="""
    WITH c AS (SELECT c_custkey AS k, c_mktsegment AS seg, c_acctbal AS bal
               FROM customer),
    alive AS (
        SELECT seg AS g,
               CASE WHEN k % 8 = 3 THEN bal + 300
                    WHEN k % 2 = 0 THEN bal + 100
                    ELSE bal END AS v
        FROM c
        WHERE k % 2 = 0 OR (k % 4 = 3 AND (k % 3 <> 0 OR k % 8 = 3))
    )
    SELECT g AS c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(FLOOR(v * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS sum_cents,
           CAST(2 AS BIGINT) AS resumed_at,
           CAST(3 AS BIGINT) AS mv_versions,
           CAST(0 AS BIGINT) AS full_refreshes
    FROM alive GROUP BY g
    """,
)
def q_ivm_durable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durable incremental view maintenance: the standing rollup is
    itself a ManifestTable and the feed cursor is committed
    ATOMICALLY with the rollup content (manifest ``properties``), so
    a maintainer process can die and a fresh one resumes exactly-once
    — no double-apply, no gap.  The query drives seed → typed upserts
    → sync → RESTART (a brand-new maintainer instance rehydrates
    cursor + rollup from the MV table) → deletes → upserts → sync,
    and certifies the persisted MV content equals a from-scratch
    recompute, plus the resume point and the commit cadence.

    Scale: a 100 TB standing aggregate must survive maintainer
    restarts without re-scanning the source — state checkpointing
    rides the same atomic manifest publish as the data (the Delta
    txnAppId/txnVersion pattern), and the catch-up sync reads only
    the feed rows committed while the maintainer was down.
    """
    import shutil
    import tempfile

    from pypeline_spark.sinks.manifest import ManifestTable

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    k = F.col("c_custkey")
    scratch = tempfile.mkdtemp(prefix="ivm_durable_")
    try:
        table = ManifestTable(os.path.join(scratch, "src"))
        mv_root = os.path.join(scratch, "mv")
        args = (table, mv_root, ["c_custkey"], "c_mktsegment", "c_acctbal")
        table.commit_overwrite(c.filter(k % 3 != 0), batch_id="seed")  # v1
        m1 = DurableRollupMaintainer(*args)
        m1.sync(spark)  # init at v1 -> mv v1
        table.commit_delta(
            c.filter(k % 2 == 0).withColumn(
                "c_acctbal", F.col("c_acctbal") + 100.0
            ),
            ["c_custkey"], batch_id="d1", cdc=True,
        )  # v2
        m1.sync(spark)  # -> mv v2, cursor 2
        # RESTART: a brand-new instance rehydrates from the MV table
        m2 = DurableRollupMaintainer(*args)
        resumed_at = m2.cursor
        table.commit_delta(
            None, ["c_custkey"], batch_id="d2",
            deletes=c.filter(k % 4 == 1),
        )  # v3
        table.commit_delta(
            c.filter(k % 8 == 3).withColumn(
                "c_acctbal", F.col("c_acctbal") + 300.0
            ),
            ["c_custkey"], batch_id="d3",
        )  # v4
        m2.sync(spark)  # catch-up splice of v3+v4 -> mv v3, cursor 4
        out = (
            m2.mv.read(spark)  # the PERSISTED artifact, not the handle
            .withColumn("resumed_at", F.lit(resumed_at).cast("bigint"))
            .withColumn(
                "mv_versions", F.lit(m2.mv.version()).cast("bigint")
            )
            .withColumn(
                "full_refreshes",
                F.lit(m2.full_refreshes).cast("bigint"),
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "q_ivm_cdc",
    # The oracle recomputes the FINAL rollup from first principles over
    # the same modular slices the Spark side committed and maintained
    # INCREMENTALLY: alive keys = evens (v2 upserts; k%10==0 moved to
    # segment MACHINERY) plus k%4==3 keys that were seeded (k%3<>0) or
    # v5-upserted (k%8==3); k%4==1 keys are tombstoned.  Values: +141
    # where k%10==4 (the v7 copy-on-write merge, last writer — it also
    # reverts those keys' segment to the source value, a no-op since
    # k%10==4 keys never moved), else +300 where k%8==3 (v5), else
    # +100 for evens (v2), else seed balance.  full_refreshes = 1 pins
    # that the syncs crossing the v4 compact() and v6 compact() REORG
    # boundaries stayed INCREMENTAL (the r14 feed-through-reorg
    # contract: scheduled maintenance costs consumers nothing) and
    # exactly ONE sync — the one crossing the v7 CONTENT rewrite —
    # fell back to a snapshot recompute; n_syncs = 6 pins the sync
    # cadence.  The hash match IS the incremental == recompute
    # equivalence proof across update, group-move, delete, two
    # compactions and a copy-on-write merge.
    oracle="""
    WITH c AS (SELECT c_custkey AS k, c_mktsegment AS seg, c_acctbal AS bal
               FROM customer),
    alive AS (
        SELECT CASE WHEN k % 10 = 0 THEN 'MACHINERY' ELSE seg END AS g,
               CASE WHEN k % 10 = 4 THEN bal + 141
                    WHEN k % 8 = 3 THEN bal + 300
                    WHEN k % 2 = 0 THEN bal + 100
                    ELSE bal END AS v
        FROM c
        WHERE k % 2 = 0 OR (k % 4 = 3 AND (k % 3 <> 0 OR k % 8 = 3))
    )
    SELECT g AS c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(FLOOR(v * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS sum_cents,
           CAST(1 AS BIGINT) AS full_refreshes,
           CAST(6 AS BIGINT) AS n_syncs
    FROM alive GROUP BY g
    """,
)
def q_ivm_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-feed-driven IVM: a standing per-segment rollup follows a
    merge-on-read table through typed upserts (some keys MOVING
    between groups), deletes, TWO compactions, and a copy-on-write
    merge — maintained from ``changes()`` cursors by partial recompute
    of affected groups only.  The syncs crossing the compactions stay
    INCREMENTAL (reorg commits are feed-transparent, r14); only the
    sync crossing the CoW merge — a genuine content rewrite — falls
    back to a snapshot recompute.  The final rollup is hash-proven
    equal to a from-scratch recompute (the DuckDB oracle).

    Scale: this is how a 100 TB continuous aggregate actually stays
    fresh — per sync the maintainer reads O(changed rows) of feed,
    probes preimage groups via a key semi-join (manifest-stat/bloom
    prunable), and rescans only the affected groups' rows, never the
    table; scheduled compaction no longer interrupts consumers, and
    only content rewrites (rare, operator-driven) cost a refresh.
    """
    import shutil
    import tempfile

    from pypeline_spark.sinks.manifest import ManifestTable

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    k = F.col("c_custkey")
    scratch = tempfile.mkdtemp(prefix="ivm_cdc_")
    try:
        table = ManifestTable(scratch)
        table.commit_overwrite(c.filter(k % 3 != 0), batch_id="seed")  # v1
        m = FeedRollupMaintainer(
            table, ["c_custkey"], "c_mktsegment", "c_acctbal"
        )
        m.sync(spark)  # initializes at v1
        # v2: upserts — every even key at +100, k%10==0 MOVES segment
        u2 = c.filter(k % 2 == 0).select(
            "c_custkey",
            F.when(k % 10 == 0, F.lit("MACHINERY"))
            .otherwise(F.col("c_mktsegment"))
            .alias("c_mktsegment"),
            (F.col("c_acctbal") + 100.0).alias("c_acctbal"),
        )
        table.commit_delta(u2, ["c_custkey"], batch_id="d1", cdc=True)
        m.sync(spark)  # incremental: updates + inserts + group moves
        # v3: tombstone the k%4==1 keys
        table.commit_delta(
            None, ["c_custkey"], batch_id="d2", deletes=c.filter(k % 4 == 1)
        )
        m.sync(spark)  # incremental: deletes via preimage groups
        table.compact(spark, batch_id="c1")  # v4: reorg boundary
        m.sync(spark)  # stays incremental: the feed reads THROUGH it
        # v5: post-compaction upsert at +300 (k%8==3: odd, some absent)
        u5 = c.filter(k % 8 == 3).withColumn(
            "c_acctbal", F.col("c_acctbal") + 300.0
        )
        table.commit_delta(u5, ["c_custkey"], batch_id="d3")
        m.sync(spark)  # incremental
        table.compact(spark, batch_id="c2")  # v6: fold d3 (reorg)
        # v7: copy-on-write merge — a CONTENT rewrite (+141 on the
        # k%10==4 keys, whole rows from source)
        u7 = c.filter(k % 10 == 4).select(
            "c_custkey",
            "c_mktsegment",
            (F.col("c_acctbal") + 141.0).alias("c_acctbal"),
        )
        table.commit_merge(spark, u7, ["c_custkey"], batch_id="m1")
        out = (
            m.sync(spark)  # falls back to ONE snapshot recompute
            .withColumn(
                "full_refreshes", F.lit(m.full_refreshes).cast("bigint")
            )
            .withColumn("n_syncs", F.lit(m.syncs).cast("bigint"))
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "q_manifest_concurrent",
    # The oracle recomputes the post-race table from first principles:
    # BOTH writers' upserts applied (k%3==0 at +100, k%3==2 at +200,
    # the k%3==1 seed untouched) across every customer key.  Writer B
    # commits INSIDE writer A's read-modify-write window (deterministic
    # race injection), so with the pre-OCC os.replace publish A would
    # have silently CLOBBERED B — ledger missing 'race-b', B's rows
    # gone.  The hash match plus the pinned bookkeeping (3 versions, 2
    # delta commits, both batch ids applied) proves the put-if-absent
    # publish detected the conflict and A REBASED onto B's tip.  The
    # full conflict matrix (aborts over rewrites, duplicate-batch
    # no-op, threaded contention) is pinned in
    # tests/test_manifest.py::TestOptimisticConcurrency.
    oracle="""
    SELECT CAST(c_custkey % 8 AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(FLOOR(
               (CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 100
                     WHEN c_custkey % 3 = 2 THEN c_acctbal + 200
                     ELSE c_acctbal END) * 100 + 0.5) AS BIGINT))
               AS BIGINT) AS sum_cents,
           CAST(3 AS BIGINT) AS n_versions,
           CAST(2 AS BIGINT) AS n_deltas,
           TRUE AS both_applied
    FROM customer GROUP BY bucket
    """,
)
def q_manifest_concurrent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimistic concurrency on the manifest commit protocol: two
    writers race the same version slot — writer B's delta commit lands
    inside writer A's read-modify-write window — and the put-if-absent
    publish DETECTS the lost update instead of clobbering it: A gets
    CommitConflict, verifies the intervening commit is rebase-safe
    (delta-on-delta, same keys), and republishes against the new tip.
    The query certifies the outcome: both ledger entries, both
    writers' rows, dense versions.

    Scale: this is the two-writer test a lakehouse commit protocol is
    defined by (Delta/Iceberg conflict detection) — at 100 TB the
    publish is a conditional PUT on the object store and the rebase
    re-points O(1) manifest metadata; neither writer re-reads or
    rewrites data files.
    """
    import shutil
    import tempfile

    from pypeline_spark.sinks.manifest import ManifestTable

    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    k = F.col("c_custkey")
    scratch = tempfile.mkdtemp(prefix="manifest_occ_")
    try:
        a, b = ManifestTable(scratch), ManifestTable(scratch)
        a.commit_overwrite(c.filter(k % 3 == 1), batch_id="seed")  # v1
        ub = c.filter(k % 3 == 2).withColumn(
            "c_acctbal", F.col("c_acctbal") + 200.0
        )
        ua = c.filter(k % 3 == 0).withColumn(
            "c_acctbal", F.col("c_acctbal") + 100.0
        )
        # deterministic race: B commits between A's manifest read and
        # A's publish attempt
        a._race_once = lambda: b.commit_delta(
            ub, ["c_custkey"], batch_id="race-b"
        )
        v = a.commit_delta(ua, ["c_custkey"], batch_id="race-a")  # rebases
        m = a._read_manifest()
        both = (
            {"race-a", "race-b"} <= set(m["batch_ids"])
            and v == 3
            and len(m.get("deltas", [])) == 2
        )
        out = (
            a.read_resolved(spark)
            .groupBy(F.pmod("c_custkey", F.lit(8)).cast("bigint").alias("bucket"))
            .agg(
                F.count("*").cast("bigint").alias("n_rows"),
                F.sum(
                    F.floor(F.col("c_acctbal") * 100 + 0.5).cast("bigint")
                ).cast("bigint").alias("sum_cents"),
            )
            .withColumn("n_versions", F.lit(v).cast("bigint"))
            .withColumn("n_deltas", F.lit(len(m.get("deltas", []))).cast("bigint"))
            .withColumn("both_applied", F.lit(bool(both)))
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "q_table_evolve",
    # The oracle recomputes the fully-evolved table from first
    # principles over the same deterministic slices: v2 is a PRUNED
    # copy-on-write merge upserting keys <= 30 at +100 and ADDING the
    # 'tier' column (carried files never see it — the tracked table
    # schema null-fills them at read), v3 is a merge-on-read delta
    # upserting the k%9==2 keys at +7 and ADDING 'bonus' (whole-row
    # upserts, so those keys' tier reads NULL).  n_tier/n_bonus pin
    # the null-fill boundaries exactly; n_cols pins the widened
    # 4-column read schema.  Guard rails (type-change rejection,
    # missing-column rejection, overwrite reset, restore carry,
    # untracked-legacy refusal, optimize over the mixed base) are
    # pinned in tests/test_manifest.py::TestSchemaEvolution.
    oracle="""
    WITH c AS (SELECT c_custkey AS k, c_acctbal AS bal FROM customer)
    SELECT CAST(k % 4 AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(FLOOR((CASE WHEN k % 9 = 2 THEN bal + 7
                                     WHEN k <= 30 THEN bal + 100
                                     ELSE bal END) * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_cents,
           CAST(SUM(CASE WHEN k <= 30 AND k % 9 <> 2 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_tier,
           CAST(SUM(CASE WHEN k % 9 = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_bonus,
           CAST(4 AS BIGINT) AS n_cols
    FROM c GROUP BY bucket
    """,
)
def q_table_evolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-level additive schema evolution (the Delta/Iceberg
    mergeSchema story): the manifest tracks the table schema, a pruned
    copy-on-write merge ADDS a column while carrying non-overlapping
    files verbatim (they null-fill the new column at read — a
    heterogeneous base stays well-defined), and a later merge-on-read
    delta ADDS another column that resolution surfaces across base
    rows.  The query reads the fully-evolved table and certifies
    content, null-fill boundaries, and the widened schema.

    Scale: adding a column to a 100 TB table must cost ZERO data
    rewrites — here it costs exactly the rows the evolving commit was
    already writing, because the schema lives in table metadata and
    old files null-fill at read; the alternative (rewriting every
    file to the new schema) is a full-table write no maintenance
    window tolerates.
    """
    import shutil
    import tempfile

    from pypeline_spark.sinks.manifest import ManifestTable

    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    k = F.col("c_custkey")
    scratch = tempfile.mkdtemp(prefix="table_evolve_")
    try:
        table = ManifestTable(scratch)
        table.commit_overwrite(
            c.repartitionByRange(8, "c_custkey"),
            batch_id="seed",
            stats_cols=["c_custkey"],
        )  # v1
        u2 = c.filter(k <= 30).select(
            "c_custkey",
            (F.col("c_acctbal") + 100.0).alias("c_acctbal"),
            F.when(k % 2 == 0, F.lit("gold"))
            .otherwise(F.lit("silver"))
            .alias("tier"),
        )
        table.commit_merge(
            spark, u2, ["c_custkey"], batch_id="m1",
            prune_col="c_custkey", stats_cols=["c_custkey"],
        )  # v2: adds 'tier'; files outside [0, 30] carried verbatim
        u3 = c.filter(k % 9 == 2).select(
            "c_custkey",
            (F.col("c_acctbal") + 7.0).alias("c_acctbal"),
            F.lit(1.5).alias("bonus"),
        )
        table.commit_delta(u3, ["c_custkey"], batch_id="d1")  # v3: adds 'bonus'
        got = table.read_resolved(spark)
        out = (
            got.groupBy(F.pmod("c_custkey", F.lit(4)).cast("bigint").alias("bucket"))
            .agg(
                F.count("*").cast("bigint").alias("n_rows"),
                F.sum(
                    F.floor(F.col("c_acctbal") * 100 + 0.5).cast("bigint")
                ).cast("bigint").alias("sum_cents"),
                F.count("tier").cast("bigint").alias("n_tier"),
                F.count("bonus").cast("bigint").alias("n_bonus"),
            )
            .withColumn("n_cols", F.lit(len(got.columns)).cast("bigint"))
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "q_delete_where",
    # The oracle is the SQL DELETE itself: alive = rows where the
    # predicate is NOT true.  deleted_rows/deleted_cents re-derive the
    # feed's full-row 'delete' CDC pre-images; pruned_ok is computed
    # GENUINELY on the Spark side (files outside the predicate's
    # stats envelope must carry over un-rewritten) and pinned TRUE.
    oracle="""
    WITH dead AS (
        SELECT * FROM customer
        WHERE c_acctbal >= 0.0 AND c_acctbal < 1000.0
    ),
    alive AS (
        SELECT * FROM customer
        WHERE NOT (c_acctbal >= 0.0 AND c_acctbal < 1000.0)
    )
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_cents,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM dead) AS deleted_rows,
           (SELECT CAST(SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT))
                        AS BIGINT) FROM dead) AS deleted_cents,
           TRUE AS pruned_ok
    FROM alive GROUP BY c_mktsegment
    """,
)
def q_delete_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate DML #1 — ``DELETE FROM t WHERE p`` as a stats-pruned
    copy-on-write commit (r15 directive 2, the Delta DELETE shape):
    the predicate's conjuncts prune candidate files from manifest
    metadata, ONE column-pruned scan finds the files actually holding
    matches, only those are rewritten (``pruned_ok`` certifies that
    every file outside the [0, 1000) acctbal envelope carried over
    verbatim, name-for-name), and the deleted rows land as FULL-ROW
    typed CDC that the change feed reads through
    (``deleted_rows``/``deleted_cents`` are re-derived from the feed,
    not the snapshot).  The reference's users run this as ``post_query``
    SQL on their target DB (ref: /root/reference/pypeline/Pype.py:167).

    Scale: deleting a narrow slice of a 100 TB table rewrites the
    overlapping files only — the two-phase plan (metadata prune, then
    an exact predicate-column scan) bounds both the read and the
    rewrite by the slice, never the table.
    """
    import shutil
    import tempfile

    from pypeline_spark.sinks.manifest import ManifestTable

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    scratch = tempfile.mkdtemp(prefix="delwhere_")
    try:
        t = ManifestTable(scratch)
        t.commit_overwrite(
            c.repartitionByRange(8, "c_acctbal"),
            batch_id="seed",
            stats_cols=["c_acctbal"],
        )  # v1: narrow per-file acctbal envelopes
        m0 = t._read_manifest()
        pred = "c_acctbal >= 0.0 AND c_acctbal < 1000.0"
        overlapping = {
            f for f in m0["files"]
            if t._overlaps(m0, f, "c_acctbal", 0.0, 1000.0)
        }
        t.delete_where(spark, pred, batch_id="dml", stats_cols=["c_acctbal"])
        m1 = t._read_manifest()
        carried = set(m0["files"]) & set(m1["files"])
        # every non-overlapping file carried verbatim AND nothing
        # outside the envelope was rewritten
        pruned_ok = (
            carried >= set(m0["files"]) - overlapping
            and set(m0["files"]) - carried <= overlapping
            and len(overlapping) < len(m0["files"])
        )
        feed = t.changes(spark, 1)  # the DML commit's CDC
        dead = feed.filter(F.col("_change_type") == "delete").agg(
            F.count("*").cast("bigint").alias("deleted_rows"),
            F.sum(F.floor(F.col("c_acctbal") * 100 + 0.5).cast("bigint"))
            .cast("bigint").alias("deleted_cents"),
        )
        out = (
            t.read_resolved(spark)
            .groupBy("c_mktsegment")
            .agg(
                F.count("*").cast("bigint").alias("n_rows"),
                F.sum(F.floor(F.col("c_acctbal") * 100 + 0.5).cast("bigint"))
                .cast("bigint").alias("sum_cents"),
            )
            .crossJoin(F.broadcast(dead))  # one-row stats frame
            .withColumn("pruned_ok", F.lit(bool(pruned_ok)))
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "q_update_where",
    # The oracle is the SQL UPDATE itself (simultaneous assignment
    # over the old row); pre_rows/post_cents re-derive the feed's
    # update_preimage/update_postimage CDC pair.
    oracle="""
    WITH updated AS (
        SELECT c_custkey,
               CASE WHEN c_acctbal < 0.0
                    THEN c_acctbal + 1000.0 ELSE c_acctbal END AS bal,
               CASE WHEN c_acctbal < 0.0
                    THEN 'RESCUED' ELSE c_mktsegment END AS seg
        FROM customer
    ),
    pre AS (SELECT * FROM customer WHERE c_acctbal < 0.0)
    SELECT seg AS c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(FLOOR(bal * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS sum_cents,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM pre) AS pre_rows,
           (SELECT CAST(SUM(CAST(FLOOR((c_acctbal + 1000.0) * 100 + 0.5)
                        AS BIGINT)) AS BIGINT) FROM pre) AS post_cents
    FROM updated GROUP BY seg
    """,
)
def q_update_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate DML #2 — ``UPDATE t SET a = f(a), b = 'lit' WHERE p``
    (r15 directive 2): multi-column simultaneous assignment (every
    right-hand side sees the OLD row), results cast to each column's
    existing type, same two-phase pruned copy-on-write as
    ``delete_where``, and the commit records update_preimage /
    update_postimage CDC pairs (the Delta CDF vocabulary) —
    ``pre_rows``/``post_cents`` are re-derived from the FEED, proving
    consumers see both sides of the update.

    Scale: the negative-balance slice is a small fraction of the
    acctbal domain; a range-clustered table rewrites only the files
    whose envelope crosses zero.
    """
    import shutil
    import tempfile

    from pypeline_spark.sinks.manifest import ManifestTable

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    scratch = tempfile.mkdtemp(prefix="updwhere_")
    try:
        t = ManifestTable(scratch)
        t.commit_overwrite(
            c.repartitionByRange(8, "c_acctbal"),
            batch_id="seed",
            stats_cols=["c_acctbal"],
        )
        t.update_where(
            spark,
            "c_acctbal < 0.0",
            {
                "c_acctbal": "c_acctbal + 1000.0",
                "c_mktsegment": "'RESCUED'",
            },
            batch_id="dml",
            stats_cols=["c_acctbal"],
        )
        feed = t.changes(spark, 1)
        cdc = feed.agg(
            F.sum(
                F.when(F.col("_change_type") == "update_preimage", 1)
                .otherwise(0)
            ).cast("bigint").alias("pre_rows"),
            F.sum(
                F.when(
                    F.col("_change_type") == "update_postimage",
                    F.floor(F.col("c_acctbal") * 100 + 0.5).cast("bigint"),
                ).otherwise(F.lit(0).cast("bigint"))
            ).cast("bigint").alias("post_cents"),
        )
        out = (
            t.read_resolved(spark)
            .groupBy("c_mktsegment")
            .agg(
                F.count("*").cast("bigint").alias("n_rows"),
                F.sum(F.floor(F.col("c_acctbal") * 100 + 0.5).cast("bigint"))
                .cast("bigint").alias("sum_cents"),
            )
            .crossJoin(F.broadcast(cdc))
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "q_time_travel_ts",
    # Three pinned reads of the same evolving table, one per commit
    # timestamp (AS OF the exact stamp, a mid-gap instant, and the
    # tip): the oracle recomputes each state's rollup from the same
    # modular slices.  v1 = even keys; v2 upserts k%3==0 at +100
    # (evens updated, odds inserted); v3 tombstones k%5==0.
    oracle="""
    WITH c AS (SELECT c_custkey AS k, c_acctbal AS bal FROM customer),
    v1 AS (SELECT k, bal FROM c WHERE k % 2 = 0),
    v2 AS (
        SELECT k, CASE WHEN k % 3 = 0 THEN bal + 100 ELSE bal END AS bal
        FROM c WHERE k % 2 = 0 OR k % 3 = 0
    ),
    v3 AS (SELECT * FROM v2 WHERE k % 5 <> 0),
    lab AS (
        SELECT 'as_of_v1' AS label, * FROM v1
        UNION ALL SELECT 'as_of_v2', * FROM v2
        UNION ALL SELECT 'as_of_tip', * FROM v3
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(FLOOR(bal * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS sum_cents
    FROM lab GROUP BY label
    """,
)
def q_time_travel_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``TIMESTAMP AS OF`` time travel (r15 directive 3): every commit
    is stamped monotonically at publish; reads resolve 'the latest
    version committed at or before ts' (the Delta/Iceberg rule).  The
    query drives seed → upsert → tombstone-delete, then re-reads the
    SAME table at three instants — v1's exact stamp, a midpoint
    strictly between v2's and v3's stamps, and the tip's stamp — and
    certifies each pinned state.  Commit stamps are reals from the
    wall clock; distinct commits are milliseconds apart (each writes
    files), so the midpoint instant is unambiguous.

    Scale: "what did this table look like yesterday" costs a
    metadata-only version resolution (one manifest listing) plus the
    ordinary snapshot read of that version — no log replay, no copy.
    """
    import shutil
    import tempfile

    from pypeline_spark.sinks.manifest import ManifestTable

    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"), F.col("c_acctbal").alias("bal")
    )
    kk = F.col("k")
    scratch = tempfile.mkdtemp(prefix="asof_")
    try:
        t = ManifestTable(scratch)
        t.commit_overwrite(c.filter(kk % 2 == 0), batch_id="v1")
        t.commit_delta(
            c.filter(kk % 3 == 0).withColumn("bal", F.col("bal") + 100.0),
            ["k"], batch_id="v2",
        )
        t.commit_delta(
            None, ["k"],
            deletes=c.filter(kk % 5 == 0).select("k"),
            batch_id="v3",
        )
        ct = {v: t._manifest_at(v)["committed_at"] for v in (1, 2, 3)}
        reads = [
            ("as_of_v1", t.read_resolved(spark, timestamp=ct[1])),
            ("as_of_v2",
             t.read_resolved(spark, timestamp=(ct[2] + ct[3]) / 2.0)),
            ("as_of_tip", t.read_resolved(spark, timestamp=ct[3])),
        ]
        parts = [
            df.groupBy(F.lit(label).alias("label")).agg(
                F.count("*").cast("bigint").alias("n_rows"),
                F.sum(F.floor(F.col("bal") * 100 + 0.5).cast("bigint"))
                .cast("bigint").alias("sum_cents"),
            )
            for label, df in reads
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "q_type_widening",
    # int32/float32/decimal(10,2) files widened to
    # bigint/double/decimal(14,4) by ONE metadata commit, then a
    # narrow post-widening delta; the oracle reproduces the final
    # content by casting the SAME slices to the wide types.  REAL is
    # DuckDB's float32 — both engines widen the identical stored bits
    # to double, so the cents arithmetic agrees exactly.
    oracle="""
    WITH c AS (
        SELECT c_custkey AS k,
               CAST(c_acctbal AS REAL) AS v,
               CAST(c_acctbal AS DECIMAL(10,2)) AS d
        FROM customer
    ),
    final AS (
        SELECT CAST(k AS BIGINT) AS k,
               CASE WHEN k % 9 = 2
                    THEN CAST(CAST(v AS DOUBLE) + 50.0 AS DOUBLE)
                    ELSE CAST(v AS DOUBLE) END AS v,
               CASE WHEN k % 9 = 2
                    THEN CAST(CAST(d AS DECIMAL(14,4)) + 1.2345
                         AS DECIMAL(14,4))
                    ELSE CAST(d AS DECIMAL(14,4)) END AS d
        FROM c
    )
    SELECT CAST(k % 4 AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           CAST(SUM(CAST(FLOOR(v * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS sum_cents,
           CAST(SUM(d) * 10000 AS BIGINT) AS sum_d_e4,
           'bigint' AS k_type, 'double' AS v_type,
           'decimal(14,4)' AS d_type,
           TRUE AS metadata_only, TRUE AS bloom_alive
    FROM final GROUP BY CAST(k % 4 AS BIGINT)
    """,
)
def q_type_widening(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Safe type widening as metadata-only evolution (r15 directive 4,
    the Delta 4.0 type-widening table feature): a table written with
    int32 / float32 / decimal(10,2) columns widens to bigint / double
    / decimal(14,4) in ONE manifest commit — ``metadata_only``
    certifies the data file list is byte-identical across the ALTER —
    and every old file upcasts at read (the SPARK-40876 parquet
    widening read).  A post-widening delta still carrying the NARROW
    int type resolves under the wide schema, and ``bloom_alive``
    certifies the pre-widening per-file bloom index still point-prunes
    under the widened column type (file bytes unchanged => probe
    canonicalization unchanged).

    Scale: ALTER COLUMN TYPE on a 100 TB table costs one manifest
    write instead of a full rewrite, and keeps every stats/bloom
    index — the difference between a live schema migration and a
    maintenance window.
    """
    import shutil
    import tempfile

    from pypeline_spark.sinks.manifest import ManifestTable

    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("int").alias("k"),
        F.col("c_acctbal").cast("float").alias("v"),
        F.col("c_acctbal").cast("decimal(10,2)").alias("d"),
    )
    kk = F.col("k")
    scratch = tempfile.mkdtemp(prefix="widen_")
    try:
        t = ManifestTable(scratch)
        t.commit_overwrite(
            c.repartitionByRange(8, "k"),
            batch_id="seed", stats_cols=["k"], bloom_cols=["k"],
        )  # v1: narrow types on disk, stats + bloom on k
        files_before = t._read_manifest()["files"]
        t.evolve_schema(
            "k bigint, v double, d decimal(14,4)", batch_id="widen"
        )  # v2: METADATA ONLY
        metadata_only = t._read_manifest()["files"] == files_before
        # pre-widening bloom still point-prunes under the wide type
        keep, total = t.prune_plan_eq("k", 7)
        bloom_alive = total == 8 and len(keep) < total
        t.commit_delta(
            c.filter(kk % 9 == 2).select(
                "k",
                (F.col("v") + F.lit(50.0)).cast("float").alias("v"),
                (F.col("d") + F.lit(1.2345)).cast("decimal(14,4)").alias("d"),
            ),
            ["k"], batch_id="d1",
        )  # v3: the delta's k is STILL int32 — upcasts at resolution
        got = t.read_resolved(spark)
        typ = dict(got.dtypes)
        out = (
            got.groupBy((kk % 4).cast("bigint").alias("bucket"))
            .agg(
                F.count("*").cast("bigint").alias("n_rows"),
                F.sum("k").cast("bigint").alias("sum_k"),
                F.sum(F.floor(F.col("v") * 100 + 0.5).cast("bigint"))
                .cast("bigint").alias("sum_cents"),
                (F.sum("d") * 10000).cast("bigint").alias("sum_d_e4"),
            )
            .withColumn("k_type", F.lit(typ["k"]))
            .withColumn("v_type", F.lit(typ["v"]))
            .withColumn("d_type", F.lit(typ["d"]))
            .withColumn("metadata_only", F.lit(bool(metadata_only)))
            .withColumn("bloom_alive", F.lit(bool(bloom_alive)))
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "q_delete_vector",
    # The oracle is the SQL DELETE itself; deleted_rows/deleted_cents
    # re-derive the feed's full-row 'delete' CDC, dv_live_rows pins the
    # manifest's suppression count, and files_intact / dv_pruned_ok /
    # compact_ok are computed GENUINELY Spark-side and pinned TRUE.
    oracle="""
    WITH dead AS (
        SELECT * FROM customer
        WHERE c_acctbal >= 2000.0 AND c_acctbal < 4000.0
    ),
    alive AS (
        SELECT * FROM customer
        WHERE NOT (c_acctbal >= 2000.0 AND c_acctbal < 4000.0)
    )
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_cents,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM dead) AS deleted_rows,
           (SELECT CAST(SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT))
                        AS BIGINT) FROM dead) AS deleted_cents,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM dead) AS dv_live_rows,
           TRUE AS files_intact,
           TRUE AS dv_pruned_ok,
           TRUE AS compact_ok
    FROM alive GROUP BY c_mktsegment
    """,
)
def q_delete_vector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate DML #3 — ``DELETE FROM t WHERE p`` via DELETION
    VECTORS (the Delta 3.x merge-on-read DELETE): the commit records
    the matched (file, position) pairs and rewrites NOTHING —
    ``files_intact`` certifies the base file list is bit-identical
    across the delete, ``dv_pruned_ok`` that only stats-overlapping
    files got dv entries, ``dv_live_rows`` that the manifest's
    suppression count equals the SQL-dead rows, and
    ``deleted_rows``/``deleted_cents`` re-derive the full-row delete
    CDC from the change feed.  The aggregate itself reads THROUGH the
    dv (every reader anti-joins the suppression set), and
    ``compact_ok`` certifies that compaction then materializes the dv
    (entry cleared) without changing the logical content.  The
    reference's users run this as ``post_query`` SQL on their target
    DB (ref: /root/reference/pypeline/Pype.py:167).

    Scale: this is the O(matched rows) DELETE — deleting 1k rows
    scattered over 10k files of a 100 TB table writes kilobytes of dv
    instead of rewriting 10k files; reads pay a broadcast anti-join
    until the next scheduled OPTIMIZE materializes the suppression.
    """
    import shutil
    import tempfile

    from pypeline_spark.sinks.manifest import ManifestTable

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    scratch = tempfile.mkdtemp(prefix="delvec_")
    try:
        t = ManifestTable(scratch)
        t.commit_overwrite(
            c.repartitionByRange(8, "c_acctbal"),
            batch_id="seed",
            stats_cols=["c_acctbal"],
        )  # v1: narrow per-file acctbal envelopes
        m0 = t._read_manifest()
        overlapping = {
            f for f in m0["files"]
            if t._overlaps(m0, f, "c_acctbal", 2000.0, 4000.0)
        }
        t.delete_where(
            spark,
            "c_acctbal >= 2000.0 AND c_acctbal < 4000.0",
            batch_id="dml",
            mode="dv",
        )  # v2: zero base-file writes
        m1 = t._read_manifest()
        files_intact = m1["files"] == m0["files"]
        dv = m1.get("dv") or {"rows": {}}
        dv_pruned_ok = (
            set(dv["rows"]) <= overlapping
            and len(overlapping) < len(m0["files"])
        )
        dv_live_rows = int(sum(dv["rows"].values()))
        feed = t.changes(spark, 1)  # the dv commit's CDC
        dead = feed.filter(F.col("_change_type") == "delete").agg(
            F.count("*").cast("bigint").alias("deleted_rows"),
            F.sum(F.floor(F.col("c_acctbal") * 100 + 0.5).cast("bigint"))
            .cast("bigint").alias("deleted_cents"),
        )
        out = (
            t.read(spark)  # reads THROUGH the dv
            .groupBy("c_mktsegment")
            .agg(
                F.count("*").cast("bigint").alias("n_rows"),
                F.sum(F.floor(F.col("c_acctbal") * 100 + 0.5).cast("bigint"))
                .cast("bigint").alias("sum_cents"),
            )
            .crossJoin(F.broadcast(dead))  # one-row stats frame
            .withColumn("dv_live_rows", F.lit(dv_live_rows).cast("bigint"))
            .withColumn("files_intact", F.lit(bool(files_intact)))
            .withColumn("dv_pruned_ok", F.lit(bool(dv_pruned_ok)))
        ).localCheckpoint(eager=True)
        # compaction materializes the suppression: dv cleared, logical
        # content (row count + cents) unchanged
        pre = t.read(spark).agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.floor(F.col("c_acctbal") * 100 + 0.5).cast("bigint"))
            .cast("bigint").alias("cents"),
        ).first()
        t.compact(spark, batch_id="mat", stats_cols=["c_acctbal"])
        m2 = t._read_manifest()
        post = t.read(spark).agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.floor(F.col("c_acctbal") * 100 + 0.5).cast("bigint"))
            .cast("bigint").alias("cents"),
        ).first()
        compact_ok = (
            not m2.get("dv")
            and pre["n"] == post["n"]
            and pre["cents"] == post["cents"]
        )
        return out.withColumn("compact_ok", F.lit(bool(compact_ok)))
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "q_merge_into",
    # The oracle expresses the conditional merge as plain SQL set
    # algebra: matched rows route through the first applicable clause
    # (delete if n_ord >= 20, else update), unmatched target rows face
    # the by-source clause, unmatched source rows insert.  The clause
    # tallies re-derive the feed's typed CDC.
    oracle="""
    WITH tgt AS (
        SELECT c_custkey, c_acctbal, c_mktsegment FROM customer
        WHERE c_custkey % 3 <> 0
    ),
    src AS (
        SELECT o_custkey AS k,
               CAST(COUNT(*) AS BIGINT) AS n_ord,
               CAST(SUM(FLOOR(o_totalprice)) AS DOUBLE) AS spend
        FROM orders WHERE o_custkey <= 600 GROUP BY o_custkey
    ),
    matched AS (
        SELECT t.c_custkey, t.c_acctbal, t.c_mktsegment, s.n_ord, s.spend
        FROM tgt t JOIN src s ON t.c_custkey = s.k
    ),
    final AS (
        SELECT c_custkey, c_acctbal + spend AS c_acctbal, c_mktsegment
        FROM matched WHERE NOT (n_ord >= 20)
        UNION ALL
        SELECT t.c_custkey, t.c_acctbal,
               CASE WHEN t.c_acctbal < 0.0 THEN 'DORMANT'
                    ELSE t.c_mktsegment END
        FROM tgt t WHERE t.c_custkey NOT IN (SELECT k FROM src)
        UNION ALL
        SELECT s.k, s.spend, 'FROMORDERS'
        FROM src s WHERE s.k NOT IN (SELECT c_custkey FROM tgt)
    )
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_cents,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM matched
            WHERE n_ord >= 20) AS n_deleted,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM matched
            WHERE NOT (n_ord >= 20)) AS n_updated,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM src
            WHERE k NOT IN (SELECT c_custkey FROM tgt)) AS n_inserted,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM tgt
            WHERE c_custkey NOT IN (SELECT k FROM src)
              AND c_acctbal < 0.0) AS n_by_source
    FROM final GROUP BY c_mktsegment
    """,
)
def q_merge_into(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional ``MERGE INTO`` (the full SQL/Delta merge surface):
    customers merged against a per-customer order rollup with FOUR
    clause kinds in one statement — WHEN MATCHED AND heavy-buyer THEN
    DELETE, WHEN MATCHED THEN UPDATE (balance += spend, RHS over both
    aliases), WHEN NOT MATCHED THEN INSERT (explicit assignments +
    literal segment), WHEN NOT MATCHED BY SOURCE AND negative-balance
    THEN UPDATE (segment := 'DORMANT').  One full-outer join drives
    every clause through a single CASE-typed action column; the
    commit's typed CDC (delete / update_preimage / update_postimage /
    insert) is re-derived from the change feed as the
    ``n_deleted``/``n_updated``/``n_inserted``/``n_by_source``
    tallies.  The reference's users run MERGE as ``post_query`` SQL on
    their target DB (ref: /root/reference/pypeline/Pype.py:167); here
    it is native and file-pruned.

    Scale: without by-source clauses the touched slice is
    stats-pruned + semi-join narrowed (only files holding matches
    rewrite); with them every unmatched row may change, so the merge
    degrades gracefully to a full CoW pass — exactly Delta's
    behavior.  The ambiguity guard (multiple source rows per target
    key) is one O(matched) aggregate, and the source is
    lazily-checkpointed once for its three consumers.
    """
    import shutil
    import tempfile

    from pypeline_spark.sinks.manifest import ManifestTable

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    ).filter(F.col("c_custkey") % 3 != 0)
    o = load_table(spark, sf_dir, "orders")
    src = (
        o.filter(F.col("o_custkey") <= 600)
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.count("*").cast("bigint").alias("n_ord"),
            F.sum(F.floor("o_totalprice")).cast("double").alias("spend"),
        )
    )
    scratch = tempfile.mkdtemp(prefix="mergeinto_")
    try:
        t = ManifestTable(scratch)
        t.commit_overwrite(
            c.repartitionByRange(8, "c_custkey"),
            batch_id="seed",
            stats_cols=["c_custkey"],
        )
        t.merge_into(
            spark,
            src,
            key_columns=["c_custkey"],
            clauses=[
                ("delete", "s.n_ord >= 20", None),
                ("update", None, {"c_acctbal": "t.c_acctbal + s.spend"}),
                (
                    "insert",
                    None,
                    {
                        "c_custkey": "s.c_custkey",
                        "c_acctbal": "s.spend",
                        "c_mktsegment": "'FROMORDERS'",
                    },
                ),
                (
                    "update_by_source",
                    "t.c_acctbal < 0.0",
                    {"c_mktsegment": "'DORMANT'"},
                ),
            ],
            batch_id="m1",
            stats_cols=["c_custkey"],
        )
        feed = t.changes(spark, 1)  # the merge commit's typed CDC
        tallies = feed.agg(
            F.sum((F.col("_change_type") == "delete").cast("bigint"))
            .cast("bigint").alias("n_deleted"),
            F.sum(
                (F.col("_change_type") == "update_postimage").cast("bigint")
            ).cast("bigint").alias("n_post"),
            F.sum((F.col("_change_type") == "insert").cast("bigint"))
            .cast("bigint").alias("n_inserted"),
            F.sum(
                (
                    (F.col("_change_type") == "update_postimage")
                    & (F.col("c_mktsegment") == "DORMANT")
                ).cast("bigint")
            ).cast("bigint").alias("n_by_source"),
        ).select(
            "n_deleted",
            (F.col("n_post") - F.col("n_by_source")).alias("n_updated"),
            "n_inserted",
            "n_by_source",
        )
        out = (
            t.read(spark)
            .groupBy("c_mktsegment")
            .agg(
                F.count("*").cast("bigint").alias("n_rows"),
                F.sum(F.floor(F.col("c_acctbal") * 100 + 0.5).cast("bigint"))
                .cast("bigint").alias("sum_cents"),
            )
            .crossJoin(F.broadcast(tallies))  # one-row stats frame
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "q_merge_into_dv",
    # The SAME set-algebra oracle as q_merge_into — the deletion-vector
    # merge must produce bit-identical content and CDC tallies — plus
    # two structural proofs pinned TRUE: the base file list only ever
    # APPENDS across the merge (nothing rewritten) and the outstanding
    # merge-on-read delta fileset carries through verbatim (the merge
    # ran over un-compacted deltas, the capability the cow mode lacks).
    oracle="""
    WITH tgt AS (
        SELECT c_custkey, c_acctbal, c_mktsegment FROM customer
        WHERE c_custkey % 3 <> 0
    ),
    src AS (
        SELECT o_custkey AS k,
               CAST(COUNT(*) AS BIGINT) AS n_ord,
               CAST(SUM(FLOOR(o_totalprice)) AS DOUBLE) AS spend
        FROM orders WHERE o_custkey <= 600 GROUP BY o_custkey
    ),
    matched AS (
        SELECT t.c_custkey, t.c_acctbal, t.c_mktsegment, s.n_ord, s.spend
        FROM tgt t JOIN src s ON t.c_custkey = s.k
    ),
    final AS (
        SELECT c_custkey, c_acctbal + spend AS c_acctbal, c_mktsegment
        FROM matched WHERE NOT (n_ord >= 20)
        UNION ALL
        SELECT t.c_custkey, t.c_acctbal,
               CASE WHEN t.c_acctbal < 0.0 THEN 'DORMANT'
                    ELSE t.c_mktsegment END
        FROM tgt t WHERE t.c_custkey NOT IN (SELECT k FROM src)
        UNION ALL
        SELECT s.k, s.spend, 'FROMORDERS'
        FROM src s WHERE s.k NOT IN (SELECT c_custkey FROM tgt)
    )
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_cents,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM matched
            WHERE n_ord >= 20) AS n_deleted,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM matched
            WHERE NOT (n_ord >= 20)) AS n_updated,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM src
            WHERE k NOT IN (SELECT c_custkey FROM tgt)) AS n_inserted,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM tgt
            WHERE c_custkey NOT IN (SELECT k FROM src)
              AND c_acctbal < 0.0) AS n_by_source,
           TRUE AS files_intact,
           TRUE AS deltas_kept
    FROM final GROUP BY c_mktsegment
    """,
)
def q_merge_into_dv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deletion-vector ``MERGE INTO`` (the Delta 3.x DV-enabled MERGE)
    over a table with BOTH prior deletion vectors AND outstanding
    merge-on-read deltas — the exact state the copy-on-write merge
    refuses.  The target (customers with ``custkey % 3 <> 0``) is
    materialized messily: v1 overwrites ALL customers, v2 dv-deletes
    the ``% 3 = 0`` slice (zero rewrites), v3 delta-upserts a subset
    of the survivors (identical values — creating keys with TWO stored
    images that resolution folds).  The same four-clause merge as
    ``q_merge_into`` then runs with ``mode='dv'``: matched deletes /
    updates and by-source updates suppress EVERY stored image of their
    key by (file, position) and only post-image/insert rows land as
    new files.  ``files_intact`` pins that the pre-merge base file
    list survives as a prefix (nothing rewritten), ``deltas_kept``
    that the outstanding delta fileset carries through verbatim; the
    CDC tallies re-derive the typed feed.  Content and tallies must
    hash-match the SAME oracle as the cow merge.

    Scale: write cost is O(changed rows) however the matches scatter
    — the merge never pays the compact() a 100 TB streaming table
    can't afford mid-ingest; reads pay a broadcast anti-join until the
    next scheduled OPTIMIZE (ref behavior: post_query MERGE at
    /root/reference/pypeline/Pype.py:167)."""
    import shutil
    import tempfile

    from pypeline_spark.sinks.manifest import ManifestTable

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    o = load_table(spark, sf_dir, "orders")
    src = (
        o.filter(F.col("o_custkey") <= 600)
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.count("*").cast("bigint").alias("n_ord"),
            F.sum(F.floor("o_totalprice")).cast("double").alias("spend"),
        )
    )
    scratch = tempfile.mkdtemp(prefix="mergedv_")
    try:
        t = ManifestTable(scratch)
        t.commit_overwrite(
            c.repartitionByRange(8, "c_custkey"),
            batch_id="seed",
            stats_cols=["c_custkey"],
        )  # v1: all customers, incl. the slice the dv delete removes
        t.delete_where(
            spark, "c_custkey % 3 = 0", batch_id="trim", mode="dv"
        )  # v2: prior dv state, zero rewrites
        t.commit_delta(
            c.filter(
                (F.col("c_custkey") % 3 != 0) & (F.col("c_custkey") % 5 == 1)
            ),
            ["c_custkey"],
            batch_id="reup",
            stats_cols=["c_custkey"],
        )  # v3: outstanding delta — re-upserted keys now have 2 images
        m0 = t._read_manifest()
        t.merge_into(
            spark,
            src,
            key_columns=["c_custkey"],
            clauses=[
                ("delete", "s.n_ord >= 20", None),
                ("update", None, {"c_acctbal": "t.c_acctbal + s.spend"}),
                (
                    "insert",
                    None,
                    {
                        "c_custkey": "s.c_custkey",
                        "c_acctbal": "s.spend",
                        "c_mktsegment": "'FROMORDERS'",
                    },
                ),
                (
                    "update_by_source",
                    "t.c_acctbal < 0.0",
                    {"c_mktsegment": "'DORMANT'"},
                ),
            ],
            batch_id="m1",
            stats_cols=["c_custkey"],
            mode="dv",
        )
        m1 = t._read_manifest()
        files_intact = m1["files"][: len(m0["files"])] == m0["files"]
        deltas_kept = m1.get("deltas") == m0.get("deltas") and bool(
            m1.get("deltas")
        )
        feed = t.changes(spark, m0["version"])  # the merge's typed CDC
        tallies = feed.agg(
            F.sum((F.col("_change_type") == "delete").cast("bigint"))
            .cast("bigint").alias("n_deleted"),
            F.sum(
                (F.col("_change_type") == "update_postimage").cast("bigint")
            ).cast("bigint").alias("n_post"),
            F.sum((F.col("_change_type") == "insert").cast("bigint"))
            .cast("bigint").alias("n_inserted"),
            F.sum(
                (
                    (F.col("_change_type") == "update_postimage")
                    & (F.col("c_mktsegment") == "DORMANT")
                ).cast("bigint")
            ).cast("bigint").alias("n_by_source"),
        ).select(
            "n_deleted",
            (F.col("n_post") - F.col("n_by_source")).alias("n_updated"),
            "n_inserted",
            "n_by_source",
        )
        out = (
            t.read_resolved(spark)  # deltas still outstanding post-merge
            .groupBy("c_mktsegment")
            .agg(
                F.count("*").cast("bigint").alias("n_rows"),
                F.sum(F.floor(F.col("c_acctbal") * 100 + 0.5).cast("bigint"))
                .cast("bigint").alias("sum_cents"),
            )
            .crossJoin(F.broadcast(tallies))  # one-row stats frame
            .withColumn("files_intact", F.lit(bool(files_intact)))
            .withColumn("deltas_kept", F.lit(bool(deltas_kept)))
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "q_sql_merge",
    # The SAME set-algebra oracle as q_merge_into: the SQL-string path
    # must produce bit-identical content and CDC tallies to the
    # API-built merge (r18 directive #3's Done criterion) — plus one
    # structural proof pinned TRUE: DESCRIBE HISTORY dispatched through
    # the same router reads the two commits back.
    oracle="""
    WITH tgt AS (
        SELECT c_custkey, c_acctbal, c_mktsegment FROM customer
        WHERE c_custkey % 3 <> 0
    ),
    src AS (
        SELECT o_custkey AS k,
               CAST(COUNT(*) AS BIGINT) AS n_ord,
               CAST(SUM(FLOOR(o_totalprice)) AS DOUBLE) AS spend
        FROM orders WHERE o_custkey <= 600 GROUP BY o_custkey
    ),
    matched AS (
        SELECT t.c_custkey, t.c_acctbal, t.c_mktsegment, s.n_ord, s.spend
        FROM tgt t JOIN src s ON t.c_custkey = s.k
    ),
    final AS (
        SELECT c_custkey, c_acctbal + spend AS c_acctbal, c_mktsegment
        FROM matched WHERE NOT (n_ord >= 20)
        UNION ALL
        SELECT t.c_custkey, t.c_acctbal,
               CASE WHEN t.c_acctbal < 0.0 THEN 'DORMANT'
                    ELSE t.c_mktsegment END
        FROM tgt t WHERE t.c_custkey NOT IN (SELECT k FROM src)
        UNION ALL
        SELECT s.k, s.spend, 'FROMORDERS'
        FROM src s WHERE s.k NOT IN (SELECT c_custkey FROM tgt)
    )
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_cents,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM matched
            WHERE n_ord >= 20) AS n_deleted,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM matched
            WHERE NOT (n_ord >= 20)) AS n_updated,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM src
            WHERE k NOT IN (SELECT c_custkey FROM tgt)) AS n_inserted,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM tgt
            WHERE c_custkey NOT IN (SELECT k FROM src)
              AND c_acctbal < 0.0) AS n_by_source,
           TRUE AS history_routed
    FROM final GROUP BY c_mktsegment
    """,
)
def q_sql_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL statement front-end for the manifest tier (r18
    directive #3): the exact four-clause merge of ``q_merge_into`` —
    WHEN MATCHED AND heavy-buyer DELETE, WHEN MATCHED UPDATE, WHEN NOT
    MATCHED INSERT (explicit column/VALUES lists), WHEN NOT MATCHED BY
    SOURCE AND negative-balance UPDATE — expressed as ONE ``MERGE
    INTO`` SQL string with user aliases (``acct``/``u``), parsed by
    the six-shape router (``sinks/sql.py``) and dispatched onto
    ``ManifestTable.merge_into``: equi-key extraction from the ON
    conjunction, alias canonicalization onto the plan's ``t``/``s``,
    payload dicts from SET / INSERT-VALUES lists.  ``DESCRIBE HISTORY``
    runs through the same router to read the commits back
    (``history_routed``).  The oracle is VERBATIM ``q_merge_into``'s —
    the SQL path must hash-match the API path's set algebra exactly.

    This closes the reference-parity ergonomic gap: its users run
    MERGE/UPDATE/DELETE as post_query SQL strings on their target DB
    (ref: /root/reference/pypeline/Pype.py:167); the router makes the
    same strings write-capable on the jar-free ACID tier (and
    ``post_query`` on lakehouse pipeline steps routes through it).

    Scale: the router is O(statement length) driver-side parsing —
    the plan it dispatches to is the same file-pruned one-join merge
    as ``q_merge_into``; nothing is re-implemented."""
    import shutil
    import tempfile
    import uuid as _uuid

    from pypeline_spark.sinks.manifest import ManifestTable
    from pypeline_spark.sinks.sql import execute_table_sql

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    ).filter(F.col("c_custkey") % 3 != 0)
    o = load_table(spark, sf_dir, "orders")
    src_view = f"sqlmerge_src_{_uuid.uuid4().hex[:8]}"
    (
        o.filter(F.col("o_custkey") <= 600)
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.count("*").cast("bigint").alias("n_ord"),
            F.sum(F.floor("o_totalprice")).cast("double").alias("spend"),
        )
    ).createOrReplaceTempView(src_view)
    scratch = tempfile.mkdtemp(prefix="sqlmerge_")
    try:
        t = ManifestTable(scratch)
        t.commit_overwrite(
            c.repartitionByRange(8, "c_custkey"),
            batch_id="seed",
            stats_cols=["c_custkey"],
        )
        execute_table_sql(
            spark,
            lambda name: t,
            f"""
            MERGE INTO accounts AS acct USING {src_view} AS u
            ON acct.c_custkey = u.c_custkey
            WHEN MATCHED AND u.n_ord >= 20 THEN DELETE
            WHEN MATCHED THEN UPDATE SET
                c_acctbal = acct.c_acctbal + u.spend
            WHEN NOT MATCHED THEN INSERT
                (c_custkey, c_acctbal, c_mktsegment)
                VALUES (u.c_custkey, u.spend, 'FROMORDERS')
            WHEN NOT MATCHED BY SOURCE AND acct.c_acctbal < 0.0
                THEN UPDATE SET c_mktsegment = 'DORMANT'
            """,
            batch_id="m1",
        )
        hist = execute_table_sql(
            spark, lambda name: t, "DESCRIBE HISTORY accounts"
        )
        history_routed = hist.count() == 2
        feed = t.changes(spark, 1)  # the merge commit's typed CDC
        tallies = feed.agg(
            F.sum((F.col("_change_type") == "delete").cast("bigint"))
            .cast("bigint").alias("n_deleted"),
            F.sum(
                (F.col("_change_type") == "update_postimage").cast("bigint")
            ).cast("bigint").alias("n_post"),
            F.sum((F.col("_change_type") == "insert").cast("bigint"))
            .cast("bigint").alias("n_inserted"),
            F.sum(
                (
                    (F.col("_change_type") == "update_postimage")
                    & (F.col("c_mktsegment") == "DORMANT")
                ).cast("bigint")
            ).cast("bigint").alias("n_by_source"),
        ).select(
            "n_deleted",
            (F.col("n_post") - F.col("n_by_source")).alias("n_updated"),
            "n_inserted",
            "n_by_source",
        )
        out = (
            t.read(spark)
            .groupBy("c_mktsegment")
            .agg(
                F.count("*").cast("bigint").alias("n_rows"),
                F.sum(F.floor(F.col("c_acctbal") * 100 + 0.5).cast("bigint"))
                .cast("bigint").alias("sum_cents"),
            )
            .crossJoin(F.broadcast(tallies))  # one-row stats frame
            .withColumn("history_routed", F.lit(bool(history_routed)))
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
