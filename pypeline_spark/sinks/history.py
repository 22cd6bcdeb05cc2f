"""History-keeping sinks: SCD Type-2 merge and snapshot diff (CDC).

The reference's only incremental story is "re-run the idempotent keyed
upsert" (ref: /root/reference/pypeline/Pype.py:97-117) — it overwrites
matched rows and loses the previous values.  A warehouse-grade pipeline
engine also needs the two standard history primitives:

- **SCD2 merge** (``scd2_apply``): matched-and-changed rows close the
  current version (valid_to = as_of, is_current = false) and append a
  new current version; unchanged rows are untouched; unseen keys
  insert as new current rows.  The full version history is queryable.
- **Snapshot diff** (``snapshot_diff``): given two snapshots of the
  same keyed table, emit one row per changed key classified
  insert/update/delete — the change feed a CDC-less source can still
  produce (the hash-diff pattern).

Scale design:
- Both are single-shuffle plans: one hash exchange per side on the key
  columns, then a joined row-compare.  Nothing is collected; no window
  over the whole table.
- Row comparison uses per-column null-safe equality (not md5 of a
  concat, which would false-match on delimiter collisions and type
  coercion).  Catalyst folds the conjunction into codegen.
- At 100 TB the history table is partitioned by is_current so the
  merge's current-side scan prunes all closed versions at the file
  level; the diff's two snapshot scans prune columns to key + tracked.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pypeline_spark.registry import query
from pypeline_spark.session import load_table


def _same_row(a: str, b: str, cols: Sequence[str]) -> Column:
    """Null-safe per-column equality conjunction between aliases."""
    return reduce(
        lambda acc, c: acc & F.col(f"{a}.{c}").eqNullSafe(F.col(f"{b}.{c}")),
        cols[1:],
        F.col(f"{a}.{cols[0]}").eqNullSafe(F.col(f"{b}.{cols[0]}")),
    )


def scd2_apply(
    history: DataFrame,
    updates: DataFrame,
    key_columns: Sequence[str],
    tracked_columns: Sequence[str],
    as_of_col: str = "as_of",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    is_current: str = "is_current",
) -> DataFrame:
    """Merge one batch of updates into an SCD2 history table.

    ``history`` carries key + tracked + (valid_from, valid_to,
    is_current); ``updates`` carries key + tracked + as_of (one row per
    key per batch).  Returns the new full history.
    """
    keys = list(key_columns)
    tracked = list(tracked_columns)
    out_cols = keys + tracked + [valid_from, valid_to, is_current]

    closed_hist = history.filter(~F.col(is_current)).select(*out_cols)
    cur = history.filter(F.col(is_current))

    # keys whose tracked attributes actually changed in this batch
    changed = (
        cur.alias("t")
        .join(updates.alias("u"), keys)
        .filter(~_same_row("t", "u", tracked))
        .select(*[F.col(f"t.{k}") for k in keys], F.col(f"u.{as_of_col}").alias("__as_of"))
    )

    # current rows for changed keys: close them at the batch timestamp
    closing = (
        cur.alias("t")
        .join(changed.alias("c"), keys)
        .select(
            *[F.col(f"t.{k}") for k in keys],
            *[F.col(f"t.{c}") for c in tracked],
            F.col(f"t.{valid_from}").alias(valid_from),
            F.col("c.__as_of").alias(valid_to),
            F.lit(False).alias(is_current),
        )
    )

    # current rows for unchanged keys survive untouched
    surviving = cur.join(changed.select(*keys), keys, "left_anti").select(*out_cols)

    # new current versions: changed keys + keys never seen before
    matched_unchanged = (
        updates.alias("u")
        .join(cur.alias("t"), keys)
        .filter(_same_row("t", "u", tracked))
        .select(*[F.col(f"u.{k}") for k in keys])
    )
    opening = (
        updates.join(matched_unchanged, keys, "left_anti")
        .select(
            *keys,
            *tracked,
            F.col(as_of_col).alias(valid_from),
            F.lit(None).cast(updates.schema[as_of_col].dataType).alias(valid_to),
            F.lit(True).alias(is_current),
        )
    )

    return closed_hist.unionByName(surviving).unionByName(closing).unionByName(opening)


def snapshot_diff(
    old: DataFrame, new: DataFrame, key_columns: Sequence[str], tracked_columns: Sequence[str]
) -> DataFrame:
    """Classify each key across two snapshots: insert / update / delete.

    Unchanged keys are omitted — the output is the change feed, sized
    by churn, not by table size.
    """
    keys = list(key_columns)
    tracked = list(tracked_columns)
    o = old.select(*keys, *tracked, F.lit(True).alias("__in_old")).alias("o")
    n = new.select(*keys, *tracked, F.lit(True).alias("__in_new")).alias("n")
    joined = o.join(n, keys, "full_outer")
    change = (
        F.when(F.col("o.__in_old").isNull(), F.lit("insert"))
        .when(F.col("n.__in_new").isNull(), F.lit("delete"))
        .when(~_same_row("o", "n", tracked), F.lit("update"))
    )
    return (
        joined.select(*keys, change.alias("change_type"))
        .filter(F.col("change_type").isNotNull())
    )


# ---------------------------------------------------------------------------
# Fixture-backed correctness queries

_HIST_SQL = """
    SELECT c_custkey, c_name, c_acctbal, c_mktsegment,
           DATE '2023-01-01' AS valid_from,
           CAST(NULL AS DATE) AS valid_to,
           TRUE AS is_current
    FROM customer WHERE c_custkey <= 1000
"""

# even keys change balance + segment; odd keys arrive identical (no-op)
_UPD_SQL = """
    SELECT c_custkey, c_name,
           CASE WHEN c_custkey % 2 = 0 THEN ROUND(c_acctbal + 100.0, 2)
                ELSE c_acctbal END AS c_acctbal,
           CASE WHEN c_custkey % 2 = 0 THEN 'UPDATED' ELSE c_mktsegment END
               AS c_mktsegment,
           DATE '2024-06-01' AS as_of
    FROM customer WHERE c_custkey BETWEEN 800 AND 1200
"""

_SCD2_KEYS = ["c_custkey"]
_SCD2_TRACKED = ["c_name", "c_acctbal", "c_mktsegment"]


def _scd2_inputs(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    c = load_table(spark, sf_dir, "customer")
    hist = c.filter(F.col("c_custkey") <= 1000).select(
        "c_custkey",
        "c_name",
        "c_acctbal",
        "c_mktsegment",
        F.lit("2023-01-01").cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    upd = c.filter(F.col("c_custkey").between(800, 1200)).select(
        "c_custkey",
        "c_name",
        F.when(F.col("c_custkey") % 2 == 0, F.round(F.col("c_acctbal") + 100.0, 2))
        .otherwise(F.col("c_acctbal"))
        .alias("c_acctbal"),
        F.when(F.col("c_custkey") % 2 == 0, F.lit("UPDATED"))
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
        F.lit("2024-06-01").cast("date").alias("as_of"),
    )
    return hist, upd


@query(
    "q_scd2",
    oracle=f"""
    WITH hist AS ({_HIST_SQL}), upd AS ({_UPD_SQL}),
    changed AS (
        SELECT u.c_custkey FROM upd u JOIN hist t USING (c_custkey)
        WHERE t.c_name IS DISTINCT FROM u.c_name
           OR t.c_acctbal IS DISTINCT FROM u.c_acctbal
           OR t.c_mktsegment IS DISTINCT FROM u.c_mktsegment
    )
    SELECT t.c_custkey, t.c_name, t.c_acctbal, t.c_mktsegment, t.valid_from,
           CASE WHEN c.c_custkey IS NOT NULL THEN DATE '2024-06-01' END AS valid_to,
           c.c_custkey IS NULL AS is_current
    FROM hist t LEFT JOIN changed c USING (c_custkey)
    UNION ALL
    SELECT u.c_custkey, u.c_name, u.c_acctbal, u.c_mktsegment,
           DATE '2024-06-01', CAST(NULL AS DATE), TRUE
    FROM upd u
    WHERE u.c_custkey IN (SELECT c_custkey FROM changed)
       OR u.c_custkey NOT IN (SELECT c_custkey FROM hist)
    """,
)
def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 merge: even keys 800-1000 version (old row closed + new
    current), odd matched keys no-op, 1001-1200 insert as current."""
    hist, upd = _scd2_inputs(spark, sf_dir)
    return scd2_apply(hist, upd, _SCD2_KEYS, _SCD2_TRACKED)


@query(
    "q_snapshot_diff",
    oracle="""
    WITH old AS (
        SELECT c_custkey, c_acctbal, c_mktsegment FROM customer
        WHERE c_custkey <= 1000
    ),
    new AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 3 = 0 THEN ROUND(c_acctbal + 50.0, 2)
                    ELSE c_acctbal END AS c_acctbal,
               c_mktsegment
        FROM customer
        WHERE c_custkey <= 1200 AND c_custkey % 10 != 0
    )
    SELECT COALESCE(o.c_custkey, n.c_custkey) AS c_custkey,
           CASE WHEN o.c_custkey IS NULL THEN 'insert'
                WHEN n.c_custkey IS NULL THEN 'delete'
                WHEN o.c_acctbal IS DISTINCT FROM n.c_acctbal
                  OR o.c_mktsegment IS DISTINCT FROM n.c_mktsegment
                THEN 'update' END AS change_type
    FROM old o FULL OUTER JOIN new n ON o.c_custkey = n.c_custkey
    WHERE CASE WHEN o.c_custkey IS NULL THEN 'insert'
               WHEN n.c_custkey IS NULL THEN 'delete'
               WHEN o.c_acctbal IS DISTINCT FROM n.c_acctbal
                 OR o.c_mktsegment IS DISTINCT FROM n.c_mktsegment
               THEN 'update' END IS NOT NULL
    """,
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-diff CDC between two snapshots: deletions (every 10th key),
    updates (every 3rd key's balance), inserts (keys 1001-1200)."""
    c = load_table(spark, sf_dir, "customer")
    old = c.filter(F.col("c_custkey") <= 1000).select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    new = (
        c.filter((F.col("c_custkey") <= 1200) & (F.col("c_custkey") % 10 != 0))
        .select(
            "c_custkey",
            F.when(F.col("c_custkey") % 3 == 0, F.round(F.col("c_acctbal") + 50.0, 2))
            .otherwise(F.col("c_acctbal"))
            .alias("c_acctbal"),
            "c_mktsegment",
        )
    )
    return snapshot_diff(old, new, ["c_custkey"], ["c_acctbal", "c_mktsegment"])


def cdc_apply(
    base: DataFrame,
    ops: DataFrame,
    key_columns: Sequence[str],
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Apply a CDC log (mixed upserts + deletes, arbitrary arrival
    order) to a keyed base table.

    Two phases, the shape every CDC consumer (Debezium sink, Delta CDF
    reader) uses:

    1. **Log compaction** — keep only the highest-``seq_col`` op per
       key (one window pass; ties broken by op so reruns are stable).
    2. **Merge** — compacted deletes drop the key, compacted upserts
       replace-or-insert the row; untouched base rows pass through via
       a single left-anti join.

    Scale: compaction shuffles the log once on the key columns, the
    merge joins base↔compacted-log on the same key — co-partitioned,
    so AQE plans one exchange per side and the log side (a batch,
    typically ≪ base) broadcasts.  No window over the base table.
    """
    keys = list(key_columns)
    w = F.row_number().over(
        Window.partitionBy(*keys).orderBy(F.col(seq_col).desc(), F.col(op_col))
    )
    last = ops.withColumn("__rn", w).filter(F.col("__rn") == 1).drop("__rn")
    survivors = last.filter(F.col(op_col) != "delete").drop(seq_col, op_col)
    untouched = base.join(last.select(keys), keys, "left_anti")
    return untouched.unionByName(survivors.select(base.columns))


_CDC_BASE_SQL = """
    SELECT c_custkey AS custkey, c_acctbal AS acctbal,
           c_mktsegment AS segment
    FROM customer WHERE c_custkey <= 1000
"""
# CDC log derived from orders: seq = o_orderkey (globally unique,
# monotone), every 5th op a delete, payload from the order row.  Keys
# beyond the base range arrive as inserts.
_CDC_OPS_SQL = """
    SELECT o_custkey AS custkey, o_orderkey AS seq,
           CASE WHEN o_orderkey % 5 = 0 THEN 'delete' ELSE 'upsert' END AS op,
           ROUND(o_totalprice, 2) AS acctbal,
           'CDC_' || o_orderstatus AS segment
    FROM orders WHERE o_orderkey % 3 != 0
"""


@query(
    "q_cdc_apply",
    oracle=f"""
    WITH base AS ({_CDC_BASE_SQL}), ops AS ({_CDC_OPS_SQL}),
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
def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC log application: compact an out-of-order upsert/delete
    change log (one op per order, sequenced by orderkey) to its final
    op per key, then merge onto the customer base — deletes drop,
    upserts replace or insert, untouched rows pass through."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    base = c.filter(F.col("c_custkey") <= 1000).select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_mktsegment").alias("segment"),
    )
    ops = o.filter(F.col("o_orderkey") % 3 != 0).select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("seq"),
        F.when(F.col("o_orderkey") % 5 == 0, "delete").otherwise("upsert").alias("op"),
        F.round(F.col("o_totalprice"), 2).alias("acctbal"),
        F.concat(F.lit("CDC_"), F.col("o_orderstatus")).alias("segment"),
    )
    return cdc_apply(base, ops, ["custkey"])


_PIT_DATES = ("2024-03-01", "2024-08-01")  # one before, one after the SCD2 cutover


@query(
    "q_pit_join",
    # Point-in-time dimension lookup: each (key, probe date) row joins
    # the SCD2 version valid AT that date — the temporal-correctness
    # join every feature-store / training-data backfill needs (as-of
    # facts must see the dimension as it was, not as it is).  The
    # oracle rebuilds the merged history inline (same derivation as
    # the q_scd2 oracle) and applies the same validity predicate.
    oracle=f"""
    WITH hist AS ({_HIST_SQL}), upd AS ({_UPD_SQL}),
    changed AS (
        SELECT u.c_custkey FROM upd u JOIN hist t USING (c_custkey)
        WHERE t.c_name IS DISTINCT FROM u.c_name
           OR t.c_acctbal IS DISTINCT FROM u.c_acctbal
           OR t.c_mktsegment IS DISTINCT FROM u.c_mktsegment
    ),
    merged AS (
        SELECT t.c_custkey, t.c_name, t.c_acctbal, t.c_mktsegment, t.valid_from,
               CASE WHEN c.c_custkey IS NOT NULL THEN DATE '2024-06-01' END AS valid_to,
               c.c_custkey IS NULL AS is_current
        FROM hist t LEFT JOIN changed c USING (c_custkey)
        UNION ALL
        SELECT u.c_custkey, u.c_name, u.c_acctbal, u.c_mktsegment,
               DATE '2024-06-01', CAST(NULL AS DATE), TRUE
        FROM upd u
        WHERE u.c_custkey IN (SELECT c_custkey FROM changed)
           OR u.c_custkey NOT IN (SELECT c_custkey FROM hist)
    ),
    probes AS (
        SELECT c_custkey, CAST(d AS DATE) AS pit
        FROM (SELECT DISTINCT c_custkey FROM merged),
             (SELECT unnest(['{_PIT_DATES[0]}', '{_PIT_DATES[1]}']) AS d)
    )
    SELECT p.c_custkey, p.pit, m.c_acctbal, m.c_mktsegment, m.is_current
    FROM probes p
    JOIN merged m
      ON p.c_custkey = m.c_custkey
     AND m.valid_from <= p.pit
     AND (m.valid_to IS NULL OR p.pit < m.valid_to)
    """,
)
def q_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join: probe every SCD2 key at {_PIT_DATES} and
    return the dimension version valid at each probe date (validity
    predicate ``valid_from <= pit < valid_to``).  Exactly one version
    matches per (key, pit) by SCD2 construction.

    Scale: equi-join on the key with the validity range as a residual
    predicate inside the key group — one shuffle per side, the same
    non-cartesian shape as the range/as-of joins; at 100 TB the
    history side prunes closed versions via is_current/valid_to
    partitioning before the join.
    """
    hist, upd = _scd2_inputs(spark, sf_dir)
    merged = scd2_apply(hist, upd, _SCD2_KEYS, _SCD2_TRACKED)
    dates = F.array(*[F.lit(d).cast("date") for d in _PIT_DATES])
    probes = merged.select("c_custkey").distinct().select(
        "c_custkey", F.explode(dates).alias("pit")
    )
    cond = (
        (F.col("p.c_custkey") == F.col("m.c_custkey"))
        & (F.col("m.valid_from") <= F.col("p.pit"))
        & (F.col("m.valid_to").isNull() | (F.col("p.pit") < F.col("m.valid_to")))
    )
    return (
        probes.alias("p")
        .join(merged.alias("m"), cond)
        .select(
            F.col("p.c_custkey").alias("c_custkey"),
            F.col("p.pit").alias("pit"),
            F.col("m.c_acctbal").alias("c_acctbal"),
            F.col("m.c_mktsegment").alias("c_mktsegment"),
            F.col("m.is_current").alias("is_current"),
        )
    )
