"""Explicit runtime Bloom-filter semi-join prefilter.

The classic big-join shuffle reducer: when a selective dimension-side
predicate leaves a key set too large (or too late-bound) to broadcast
as an exact IN-list, compress it into a fixed-size Bloom bitset,
broadcast THAT, and drop non-matching fact rows map-side BEFORE the
join shuffle.  False positives are scrubbed by the exact join that
follows, so the composition is lossless; false negatives are
impossible (``tests/test_runtime_filter.py`` pins both).

Spark's optimizer applies this internally (runtime row-level
filtering, ``spark.sql.optimizer.runtime.bloomFilter.enabled``), but
its ``bloom_filter_agg`` / ``might_contain`` expressions are not on
the public function path in this build — and an engine-level operator
wants the semantics under test control.  This implementation stays
ENTIRELY inside built-in JVM expressions on both sides:

- build: key -> 4 positions from md5 hex slices -> ``explode`` ->
  per-word ``bit_or`` partial aggregation (map-side combined) ->
  ONE 1-row DataFrame holding the bitset as ``array<bigint>``;
- probe: the 1-row bitset is broadcast onto the fact and each row
  tests its 4 positions with ``element_at``/``shiftright``/``&`` —
  whole-stage-codegen arithmetic, no Python, no UDF.

Scale: the bitset costs ``num_bits/8`` bytes regardless of key count
(size it at ~10 bits per expected distinct key for ~1% false
positives: 2**27 bits = 16 MiB covers ~13M keys).  The fact-side scan
does 4 integer hashes per row and the join shuffle afterwards carries
only rows that might match — at a 5% match rate that is a ~20x
shuffle-volume cut for one broadcast of KBs..MBs.  The build side is
one partial-aggregated pass over the dimension keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BLOOM_BITS = 8192  # default sized for test-scale key sets (~1k keys)
_N_HASHES = 4
_WORDS_COL = "__bloom_words"


def _positions(col: str, num_bits: int) -> list[Column]:
    """4 bit positions per key from independent md5 hex slices (the
    manifest bloom index uses the same hash family; this module keeps
    its own copy so the broadcast filter and the file index can
    version independently)."""
    h = F.md5(F.col(col).cast("string"))
    return [
        F.pmod(
            F.conv(F.substring(h, 1 + 8 * i, 8), 16, 10).cast("bigint"),
            F.lit(num_bits),
        )
        for i in range(_N_HASHES)
    ]


def keyset_bloom(df: DataFrame, col: str, num_bits: int = BLOOM_BITS) -> DataFrame:
    """ONE-row DataFrame whose ``__bloom_words`` column is a dense
    ``array<bigint>`` Bloom bitset over ``df[col]`` (nulls ignored —
    an equi-join never matches them anyway).  Built fully distributed:
    per-word partial ``bit_or`` aggregates combine map-side, and only
    ``num_bits/64`` (word, bits) pairs reach the final assembly."""
    n_words = (num_bits + 63) // 64
    bits = (
        df.where(F.col(col).isNotNull())
        .select(F.explode(F.array(*_positions(col, num_bits))).alias("pos"))
        .select(
            F.floor(F.col("pos") / 64).cast("int").alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("word"))
    )
    # assemble the dense word array in index order; absent words are 0
    return bits.groupBy().agg(
        F.map_from_arrays(F.collect_list("w"), F.collect_list("word")).alias("m")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_words - 1)),
            # try_element_at: NULL (not an ANSI error) on absent words
            lambda i: F.coalesce(
                F.try_element_at(F.col("m"), i), F.lit(0).cast("bigint")
            ),
        ).alias(_WORDS_COL)
    )


def bloom_prefilter(
    fact: DataFrame, bloom: DataFrame, col: str, num_bits: int = BLOOM_BITS
) -> DataFrame:
    """Keep only fact rows whose ``col`` MIGHT be in the key set behind
    ``bloom`` (a :func:`keyset_bloom` result).  Superset of the exact
    semi-join (no false negatives); rows with a null key are dropped,
    matching equi-join semantics.  The 1-row bitset is broadcast, so
    the filter runs map-side with zero added shuffle."""
    out = fact.crossJoin(F.broadcast(bloom))
    pos_cols = [f"__bp{i}" for i in range(_N_HASHES)]
    for name, p in zip(pos_cols, _positions(col, num_bits)):
        out = out.withColumn(name, p)
    cond = None
    for name in pos_cols:
        hit = F.expr(
            f"(shiftright(element_at({_WORDS_COL}, CAST({name} DIV 64 AS INT) + 1),"
            f" CAST({name} % 64 AS INT)) & 1) = 1"
        )
        cond = hit if cond is None else cond & hit
    return out.filter(cond).drop(_WORDS_COL, *pos_cols)


from pyspark.sql import SparkSession  # noqa: E402  (query section)

from pypeline_spark.registry import query  # noqa: E402
from pypeline_spark.session import load_table  # noqa: E402


@query(
    "q_bloom_join",
    # The oracle is the PLAIN exact join: the bloom prefilter admits a
    # superset of the matching fact rows (false positives only, never
    # false negatives) and the exact join that follows scrubs the
    # false positives, so bloom-prefiltered join == plain join — the
    # hash match proves the runtime filter is lossless end to end.
    # Shuffle-volume reduction (the point of the operator) is pinned
    # separately in tests/test_runtime_filter.py.
    oracle="""
    SELECT l.l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100
                               + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT' AND o.o_orderstatus = 'F'
    GROUP BY l.l_returnflag
    """,
)
def q_bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-filtered fact join: a selective orders predicate
    (URGENT + finished) defines the key set, :func:`keyset_bloom`
    compresses it to one broadcastable bitset, and lineitem is
    bloom-prefiltered MAP-SIDE before the exact equi-join and revenue
    aggregate.  Result is identical to the plain join (oracle); only
    the shuffle volume changes.

    Scale: at 100 TB the fact shuffle is the dominant cost of a
    selective dim join; the bitset stays KBs..MBs however many keys
    the predicate selects, while an exact broadcast IN-list grows with
    the key set.  Everything here is whole-stage-codegen JVM
    arithmetic — no UDF touches the hot path.
    """
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_orderstatus") == "F")
        )
        .select("o_orderkey")
    )
    bloom = keyset_bloom(o, "o_orderkey")
    fact = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"
    )
    pre = bloom_prefilter(fact, bloom, "l_orderkey")
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5
    ).cast("bigint")
    return (
        pre.join(o, pre["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_returnflag")
        .agg(
            F.count("*").cast("bigint").alias("n_items"),
            F.sum(cents).cast("bigint").alias("revenue_cents"),
        )
    )
