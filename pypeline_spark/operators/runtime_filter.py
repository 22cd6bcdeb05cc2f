"""Explicit runtime Bloom-filter semi-join prefilter.

The classic big-join shuffle reducer: when a selective dimension-side
predicate leaves a key set too large (or too late-bound) to broadcast
as an exact IN-list, compress it into a fixed-size Bloom bitset,
broadcast THAT, and drop non-matching fact rows map-side BEFORE the
join shuffle.  False positives are scrubbed by the exact join that
follows, so the composition is lossless; false negatives are
impossible (``tests/test_runtime_filter.py`` pins both, including
across numeric types — see the canonicalization notes below).

Spark's optimizer applies this internally (runtime row-level
filtering, ``spark.sql.optimizer.runtime.bloomFilter.enabled``), but
its ``bloom_filter_agg`` / ``might_contain`` expressions are not on
the public function path in this build — and an engine-level operator
wants the semantics under test control.  This implementation stays
ENTIRELY inside built-in JVM expressions on both sides:

- build: key -> canonical string -> 4 positions from md5 hex slices
  -> ``explode`` -> per-word ``bit_or`` partial aggregation (map-side
  combined) -> ONE 1-row DataFrame holding the bitset as
  ``array<bigint>`` plus its own size (``__bloom_bits``);
- probe: the 1-row bitset is broadcast onto the fact and each row
  tests its 4 positions with ``element_at``/``shiftright``/``&`` —
  whole-stage-codegen arithmetic, no Python, no UDF.  The modulus
  comes from the bitset row itself, so a probe can never index with
  a size the build didn't use.

Canonicalization: keys are hashed through a canonical string form,
NOT a raw ``CAST(col AS STRING)``.  Raw casts render the same number
differently per type (bigint ``5`` -> ``'5'``, double -> ``'5.0'``,
decimal(10,2) -> ``'5.00'``), so a bitset built on one numeric type
probed with another would set/test DIFFERENT bits — silent false
negatives, the one failure the operator promises is impossible.  The
scheme mirrors the manifest bloom index's ``_bloom_canon``
(sinks/manifest.py): integral-valued numbers hash as their integer
string, other reals as their double string; non-numeric types keep
the plain string cast.  A numeric build probed by a non-numeric
column (or vice versa) cannot be made consistent, so
:func:`bloom_prefilter` raises on a category mismatch instead of
silently dropping rows (the bitset carries its key category in
column metadata).

One subtlety keeps the no-false-negative contract true above 2^53:
Spark coerces an exact-vs-fractional equi-join (bigint==double,
decimal==double) to DOUBLE, so bigint ``2^53+1`` JOIN-matches double
``9007199254740992.0`` even though their exact integer strings
differ.  Hashing only the exact form would drop that fact row.  So
every numeric key contributes TWO canonical forms — its exact form
and its double-coerced form (the bigint the value rounds to through
a double, or the double string when it exceeds bigint range) — and
the build sets bits for both whenever they differ (only values with
magnitude > 2^53, i.e. never at typical key scales).  The probe
tests its exact form OR, when its own two forms differ, its coerced
form.  Whatever coercion the downstream join applies (exact-exact
stays exact, anything-vs-fractional goes through double), the form
the join effectively compares is present on both sides, so the
prefilter remains a superset of the exact join for every numeric
type pair.  ``tests/test_runtime_filter.py`` pins the >2^53 cases
in both directions.

Sizing: by default the build derives ``num_bits`` from the dimension
side itself — an ``approx_count_distinct`` subquery feeds
``~BITS_PER_KEY`` bits per expected key (~1-2% false positives at 4
hashes), clamped to [``BLOOM_BITS``, ``MAX_BLOOM_BITS``].  The sizing
is computed INSIDE the plan (a 1-row aggregate broadcast onto the
build), so no driver-side action runs.  Scale: the bitset costs
``num_bits/8`` bytes regardless of key count (2**27 bits = 16 MiB
covers ~13M keys at 10 bits/key).  The fact-side scan does 4 integer
hashes per row and the join shuffle afterwards carries only rows
that might match — at a 5% match rate that is a ~20x shuffle-volume
cut for one broadcast of KBs..MBs.  The build side is one
partial-aggregated pass over the dimension keys plus the sizing
aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

BLOOM_BITS = 8192  # auto-size floor (also the test-scale default)
MAX_BLOOM_BITS = 1 << 27  # 16 MiB broadcast ceiling (~13M keys)
BITS_PER_KEY = 10  # ~1.2% FP at 4 hashes (load 0.4 per hash)
_N_HASHES = 4
_WORDS_COL = "__bloom_words"
_BITS_COL = "__bloom_bits"
_KIND_META = "pypeline.bloom.kind"

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_FRACTIONAL = (T.FloatType, T.DoubleType, T.DecimalType)


def _kind(dtype: T.DataType) -> str:
    """Key category for build/probe compatibility: all numeric types
    share one canonical form ('num'); everything else is its own
    category keyed by the Spark type name."""
    if isinstance(dtype, _INTEGRAL + _FRACTIONAL):
        return "num"
    return dtype.simpleString()


def _canon(col: Column, dtype: T.DataType) -> Column:
    """Canonical string form of a key for bloom hashing (the Spark-
    expression mirror of ``ManifestTable._bloom_canon``): integral
    values -> integer string, other reals -> double string, non-
    numerics -> plain string cast.  ``try_cast`` keeps the integral
    probe ANSI-safe (overflow/NaN/Inf fall through to the double
    branch instead of raising)."""
    if isinstance(dtype, _INTEGRAL):
        return col.cast("bigint").cast("string")
    if isinstance(dtype, _FRACTIONAL):
        as_big = col.try_cast("bigint")
        return F.when(
            as_big.isNotNull() & (as_big.cast("double") == col.cast("double")),
            as_big.cast("string"),
        ).otherwise(col.cast("double").cast("string"))
    return col.cast("string")


def _canon_coerced(col: Column, dtype: T.DataType) -> Column:
    """The DOUBLE-COERCED canonical form: the key as the exact join
    would see it after Spark widens an exact-vs-fractional comparison
    to double.  Integral-valued doubles that fit a bigint render as
    that bigint's string; everything else as the double string.  For
    values below 2^53 this coincides with :func:`_canon`; above it
    the two forms differ, and build/probe handle both (see module
    docstring)."""
    if not isinstance(dtype, _INTEGRAL + _FRACTIONAL):
        return col.cast("string")
    as_dbl = col.cast("double")
    rt = as_dbl.try_cast("bigint")
    return F.when(
        rt.isNotNull() & (rt.cast("double") == as_dbl), rt.cast("string")
    ).otherwise(as_dbl.cast("string"))


def _auto_bits(n: Column) -> Column:
    """Bitset size (int) from an expected-distinct-key count:
    ``BITS_PER_KEY`` bits per key rounded up to a whole 64-bit word,
    clamped to [``BLOOM_BITS``, ``MAX_BLOOM_BITS``].  The clamp runs
    ENTIRELY in bigint and only the already-clamped value (<= 2^27)
    casts down to int — a pre-clamp int cast would overflow above
    ~214M distinct keys and, outside ANSI mode, wrap negative so the
    ``greatest`` floor silently collapsed the bitset to 8192 bits
    (~100% FP).  Pinned in tests/test_runtime_filter.py at n=10^10."""
    raw = F.ceil(n.cast("bigint") * BITS_PER_KEY / F.lit(64.0)) * 64
    return (
        F.greatest(
            F.lit(BLOOM_BITS).cast("bigint"),
            F.least(F.lit(MAX_BLOOM_BITS).cast("bigint"), raw.cast("bigint")),
        )
        .cast("int")
    )


def _positions(canon: Column, bits: Column) -> list[Column]:
    """4 bit positions per key from independent md5 hex slices of the
    canonical key string (the manifest bloom index uses the same hash
    family; this module keeps its own copy so the broadcast filter
    and the file index can version independently)."""
    h = F.md5(canon)
    return [
        F.pmod(
            F.conv(F.substring(h, 1 + 8 * i, 8), 16, 10).cast("bigint"),
            bits,
        )
        for i in range(_N_HASHES)
    ]


def keyset_bloom(
    df: DataFrame, col: str, num_bits: int | None = None
) -> DataFrame:
    """ONE-row DataFrame whose ``__bloom_words`` column is a dense
    ``array<bigint>`` Bloom bitset over ``df[col]`` (nulls ignored —
    an equi-join never matches them anyway) and whose
    ``__bloom_bits`` column records the bitset size the probe must
    use.  Built fully distributed: per-word partial ``bit_or``
    aggregates combine map-side, and only ``num_bits/64``
    (word, bits) pairs reach the final assembly.

    ``num_bits=None`` (default) auto-sizes from the build side: an
    in-plan ``approx_count_distinct`` allocates ``BITS_PER_KEY`` bits
    per expected key, clamped to [BLOOM_BITS, MAX_BLOOM_BITS] and
    rounded up to a whole word.  Pass an explicit ``num_bits`` to pin
    the size (reproducibility / the reference-model tests)."""
    dtype = df.schema[col].dataType
    keys = df.where(F.col(col).isNotNull()).select(
        _canon(F.col(col), dtype).alias("__k"),
        _canon_coerced(F.col(col), dtype).alias("__kc"),
    )
    if num_bits is None:
        sizing = keys.agg(F.approx_count_distinct("__k").alias("n")).select(
            _auto_bits(F.col("n")).alias(_BITS_COL)
        )
    else:
        sizing = df.sparkSession.range(1).select(
            F.lit(int(num_bits)).alias(_BITS_COL)
        )
    bits_col = F.col(_BITS_COL)
    # each key sets its exact-form positions, plus its double-coerced
    # form's positions when the two differ (|value| > 2^53 only) — the
    # dual emission that keeps cross-type probes false-negative-free.
    exact_pos = F.array(*_positions(F.col("__k"), bits_col))
    coerced_pos = F.when(
        F.col("__kc") != F.col("__k"),
        F.array(*_positions(F.col("__kc"), bits_col)),
    ).otherwise(F.array().cast(T.ArrayType(T.LongType())))
    bits = (
        keys.crossJoin(F.broadcast(sizing))
        .select(F.explode(F.concat(exact_pos, coerced_pos)).alias("pos"))
        .select(
            F.floor(F.col("pos") / 64).cast("int").alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias(
                "bit"
            ),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("word"))
    )
    # assemble the dense word array in index order; absent words are 0.
    # groupBy().agg on an empty input still yields one row (empty map),
    # so an empty key set produces an all-zero bitset, not zero rows.
    return (
        bits.groupBy()
        .agg(
            F.map_from_arrays(
                F.collect_list("w"), F.collect_list("word")
            ).alias("m")
        )
        .crossJoin(F.broadcast(sizing))
        .select(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.expr(f"CAST(({_BITS_COL} + 63) DIV 64 AS INT) - 1"),
                ),
                # try_element_at: NULL (not an ANSI error) on absent words
                lambda i: F.coalesce(
                    F.try_element_at(F.col("m"), i), F.lit(0).cast("bigint")
                ),
            ).alias(_WORDS_COL, metadata={_KIND_META: _kind(dtype)}),
            bits_col,
        )
    )


def bloom_prefilter(fact: DataFrame, bloom: DataFrame, col: str) -> DataFrame:
    """Keep only fact rows whose ``col`` MIGHT be in the key set behind
    ``bloom`` (a :func:`keyset_bloom` result).  Superset of the exact
    semi-join (no false negatives); rows with a null key are dropped,
    matching equi-join semantics.  The 1-row bitset is broadcast, so
    the filter runs map-side with zero added shuffle.  The modulus is
    read from the bitset row itself (``__bloom_bits``), so probe and
    build can never disagree on the bit space.

    Raises ``ValueError`` when the fact column's key category differs
    from the one the bitset was built on (numeric vs non-numeric —
    their canonical forms are unrelated, so probing would silently
    produce false negatives instead of a superset)."""
    dtype = fact.schema[col].dataType
    built_kind = (
        bloom.schema[_WORDS_COL].metadata.get(_KIND_META)
        if _WORDS_COL in bloom.columns
        else None
    )
    if built_kind is not None and built_kind != _kind(dtype):
        raise ValueError(
            f"bloom_prefilter: bitset was built on a {built_kind!r} key "
            f"but probe column {col!r} is {_kind(dtype)!r} "
            f"({dtype.simpleString()}); canonical forms differ, which "
            "would cause silent false negatives"
        )
    out = fact.crossJoin(F.broadcast(bloom)).withColumns(
        {
            "__ke": _canon(F.col(col), dtype),
            "__kc": _canon_coerced(F.col(col), dtype),
        }
    )
    exact_cols = [f"__bp{i}" for i in range(_N_HASHES)]
    coerced_cols = [f"__bq{i}" for i in range(_N_HASHES)]
    out = out.withColumns(
        dict(
            zip(exact_cols, _positions(F.col("__ke"), F.col(_BITS_COL)))
        )
        | dict(
            zip(coerced_cols, _positions(F.col("__kc"), F.col(_BITS_COL)))
        )
    )

    def _all_hit(names: list[str]) -> Column:
        cond = None
        for name in names:
            hit = F.expr(
                f"(shiftright(element_at({_WORDS_COL}, CAST({name} DIV 64 AS INT) + 1),"
                f" CAST({name} % 64 AS INT)) & 1) = 1"
            )
            cond = hit if cond is None else cond & hit
        return cond

    # exact-form hit, OR — only when the probe value's coerced form
    # differs (|value| > 2^53) — a coerced-form hit.  The inequality
    # guard short-circuits the second 4-bit test for ordinary keys.
    cond = _all_hit(exact_cols) | (
        (F.col("__kc") != F.col("__ke")) & _all_hit(coerced_cols)
    )
    return out.filter(cond).drop(
        _WORDS_COL, _BITS_COL, "__ke", "__kc", *exact_cols, *coerced_cols
    )


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
    compresses it to one broadcastable bitset (auto-sized from the
    key cardinality), and lineitem is bloom-prefiltered MAP-SIDE
    before the exact equi-join and revenue aggregate.  Result is
    identical to the plain join (oracle); only the shuffle volume
    changes.

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
