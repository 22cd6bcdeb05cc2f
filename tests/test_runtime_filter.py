"""Runtime Bloom-filter semi-join prefilter: no false negatives ever,
real row reduction, join-composition losslessness, and null/empty
edges (operators/runtime_filter.py)."""

import pytest
from pyspark.sql import functions as F

from pypeline_spark.operators.runtime_filter import (
    BLOOM_BITS,
    bloom_prefilter,
    keyset_bloom,
)
from pypeline_spark.session import load_table


@pytest.fixture()
def orders(spark, sf_dir):
    return load_table(spark, sf_dir, "orders")


@pytest.fixture()
def lineitem(spark, sf_dir):
    return load_table(spark, sf_dir, "lineitem")


def test_bitset_shape(spark, orders):
    row = keyset_bloom(orders.select("o_orderkey"), "o_orderkey").collect()
    assert len(row) == 1
    words = row[0]["__bloom_words"]
    bits = row[0]["__bloom_bits"]
    # auto-sized: at least the floor, a whole number of words, and the
    # dense array length must agree with the recorded size
    assert bits >= BLOOM_BITS and bits % 64 == 0
    assert len(words) == bits // 64
    assert any(w != 0 for w in words)


def test_explicit_num_bits_is_pinned(spark, orders):
    row = keyset_bloom(orders.select("o_orderkey"), "o_orderkey",
                       num_bits=BLOOM_BITS).first()
    assert row["__bloom_bits"] == BLOOM_BITS
    assert len(row["__bloom_words"]) == BLOOM_BITS // 64


def test_auto_size_tracks_cardinality(spark):
    """10 bits/key: 100k distinct keys must get ~1M bits (clamped to a
    whole word), far above the floor — the sizing really reads the
    build side, not a constant."""
    dim = spark.range(100_000).select(F.col("id").alias("k"))
    bits = keyset_bloom(dim, "k").first()["__bloom_bits"]
    assert 800_000 <= bits <= 1_400_000  # approx_count_distinct slack
    assert bits % 64 == 0


def test_no_false_negatives(spark, orders, lineitem):
    """Every fact row whose key IS in the dim set must pass the
    prefilter — the bloom may only ever add rows, never drop one."""
    dim = orders.filter(F.col("o_orderkey") % 7 == 0).select("o_orderkey")
    bloom = keyset_bloom(dim, "o_orderkey")
    passed = bloom_prefilter(lineitem, bloom, "l_orderkey")
    true_matches = lineitem.join(
        dim, lineitem["l_orderkey"] == dim["o_orderkey"], "left_semi"
    )
    # true matches minus passed rows must be empty (superset check)
    assert true_matches.exceptAll(passed).count() == 0


def test_prefilter_reduces_rows(spark, orders, lineitem):
    dim = orders.filter(F.col("o_orderkey") % 7 == 0).select("o_orderkey")
    bloom = keyset_bloom(dim, "o_orderkey")
    total = lineitem.count()
    passed = bloom_prefilter(lineitem, bloom, "l_orderkey").count()
    exact = lineitem.join(
        dim, lineitem["l_orderkey"] == dim["o_orderkey"], "left_semi"
    ).count()
    assert exact <= passed < total


def test_join_composition_is_lossless(spark, orders, lineitem):
    """bloom-prefiltered exact join == plain exact join, row for row."""
    dim = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", "o_orderdate"
    )
    plain = lineitem.join(dim, lineitem["l_orderkey"] == dim["o_orderkey"])
    bloom = keyset_bloom(dim, "o_orderkey")
    filtered = bloom_prefilter(lineitem, bloom, "l_orderkey").join(
        dim, F.col("l_orderkey") == dim["o_orderkey"]
    )
    assert plain.exceptAll(filtered).count() == 0
    assert filtered.exceptAll(plain).count() == 0


def test_null_keys_are_dropped_like_an_equi_join(spark):
    dim = spark.createDataFrame(
        [(1,), (None,), (3,)], "k bigint"
    )
    fact = spark.createDataFrame(
        [(1, "a"), (None, "b"), (2, "c"), (3, "d")], "k bigint, v string"
    )
    bloom = keyset_bloom(dim, "k")  # null dim key must not poison the build
    passed = bloom_prefilter(fact, bloom, "k")
    vals = {r.v for r in passed.collect()}
    assert "b" not in vals  # null fact key dropped (equi-join semantics)
    assert {"a", "d"} <= vals  # true matches always pass


def test_empty_dim_rejects_everything(spark, lineitem):
    empty = lineitem.select(F.col("l_orderkey").alias("k")).limit(0)
    bloom = keyset_bloom(empty, "k")
    assert bloom.count() == 1  # bitset row still exists, all zeros
    assert bloom_prefilter(lineitem, bloom, "l_orderkey").count() == 0


def test_fact_side_filter_adds_no_shuffle(spark, lineitem, orders):
    """The prefilter must run map-side: the only Exchanges in the plan
    belong to the bitset BUILD subtree (dim-side aggregation); the fact
    scan flows into the broadcast nested-loop filter with no exchange
    in between."""
    import re

    def shuffles(df):
        # SHUFFLE exchanges only: the bitset broadcast is a (cheap,
        # intended) BroadcastExchange and must not count against us
        plan = df._jdf.queryExecution().executedPlan().toString()
        return len(re.findall(r"(?<!Broadcast)Exchange", plan)), plan

    dim = orders.filter(F.col("o_orderkey") % 7 == 0).select("o_orderkey")
    pre = bloom_prefilter(lineitem, keyset_bloom(dim, "o_orderkey"), "l_orderkey")
    n_pre, plan = shuffles(pre)
    n_build, _ = shuffles(keyset_bloom(dim, "o_orderkey"))
    assert n_pre == n_build, plan
    assert "BroadcastNestedLoopJoin" in plan  # 1-row bitset broadcast


def test_cross_numeric_type_no_false_negatives(spark):
    """The ADVICE-flagged failure class: a bitset built on BIGINT keys
    probed with DOUBLE (or DECIMAL) keys of the same values must pass
    every true match — raw CAST-to-string would hash '5' vs '5.0' and
    silently drop all of them."""
    dim = spark.createDataFrame([(k,) for k in range(1, 50)], "k bigint")
    bloom = keyset_bloom(dim, "k")
    fact_d = spark.createDataFrame(
        [(float(k), f"v{k}") for k in range(1, 50)], "k double, v string"
    )
    assert bloom_prefilter(fact_d, bloom, "k").count() == 49
    fact_dec = spark.sql(
        "SELECT CAST(id AS DECIMAL(10,2)) AS k FROM range(1, 50)"
    )
    assert bloom_prefilter(fact_dec, bloom, "k").count() == 49
    # and the mirror: build on double, probe with bigint
    dim_d = spark.createDataFrame([(float(k),) for k in range(1, 50)],
                                  "k double")
    fact_i = spark.range(1, 50).select(F.col("id").alias("k"))
    assert bloom_prefilter(fact_i, keyset_bloom(dim_d, "k"), "k").count() == 49


def test_fractional_keys_hash_consistently(spark):
    """Non-integral values (double 2.5 vs decimal 2.50) share the
    double-string canonical form."""
    dim = spark.createDataFrame([(2.5,), (7.25,)], "k double")
    bloom = keyset_bloom(dim, "k")
    fact = spark.sql(
        "SELECT CAST(k AS DECIMAL(6,3)) AS k FROM VALUES (2.5),(7.25),(9.125) t(k)"
    )
    passed = {float(r.k) for r in bloom_prefilter(fact, bloom, "k").collect()}
    assert {2.5, 7.25} <= passed


def test_auto_bits_clamps_on_bigint_before_int_cast(spark):
    """ADVICE r11 (medium): the sizing expression must clamp in BIGINT
    and only cast the already-clamped value to int — a pre-clamp int
    cast overflows above ~214M distinct keys (10 bits/key * 2^31/10),
    raising under ANSI or wrapping negative and collapsing the bitset
    to the 8192-bit floor otherwise.  Pin the expression directly at
    n=10^10 (no need to build 10B keys): it must yield exactly the
    MAX_BLOOM_BITS ceiling, positive, as int."""
    from pypeline_spark.operators.runtime_filter import (
        MAX_BLOOM_BITS,
        _auto_bits,
    )

    rows = spark.createDataFrame(
        [(0,), (1,), (100_000,), (250_000_000,), (10_000_000_000,)],
        "n bigint",
    ).select(F.col("n"), _auto_bits(F.col("n")).alias("bits")).collect()
    got = {r.n: r.bits for r in rows}
    assert got[0] == BLOOM_BITS  # floor
    assert got[1] == BLOOM_BITS
    assert got[100_000] == ((100_000 * 10 + 63) // 64) * 64
    assert got[250_000_000] == MAX_BLOOM_BITS  # past the int32 overflow point
    assert got[10_000_000_000] == MAX_BLOOM_BITS
    assert all(b > 0 for b in got.values())


def test_above_2p53_cross_type_no_false_negatives(spark):
    """ADVICE r11 (low): Spark coerces bigint==double to DOUBLE, so
    bigint 2^53+1 join-matches double 9007199254740992.0.  The dual
    canonical-form scheme must keep such rows in BOTH directions —
    and exact-exact probes above 2^53 must still hit via the exact
    form (bigint==bigint / bigint==decimal never go through double)."""
    big = (1 << 53) + 1  # rounds to 2^53 as a double
    dim = spark.createDataFrame([(big,), (7,)], "k bigint")
    bloom = keyset_bloom(dim, "k")

    # double probe carrying the coerced value: the exact join matches
    # (CAST(2^53+1 AS DOUBLE) == 9007199254740992.0), so must we
    fact_d = spark.createDataFrame([(float(1 << 53), "hi")],
                                   "k double, v string")
    assert bloom_prefilter(fact_d, bloom, "k").count() == 1

    # exact bigint probe of the same key: still hits via the exact form
    fact_i = spark.createDataFrame([(big, "x")], "k bigint, v string")
    assert bloom_prefilter(fact_i, bloom, "k").count() == 1

    # decimal probe (exact coercion path) of the exact value
    fact_dec = spark.sql(f"SELECT CAST({big} AS DECIMAL(20,0)) AS k")
    assert bloom_prefilter(fact_dec, bloom, "k").count() == 1

    # mirror: build on the DOUBLE side, probe with the bigint — the
    # probe's coerced form must reach the double-built bits
    dim_d = spark.createDataFrame([(float(1 << 53),)], "k double")
    bloom_d = keyset_bloom(dim_d, "k")
    assert bloom_prefilter(fact_i, bloom_d, "k").count() == 1

    # and a superset sanity: a genuinely absent huge key still filters
    miss = spark.createDataFrame([((1 << 60) + 12345, "no")],
                                 "k bigint, v string")
    assert bloom_prefilter(miss, bloom, "k").count() == 0


def test_kind_mismatch_raises(spark):
    """Numeric-vs-string canonical forms are unrelated: probing must
    raise instead of silently returning false negatives."""
    dim = spark.createDataFrame([("a",), ("b",)], "k string")
    bloom = keyset_bloom(dim, "k")
    fact = spark.range(5).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="built on"):
        bloom_prefilter(fact, bloom, "k")


def test_false_positive_rate_under_bound(spark):
    """Auto-sizing at BITS_PER_KEY=10 with 4 hashes predicts
    (1-e^-0.4)^4 ~ 1.2% FPs; pin a 3% ceiling so a sizing regression
    (or a broken hash family) fails loudly."""
    dim = spark.range(5_000).select(F.col("id").alias("k"))
    bloom = keyset_bloom(dim, "k")
    probe = spark.range(10_000, 30_000).select(F.col("id").alias("k"))
    fp = bloom_prefilter(probe, bloom, "k").count()
    assert fp / 20_000 < 0.03, fp


# -- bit-exactness against a pure-Python reference model ----------------
#
# Same discipline as the manifest bloom builder's reference pin: the
# JVM-expression bitset (md5 hex slices -> pmod -> bit_or words) must
# equal a from-first-principles Python computation bit for bit, so a
# refactor that silently changes the hash family (and with it every
# persisted/broadcast bitset) fails loudly.

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _py_bloom(values, num_bits):
    words = [0] * ((num_bits + 63) // 64)
    for v in values:
        if v is None:
            continue
        h = hashlib.md5(str(v).encode()).hexdigest()
        for i in range(4):
            pos = int(h[8 * i : 8 * i + 8], 16) % num_bits
            words[pos // 64] |= 1 << (pos % 64)
    # Spark bigint is signed: normalize python's unbounded ints
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    keys=st.lists(
        st.one_of(st.integers(-(10**12), 10**12), st.none()),
        min_size=0, max_size=30,
    )
)
def test_bitset_matches_python_reference_ints(spark, keys):
    df = spark.createDataFrame([(k,) for k in keys] or [(None,)], "k bigint")
    if not keys:
        df = df.limit(0)
    got = keyset_bloom(df, "k", num_bits=512).first()["__bloom_words"]
    assert list(got) == _py_bloom(keys, 512)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    keys=st.lists(
        st.text(alphabet=st.characters(codec="ascii",
                                       categories=("L", "N", "P")),
                min_size=0, max_size=12),
        min_size=1, max_size=30,
    )
)
def test_bitset_matches_python_reference_strings(spark, keys):
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = keyset_bloom(df, "k", num_bits=512).first()["__bloom_words"]
    assert list(got) == _py_bloom(keys, 512)
