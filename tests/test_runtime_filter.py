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
    assert len(words) == BLOOM_BITS // 64
    assert any(w != 0 for w in words)


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
