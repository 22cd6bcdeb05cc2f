"""Property-based differential tests for round-4 operators against
pure-Python reference models: last-touch attribution (channel-priority
waterfall) and repeated-span detection.  Hypothesis drives small
adversarial inputs — ties, empty channels, boundary-exact lookbacks,
repeated tokens — the fixture data can't be relied on to contain."""

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import Window as W
from pyspark.sql import functions as F

PROP_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

ATTR_WINDOW = 60  # seconds, small so generated streams straddle it

stream = st.lists(
    st.tuples(
        st.integers(0, 200),  # second offset
        st.sampled_from(["click", "view", "purchase"]),
        st.integers(0, 9),  # credited key k
    ),
    min_size=1,
    max_size=16,
)


def _model_attribution(rows):
    """Reference model: scan in (ts, event_id) order, remember last
    click/view; purchases credit click-within-window first, then view,
    else direct."""
    out = {}
    last = {"click": None, "view": None}  # (ts, k)
    for eid, (ts, kind, k) in enumerate(sorted((r for r in rows), key=lambda r: r[0])):
        if kind in last:
            last[kind] = (ts, k)
        else:  # purchase
            if last["click"] and ts - last["click"][0] <= ATTR_WINDOW:
                out[eid] = ("click", last["click"][1])
            elif last["view"] and ts - last["view"][0] <= ATTR_WINDOW:
                out[eid] = ("view", last["view"][1])
            else:
                out[eid] = ("direct", None)
    return out


def _spark_attribution(spark, rows):
    base = pd.Timestamp("2024-01-01")
    data = [
        (eid, (base + pd.Timedelta(seconds=ts)).to_pydatetime(), kind, k)
        for eid, (ts, kind, k) in enumerate(sorted(rows, key=lambda r: r[0]))
    ]
    e = spark.createDataFrame(data, "event_id long, ts timestamp, kind string, k long")
    w = W.orderBy("ts", "event_id").rowsBetween(W.unboundedPreceding, W.currentRow)

    def last(kind, col):
        return F.last(
            F.when(F.col("kind") == kind, F.col(col)), ignorenulls=True
        ).over(w)

    filled = (
        e.withColumn("lct", last("click", "ts"))
        .withColumn("lck", last("click", "k"))
        .withColumn("lvt", last("view", "ts"))
        .withColumn("lvk", last("view", "k"))
    )
    click_ok = F.col("lct").isNotNull() & (
        F.unix_timestamp("ts") - F.unix_timestamp("lct") <= ATTR_WINDOW
    )
    view_ok = F.col("lvt").isNotNull() & (
        F.unix_timestamp("ts") - F.unix_timestamp("lvt") <= ATTR_WINDOW
    )
    out = filled.filter(F.col("kind") == "purchase").select(
        "event_id",
        F.when(click_ok, F.lit("click"))
        .when(view_ok, F.lit("view"))
        .otherwise(F.lit("direct"))
        .alias("channel"),
        F.when(click_ok, F.col("lck")).when(view_ok, F.col("lvk")).alias("ck"),
    )
    return {r.event_id: (r.channel, r.ck) for r in out.collect()}


class TestAttributionProperties:
    @PROP_SETTINGS
    @given(rows=stream)
    def test_matches_reference_model(self, spark, rows):
        assert _spark_attribution(spark, rows) == _model_attribution(rows)


texts = st.lists(
    st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=12).map(
        " ".join
    ),
    min_size=1,
    max_size=6,
)

SPAN_K = 3  # small k so generated docs produce spans


def _model_spans(docs):
    """Reference model of span_rows at k=3: stride-1 windows, dups kept."""
    out = []
    for doc_id, text in enumerate(docs):
        toks = [t for t in text.strip().lower().split() if t]
        for i in range(len(toks) - SPAN_K + 1):
            out.append((doc_id, " ".join(toks[i : i + SPAN_K])))
    return sorted(out)


class TestSpanProperties:
    @PROP_SETTINGS
    @given(docs=texts)
    def test_span_rows_match_reference(self, spark, docs):
        import pypeline_spark.functions.dedup as dd

        df = spark.createDataFrame(
            list(enumerate(docs)), "doc_id long, text string"
        )
        orig = dd.SPAN_K
        dd.SPAN_K = SPAN_K
        try:
            got = sorted(
                (r.doc_id, r.span) for r in dd.span_rows(df).collect()
            )
        finally:
            dd.SPAN_K = orig
        assert got == _model_spans(docs)


seqs = st.lists(
    st.sampled_from(["view", "click", "purchase", "error"]),
    min_size=1,
    max_size=14,
)


def _model_pattern_var(kinds):
    """Reference: python regex over the kind sequence — view (click)*
    purchase, strictly consecutive; one match per starting view."""
    out = []
    for i, k in enumerate(kinds):
        if k != "view":
            continue
        j = i + 1
        while j < len(kinds) and kinds[j] == "click":
            j += 1
        if j < len(kinds) and kinds[j] == "purchase":
            out.append((i, j, j - i - 1))  # (view idx, purchase idx, n_clicks)
    return sorted(out)


class TestPatternVarProperties:
    @PROP_SETTINGS
    @given(kinds=seqs)
    def test_matches_regex_reference(self, spark, kinds):
        base = pd.Timestamp("2024-01-01")
        data = [
            (i, (base + pd.Timedelta(seconds=i)).to_pydatetime(), k)
            for i, k in enumerate(kinds)
        ]
        e = spark.createDataFrame(data, "event_id long, ts timestamp, kind string")
        w = W.orderBy("ts", "event_id")
        seq = e.select(
            "event_id",
            "kind",
            F.row_number().over(w).alias("rn"),
        )
        wf = W.orderBy("rn").rowsBetween(1, W.unboundedFollowing)
        nnc = seq.withColumn(
            "next_nc",
            F.min(F.when(F.col("kind") != "click", F.col("rn"))).over(wf),
        )
        v = nnc.alias("v")
        p = nnc.alias("p")
        got = sorted(
            (r.vi, r.pi, r.nc)
            for r in v.join(p, F.col("p.rn") == F.col("v.next_nc"))
            .filter(
                (F.col("v.kind") == "view") & (F.col("p.kind") == "purchase")
            )
            .select(
                F.col("v.event_id").alias("vi"),
                F.col("p.event_id").alias("pi"),
                (F.col("p.rn") - F.col("v.rn") - 1).alias("nc"),
            )
            .collect()
        )
        assert got == _model_pattern_var(kinds)
