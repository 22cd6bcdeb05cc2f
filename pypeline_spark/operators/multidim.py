r"""Multi-dimensional analytics: one-pass correlation matrices and
Z-order (Morton) clustering keys for multi-column data skipping.

- **Correlation matrix**: all pairwise Pearson correlations of a set
  of measures in ONE aggregate pass — the profiling step before
  feature selection.  Six ``corr`` expressions share a single scan and
  a single (1-row) aggregate; ``stack`` pivots the row to long form.
  At 100 TB this is the difference between one pass and C(n,2) passes.

- **Z-order key**: interleaves the bits of two bucketed dimensions so
  rows close in (x, y) are close in z.  Sorting/range-partitioning a
  table by z before writing gives every output file a NARROW min/max
  envelope in BOTH dimensions, so a predicate on either column prunes
  files (parquet row-group stats / data-skipping indexes) — the
  standard lakehouse layout trick for multi-dimensional workloads.
  ``sinks/layout.py::write_zordered`` is the writer; the query below
  oracle-checks the bit-interleave arithmetic itself.

Reference connection: delegated-SQL surface made native
(ref: /root/reference/pypeline/Pype.py:36); SURVEY.md §2b.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pypeline_spark.registry import query
from pypeline_spark.session import load_table

Z_BITS = 8  # bits per dimension: z fits in 2*Z_BITS = 16 bits


def zvalue(x: Column, y: Column, bits: int = Z_BITS) -> Column:
    """Morton interleave of two already-bucketed non-negative ints.

    Bit i of x lands at z-bit 2i, bit i of y at 2i+1.  Built from
    shiftleft/shiftright/& only — evaluates inside WholeStageCodegen,
    no UDF.
    """
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(x, i).bitwiseAND(1), 2 * i))
        terms.append(F.shiftleft(F.shiftright(y, i).bitwiseAND(1), 2 * i + 1))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def zbucket(v: Column, lo: Column, hi: Column, bits: int = Z_BITS) -> Column:
    """Scale a value into the z-key's ``bits``-bit domain from its
    [lo, hi] data bounds: floor((v - lo) * 2^bits / (hi - lo + 1)).

    This is the pre-bucketing ``zvalue`` requires for wide domains — a
    plain ``& mask`` WRAPS (the bucket cycles through the range), which
    destroys the per-file envelope on the raw column and with it the
    whole point of the clustering.  ``lo``/``hi`` normally come from a
    broadcast 1-row min/max aggregate (the same shape the lakehouse
    OPTIMIZE command computes before clustering).

    Values OUTSIDE [lo, hi] clamp to the domain edges instead of
    producing a negative / overflowing bucket whose bits would wrap
    inside the interleave (ADVICE r11: a merge-on-read OPTIMIZE that
    took bounds from base-file stats could feed delta rows past the
    recorded range).  Clamping only coarsens the envelope of the edge
    buckets; in-range values bucket exactly as before."""
    span = hi - lo + 1
    raw = ((v - lo) * (1 << bits) / span).cast("int")
    return F.greatest(F.lit(0), F.least(F.lit((1 << bits) - 1), raw))


def zvalue_n(buckets: Sequence[Column], bits: int = Z_BITS) -> Column:
    """K-dimensional Morton interleave of already-bucketed non-negative
    ints (the ``OPTIMIZE ... ZORDER BY (c1, .., ck)`` key): bit i of
    dimension j lands at z-bit ``k*i + j``, so ``zvalue_n([x, y])``
    produces exactly :func:`zvalue`'s 2-D layout.  Buckets are widened
    to bigint before shifting — k*bits z-bits overflow a 32-bit shift
    at k >= 4 — and the whole expression stays shiftleft/shiftright/&
    arithmetic inside WholeStageCodegen, no UDF.

    The z key must fit the POSITIVE bigint range: ``k * bits`` z-bits
    above 63 would shift into the sign bit (k=8 at the default 8 bits)
    or wrap the shift mod 64 (k>=9), silently colliding / mis-ordering
    Morton keys — layout-only damage, but it defeats the clustering
    the key exists for (ADVICE r12), so this RAISES instead.  The fix
    belongs at the call site, not here: buckets were already scaled to
    ``bits`` by :func:`zbucket`, so silently interleaving fewer bits
    would drop their HIGH bits (bucket 0 colliding with bucket 128) —
    callers must shrink bits-per-dimension for the bucketing and the
    interleave TOGETHER (``bits = min(bits, 63 // k)``, what
    ``ManifestTable._cluster_for_rewrite`` does)."""
    k = len(buckets)
    if k == 0:
        raise ValueError("zvalue_n needs at least one bucketed dimension")
    if k * bits > 63:
        raise ValueError(
            f"{k} dimensions x {bits} bits = {k * bits} z-bits > 63: the "
            "interleave would reach the bigint sign bit (k=8) or wrap the "
            "shift mod 64 (k>=9) — shrink bits per dimension "
            f"(min({bits}, 63 // {k}) = {min(bits, 63 // k)}) in BOTH the "
            "bucketing and the interleave"
        )
    terms = []
    for i in range(bits):
        for j, b in enumerate(buckets):
            terms.append(
                F.shiftleft(
                    F.shiftright(b.cast("bigint"), i).bitwiseAND(1),
                    k * i + j,
                )
            )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def _zvalue_sql(x: str, y: str, bits: int = Z_BITS) -> str:
    """The same interleave in portable SQL (DuckDB `<<`/`>>`/`&`)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


_MEASURES = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def _pairs():
    cols = _MEASURES
    return [(cols[i], cols[j]) for i in range(len(cols)) for j in range(i + 1, len(cols))]


@query(
    "q_corr_matrix",
    oracle="\nUNION ALL\n".join(
        f"SELECT '{a}' AS col_x, '{b}' AS col_y,"
        # + 0.0 folds IEEE -0.0 (a possible ROUND output) to +0.0
        f" ROUND(corr({a}, {b}), 3) + 0.0 AS r FROM lineitem"
        for a, b in _pairs()
    ),
)
def q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations of 4 lineitem measures, one pass.

    All six ``corr`` aggregates share a single scan + single 1-row
    aggregate; ``stack`` unpivots to (col_x, col_y, r) long form.
    """
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.agg(
        *[
            (F.round(F.corr(a, b), 3) + F.lit(0.0)).alias(f"c{i}")
            for i, (a, b) in enumerate(_pairs())
        ]
    )
    stack_args = ", ".join(
        f"'{a}', '{b}', c{i}" for i, (a, b) in enumerate(_pairs())
    )
    return wide.selectExpr(
        f"stack({len(_pairs())}, {stack_args}) AS (col_x, col_y, r)"
    )


@query(
    "q_zorder",
    oracle=f"""
    WITH z AS (
        SELECT ({_zvalue_sql(f"(l_partkey % {1 << Z_BITS})", f"(l_suppkey % {1 << Z_BITS})")})
               AS zv
        FROM lineitem
    )
    SELECT CAST(zv // 256 AS INT) AS z_bucket,
           COUNT(*) AS n_rows,
           CAST(MIN(zv) AS INT) AS z_min,
           CAST(MAX(zv) AS INT) AS z_max
    FROM z GROUP BY z_bucket
    """,
)
def q_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order key distribution over (l_partkey, l_suppkey) buckets.

    Oracle-checks the bit-interleave arithmetic; the layout writer
    (``sinks/layout.py``) range-partitions on this key so parquet
    min/max stats prune on BOTH dimensions.
    """
    li = load_table(spark, sf_dir, "lineitem")
    mask = (1 << Z_BITS) - 1
    zv = zvalue(
        F.col("l_partkey").bitwiseAND(mask), F.col("l_suppkey").bitwiseAND(mask)
    )
    # % on positives == & mask here; & keeps the DuckDB side (%) exact too
    return (
        li.select(zv.alias("zv"))
        .groupBy(F.expr("zv div 256").cast("int").alias("z_bucket"))
        .agg(
            F.count("*").alias("n_rows"),
            F.min("zv").cast("int").alias("z_min"),
            F.max("zv").cast("int").alias("z_max"),
        )
    )
