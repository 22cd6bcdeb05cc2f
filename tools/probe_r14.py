"""Round-14 scale probes (r13 verdict directive #7: scale probes for
every new path, with honest fixture-scale adjudication), recorded in
SCALE.md:

1. Feed-through-reorg (directive #2): time a changes() read spanning
   two OPTIMIZE commits vs the full re-snapshot a consumer needed
   before r14 (when any reorg in range poisoned the cursor) — the
   O(changed rows) vs O(table) comparison the read-through exists for.
2. evolve_schema (directive #3): wall time of the metadata-only ADD
   COLUMN vs the full-table rewrite a non-evolving design would pay
   (optimize at the same version).
3. Column mapping (directive #4): read_resolved aggregate on a mapped
   + renamed table vs an identical unmapped table — the alias
   projection should be plan-time noise.
4. Durable vs in-memory IVM sync (directive #5): one incremental sync
   after a delta commit — the durable variant adds one
   group-cardinality MV overwrite commit.

Usage: python tools/probe_r14.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pypeline_spark.operators.ivm import (  # noqa: E402
    DurableRollupMaintainer,
    FeedRollupMaintainer,
)
from pypeline_spark.session import get_spark, load_table  # noqa: E402
from pypeline_spark.sinks.manifest import ManifestTable  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _timed(fn):
    t0 = time.monotonic()
    out = fn()
    return round(time.monotonic() - t0, 3), out


def main() -> None:
    spark = get_spark("probe_r14")
    cust = load_table(spark, SF_DIR, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    k = F.col("c_custkey")
    out: dict = {"sf_dir": SF_DIR, "rows": cust.count()}
    scratch = tempfile.mkdtemp(prefix="probe_r14_")
    try:
        # -- 1. feed-through-reorg vs re-snapshot ------------------------
        t = ManifestTable(os.path.join(scratch, "feed"))
        t.commit_overwrite(cust, batch_id="seed")  # v1
        t.commit_delta(
            cust.filter(k % 10 == 1).withColumn("c_acctbal", F.lit(1.0)),
            ["c_custkey"], batch_id="d1",
        )  # v2
        t.optimize(spark, target_rows=200_000, batch_id="o1")  # v3 reorg
        t.commit_delta(
            cust.filter(k % 10 == 2).withColumn("c_acctbal", F.lit(2.0)),
            ["c_custkey"], batch_id="d2",
        )  # v4
        t.optimize(spark, target_rows=200_000, batch_id="o2")  # v5 reorg
        t.commit_delta(
            cust.filter(k % 10 == 3).withColumn("c_acctbal", F.lit(3.0)),
            ["c_custkey"], batch_id="d3",
        )  # v6
        sec, n = _timed(lambda: t.changes(spark, 1, until_version=6).count())
        out["feed_through_2_reorgs"] = {"sec": sec, "change_rows": n}
        sec, n = _timed(lambda: t.read_resolved(spark).count())
        out["re_snapshot_alternative"] = {"sec": sec, "table_rows": n}

        # -- 2. evolve_schema vs rewrite ---------------------------------
        sec, _ = _timed(
            lambda: t.evolve_schema("probe_col double", batch_id="e1")
        )
        out["evolve_schema_metadata_only"] = {"sec": sec}
        sec, _ = _timed(
            lambda: t.optimize(spark, target_rows=200_000, batch_id="o3")
        )
        out["full_rewrite_alternative"] = {"sec": sec}

        # -- 3. column-mapped read overhead ------------------------------
        plain = ManifestTable(os.path.join(scratch, "plain"))
        plain.commit_overwrite(cust, batch_id="seed")
        plain.commit_delta(
            cust.filter(k % 7 == 0), ["c_custkey"], batch_id="d1"
        )
        mapped = ManifestTable(os.path.join(scratch, "mapped"))
        mapped.commit_overwrite(cust, batch_id="seed")
        mapped.enable_column_mapping(batch_id="cm")
        mapped.rename_column("c_acctbal", "balance", batch_id="rn")
        mapped.commit_delta(
            cust.filter(k % 7 == 0).withColumnRenamed(
                "c_acctbal", "balance"
            ),
            ["c_custkey"], batch_id="d1",
        )

        def _agg(tbl, col):
            return (
                tbl.read_resolved(spark)
                .agg(F.sum(F.floor(F.col(col) * 100)).alias("s"))
                .first()[0]
            )

        sec_plain, v1 = _timed(lambda: _agg(plain, "c_acctbal"))
        sec_mapped, v2 = _timed(lambda: _agg(mapped, "balance"))
        assert v1 == v2, (v1, v2)
        out["read_resolved_unmapped"] = {"sec": sec_plain}
        out["read_resolved_mapped_renamed"] = {"sec": sec_mapped}

        # -- 4. durable vs in-memory IVM sync ----------------------------
        src = ManifestTable(os.path.join(scratch, "ivm_src"))
        src.commit_overwrite(cust, batch_id="seed")
        mem = FeedRollupMaintainer(
            src, ["c_custkey"], "c_mktsegment", "c_acctbal"
        )
        dur = DurableRollupMaintainer(
            src, os.path.join(scratch, "ivm_mv"),
            ["c_custkey"], "c_mktsegment", "c_acctbal",
        )
        mem.sync(spark)
        dur.sync(spark)
        src.commit_delta(
            cust.filter(k % 9 == 4).withColumn("c_acctbal", F.lit(5.0)),
            ["c_custkey"], batch_id="d1",
        )
        sec_mem, _ = _timed(lambda: mem.sync(spark))
        sec_dur, _ = _timed(lambda: dur.sync(spark))
        out["ivm_sync_in_memory"] = {"sec": sec_mem}
        out["ivm_sync_durable"] = {"sec": sec_dur}
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
