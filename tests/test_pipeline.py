"""Layer A unit tests: spec validation, hydration, transformer chain,
YAML loading, end-to-end runner semantics (SURVEY.md §5)."""

import textwrap

import pytest

from pypeline_spark.pipeline.hydrate import HydrationError, hydrate_query
from pypeline_spark.pipeline.runner import Pypeline
from pypeline_spark.pipeline.spec import PipelineConfig, PypeSpec, SpecError
from pypeline_spark.pipeline.transformers import apply_transform_chain, load_transformers
from pypeline_spark.session import register_tables


class TestHydration:
    def test_basic_substitution(self):
        assert (
            hydrate_query("SELECT * FROM t WHERE x = {x} AND y = '{y}'", {"x": 5, "y": "a"})
            == "SELECT * FROM t WHERE x = 5 AND y = 'a'"
        )

    def test_unresolved_placeholder_raises(self):
        # the reference silently ships {typo} to the engine; we fail fast
        with pytest.raises(HydrationError, match="missing"):
            hydrate_query("SELECT {missing}", {})

    def test_offset_suffix(self):
        # vestigial OFFSET path (ref: Pype.py:174-175) kept functional
        assert hydrate_query("SELECT 1", {}, offset=30) == "SELECT 1 OFFSET 30"

    def test_no_placeholders_passthrough(self):
        assert hydrate_query("SELECT 1") == "SELECT 1"


class TestSpec:
    def test_missing_extract_query(self):
        with pytest.raises(SpecError, match="extract_query"):
            PypeSpec(name="x", extract_query="", target_table="t")

    def test_bad_type(self):
        with pytest.raises(SpecError, match="not in"):
            PypeSpec(name="x", extract_query="SELECT 1", target_table="t", type="merge")

    def test_delete_requires_identifier(self):
        with pytest.raises(SpecError, match="identifier"):
            PypeSpec(name="x", extract_query="SELECT 1", target_table="t", type="delete")

    def test_unknown_pype_in_pipeline(self):
        # the reference's validation here is a typo'd no-op (Pypeline.py:43)
        with pytest.raises(SpecError, match="unknown pypes"):
            PipelineConfig.from_dict(
                {
                    "pypes": {
                        "a": {"extract_query": "SELECT 1", "target_table": "t"}
                    },
                    "pypelines": {"p": ["a", "ghost"]},
                }
            )

    def test_unknown_config_key(self):
        with pytest.raises(SpecError, match="unknown config keys"):
            PipelineConfig.from_dict(
                {
                    "pypes": {
                        "a": {
                            "extract_query": "SELECT 1",
                            "target_table": "t",
                            "bulk_sizee": 10,
                        }
                    },
                    "pypelines": {"p": ["a"]},
                }
            )

    def test_yaml_roundtrip(self, tmp_path):
        cfg = textwrap.dedent(
            """
            pypes:
              step1:
                extract_query: SELECT c_custkey AS id, c_name FROM customer
                target_table: names
                type: overwrite
            pypelines:
              demo: [step1]
            """
        )
        path = tmp_path / "cfg.yaml"
        path.write_text(cfg)
        config = PipelineConfig.from_yaml(str(path))
        assert config.get_pypes("demo")[0].target_table == "names"


class TestTransformers:
    def test_load_by_dotted_path(self):
        chain = load_transformers(
            ["pypeline_spark.pipeline.sample_transformers.AddTierTransformer"]
        )
        assert chain[0].filter({"c_acctbal": 9000})["tier"] == "HIGH"

    def test_bad_path_raises(self):
        with pytest.raises(ModuleNotFoundError):
            load_transformers(["no.such.module.Cls"])
        with pytest.raises(ValueError, match="dotted path"):
            load_transformers(["JustAClass"])

    def test_chain_order_and_schema_change(self, spark, sf_dir):
        register_tables(spark, sf_dir)
        df = spark.sql("SELECT c_custkey, c_name, c_acctbal FROM customer LIMIT 20")
        chain = load_transformers(
            [
                "pypeline_spark.pipeline.sample_transformers.UppercaseNameTransformer",
                "pypeline_spark.pipeline.sample_transformers.AddTierTransformer",
            ]
        )
        out = apply_transform_chain(
            df, chain, "c_custkey bigint, c_name string, c_acctbal double, tier string"
        )
        rows = out.collect()
        assert len(rows) == 20
        assert all(r.c_name == r.c_name.upper() for r in rows)
        assert {r.tier for r in rows} <= {"HIGH", "LOW"}

    def test_empty_chain_is_identity(self, spark, sf_dir):
        register_tables(spark, sf_dir)
        df = spark.sql("SELECT 1 AS one")
        assert apply_transform_chain(df, []) is df

    def test_native_chain_matches_row_chain(self, spark, sf_dir):
        register_tables(spark, sf_dir)
        df = spark.sql("SELECT c_custkey, c_name, c_acctbal FROM customer LIMIT 50")
        row_chain = load_transformers(
            [
                "pypeline_spark.pipeline.sample_transformers.UppercaseNameTransformer",
                "pypeline_spark.pipeline.sample_transformers.AddTierTransformer",
            ]
        )
        native_chain = load_transformers(
            [
                "pypeline_spark.pipeline.sample_transformers.NativeUppercaseNameTransformer",
                "pypeline_spark.pipeline.sample_transformers.NativeAddTierTransformer",
            ]
        )
        schema = "c_custkey bigint, c_name string, c_acctbal double, tier string"
        via_rows = sorted(map(tuple, apply_transform_chain(df, row_chain, schema).collect()))
        via_native = sorted(map(tuple, apply_transform_chain(df, native_chain).collect()))
        assert via_rows == via_native

    def test_native_chain_compiles_to_pure_catalyst(self, spark, sf_dir):
        """No Python anywhere in the plan when every transformer is
        native: the chain must be Catalyst expressions only."""
        register_tables(spark, sf_dir)
        df = spark.sql("SELECT c_custkey, c_name, c_acctbal FROM customer")
        chain = load_transformers(
            [
                "pypeline_spark.pipeline.sample_transformers.NativeUppercaseNameTransformer",
                "pypeline_spark.pipeline.sample_transformers.NativeAddTierTransformer",
            ]
        )
        out = apply_transform_chain(df, chain)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "MapInPandas" not in plan
        assert "EvalPython" not in plan

    def test_mixed_chain_batches_row_runs(self, spark, sf_dir):
        """native / row / row / native: the two row transformers share
        ONE mapInPandas pass and the natives stay JVM-side."""
        register_tables(spark, sf_dir)
        df = spark.sql("SELECT c_custkey, c_name, c_acctbal FROM customer LIMIT 50")
        chain = load_transformers(
            [
                "pypeline_spark.pipeline.sample_transformers.NativeUppercaseNameTransformer",
                "pypeline_spark.pipeline.sample_transformers.AddTierTransformer",
                "pypeline_spark.pipeline.sample_transformers.DropNationTransformer",
                "pypeline_spark.pipeline.sample_transformers.NativeAddTierTransformer",
            ]
        )
        out = apply_transform_chain(
            df, chain, "c_custkey bigint, c_name string, c_acctbal double, tier string"
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("MapInPandas") == 1
        rows = out.collect()
        assert len(rows) == 50
        assert all(r.c_name == r.c_name.upper() and r.tier in ("HIGH", "LOW") for r in rows)


class TestRunner:
    def test_etl_pipeline_end_to_end(self, spark, sf_dir):
        from pypeline_spark.pipeline.queries import _ETL_CONFIG

        register_tables(spark, sf_dir)
        config = PipelineConfig.from_dict(_ETL_CONFIG)
        p = Pypeline(spark, config, placeholders={"max_key": 100}, debug=True)
        result = p.run("customer_etl")
        assert len(result.steps) == 2
        # debug telemetry parity with the reference (Pype.py:65-75):
        # per-step rows in/out + wall-times + process RSS; rows_in
        # comes from the Observation API (rides the sink action)
        assert all(
            s.rows_in > 0 and s.rows_out > 0 and s.rss_mb > 0
            for s in result.steps
        )
        final = p.catalog.get("dim_customer")
        rows = {r.c_custkey: r for r in final.collect()}
        assert all(r.tier in ("HIGH", "LOW") for r in rows.values())
        # update step boosted only LOW tier
        base = {
            r.c_custkey: r.c_acctbal
            for r in spark.sql(
                "SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey <= 100"
            ).collect()
        }
        for k, r in rows.items():
            if r.tier == "LOW":
                assert r.c_acctbal == pytest.approx(base[k] + 500.0)
            else:
                assert r.c_acctbal == pytest.approx(base[k])

    def test_runtime_placeholder_override(self, spark, sf_dir):
        from pypeline_spark.pipeline.queries import _ETL_CONFIG

        register_tables(spark, sf_dir)
        config = PipelineConfig.from_dict(_ETL_CONFIG)
        p = Pypeline(spark, config, placeholders={"max_key": 100})
        p.run("customer_etl", placeholders={"max_key": 10})
        expected = spark.sql("SELECT count(*) AS n FROM customer WHERE c_custkey <= 10").collect()[0].n
        assert p.catalog.get("dim_customer").count() == expected

    def test_post_query_runs_on_target_view(self, spark, sf_dir):
        register_tables(spark, sf_dir)
        config = PipelineConfig.from_dict(
            {
                "pypes": {
                    "s": {
                        "extract_query": "SELECT c_custkey AS id, c_acctbal FROM customer LIMIT 5",
                        "target_table": "t_post",
                        "type": "overwrite",
                        "post_query": (
                            "CREATE OR REPLACE TEMP VIEW t_post_summary AS "
                            "SELECT count(*) AS n FROM t_post"
                        ),
                    }
                },
                "pypelines": {"p": ["s"]},
            }
        )
        Pypeline(spark, config).run("p")
        assert spark.sql("SELECT n FROM t_post_summary").collect()[0].n == 5


class TestMaterialization:
    def test_step_target_does_not_reexecute_prior_steps(self, spark, sf_dir):
        """MemoryCatalog.put cuts lineage (localCheckpoint): after a
        2-step run, the stored target's plan must scan the materialized
        RDD — not replay step 1's extract over the source tables."""
        from pypeline_spark.pipeline.queries import _ETL_CONFIG

        register_tables(spark, sf_dir)
        config = PipelineConfig.from_dict(_ETL_CONFIG)
        p = Pypeline(spark, config, placeholders={"max_key": 100})
        p.run("customer_etl")
        plan = p.catalog.get("dim_customer")._jdf.queryExecution().optimizedPlan().toString()
        assert "ExistingRDD" in plan or "LogicalRDD" in plan, plan
        # no source scan, no merge join, no Python chain in the target
        assert "customer" not in plan.lower().replace("dim_customer", "")
        assert "Join" not in plan and "MapInPandas" not in plan, plan

    def test_parquet_catalog_swaps_tmp_into_place(self, spark, tmp_path):
        """put() writes ONCE to a tmp dir and renames it into place —
        read-modify-write against the live path stays correct and no
        tmp residue survives."""
        from pypeline_spark.sinks.keyed import ParquetCatalog

        import os

        cat = ParquetCatalog(str(tmp_path / "db"))
        cat.put("t", spark.range(5).withColumnRenamed("id", "k"))
        # new value derived from the CURRENT stored value (the RMW shape)
        cur = cat.get("t")
        cat.put("t", cur.unionByName(spark.range(5, 8).withColumnRenamed("id", "k")))
        assert sorted(r.k for r in cat.get("t").collect()) == list(range(8))
        assert not os.path.exists(str(tmp_path / "db" / "t.__tmp__"))


class TestRestartability:
    def test_rerun_after_midrun_failure_converges(self, spark, sf_dir, tmp_path, monkeypatch):
        """Kill a 3-step pipeline inside step 3, rerun it, and assert
        the durable target equals an uninterrupted run — the
        reference's partially-applied-but-idempotent contract
        (Pype.py:148 per-batch commit + idempotent keyed upsert)."""
        from pypeline_spark.sinks.keyed import ParquetCatalog

        register_tables(spark, sf_dir)
        config = PipelineConfig.from_dict(
            {
                "pypes": {
                    "seed": {
                        "extract_query": (
                            "SELECT c_custkey AS id, c_name, c_acctbal "
                            "FROM customer WHERE c_custkey <= 50"
                        ),
                        "target_table": "cust",
                        "type": "upsert",
                        "key_columns": ["id"],
                    },
                    "boost": {
                        "extract_query": (
                            "SELECT id, c_name, c_acctbal + 100.0 AS c_acctbal "
                            "FROM cust WHERE id <= 20"
                        ),
                        "target_table": "cust",
                        "type": "upsert",
                        "key_columns": ["id"],
                    },
                    "label": {
                        "extract_query": "SELECT id, c_name, c_acctbal FROM cust",
                        "target_table": "cust",
                        # overwrite: the reshape adds a column, and an
                        # upsert would align to the old target schema
                        "type": "overwrite",
                        "key_columns": ["id"],
                        "transformers": [
                            "pypeline_spark.pipeline.sample_transformers.ExplodingTransformer",
                            "pypeline_spark.pipeline.sample_transformers.AddTierTransformer",
                        ],
                        "transformer_schema": (
                            "id bigint, c_name string, c_acctbal double, tier string"
                        ),
                    },
                },
                "pypelines": {"p": ["seed", "boost", "label"]},
            }
        )

        def run_once(root: str) -> dict:
            cat = ParquetCatalog(root)
            Pypeline(spark, config, catalog=cat).run("p")
            return {r.id: (r.c_acctbal, r.tier) for r in cat.get("cust").collect()}

        # uninterrupted reference run
        expected = run_once(str(tmp_path / "clean"))

        # interrupted run: steps 1-2 commit, step 3 dies mid-flight
        crash_root = str(tmp_path / "crashy")
        cat = ParquetCatalog(crash_root)
        monkeypatch.setenv("SPARK_GRAFT_EXPLODE", "1")
        with pytest.raises(Exception, match="injected mid-run failure"):
            Pypeline(spark, config, catalog=cat).run("p")
        monkeypatch.delenv("SPARK_GRAFT_EXPLODE")
        # partial state is durable: steps 1-2 applied, no tier column yet
        partial = ParquetCatalog(crash_root).get("cust")
        assert partial is not None and "tier" not in partial.columns

        # rerun from the top over the partial state -> converges
        assert run_once(crash_root) == expected

    def test_crash_inside_put_swap_never_loses_standing_table(self, spark, tmp_path):
        """put() renames the standing table ASIDE (path.__old__) before
        renaming tmp into place, so a crash at ANY point inside the swap
        leaves a complete copy on disk.  Simulate each crash window's
        on-disk state and assert get()/put() recover the table instead
        of treating the batch as a first load (the failure the old
        rmtree-then-rename protocol had)."""
        import os
        import shutil

        from pypeline_spark.sinks.keyed import ParquetCatalog

        root = str(tmp_path / "db")
        cat = ParquetCatalog(root)
        cat.put("t", spark.range(10).withColumnRenamed("id", "k"))
        path = os.path.join(root, "t")

        # window 1: crashed between rename-aside and rename-into-place
        # (path missing, __old__ holds the only standing copy, __tmp__
        # holds the half-committed batch)
        os.rename(path, path + ".__old__")
        shutil.copytree(path + ".__old__", path + ".__tmp__")
        got = cat.get("t")
        assert got is not None and got.count() == 10  # served, not None
        # get() serves the aside copy WITHOUT renaming it back: a reader
        # in another process racing a live writer's swap window must not
        # mutate the layout the writer's final rename depends on.  Only
        # put() (the single writer) heals the directory state.
        assert not os.path.exists(path) and os.path.exists(path + ".__old__")

        # a read-modify-write put over the aside copy converges AND heals
        cur = cat.get("t")
        cat.put("t", cur.unionByName(spark.range(10, 12).withColumnRenamed("id", "k")))
        assert cat.get("t").count() == 12
        assert os.path.exists(path) and not os.path.exists(path + ".__old__")
        assert not os.path.exists(path + ".__tmp__")

        # window 2: crashed after rename-into-place but before cleanup
        # (both path and __old__ present) — get() serves the NEW table
        shutil.copytree(path, path + ".__old__")
        assert cat.get("t").count() == 12
        cat.put("t", spark.range(3).withColumnRenamed("id", "k"))
        assert cat.get("t").count() == 3
        assert not os.path.exists(path + ".__old__")
        assert not os.path.exists(path + ".__tmp__")


class TestMidChainSchemaEvolution:
    def test_schema_list_lets_row_run_reshape_before_native_step(self, spark, sf_dir):
        """row(reshape) -> native(consumes reshaped col) -> row(reshape):
        a per-run schema list gives every row run its own output schema,
        matching the reference's per-batch header re-read (Pype.py:87)."""
        register_tables(spark, sf_dir)
        df = spark.sql("SELECT c_custkey, c_name, c_acctbal FROM customer LIMIT 30")
        chain = load_transformers(
            [
                # run 1 (row): drop c_name, add name_word0 + n_words
                "pypeline_spark.pipeline.sample_transformers.SplitNameTransformer",
                # native: consumes the reshaped n_words column
                "pypeline_spark.pipeline.sample_transformers.NativeAddTierTransformer",
                # run 2 (row): column-preserving
                "pypeline_spark.pipeline.sample_transformers.ExplodingTransformer",
            ]
        )
        out = apply_transform_chain(
            df,
            chain,
            [
                "c_custkey bigint, c_acctbal double, name_word0 string, n_words bigint",
                "c_custkey bigint, c_acctbal double, name_word0 string, n_words bigint, tier string",
            ],
        )
        rows = out.collect()
        assert len(rows) == 30
        assert all(r.n_words >= 1 and r.tier in ("HIGH", "LOW") for r in rows)
        assert "c_name" not in out.columns

    def test_schema_list_length_mismatch_raises(self, spark, sf_dir):
        register_tables(spark, sf_dir)
        df = spark.sql("SELECT c_custkey, c_name, c_acctbal FROM customer LIMIT 5")
        chain = load_transformers(
            ["pypeline_spark.pipeline.sample_transformers.AddTierTransformer"]
        )
        with pytest.raises(ValueError, match="1 row-transformer runs"):
            apply_transform_chain(df, chain, ["a int", "b int"])


def test_cdc_step_requires_key_columns():
    import pytest as _pytest

    from pypeline_spark.pipeline.spec import PipelineConfig, SpecError

    bad = {
        "pypes": {
            "apply": {
                "extract_query": "SELECT 1 AS custkey, 1 AS seq, 'upsert' AS op",
                "target_table": "t",
                "type": "cdc",
                "key_columns": [],
            }
        },
        "pypelines": {"p": ["apply"]},
    }
    with _pytest.raises(SpecError, match="requires key_columns"):
        PipelineConfig.from_dict(bad)


def test_cdc_step_first_batch_creates_from_survivors(spark):
    """A cdc step against a missing target applies the compacted log
    to an empty base: survivors insert, deletes vanish."""
    from pypeline_spark.pipeline.runner import Pypeline
    from pypeline_spark.pipeline.spec import PipelineConfig

    spark.createDataFrame(
        [(1, 10, "upsert", "a"), (1, 20, "delete", None), (2, 5, "upsert", "b")],
        "k int, seq int, op string, v string",
    ).createOrReplaceTempView("__cdc_log__")
    config = PipelineConfig.from_dict(
        {
            "pypes": {
                "apply": {
                    "extract_query": "SELECT k, seq, op, v FROM __cdc_log__",
                    "target_table": "t_new",
                    "type": "cdc",
                    "key_columns": ["k"],
                }
            },
            "pypelines": {"p": ["apply"]},
        }
    )
    pipe = Pypeline(spark, config)
    pipe.run("p")
    assert {(r.k, r.v) for r in pipe.catalog.get("t_new").collect()} == {(2, "b")}


class TestDedupStep:
    def test_exact_dedup_step_drops_seen_and_internal(self, spark):
        from pypeline_spark.pipeline.runner import Pypeline
        from pypeline_spark.pipeline.spec import PipelineConfig

        spark.createDataFrame(
            [(1, "alpha beta gamma"), (2, "delta epsilon zeta")],
            "doc_id bigint, text string",
        ).createOrReplaceTempView("__seed_docs__")
        spark.createDataFrame(
            [
                (10, "alpha beta gamma"),   # dup of seed -> dropped
                (11, "eta theta iota"),     # new -> kept
                (12, "eta theta iota"),     # internal dup of 11 -> dropped
            ],
            "doc_id bigint, text string",
        ).createOrReplaceTempView("__batch_docs__")
        config = PipelineConfig.from_dict(
            {
                "pypes": {
                    "seed": {
                        "extract_query": "SELECT * FROM __seed_docs__",
                        "target_table": "corpus",
                        "type": "overwrite",
                    },
                    "ingest": {
                        "extract_query": "SELECT * FROM __batch_docs__",
                        "target_table": "corpus",
                        "type": "dedup",
                        "dedup_method": "exact",
                        "key_columns": ["doc_id"],
                    },
                },
                "pypelines": {"p": ["seed", "ingest"]},
            }
        )
        pipe = Pypeline(spark, config)
        pipe.run("p")
        assert {r.doc_id for r in pipe.catalog.get("corpus").collect()} == {1, 2, 11}

    def test_minhash_dedup_step_drops_near_dups(self, spark):
        from pypeline_spark.pipeline.runner import Pypeline
        from pypeline_spark.pipeline.spec import PipelineConfig

        base = "the quick brown fox jumps over the lazy dog again and again"
        near = base + " tonight"  # high-Jaccard shingle overlap
        far = "completely different words about spark shuffles and parquet scans"
        spark.createDataFrame(
            [(1, base)], "doc_id bigint, text string"
        ).createOrReplaceTempView("__seed_docs__")
        spark.createDataFrame(
            [(10, near), (11, far)], "doc_id bigint, text string"
        ).createOrReplaceTempView("__batch_docs__")
        config = PipelineConfig.from_dict(
            {
                "pypes": {
                    "seed": {
                        "extract_query": "SELECT * FROM __seed_docs__",
                        "target_table": "corpus",
                        "type": "overwrite",
                    },
                    "ingest": {
                        "extract_query": "SELECT * FROM __batch_docs__",
                        "target_table": "corpus",
                        "type": "dedup",
                        "dedup_method": "minhash",
                        "key_columns": ["doc_id"],
                    },
                },
                "pypelines": {"p": ["seed", "ingest"]},
            }
        )
        pipe = Pypeline(spark, config)
        pipe.run("p")
        assert {r.doc_id for r in pipe.catalog.get("corpus").collect()} == {1, 11}

    def test_dedup_spec_validation(self):
        import pytest

        from pypeline_spark.pipeline.spec import PypeSpec, SpecError

        with pytest.raises(SpecError, match="dedup_method"):
            PypeSpec(
                name="x",
                extract_query="SELECT 1",
                target_table="t",
                type="dedup",
                dedup_method="bogus",
            )
