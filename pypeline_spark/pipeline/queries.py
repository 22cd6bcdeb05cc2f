"""End-to-end pipeline runs as oracle-checked queries (Layer A proof).

Each query builds a PipelineConfig in code (the YAML path is covered in
tests), runs it through the full hydrate -> spark.sql extract ->
mapInPandas transformer chain -> keyed sink -> post-query lifecycle,
and returns the final target table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pypeline_spark.pipeline.runner import Pypeline
from pypeline_spark.pipeline.spec import PipelineConfig
from pypeline_spark.registry import query
from pypeline_spark.session import register_tables

_ETL_CONFIG = {
    "pypes": {
        "load_customers": {
            "extract_query": (
                "SELECT c_custkey, c_name, c_acctbal FROM customer "
                "WHERE c_custkey <= {max_key}"
            ),
            "target_table": "dim_customer",
            "type": "upsert",
            "key_columns": ["c_custkey"],
            "transformers": [
                "pypeline_spark.pipeline.sample_transformers.UppercaseNameTransformer",
                "pypeline_spark.pipeline.sample_transformers.AddTierTransformer",
            ],
            "transformer_schema": (
                "c_custkey bigint, c_name string, c_acctbal double, tier string"
            ),
        },
        "boost_low_tier": {
            "extract_query": (
                "SELECT c_custkey, c_name, c_acctbal + 500.0 AS c_acctbal, tier "
                "FROM dim_customer WHERE tier = 'LOW'"
            ),
            "target_table": "dim_customer",
            "type": "update",
            "key_columns": ["c_custkey"],
        },
    },
    "pypelines": {"customer_etl": ["load_customers", "boost_low_tier"]},
}


@query(
    "q_pipeline_etl",
    oracle="""
    WITH base AS (
        SELECT c_custkey, UPPER(c_name) AS c_name, c_acctbal,
               CASE WHEN c_acctbal > 5000 THEN 'HIGH' ELSE 'LOW' END AS tier
        FROM customer WHERE c_custkey <= 600
    )
    SELECT c_custkey, c_name,
           CASE WHEN tier = 'LOW' THEN c_acctbal + 500.0 ELSE c_acctbal END AS c_acctbal,
           tier
    FROM base
    """,
)
def q_pipeline_etl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-step pipeline: upsert-create with a Python transformer chain,
    then an update step reading back from the target — the reference's
    inter-step dataflow-through-database-state, here via temp views."""
    register_tables(spark, sf_dir)
    config = PipelineConfig.from_dict(_ETL_CONFIG)
    pipeline = Pypeline(spark, config, placeholders={"max_key": 600})
    pipeline.run("customer_etl")
    return pipeline.catalog.get("dim_customer")
