"""Run the example YAML pipeline end to end on the sf0.001 fixtures.

    python examples/run_pipeline.py [sf_dir]

Mirrors the reference's entry point (ref:
/root/reference/pypeline/Pypeline.py:11-35): load config, construct the
runner, `.run(name, placeholders)` — except sources are parquet-backed
temp views and the work is a distributed DataFrame plan.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pypeline_spark.pipeline.runner import Pypeline
from pypeline_spark.pipeline.spec import PipelineConfig
from pypeline_spark.session import get_spark, register_tables


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("example_pipeline")
    register_tables(spark, sf_dir)

    config = PipelineConfig.from_yaml(
        os.path.join(os.path.dirname(__file__), "customer_etl.yaml")
    )
    runner = Pypeline(spark, config, placeholders={"max_key": 600}, debug=True)
    result = runner.run("customer_etl")

    for step in result.steps:
        total = step.extract_secs + step.transform_secs + step.load_secs
        print(f"step {step.name}: {step.rows_out} rows in {total:.2f}s")
    final = runner.catalog.get("dim_customer")
    final.orderBy("c_custkey").show(5)
    print(f"dim_customer: {final.count()} rows")


if __name__ == "__main__":
    main()
