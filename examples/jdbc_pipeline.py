"""Run a YAML pipeline whose TARGET is a live relational database,
loaded with real server-side MERGE INTO — the reference's native
deployment shape (MySQL extract -> transform -> PostgreSQL keyed load,
ref: /root/reference/pypeline/Pype.py:97-148), here against the
embedded Derby that ships on Spark's classpath:

    python examples/jdbc_pipeline.py [sf_dir]

Each keyed step bulk-loads its batch into a staging table via the
executor-parallel JDBC writer, then one atomic `MERGE INTO target
USING stage` applies it — the pipeline runner picks this path
automatically because JdbcMergeCatalog exposes merge_* ops.  Swap the
URL/driver for MySQL 8+/PostgreSQL 15+ in production; the SQL is ANSI.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pypeline_spark.pipeline.runner import Pypeline
from pypeline_spark.pipeline.spec import PipelineConfig
from pypeline_spark.session import get_spark, register_tables
from pypeline_spark.sinks.jdbc_merge import JdbcMergeCatalog

CONFIG = {
    "pypes": {
        "load_accounts": {
            "extract_query": (
                "SELECT c_custkey AS id, c_name, c_acctbal, c_mktsegment "
                "FROM customer WHERE c_custkey <= {max_key}"
            ),
            "target_table": "accounts",
            "type": "upsert",
            "key_columns": ["id"],
        },
        "boost_building": {
            "extract_query": (
                "SELECT id, c_name, c_acctbal + 250.0 AS c_acctbal, "
                "c_mktsegment FROM accounts "
                "WHERE c_mktsegment = 'BUILDING'"
            ),
            "target_table": "accounts",
            "type": "update",
            "key_columns": ["id"],
            # never overwrite the segment label on matched rows
            "fields_excluded_from_update": ["c_mktsegment"],
        },
        "drop_overdrawn": {
            "extract_query": "SELECT id FROM accounts WHERE c_acctbal < 0",
            "target_table": "accounts",
            "type": "delete",
            "identifier": "id",
        },
    },
    "pypelines": {"accounts_etl": ["load_accounts", "boost_building", "drop_overdrawn"]},
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("example_jdbc_pipeline")
    register_tables(spark, sf_dir)

    db = os.path.join(tempfile.mkdtemp(prefix="pypeline_jdbc_"), "derbydb")
    catalog = JdbcMergeCatalog(
        spark,
        f"jdbc:derby:{db};create=true",
        driver="org.apache.derby.jdbc.EmbeddedDriver",
        bulk_size=500,
    )
    runner = Pypeline(
        spark, PipelineConfig.from_dict(CONFIG), catalog=catalog,
        placeholders={"max_key": 400}, debug=True,
    )
    result = runner.run("accounts_etl")
    for step in result.steps:
        print(
            f"{step.name}: rows={step.rows_out} extract={step.extract_secs:.2f}s "
            f"load={step.load_secs:.2f}s rss={step.rss_mb:.0f}MB"
        )
    final = catalog.get("accounts")
    print("final rows in Derby:", final.count())
    final.orderBy("id").show(5)


if __name__ == "__main__":
    main()
