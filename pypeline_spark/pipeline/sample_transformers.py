"""Sample row transformers exercising the reference's plugin contract:
no-arg constructor, ``filter(row_dict) -> row_dict``, loaded by dotted
path (ref: /root/reference/pypeline/Pype.py:150-162).
"""

from __future__ import annotations


class UppercaseNameTransformer:
    """Uppercases c_name in place."""

    def filter(self, row: dict) -> dict:  # noqa: A003 - reference API name
        row["c_name"] = row["c_name"].upper()
        return row


class AddTierTransformer:
    """Adds a column — allowed because the reference re-reads headers
    per batch (ref: Pype.py:87); requires transformer_schema here."""

    def filter(self, row: dict) -> dict:  # noqa: A003
        row["tier"] = "HIGH" if row["c_acctbal"] > 5000 else "LOW"
        return row


class DropNationTransformer:
    """Drops a column (schema-narrowing transform)."""

    def filter(self, row: dict) -> dict:  # noqa: A003
        row.pop("c_nationkey", None)
        return row


class NativeUppercaseNameTransformer:
    """Fast-path twin of UppercaseNameTransformer: same semantics as
    the row-dict version but as a Catalyst column expression — stays
    JVM-side, codegen-able, no Arrow round-trip."""

    def apply(self, df):
        from pyspark.sql import functions as F

        return df.withColumn("c_name", F.upper(F.col("c_name")))


class NativeAddTierTransformer:
    """Fast-path twin of AddTierTransformer (adds a column natively —
    no transformer_schema needed; Catalyst knows the output type)."""

    def apply(self, df):
        from pyspark.sql import functions as F

        return df.withColumn(
            "tier", F.when(F.col("c_acctbal") > 5000, "HIGH").otherwise("LOW")
        )
