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


class SplitNameTransformer:
    """Schema-EVOLVING row transform: replaces c_name with name_word0 /
    n_words — exercises mid-chain evolution (a per-run schema list),
    matching the reference's per-batch header re-read (Pype.py:87)."""

    def filter(self, row: dict) -> dict:  # noqa: A003
        words = row.pop("c_name").split()
        row["name_word0"] = words[0] if words else ""
        row["n_words"] = len(words)
        return row


class ExplodingTransformer:
    """Raises while processing rows when SPARK_GRAFT_EXPLODE=1 at
    DRIVER-side construction time (the flag rides into the task closure
    with the pickled instance, so it works regardless of when executor
    Python workers were forked) — used by the restartability test to
    kill a pipeline mid-run (the reference's partial-apply crash mode,
    Pype.py:148)."""

    def __init__(self) -> None:
        import os

        self.explode = os.environ.get("SPARK_GRAFT_EXPLODE") == "1"

    def filter(self, row: dict) -> dict:  # noqa: A003
        if self.explode:
            raise RuntimeError("injected mid-run failure")
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
