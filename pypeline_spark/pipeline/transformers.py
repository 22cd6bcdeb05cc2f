"""Dynamic transformer loading and the row-wise transform chain.

Reference contract: each transformer is a dotted-path class whose name
is the last path segment, instantiated with no args, exposing
``filter(row_dict) -> row_dict``; the chain applies in config order,
row by row (ref: /root/reference/pypeline/Pype.py:51-52,150-162).

Spark-first execution: instead of a serial driver-side map, the chain
runs inside ``mapInPandas`` — each Arrow batch is converted to row
dicts, pushed through the chain, and rebuilt.  This preserves the
reference's exact per-row dict semantics (including transforms that
add or drop keys, which the reference permits because it re-reads
headers per batch, ref: Pype.py:87) while distributing across
executors.  Transformers are pickled into the task closure once, not
per row.

For transforms expressible as column expressions, prefer a native
``df.transform`` chain — the UDF path exists for parity with arbitrary
Python.
"""

from __future__ import annotations

import importlib
from typing import Iterable, Iterator, Optional, Protocol, Sequence

import pandas as pd
from pyspark.sql import DataFrame


class RowTransformer(Protocol):
    def filter(self, row: dict) -> dict:  # noqa: A003 - reference API name
        ...


class NativeTransformer(Protocol):
    """Fast-path plugin: column logic as a DataFrame->DataFrame step.

    A transformer exposing ``apply`` participates in the same dotted-
    path loading and chain ordering as the row-dict contract, but runs
    as native Catalyst expressions — no Arrow round-trip, no Python
    workers, full codegen/pushdown.  A chain of only native
    transformers compiles to a pure JVM plan (asserted in
    tests/test_pipeline.py)."""

    def apply(self, df: DataFrame) -> DataFrame: ...


def dynamic_import(module_path: str, class_name: str):
    """Import ``class_name`` from ``module_path``.

    Same convention as the reference loader (ref: Pype.py:150-162):
    the class name is the final dotted segment.
    """
    mod = importlib.import_module(module_path)
    return getattr(mod, class_name)


def load_transformers(names: Iterable[str]) -> list[RowTransformer]:
    """Instantiate each 'pkg.mod.ClassName' transformer, no-arg ctor."""
    out: list[RowTransformer] = []
    for dotted in names:
        module_path, _, class_name = dotted.rpartition(".")
        if not module_path:
            raise ValueError(f"transformer {dotted!r} must be a dotted path")
        cls = dynamic_import(module_path, class_name)
        out.append(cls())
    return out


def apply_transform_chain(
    df: DataFrame,
    transformers: Sequence[RowTransformer],
    output_schema: Optional[object] = None,
) -> DataFrame:
    """Run the transform chain, native steps on the JVM fast path.

    Transformers exposing ``apply`` (NativeTransformer) are applied
    directly to the DataFrame — they stay inside Catalyst.  Row-dict
    transformers (the reference's ``filter`` contract) are grouped into
    maximal consecutive runs, each run executing as ONE ``mapInPandas``
    pass over Arrow batches (one Python round-trip per run, not per
    transformer).

    ``output_schema`` declares the output columns when a row-dict run
    reshapes rows, and mirrors the reference's per-batch evolving
    header (ref: Pype.py:87) under a statically-typed engine:

    - a single DDL string applies to the FINAL row run (earlier runs
      must preserve the column set) — the common case;
    - a LIST of DDL strings maps one-to-one onto the row-dict runs in
      chain order, so ANY run may reshape — including one sandwiched
      before a native step that consumes the reshaped columns (full
      mid-chain schema evolution).
    """
    if not transformers:
        return df
    chain = list(transformers)
    is_row = [not hasattr(t, "apply") for t in chain]

    # Split row-dict transformers into maximal consecutive runs to know
    # how many mapInPandas passes a schema list must cover.
    n_row_runs = sum(
        1 for i, r in enumerate(is_row) if r and (i == 0 or not is_row[i - 1])
    )
    schema_list: Optional[list[str]] = None
    if output_schema is not None and not isinstance(output_schema, str):
        schema_list = list(output_schema)
        if len(schema_list) != n_row_runs:
            raise ValueError(
                f"transformer_schema list has {len(schema_list)} entries "
                f"but the chain has {n_row_runs} row-transformer runs"
            )
    run_no = 0

    def flush(df: DataFrame, run_chain: list, is_last: bool) -> DataFrame:
        nonlocal run_no
        if schema_list is not None:
            schema = schema_list[run_no]
        elif is_last and output_schema:
            schema = output_schema
        else:
            schema = df.schema
        run_no += 1

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = pdf.to_dict("records")
                for t in run_chain:
                    rows = [t.filter(r) for r in rows]
                yield pd.DataFrame(rows) if rows else pdf.iloc[0:0]

        return df.mapInPandas(run, schema=schema)

    pending: list = []
    last_row_idx = max(
        (i for i, t in enumerate(chain) if not hasattr(t, "apply")), default=-1
    )
    for i, t in enumerate(chain):
        if hasattr(t, "apply"):
            if pending:
                df = flush(df, pending, is_last=False)
                pending = []
            df = t.apply(df)
        else:
            pending.append(t)
            if i == last_row_idx:
                df = flush(df, pending, is_last=True)
                pending = []
    return df
