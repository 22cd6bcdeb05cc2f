"""Keyed sinks: upsert / update / delete merge semantics on DataFrames.

The native form of the reference's three load modes
(ref: /root/reference/pypeline/Pype.py:97-130,179-186).
"""

from pypeline_spark.sinks.keyed import (  # noqa: F401
    MemoryCatalog,
    ParquetCatalog,
    delete_by_keys,
    update_only,
    upsert,
)
