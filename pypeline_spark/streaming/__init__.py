"""Structured Streaming surface: windowed aggregations, watermarks,
sessionization, stateful dedup.

The reference is strictly batch — its incremental story is "re-run the
idempotent keyed pipeline" (ref: /root/reference/pypeline/Pype.py:31-80);
this package adds the native streaming formulation per SURVEY.md §2b.
Every operator has a batch formulation (oracle-testable) and a
streaming runner whose output is asserted equal in tests (availableNow
trigger => deterministic, bounded).
"""
