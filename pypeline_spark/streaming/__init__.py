"""Structured Streaming surface: windowed aggregations, watermarks,
sessionization, stateful dedup.

The reference is strictly batch — its incremental story is "re-run the
idempotent keyed pipeline" (ref: /root/reference/pypeline/Pype.py:31-80);
this package adds the native streaming formulation per SURVEY.md §2b.
Every operator has a batch formulation (oracle-testable) and a
streaming runner whose output is asserted equal in tests (availableNow
trigger => deterministic, bounded).
"""


def await_finished(query, timeout_sec: int = 300) -> None:
    """awaitTermination with the timeout actually checked.

    ``StreamingQuery.awaitTermination(t)`` returns False on timeout
    with the query still running; reading the memory sink at that point
    silently yields partial results.  Stop the query and fail loudly
    instead — an availableNow trigger that hasn't drained in ``t``
    seconds is an environment problem a correctness harness must not
    paper over.
    """
    finished = query.awaitTermination(timeout_sec)
    if not finished:
        query.stop()
        raise TimeoutError(
            f"streaming query {query.name!r} did not finish within "
            f"{timeout_sec}s; memory sink would be partial"
        )
