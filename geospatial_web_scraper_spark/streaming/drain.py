"""Bounded, fail-loud draining of availableNow streaming queries.

``StreamingQuery.awaitTermination(timeout)`` returns ``False`` on timeout
WITHOUT stopping the query — batches keep committing in the background
while the caller reads the output table, observing a half-drained store
with no error. Every runner in this package therefore drains through
:func:`await_drained`, which stops the query and raises on timeout so
callers never see partial results silently.
"""

from __future__ import annotations

from pyspark.sql.streaming import StreamingQuery


def await_drained(q: StreamingQuery, timeout_s: float) -> None:
    """Block until ``q`` terminates; on timeout stop it and raise.

    Raises ``TimeoutError`` after best-effort ``q.stop()`` so no batch
    continues committing behind the caller's back. Exceptions raised by
    the query itself propagate unchanged (awaitTermination rethrows them).
    """
    if q.awaitTermination(timeout_s):
        return
    q.stop()
    raise TimeoutError(
        f"streaming query {q.name or q.id} did not drain within "
        f"{timeout_s}s; stopped to prevent background commits"
    )
