"""Streaming sessionization — the continuous form of
``operators.sessions.sessionize``.

The batch operator is already built on ``F.session_window``, which is
exactly Structured Streaming's stateful session construct, so the
streaming form is the SAME aggregation with a watermark in front: state
for a user's open session is kept until the watermark passes the
session's close (last event + gap), then the finished session is emitted
once in append mode. Batch and streaming therefore share semantics by
construction — pinned by tests/test_streaming_sessions.py, which runs
both over the same events and asserts identical rows.

Late data: events older than the watermark are dropped by Spark's
watermark contract (they would otherwise reopen an emitted session —
the same exactly-once reasoning as the harvest stream's epoch tables).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.sessions import sessionize


def session_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "1 minute",
    *,
    ts_col: str = "ts",
    **kwargs,
) -> DataFrame:
    """Watermarked session aggregation over a streaming events source.
    Output schema equals the batch operator's; use append output mode so
    each closed session is emitted exactly once."""
    return sessionize(
        events.withWatermark(ts_col, watermark),
        gap_minutes,
        ts_col=ts_col,
        **kwargs,
    )
