"""Gap-based sessionization of the events stream.

Crawl/web logs get cut into sessions — maximal event runs per user where
consecutive gaps stay under a threshold — before any behavioral analysis.
The Spark-first form is NOT a per-user ``lag``/running-sum window over raw
events but the native ``F.session_window`` GROUPBY: a hash aggregation
(map-side partial merge of overlapping windows, one shuffle on user_id)
that Catalyst plans without any window operator, and the same construct
Structured Streaming uses for stateful session windows — so the batch and
streaming forms share semantics.

Boundary semantics (pinned by tests): an event at ``t2`` joins its
predecessor's session iff ``t2 - t1 <= gap`` — the boundary is
INCLUSIVE (Spark merges a window starting exactly at the previous
window's end). Equal timestamps always share a session, so the result
is independent of any tiebreak order.

Determinism: session membership is pure timestamp arithmetic; the value
sum is accumulated in integer cents (``round(value·100)`` BIGINT) before
the order-independent sum — the repo's micro-unit rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """One row per (user, session): ``(user_id, session_start TIMESTAMP,
    session_end TIMESTAMP, n_events BIGINT, first_event BIGINT,
    value_sum DOUBLE)`` — start/end are the first/last event timestamps
    (not the gap-extended window end, which no other engine reproduces).
    """
    cents = (
        F.round(F.col(value_col) * 100, 0).cast("long").alias("_cents")
    )
    return (
        events.select(
            F.col(user_col).alias("user_id"),
            F.col(ts_col).alias("_ts"),
            F.col(id_col).alias("_eid"),
            cents,
        )
        .groupBy(
            "user_id", F.session_window("_ts", f"{gap_minutes} minutes")
        )
        .agg(
            F.min("_ts").alias("session_start"),
            F.max("_ts").alias("session_end"),
            F.count("*").cast("long").alias("n_events"),
            F.min("_eid").cast("long").alias("first_event"),
            F.round(F.sum("_cents") / 100.0, 2).alias("value_sum"),
        )
        .drop("session_window")
    )
