"""Streaming hypertable rollup — the continuous form of
``operators.temporal.rollup_time``'s finest level.

The hypertable architecture splits cleanly across Spark's two engines:
Structured Streaming maintains the FINEST granularity (a watermarked
epoch-aligned tumbling window over the event stream — state per open
bucket, emitted once in append mode when the watermark passes the bucket
close), and the coarser granularities are cheap batch folds over that
already-tiny table via ``temporal.coarsen_rollup`` — raw events are
never rescanned. Both paths share the re-aggregatable stat set
(count / BIGINT micro-unit sum / min / max) and the same floor(v·1e6)
micro-unit expression, so stream == batch row-for-row — pinned by
tests/test_streaming_rollup.py.

Late data: events older than the watermark are dropped by Spark's
watermark contract (they would otherwise reopen an emitted bucket — the
same exactly-once reasoning as the session stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rollup_stream(
    events: DataFrame,
    width_s: int,
    key_cols: list[str],
    value_col: str,
    ts_col: str = "ts",
    watermark: str = "1 minute",
) -> DataFrame:
    """Watermarked finest-level rollup over a streaming events source —
    output schema equals ``rollup_time``'s level-0 rows (``gran_s,
    bucket_start, *key_cols, n, sum_value_micro, min_value, max_value``).
    Use append output mode; feed the emitted table to
    ``temporal.coarsen_rollup`` for the coarser granularities."""
    if int(width_s) <= 0:
        raise ValueError(f"width_s must be positive, got {width_s}")
    v = F.col(value_col)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(ts_col, f"{int(width_s)} seconds").alias("_w"),
            *key_cols,
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(v * F.lit(1_000_000.0))).alias("sum_value_micro"),
            F.min(v).alias("min_value"),
            F.max(v).alias("max_value"),
        )
        .select(
            F.lit(int(width_s)).cast("long").alias("gran_s"),
            F.col("_w.start").cast("timestamp_ntz").alias("bucket_start"),
            *key_cols,
            "n",
            "sum_value_micro",
            "min_value",
            "max_value",
        )
    )
