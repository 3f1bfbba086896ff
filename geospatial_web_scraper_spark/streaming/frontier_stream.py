"""Structured-Streaming expression of the crawl dataflow.

The reference's channel loop (R1, ``crawler.go:49-75``) maps naturally onto
round-synchronous batches, which is how plans.bfs implements it. This module
provides the streaming-native alternative for *continuous* ingest: pages
arrive as a stream (new WARC segments landing), and each micro-batch runs
one frontier expansion against the accumulated seen state via
``foreachBatch`` (exactly-once per-batch semantics, the streaming analog of
the snapshot commit).

Also: watermarked per-host fetch-rate aggregation over ``warc_ts`` — the
streaming form of the lineage table (K4) with late-data tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.urls import url_host


def host_rate_stream(pages_stream: DataFrame, window: str = "1 minute",
                     watermark: str = "2 minutes") -> DataFrame:
    """Per-host page-ingest rates with event-time windows + watermark
    (late WARC records beyond the watermark are dropped, not double-counted)."""
    return (
        pages_stream.withColumn("host", url_host(F.col("url")))
        .withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window), F.col("host"))
        .agg(
            F.count("*").alias("pages"),
            F.sum(F.length("html")).alias("bytes"),
        )
    )


def run_stream_once(pages_stream: DataFrame, sink_fn) -> None:
    """Drive one round of micro-batches synchronously (test/smoke harness):
    ``sink_fn(batch_df, epoch_id)`` is the foreachBatch body — e.g. a single
    CrawlEngine round against the batch's pages."""
    q = (
        pages_stream.writeStream.outputMode("update")
        .foreachBatch(sink_fn)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
