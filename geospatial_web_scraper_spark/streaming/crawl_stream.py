"""Continuous crawling: seed batches arrive as a stream, each micro-batch
resumes the persistent crawl with the new seeds injected.

The reference's work loop (R1) runs until its channel drains; real crawl
deployments instead receive seed/recrawl requests continuously. This module
closes that gap: ``foreachBatch`` hands every arriving seed batch to
``CrawlEngine.resume_with_seeds`` against ONE persistent ``SnapshotStore``,
so the seen set, the global budget (F10), and the pending frontier carry
across batches, and each batch's rounds commit exactly-once into the store.

Replay safety (foreachBatch is at-least-once): a replayed seed batch
re-injects URLs that are already in the committed seen set — the normal J1
anti-join drops them, so the replay advances nothing and commits nothing
new. The store, not the streaming checkpoint, is the source of truth.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession

from .drain import await_drained
from ..plans.bfs import CrawlEngine
from ..plans.store import SnapshotStore


def run_crawl_stream(
    seeds_stream: DataFrame,
    pages: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    timeout_s: int = 600,
    compact_every: int | None = None,
    **engine_kwargs,
) -> None:
    """Drain available seed batches (availableNow) through the persistent
    crawl. ``seeds_stream`` rows: (seed_order, url, ...). With
    ``compact_every=n`` the store folds its per-round snapshots into one
    base after every n-th batch, keeping restart cost O(1) in stream
    length."""

    def sink(seed_batch: DataFrame, epoch_id: int) -> None:
        if not seed_batch.take(1):
            return
        spark = seed_batch.sparkSession
        store = SnapshotStore(spark, store_dir)
        engine = CrawlEngine(spark, pages, store=store, **engine_kwargs)
        engine.resume_with_seeds(seed_batch)
        if compact_every and (int(epoch_id) + 1) % compact_every == 0:
            store.compact()

    q = (
        seeds_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    await_drained(q, timeout_s)


def stitched_trace(spark: SparkSession, store_dir: str) -> DataFrame:
    """The accumulated crawl trace across every committed round/batch."""
    store = SnapshotStore(spark, store_dir)
    last = store.last_committed()
    if last < 0:
        raise ValueError("nothing committed yet")
    return reduce(DataFrame.unionByName, store.read_series("trace", last))
