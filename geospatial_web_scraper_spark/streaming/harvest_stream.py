"""Continuous-ingest harvest: pages stream → cross-batch first-wins URL
dedup → X2 metadata extraction → exactly-once parquet sink.

The streaming analog of the batch X2 harvest (``metadata.go:139-216`` via
``operators.extract.extract_meta_udf``): page segments land continuously
(new WARC drops), and each micro-batch extracts metadata for URLs never
seen in any earlier batch, appending to one harvest table.

Exactly-once without a transactional table format: the epoch-partitioned
idempotent-overwrite pattern. ``foreachBatch`` may replay a batch after a
failure (same ``epoch_id``, same input — the file source is replayable
from the checkpoint), so every batch writes ONLY its own ``epoch=<id>``
partition with dynamic partition overwrite; a replay overwrites that
partition in place instead of appending duplicates. The seen-set needs no
second table: it IS the harvest table restricted to ``epoch < current``
(partition pruning makes that cheap), which also makes the replayed
anti-join read exactly the state the original attempt saw.

At cluster scale the anti-join's left side is one micro-batch (small) and
the right side is the accumulated seen table keyed by URL — the same J1
shape as the batch engine (``plans/bfs.py``); nothing here collects to the
driver and no HTML bytes are shuffled (the extraction UDF runs in the
batch's own scan partitions).
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException
from pyspark.sql.window import Window

from ..operators.extract import extract_meta_udf

from .drain import await_drained


def meta_table_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "meta")


def make_harvest_sink(
    out_dir: str,
    languages: tuple[str, ...] | None = None,
    min_quality: float | None = None,
) -> Callable[[DataFrame, int], None]:
    """Build the ``foreachBatch`` body.

    Within-batch duplicate URLs are resolved deterministically (keep the
    row with the smallest ``md5(html)`` — a stream has no crawl order, so
    F1's first-wins is replaced by a stable, replay-safe tiebreak);
    cross-batch duplicates lose to any earlier epoch via the anti-join.

    ``languages`` / ``min_quality`` optionally gate the extracted text with
    the curation exprs (``operators.textstats``) — streaming curation-lite.
    Gated-out URLs are still WRITTEN (``kept=false``) so the seen set stays
    a pure URL decision: a re-arrival of a rejected URL loses the anti-join
    instead of being re-judged; :func:`harvest_table` returns kept rows.
    """
    meta_dir = meta_table_dir(out_dir)

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        w_cols = [c for c in ("url", "html", "status", "content_type")
                  if c in batch_df.columns]
        one_per_url = (
            batch_df.select(*w_cols)
            .withColumn(
                "_rk",
                F.row_number().over(
                    Window.partitionBy("url").orderBy(
                        F.md5(F.col("html").cast("binary"))
                    )
                ),
            )
            .where(F.col("_rk") == 1)
            .drop("_rk")
        )
        try:
            seen = (
                spark.read.parquet(meta_dir)
                .where(F.col("epoch") < F.lit(int(epoch_id)))
                .select("url")
            )
            fresh = one_per_url.join(seen, "url", "left_anti")
        except AnalysisException:
            # first batch: no table yet
            fresh = one_per_url
        meta = fresh.select(
            "url",
            extract_meta_udf(F.col("html"), F.col("url")).alias("_m"),
        ).select("url", "_m.title", "_m.description", "_m.keywords")
        gate = F.lit(True)
        if languages is not None or min_quality is not None:
            from ..operators.textstats import lang_id_expr, quality_score_expr

            if languages is not None:
                gate = gate & lang_id_expr(F.col("description")).isin(*languages)
            if min_quality is not None:
                gate = gate & (
                    quality_score_expr(F.col("description")) >= min_quality
                )
        # NULL description => NULL gate; coalesce so kept is strictly
        # boolean (the docstring contract: gated-out URLs land kept=false)
        meta = meta.withColumn("kept", F.coalesce(gate, F.lit(False)))
        (
            meta.withColumn("epoch", F.lit(int(epoch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(meta_dir)
        )

    return sink


def run_harvest_stream(
    pages_stream: DataFrame, out_dir: str, checkpoint_dir: str,
    timeout_s: int = 300,
    languages: tuple[str, ...] | None = None,
    min_quality: float | None = None,
) -> None:
    """Drain the available input through the harvest sink (availableNow),
    checkpointed so a restarted query resumes at the failed epoch and the
    idempotent partition overwrite absorbs the replay."""
    q = (
        pages_stream.writeStream.foreachBatch(
            make_harvest_sink(out_dir, languages=languages,
                              min_quality=min_quality)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    await_drained(q, timeout_s)


def harvest_table(spark, out_dir: str) -> DataFrame:
    """The accumulated harvest (one row per first-seen URL that passed the
    gates; rejected URLs stay in the table as kept=false for dedup)."""
    return (
        spark.read.parquet(meta_table_dir(out_dir))
        .where(F.col("kept"))
        .drop("epoch", "kept")
    )
