"""Streaming freshness — change-rate state folded per recrawl batch.

The batch freshness loop (operators/delta.py) accumulates a HISTORY of
snapshot-delta rows and estimates per-URL change rates over it. A
continuous crawler doesn't want to re-scan an ever-growing history every
tick; it wants per-URL evidence COUNTS folded as each recrawl's delta
arrives. Counts are associative and commutative, so the stream's state
equals the batch computation over the concatenated history EXACTLY
(pinned in tests/test_streaming_delta.py), and the estimator half is the
shared :func:`operators.delta.change_rates_from_counts`.

Exactly-once without a transactional format: the epoch-partitioned state
pattern the harvest stream established — each micro-batch writes ONLY
its own ``epoch=<id>`` partition (idempotent overwrite on replay, the
file source replays the same input for the same epoch), and a read
folds all epochs. State is (url, n_obs, n_changed) per epoch — tiny
compared to the deltas themselves, and the fold is ONE map-side-
combining groupBy at read time (or compact epochs periodically with the
same associativity argument).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.delta import change_rates_from_counts

__all__ = ["ChangeRateState"]


class ChangeRateState:
    """foreachBatch sink + query surface for streaming change rates.

    Wire it as ``deltas.writeStream.foreachBatch(state.sink)`` where the
    stream's rows are snapshot-delta outputs ``(key, status, …)``;
    evidence rows (``changed``/``unchanged``) fold into per-epoch count
    partitions under ``state_dir``. ``rates()`` reads the folded state
    through the shared estimator at any time — between batches, after a
    crash, or from a different session.
    """

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        key_col: str = "url",
        status_col: str = "status",
    ) -> None:
        self.spark = spark
        self.state_dir = state_dir
        self.key_col = key_col
        self.status_col = status_col

    def sink(self, batch_df: DataFrame, epoch_id: int) -> None:
        counts = (
            batch_df.where(
                F.col(self.status_col).isin("changed", "unchanged")
            )
            .groupBy(self.key_col)
            .agg(
                F.count("*").alias("n_obs"),
                F.sum(
                    (F.col(self.status_col) == "changed").cast("int")
                ).alias("n_changed"),
            )
            .withColumn("epoch", F.lit(int(epoch_id)))
        )
        # dynamic partition overwrite: a replayed epoch rewrites ONLY its
        # own partition with identical content — exactly-once by idempotence
        (
            counts.write.mode("overwrite")
            .partitionBy("epoch")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(self.state_dir)
        )

    def counts(self) -> DataFrame:
        """Folded evidence counts across all committed epochs. Before any
        evidence exists — no sink yet, or every batch so far was
        added/removed-only (a fresh crawl's first delta is all 'added') —
        this is the EMPTY counts relation, not an error: rates() must be
        queryable at any time."""
        from pyspark.errors import AnalysisException

        try:
            state = self.spark.read.parquet(self.state_dir)
        except AnalysisException:
            # missing dir, or a dir holding only _SUCCESS markers (an
            # all-filtered first batch) — schema inference has nothing
            return self.spark.createDataFrame(
                [],
                f"{self.key_col} string, n_obs bigint, n_changed bigint",
            )
        return (
            state.groupBy(self.key_col)
            .agg(
                F.sum("n_obs").alias("n_obs"),
                F.sum("n_changed").alias("n_changed"),
            )
        )

    def rates(self, max_interval: int = 64) -> DataFrame:
        """Current per-URL change rates — identical to running
        ``operators.delta.change_rates`` over the full delta history."""
        return change_rates_from_counts(
            self.counts(), key_col=self.key_col, max_interval=max_interval
        )
