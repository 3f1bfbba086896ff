"""Streaming corpus admission — the continuous form of
``operators.dedup.incremental_dedup``.

A production corpus doesn't arrive as one batch: the crawler emits
document micro-batches continuously, and each batch must be admitted
against everything already committed (exact content, then near-dup
minhash verification) BEFORE it becomes part of the corpus the next
batch is checked against. That sequential self-reference is exactly the
foreachBatch + epoch-partitioned-state pattern this repo's harvest and
freshness streams established:

- committed state lives as epoch-partitioned parquet — four tables per
  epoch: the admitted DOCUMENTS (id, text, content_hash), and the three
  per-doc-bounded artifacts ``incremental_dedup`` accepts so committed
  text is only ever read for verify candidates (the distinct hash set,
  the minhash band table, the per-doc gram counts);
- each micro-batch folds ONLY the epochs strictly BEFORE its own id and
  writes ONLY its own ``epoch=<id>`` partitions (dynamic partition
  overwrite). A replayed epoch therefore re-reads the identical prior
  state and rewrites identical output — exactly-once by idempotence,
  with no transactional table format;
- admission order IS epoch order (first-wins across batches), matching
  a sequential batch driver folding the same batches in the same order
  — pinned row-for-row by tests/test_streaming_admission.py.

Scale shape per micro-batch: O(batch + band collisions), independent of
corpus size — gate 1/2 are hash anti-join + first-wins groupBy, gate 3
touches committed text only through the broadcast candidate-id
semi-join (the r4 candidate-bounding fix), and the state artifacts the
batch appends are proportional to the batch's own survivors. The state
fold at read time is a union of per-epoch parquet partitions (compact
periodically with the same associativity argument as the freshness
stream's counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    incremental_dedup,
    minhash_bands,
    word_ngrams_expr,
)

__all__ = ["AdmissionState"]


class AdmissionState:
    """foreachBatch sink + query surface for streaming corpus admission.

    Wire as ``docs.writeStream.foreachBatch(state.sink)`` where the
    stream's rows carry ``(id_col, text_col)``; ``admitted()`` reads the
    committed corpus at any time (between batches, after a crash, from
    another session)."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        k: int = 16,
        bands: int = 4,
        ngram: int = 3,
        threshold: float = 0.7,
    ) -> None:
        self.spark = spark
        self.state_dir = state_dir.rstrip("/")
        self.id_col = id_col
        self.text_col = text_col
        self.k = k
        self.bands = bands
        self.ngram = ngram
        self.threshold = threshold

    # ------------------------------------------------------------- state io

    def _read(self, name: str, schema: str, max_epoch: int | None) -> DataFrame:
        """Fold state partitions with epoch < max_epoch (all when None).
        Missing/empty dirs are the empty relation — admission must work
        from the very first batch."""
        from pyspark.errors import AnalysisException

        try:
            df = self.spark.read.parquet(f"{self.state_dir}/{name}")
        except AnalysisException:
            return self.spark.createDataFrame([], schema)
        if max_epoch is not None:
            df = df.where(F.col("epoch") < int(max_epoch))
        return df.drop("epoch")

    def _docs_schema(self) -> str:
        return f"{self.id_col} long, {self.text_col} string, content_hash string"

    def _write(self, name: str, df: DataFrame, epoch_id: int) -> None:
        (
            df.withColumn("epoch", F.lit(int(epoch_id)))
            .write.mode("overwrite")
            .partitionBy("epoch")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(f"{self.state_dir}/{name}")
        )

    # --------------------------------------------------------------- sink

    def sink(self, batch_df: DataFrame, epoch_id: int) -> None:
        i, t = self.id_col, self.text_col
        prior_docs = self._read("docs", self._docs_schema(), epoch_id)
        prior_hashes = self._read("hashes", "content_hash string", epoch_id)
        prior_bands = self._read(
            "bands", f"{i} long, band_idx int, band_hash long", epoch_id
        )
        prior_grams = self._read("grams", f"{i} long, n_grams long", epoch_id)

        survivors = incremental_dedup(
            batch_df,
            prior_docs,
            text_col=t,
            id_col=i,
            k=self.k,
            bands=self.bands,
            ngram=self.ngram,
            threshold=self.threshold,
            corpus_hashes=prior_hashes,
            corpus_bands=prior_bands,
            corpus_gram_counts=prior_grams,
        )
        admitted = (
            batch_df.select(i, t)
            .join(survivors, i)
            .select(i, t, "content_hash")
            # one deterministic materialization: four state writes below
            # must see the SAME admitted set without re-running the gates
            .localCheckpoint()
        )
        self._write("docs", admitted, epoch_id)
        self._write("hashes", admitted.select("content_hash"), epoch_id)
        self._write(
            "bands",
            minhash_bands(admitted, t, i, self.k, self.bands, self.ngram),
            epoch_id,
        )
        self._write(
            "grams",
            admitted.select(
                F.col(i),
                F.size(
                    F.array_distinct(word_ngrams_expr(F.col(t), self.ngram))
                )
                .cast("long")
                .alias("n_grams"),
            ),
            epoch_id,
        )

    # -------------------------------------------------------------- queries

    def admitted(self) -> DataFrame:
        """The committed corpus across all epochs:
        ``(id_col, text_col, content_hash)``."""
        return self._read("docs", self._docs_schema(), None)
