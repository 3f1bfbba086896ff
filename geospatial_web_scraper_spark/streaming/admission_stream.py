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
  — pinned row-for-row by tests/test_streaming_admission.py;
- :meth:`AdmissionState.compact` (r5, VERDICT r4 ask #3) folds epochs
  ``<= upto`` into ONE base directory per table — the ``plans/store.py``
  ``compact()`` pattern (write new base → atomically flip the manifest →
  delete superseded dirs), so a long-running stream's per-batch state
  read stops being O(epochs) directory opens. The base RETAINS the
  epoch values as a data column, so a replayed already-compacted epoch
  still reads exactly the epochs strictly before it (idempotence
  survives compaction); per-epoch dirs at or below ``compacted_upto``
  are ignored on read (a replay may lawfully re-create one — its
  content is identical to the base's copy by the idempotence argument).

Scale shape per micro-batch: O(batch + band collisions), independent of
corpus size — gate 1/2 are hash anti-join + first-wins groupBy, gate 3
touches committed text only through the broadcast candidate-id
semi-join (the r4 candidate-bounding fix), and the state artifacts the
batch appends are proportional to the batch's own survivors. The state
fold at read time is the compacted base plus the per-epoch tail.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
from functools import reduce

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
    another session). Call :meth:`compact` periodically (between
    batches) to bound the state-read fan-in."""

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

    def _docs_schema(self) -> str:
        return f"{self.id_col} long, {self.text_col} string, content_hash string"

    def _schemas(self) -> dict[str, str]:
        i = self.id_col
        return {
            "docs": self._docs_schema(),
            "hashes": "content_hash string",
            "bands": f"{i} long, band_idx int, band_hash long",
            "grams": f"{i} long, n_grams long",
        }

    def _base_path(self, name: str, upto: int) -> str:
        return f"{self.state_dir}/_base/{name}/upto={upto}"

    def _read_parts(self, name: str, schema: str) -> DataFrame:
        """All committed state for ``name`` WITH its epoch column: the
        compacted base (epoch retained as a data column) unioned with the
        per-epoch partition dirs strictly after ``compacted_upto``.
        Missing/empty dirs are the empty relation — admission must work
        from the very first batch."""
        from pyspark.errors import AnalysisException

        k = self.compacted_upto()
        parts: list[DataFrame] = []
        if k >= 0:
            base = self._base_path(name, k)
            if os.path.exists(os.path.join(base, "_SUCCESS")):
                parts.append(self.spark.read.parquet(base))
        try:
            live = self.spark.read.parquet(f"{self.state_dir}/{name}")
            # dirs <= k are superseded by (and byte-duplicated in) the
            # base — a replayed compacted epoch may re-create one
            parts.append(live.where(F.col("epoch") > k))
        except AnalysisException:
            pass
        if not parts:
            return self.spark.createDataFrame([], f"{schema}, epoch int")
        parts = [
            p.withColumn("epoch", F.col("epoch").cast("int")) for p in parts
        ]
        return reduce(DataFrame.unionByName, parts)

    def _read(self, name: str, schema: str, max_epoch: int | None) -> DataFrame:
        """Fold state with epoch < max_epoch (all when None)."""
        df = self._read_parts(name, schema)
        if max_epoch is not None:
            df = df.where(F.col("epoch") < int(max_epoch))
        return df.drop("epoch")

    def _write(self, name: str, df: DataFrame, epoch_id: int) -> None:
        (
            df.withColumn("epoch", F.lit(int(epoch_id)))
            .write.mode("overwrite")
            .partitionBy("epoch")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(f"{self.state_dir}/{name}")
        )

    # ----------------------------------------------------------- compaction

    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.state_dir, "manifest.json")

    def _manifest(self) -> dict:
        if os.path.exists(self._manifest_path):
            with open(self._manifest_path) as f:
                return json.load(f)
        return {"compacted_upto": -1}

    def compacted_upto(self) -> int:
        return self._manifest().get("compacted_upto", -1)

    def _epochs_on_disk(self) -> list[int]:
        root = f"{self.state_dir}/docs"
        if not os.path.isdir(root):
            return []
        out = []
        for d in os.listdir(root):
            if d.startswith("epoch="):
                try:
                    out.append(int(d.split("=", 1)[1]))
                except ValueError:
                    continue
        return out

    def compact(self, upto: int | None = None) -> None:
        """Fold epochs ``<= upto`` (default: every epoch on disk) into one
        base directory per state table, so the per-batch state read costs
        O(1 + epochs-since-compaction) directory opens instead of
        O(total epochs). The ``plans/store.py`` pattern, crash-safe in the
        same order: (1) write the four new bases (each retains ``epoch``
        as a data column — replay filtering keeps working); (2) flip
        ``compacted_upto`` in the manifest via atomic rename; (3) only
        then remove superseded per-epoch dirs and the previous base. A
        crash between (1) and (2) leaves an unreferenced base dir, never
        missing data; between (2) and (3), superseded dirs linger but are
        filtered out on read. Call between micro-batches — compacting an
        epoch the stream has not committed yet is safe for replay (the
        base keeps per-epoch fidelity) but wastes the fold."""
        prev = self.compacted_upto()
        if upto is None:
            epochs = self._epochs_on_disk()
            if not epochs:
                return
            upto = max(epochs)
        upto = int(upto)
        if upto <= prev:
            return
        schemas = self._schemas()
        for name, schema in schemas.items():
            df = self._read_parts(name, schema).where(F.col("epoch") <= upto)
            df.write.mode("overwrite").parquet(self._base_path(name, upto))
        os.makedirs(self.state_dir, exist_ok=True)
        manifest = self._manifest()
        manifest["compacted_upto"] = upto
        fd, tmp = tempfile.mkstemp(dir=self.state_dir, suffix=".manifest")
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._manifest_path)
        for name in schemas:
            if prev >= 0:
                shutil.rmtree(self._base_path(name, prev), ignore_errors=True)
            root = f"{self.state_dir}/{name}"
            if not os.path.isdir(root):
                continue
            for d in os.listdir(root):
                if not d.startswith("epoch="):
                    continue
                try:
                    e = int(d.split("=", 1)[1])
                except ValueError:
                    continue
                if e <= upto:
                    shutil.rmtree(os.path.join(root, d), ignore_errors=True)

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
