"""Per-document overlapping chunking — the retrieval/embedding splitter.

Every RAG / embedding pipeline runs the same stage ahead of the encoder:
split each document into fixed-size token windows with a small overlap
(context continuity across the cut), carry a stable chunk id, and keep
the (doc, offset) lineage so retrieval hits map back to source spans.
It is distinct from ``operators/packing.py``: packing concatenates MANY
docs into training shards (cross-doc, budget-driven); chunking splits
ONE doc into retrieval units (per-doc, window-driven). The reference has
neither — this is a beyond-the-reference corpus-pipeline stage.

Dataflow: whitespace tokens → one ``transform(sequence(...))`` building
the window list → ``posexplode``. Everything is whole-stage codegen over
the row itself — zero shuffle, zero UDF — so the stage is free at 100 TB
(it rides the same scan as the encoder's Arrow batches). Chunk ids are
``(id, chunk_idx)`` — deterministic, resume-safe, no monotonically-
increasing-id dependence.

Window math (``size`` tokens per chunk, ``overlap`` shared): starts at
``k·(size − overlap)``; the LAST window is the first one that reaches
the end (shorter tail windows that would duplicate covered tokens are
not emitted), so every token is covered exactly once by a non-overlap
region and n_chunks = 1 + ceil(max(0, n − size) / (size − overlap)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import tokens_expr

__all__ = ["chunk_documents"]


def chunk_documents(
    docs: DataFrame,
    size: int = 128,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ ``(id_col, chunk_idx, tok_start, n_tokens, chunk_text)``: the
    overlapping token windows of each document, in order. Empty documents
    emit no chunks; a document of ≤ ``size`` tokens emits exactly one.
    ``tok_start`` is the 0-based token offset (the retrieval-hit →
    source-span lineage); ``chunk_text`` re-joins the window's tokens
    with single spaces (whitespace-normalized, the same contract as the
    dedup/textstats family)."""
    if not 0 <= overlap < size:
        raise ValueError(f"need 0 <= overlap < size, got {overlap}/{size}")
    step = size - overlap
    toks = tokens_expr(F.lower(F.col(text_col)))

    # bind the token array once (transform-wrap: HOF lambdas get no CSE)
    # and derive the window count from the BOUND array — the last window
    # START is ceil(max(0, n - size) / step); an empty doc yields NULL
    # (posexplode emits nothing), never sequence(0, -1), which Spark
    # would expand as a DESCENDING range.
    def _windows(ta):
        last = F.ceil(
            F.greatest(F.lit(0), F.size(ta) - F.lit(size)) / F.lit(step)
        ).cast("int")
        return F.when(
            F.size(ta) > 0,
            F.transform(
                F.sequence(F.lit(0), last),
                lambda k: F.struct(
                    (k * step).alias("tok_start"),
                    F.array_join(
                        F.slice(ta, k * step + 1, size), " "
                    ).alias("chunk_text"),
                    F.least(
                        F.lit(size), F.size(ta) - k * step
                    ).alias("n_tokens"),
                ),
            ),
        )

    chunks = F.transform(F.array(toks), _windows)[0]
    d = docs.select(
        F.col(id_col),
        F.posexplode(chunks).alias("chunk_idx", "_c"),
    )
    return d.select(
        id_col,
        "chunk_idx",
        F.col("_c.tok_start").alias("tok_start"),
        F.col("_c.n_tokens").alias("n_tokens"),
        F.col("_c.chunk_text").alias("chunk_text"),
    )
