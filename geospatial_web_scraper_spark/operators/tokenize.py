"""Deterministic byte-pair-encoding token counting — model-token-aware
budgets for the packing/sampling operators (VERDICT r3 ask #5).

``pack_chunks`` and ``sample_token_budget`` default to whitespace token
counts; real training-shard budgets are **tokenizer** tokens. This module
supplies a reproducible BPE pipeline so those budgets can be computed in
model-token units without any external tokenizer dependency:

* :func:`train_bpe_merges` — classic greedy BPE training (Sennrich et al.
  2016, arXiv:1508.07909): count adjacent symbol pairs across the word
  vocabulary, merge the most frequent pair, repeat. Ties break
  lexicographically, so the merge list is a pure function of its input —
  re-running training on the same corpus yields byte-identical merges.
  Training is driver-side over a word-frequency dict: the merge table is
  MODEL-SIZED state (like k-means centroids or PQ codebooks — thousands
  of entries, not corpus-sized), and greedy pair-merging is inherently
  sequential in the merge index, so there is nothing to distribute. Feed
  it word counts from a corpus *sample*; at 100 TB the word-frequency agg
  itself is one map-side-combining groupBy (:func:`word_freqs`).

* :func:`bpe_token_count_expr` — an Arrow-batched ``pandas_udf`` applying
  the merges greedily per word (lowest-rank pair first, all occurrences
  left-to-right — the canonical apply order, reproducible everywhere) and
  returning the token COUNT per document. The merge-rank dict rides the
  UDF closure (broadcast-by-serialization; model-sized), and a per-batch
  word→count memo collapses the Zipf head, so the hot loop runs once per
  *distinct* word per batch, not once per occurrence.

Unlike the corpus formulas there is NO DuckDB oracle form: greedy BPE in
SQL is impractical (the r3 verdict's own oracle guidance), so correctness
is pinned by hand-computed golden tests (tests/test_tokenize.py) instead
of the driver mirror, and the whitespace-count catalog queries stay as-is.
"""

from __future__ import annotations

from collections import Counter
from typing import Iterable, Mapping

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "word_freqs",
    "train_bpe_merges",
    "bpe_count_word",
    "bpe_token_count_expr",
    "with_bpe_token_count",
]


def word_freqs(docs: DataFrame, text_col: str = "text") -> dict[str, int]:
    """Whitespace word → frequency over a (sampled) corpus, as the driver
    dict :func:`train_bpe_merges` consumes. One explode + one map-side-
    combining groupBy; the result is vocabulary-sized (collect is safe on
    a sample — cap the input, not this operator)."""
    rows = (
        docs.select(
            F.explode(
                F.split(F.trim(F.col(text_col)), r"\s+")
            ).alias("w")
        )
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    return {r["w"]: int(r["n"]) for r in rows}


def train_bpe_merges(
    freqs: Mapping[str, int] | Iterable[str], num_merges: int
) -> list[tuple[str, str]]:
    """Greedy BPE merge list from a word-frequency mapping (or an iterable
    of raw words, counted here). Each round counts every adjacent symbol
    pair weighted by word frequency and merges the (count DESC, pair ASC)
    winner; stops early when no pair repeats (count < 2 buys nothing:
    merging a unique pair cannot change any other word)."""
    if not isinstance(freqs, Mapping):
        freqs = Counter(freqs)
    vocab: dict[tuple[str, ...], int] = {}
    for w, n in freqs.items():
        if w:
            key = tuple(w)
            vocab[key] = vocab.get(key, 0) + int(n)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for sym, n in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        pair = best[0]
        merges.append(pair)
        vocab = {
            _merge_word(sym, pair): n for sym, n in vocab.items()
        }
    return merges


def _merge_word(sym: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    """All occurrences of ``pair`` in ``sym``, merged left-to-right."""
    a, b = pair
    out: list[str] = []
    i = 0
    while i < len(sym):
        if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def bpe_count_word(
    word: str, ranks: Mapping[tuple[str, str], int]
) -> int:
    """Token count of one word under the merge-rank dict: repeatedly merge
    the LOWEST-rank pair present (all occurrences left-to-right) until no
    mergeable pair remains — the canonical BPE apply order, so the count
    is independent of dict iteration order or platform."""
    sym: tuple[str, ...] = tuple(word)
    while len(sym) > 1:
        best_rank = None
        best_pair = None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (sym[i], sym[i + 1])
        if best_pair is None:
            break
        sym = _merge_word(sym, best_pair)
    return len(sym)


def bpe_token_count_expr(
    text: Column, merges: list[tuple[str, str]]
) -> Column:
    """→ long: BPE token count of a document (sum over its whitespace
    words). Arrow-batched; a per-batch word memo makes the cost
    O(distinct words) per batch. NULL text counts 0 (the same contract as
    ``token_count_expr`` on empty docs)."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    @F.pandas_udf(T.LongType())
    def count(texts: pd.Series) -> pd.Series:
        memo: dict[str, int] = {}

        def doc_count(t) -> int:
            if t is None:
                return 0
            total = 0
            for w in t.split():
                c = memo.get(w)
                if c is None:
                    c = bpe_count_word(w, ranks)
                    memo[w] = c
                total += c
            return total

        return texts.map(doc_count).astype("int64")

    return count(text)


def with_bpe_token_count(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "n_tok_bpe",
) -> DataFrame:
    """Convenience: ``docs`` plus a BPE token-count column — the value to
    thread into ``pack_chunks(n_tok_col=...)`` /
    ``sample_token_budget(n_tok_col=...)`` for model-token budgets."""
    return docs.withColumn(out_col, bpe_token_count_expr(F.col(text_col), merges))
