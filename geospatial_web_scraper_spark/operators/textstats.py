"""Text-analysis operators for a training-data pipeline — all native
Catalyst expressions (JVM-side, whole-stage codegen; no Python anywhere).

Each expression is deliberately constrained to constructs with exact ANSI
SQL equivalents so DuckDB can oracle-check it value-for-value: token
counting, quality scoring, n-gram-free language ID (stopword voting),
md5-based document fingerprints, and rolling-hash winnowing fingerprints.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny deterministic stopword sets for the language-ID vote.
STOPWORDS = {
    "en": ("the", "and", "of", "to", "in", "is", "for", "with", "that", "are"),
    "es": ("el", "la", "de", "que", "y", "los", "en", "un", "por", "con"),
    "fr": ("le", "la", "les", "de", "et", "un", "une", "dans", "pour", "que"),
}

QUALITY_STOPWORDS = STOPWORDS["en"]


def tokens_expr(text: Column) -> Column:
    """Whitespace tokenization; '' → empty array (not [''])."""
    t = F.trim(text)
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count_expr(text: Column) -> Column:
    return F.size(tokens_expr(text))


def alpha_ratio_expr(text: Column) -> Column:
    """Fraction of characters that are ASCII letters (0 for empty)."""
    n = F.length(text)
    alpha = F.length(F.regexp_replace(text, "[^A-Za-z]", ""))
    return F.when(n > 0, alpha.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def stopword_ratio_expr(text: Column, stopwords=QUALITY_STOPWORDS) -> Column:
    toks = F.transform(tokens_expr(text), lambda x: F.lower(x))
    hits = F.size(F.filter(toks, lambda x: x.isin(*stopwords)))
    n = F.size(toks)
    return F.when(n > 0, hits.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def quality_score_expr(text: Column) -> Column:
    """Deterministic [0,1] quality heuristic: length band + letter ratio +
    stopword presence (the classic Gopher-style cheap filters)."""
    n_tok = token_count_expr(text).cast("double")
    length_term = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    return F.round(
        F.lit(0.4) * length_term
        + F.lit(0.3) * alpha_ratio_expr(text)
        + F.lit(0.3) * F.least(stopword_ratio_expr(text) * 5.0, F.lit(1.0)),
        6,
    )


def lang_id_expr(text: Column) -> Column:
    """Stopword-vote language ID: argmax of per-language stopword hits,
    ties broken by language code order, 'und' when no hits at all."""
    toks = F.transform(tokens_expr(text), lambda x: F.lower(x))
    hits = {
        lang: F.size(F.filter(toks, lambda x: x.isin(*words)))
        for lang, words in STOPWORDS.items()
    }
    best = F.greatest(*hits.values())
    expr = F.lit("und")
    # build reversed so earlier languages win ties
    for lang in sorted(STOPWORDS, reverse=True):
        expr = F.when((best > 0) & (hits[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


def fingerprint_expr(text: Column) -> Column:
    """64-bit-equivalent document fingerprint: first 16 hex chars of the md5
    of whitespace-normalized text (SQL-portable; md5 agrees across engines)."""
    normalized = F.array_join(tokens_expr(text), " ")
    return F.substring(F.md5(normalized), 1, 16)


def word_ngrams_expr(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles in document order ('' when fewer than n words)."""
    toks = tokens_expr(text)
    count = F.size(toks) - F.lit(n - 1)
    return F.when(
        count > 0,
        F.transform(
            F.sequence(F.lit(1), count),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def dup_word_frac_expr(text: Column) -> Column:
    """Fraction of token occurrences that repeat an earlier token
    (1 - distinct/total; 0 for empty docs). The cheapest Gopher-style
    repetition signal."""
    toks = tokens_expr(text)
    n = F.size(toks)
    return F.when(
        n > 0,
        F.lit(1.0) - F.size(F.array_distinct(toks)).cast("double") / n.cast("double"),
    ).otherwise(F.lit(0.0))


def dup_ngram_frac_expr(text: Column, n: int = 3) -> Column:
    """Fraction of word n-gram occurrences that are duplicates of an
    earlier occurrence (Gopher's duplicate-n-gram family, occurrence-counted
    rather than character-counted so the formula has an exact SQL mirror)."""
    grams = word_ngrams_expr(text, n)
    total = F.size(grams)
    return F.when(
        total > 0,
        (total - F.size(F.array_distinct(grams))).cast("double")
        / total.cast("double"),
    ).otherwise(F.lit(0.0))


def top_ngram_char_frac_expr(text: Column, n: int = 2) -> Column:
    """Largest fraction of the normalized text's characters attributable to
    a single repeated word n-gram: max over distinct grams of
    occurrences(g) * length(g) / length(normalized text). This is the
    Gopher "top n-gram character fraction" repetition gate.

    Cost note (100 TB): one ``array_sort`` + one linear run-length
    ``aggregate`` per document — O(grams log grams), pure whole-stage
    codegen, no shuffle, no Python. (The r3 form — ``filter`` inside a
    ``transform`` over the distinct grams — was O(distinct × total) with
    the gram-array subtree re-evaluated per lambda element, measured in
    MINUTES per 5k-doc partition at sf0.1; equal grams are adjacent after
    the sort, so a single pass tracking the current run yields the exact
    same max(count·len) value.)"""
    grams = word_ngrams_expr(text, n)
    norm_len = F.length(F.array_join(tokens_expr(text), " "))
    zero = F.lit(0).cast("int")
    init = F.struct(
        F.lit("").alias("prev"), zero.alias("run"), zero.alias("best")
    )

    def step(acc: Column, x: Column) -> Column:
        run = (
            F.when(x == acc["prev"], acc["run"] + F.lit(1))
            .otherwise(F.lit(1))
            .cast("int")
        )
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run * F.length(x)).cast("int").alias("best"),
        )

    top_chars = F.aggregate(
        F.array_sort(grams), init, step, lambda acc: acc["best"]
    )
    return F.when(
        (norm_len > 0) & (top_chars > 0),
        top_chars.cast("double") / norm_len.cast("double"),
    ).otherwise(F.lit(0.0))


def winnow_fingerprints_expr(
    text: Column, n: int = 3, window: int = 4, hash_fn=None
) -> Column:
    """Winnowing (Schleimer et al., SIGMOD'03): hash every word n-gram,
    keep the min hash of each sliding window → a compact, position-robust
    fingerprint set for near-dup detection. All native higher-order funcs.
    ``hash_fn`` defaults to ``xxhash64`` (fastest JVM-side); pass an
    md5-based hash for cross-engine oracle parity."""
    grams = word_ngrams_expr(text, n)
    if hash_fn is None:
        hash_fn = F.xxhash64
    hashes = F.transform(grams, lambda g: hash_fn(g))

    # bind the hash array ONCE via the single-element-array trick: a
    # non-lambda subtree inside a HOF lambda gets NO common-subexpression
    # elimination, so `slice(hashes, i, window)` re-derived the whole
    # gram+hash array PER WINDOW POSITION — O(len²) hashing per doc
    # (measured r5: 11-13 s of the sf0.1 containment run was this one
    # expression; ~2 s after binding). Same trap and same fix as the r4
    # top_ngram_char_frac rewrite.
    def _window_mins(h: Column) -> Column:
        cnt = F.size(h) - F.lit(window - 1)
        return F.when(
            cnt > 0,
            F.transform(
                F.sequence(F.lit(1), cnt),
                lambda i: F.array_min(F.slice(h, i, window)),
            ),
        ).otherwise(h)  # shorter than one window → keep all hashes

    return F.array_distinct(
        F.get(F.transform(F.array(hashes), _window_mins), 0)
    )
