"""Golden-pinned BPE token counting (operators/tokenize.py) — hand-computed
merges and counts (no DuckDB oracle: greedy BPE in SQL is impractical, the
r3-verdict-sanctioned oracle strategy for this operator), plus the
model-token threading through pack_chunks and sample_token_budget."""

from pyspark.sql import functions as F

from geospatial_web_scraper_spark.operators.packing import pack_chunks
from geospatial_web_scraper_spark.operators.sampling import (
    sample_token_budget,
)
from geospatial_web_scraper_spark.operators.tokenize import (
    bpe_count_word,
    bpe_token_count_expr,
    train_bpe_merges,
    with_bpe_token_count,
    word_freqs,
)


def test_train_bpe_merges_golden_hand_computed():
    """{"aaab": 1, "aab": 1}: pair counts round 1 are (a,a)->3, (a,b)->2 so
    (a,a) merges first; round 2 every remaining pair [(aa,a),(aa,b),(a,b)]
    occurs once -> early stop (merging a unique pair changes nothing)."""
    assert train_bpe_merges({"aaab": 1, "aab": 1}, 10) == [("a", "a")]
    # with the words doubled the counts double, so training runs to
    # exhaustion; each tie at count 2 breaks LEXICOGRAPHICALLY — round 2
    # picks ("a","b") over ("aa","a")/("aa","b"), round 3 ("aa","ab")
    # over ("aa","b") — until both words are single tokens
    assert train_bpe_merges({"aaab": 2, "aab": 2}, 10) == [
        ("a", "a"),
        ("a", "b"),
        ("aa", "ab"),
        ("aa", "b"),
    ]
    # num_merges caps the same run mid-way
    assert train_bpe_merges({"aaab": 2, "aab": 2}, 2) == [
        ("a", "a"),
        ("a", "b"),
    ]
    # iterable-of-words form and the num_merges cap
    assert train_bpe_merges(["aaab", "aaab", "aab", "aab"], 1) == [("a", "a")]
    assert train_bpe_merges({}, 5) == []
    assert train_bpe_merges({"": 3, "x": 9}, 5) == []


def test_bpe_count_word_golden():
    ranks = {("a", "a"): 0, ("a", "b"): 1}
    # a a a b -> (a,a) leftmost: [aa, a, b] -> (a,b): [aa, ab]
    assert bpe_count_word("aaab", ranks) == 2
    # a a b -> [aa, b]; (a,b) no longer adjacent as chars
    assert bpe_count_word("aab", ranks) == 2
    # lowest-RANK pair merges first even when a higher-rank pair is earlier
    # in the word: b a a -> (a,a) then nothing: [b, aa]
    assert bpe_count_word("baa", ranks) == 2
    assert bpe_count_word("xyz", ranks) == 3
    assert bpe_count_word("a", ranks) == 1


def test_bpe_token_count_expr_spark(spark):
    merges = [("a", "a"), ("a", "b")]
    df = spark.createDataFrame(
        [
            (0, "aaab aab"),       # 2 + 2
            (1, "b a"),            # 1 + 1
            (2, ""),               # 0
            (3, None),             # NULL -> 0
            (4, "  aaab   xyz "),  # 2 + 3, ragged whitespace
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["n_tok_bpe"]
        for r in with_bpe_token_count(df, merges).collect()
    }
    assert got == {0: 4, 1: 2, 2: 0, 3: 0, 4: 5}


def test_word_freqs_and_end_to_end_training(spark):
    df = spark.createDataFrame(
        [(0, "aaab aab"), (1, "aaab aab"), (2, "   ")],
        "doc_id long, text string",
    )
    freqs = word_freqs(df)
    assert freqs == {"aaab": 2, "aab": 2}
    assert train_bpe_merges(freqs, 2) == [("a", "a"), ("a", "b")]


def test_packing_and_sampling_accept_bpe_counts(spark):
    """Model-token budgets thread through both consumers: pack_chunks
    offsets accumulate BPE counts (not whitespace counts), and
    sample_token_budget's per-source totals are BPE sums."""
    merges = [("a", "a"), ("a", "b")]
    docs = spark.createDataFrame(
        [(0, "aaab"), (1, "aab aab"), (2, "xyz")],
        "doc_id long, text string",
    )
    packed = {
        r["doc_id"]: (r["n_tok"], r["tok_offset"])
        for r in pack_chunks(
            docs,
            budget=4,
            n_tok_col=bpe_token_count_expr(F.col("text"), merges),
            num_partitions=1,
        ).collect()
    }
    # BPE counts: 2, 4, 3 -> offsets 0, 2, 6 (whitespace would be 1, 2, 1)
    assert packed == {0: (2, 0), 1: (4, 2), 2: (3, 6)}

    sampled = sample_token_budget(
        docs.withColumn("source", F.lit("s")),
        budget_tokens=9,
        n_tok_col=bpe_token_count_expr(F.col("text"), merges),
    )
    rows = sampled.collect()
    assert {r["doc_id"]: r["n_tok"] for r in rows} == {0: 2, 1: 4, 2: 3}
    # total BPE tokens 9 == budget -> every doc kept at rate 1
    assert all(r["kept"] for r in rows)
