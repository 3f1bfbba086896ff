"""lsh_recall_eval — candidate-stage recall of the MinHash banding vs
exact gram-set Jaccard truth (the dedup twin of ann_recall_eval).

Pinned properties:
* exact-duplicate pairs (identical gram sets ⇒ identical signatures ⇒
  identical band hashes) are caught with probability 1 — the top bucket's
  recall is EXACTLY 1.0, not approximately;
* n_caught ≤ n_truth in every bucket (caught is a subset of truth by
  construction — the left join can never fabricate rows because the
  candidate side is DISTINCT pairs);
* truth is independent of the banding: a pair the bands miss still shows
  up in its bucket (recall < 1), which is the whole point of the eval.
"""

from pyspark.sql import functions as F

from geospatial_web_scraper_spark.operators import dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


BASE = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lam mu nu xi omicron pi rho sigma tau upsilon"
)


def test_exact_duplicates_always_caught(spark):
    # 3 exact-dup pairs + unrelated fillers: identical gram sets hash to
    # identical signatures, so every dup pair must land in bucket 100
    # with recall exactly 1.0.
    rows = []
    for i in range(3):
        text = BASE + f" variant {i} closing words here now"
        rows.append((2 * i, text))
        rows.append((2 * i + 1, text))
    for j in range(6, 12):
        rows.append((j, f"totally different text number {j} " * 4))
    out = dedup.lsh_recall_eval(_docs(spark, rows)).collect()
    by_bucket = {r["pct_bucket"]: r for r in out}
    assert 100 in by_bucket
    top = by_bucket[100]
    assert top["n_truth"] >= 3
    assert top["n_caught"] == top["n_truth"]
    assert top["recall6"] == 1.0


def test_caught_is_subset_of_truth_every_bucket(spark):
    rows = [(i, BASE + f" tail {i % 4} {i % 7} {i}") for i in range(24)]
    out = dedup.lsh_recall_eval(_docs(spark, rows)).collect()
    assert out  # the shared BASE guarantees gram overlap
    for r in out:
        assert 0 <= r["n_caught"] <= r["n_truth"]
        assert abs(r["recall6"] - round(r["n_caught"] / r["n_truth"], 6)) <= 1e-9


def test_truth_floor_is_integer_exact(spark):
    # A pair at exactly 1% similarity must be kept by pct_floor=1 and
    # dropped by pct_floor=2: 2 shared grams / union 200 == 1/100, so the
    # n_inter*100 >= u*floor predicate is an equality at floor=1 — the
    # boundary a float threshold would get wrong is exact here.
    shared = "q r s t"  # 4 tokens -> 2 shared 3-grams
    a = shared + " " + " ".join(f"a{i}" for i in range(97))  # 101 toks, 99 grams
    b = shared + " " + " ".join(f"b{i}" for i in range(101))  # 105 toks, 103 grams
    rows = [(0, a), (1, b)]
    kept = dedup.lsh_recall_eval(_docs(spark, rows), pct_floor=1)
    dropped = dedup.lsh_recall_eval(_docs(spark, rows), pct_floor=2)
    kept_rows = kept.collect()
    assert [r["pct_bucket"] for r in kept_rows] == [1]
    assert kept_rows[0]["n_truth"] == 1
    assert dropped.count() == 0


def test_eval_consistent_with_production_pairs(spark):
    # Every pair the PRODUCTION pipeline emits at threshold t is a truth
    # pair at bucket >= floor(100*t) that the candidate stage caught — so
    # summed over those buckets, n_caught >= the production pair count.
    # Ties the eval to minhash_neardup_pairs instead of only to itself.
    rows = []
    for i in range(8):
        text = BASE + f" tail {i % 3} mark {i % 2}"
        rows.append((i, text))
    df = _docs(spark, rows)
    prod = dedup.minhash_neardup_pairs(df, threshold=0.5).count()
    ev = dedup.lsh_recall_eval(df).collect()
    caught_high = sum(r["n_caught"] for r in ev if r["pct_bucket"] >= 50)
    assert prod > 0  # the corpus must exercise the property
    assert caught_high >= prod


def test_catalog_row_matches_oracle_shape(spark):
    from geospatial_web_scraper_spark.entry_queries import (
        QUERIES,
        ORACLES,
    )

    assert "dedup_recall_eval" in QUERIES
    assert "dedup_recall_eval" in ORACLES
    df = QUERIES["dedup_recall_eval"](spark, "/root/testdata/sf0.001")
    assert [f.name for f in df.schema.fields] == [
        "pct_bucket",
        "n_truth",
        "n_caught",
        "recall6",
    ]
