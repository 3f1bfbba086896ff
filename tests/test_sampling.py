"""Deterministic corpus splitting (operators/sampling.py split_corpus):
stability under corpus growth, salt independence, fraction validation."""

def test_split_corpus_deterministic_and_stable_under_growth(spark):
    import pytest
    from pyspark.sql import functions as F

    from geospatial_web_scraper_spark.operators.sampling import split_corpus

    small = spark.range(0, 200).select(F.col("id").alias("doc_id"))
    big = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    s_small = {r["doc_id"]: r["split"] for r in split_corpus(small, fr).collect()}
    s_big = {r["doc_id"]: r["split"] for r in split_corpus(big, fr).collect()}
    # growth never moves a document across splits
    assert all(s_big[d] == s_small[d] for d in s_small)
    # fractions roughly honored at 2000 docs
    from collections import Counter

    c = Counter(s_big.values())
    assert 0.7 < c["train"] / 2000 < 0.9
    assert c["val"] > 0 and c["test"] > 0
    # a different salt draws an independent split
    s_alt = {
        r["doc_id"]: r["split"]
        for r in split_corpus(small, fr, salt="other").collect()
    }
    assert s_alt != s_small
    with pytest.raises(ValueError):
        split_corpus(small, {"train": 0.5, "val": 0.2})
