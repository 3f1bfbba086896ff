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


def test_split_corpus_grouped_is_group_disjoint(spark):
    from pyspark.sql import functions as F

    from geospatial_web_scraper_spark.operators.sampling import split_corpus

    df = spark.range(0, 300).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("host"), (F.col("id") % 17).cast("string")).alias(
            "source"
        ),
    )
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    rows = split_corpus(df, fr, group_col="source").collect()
    assert len(rows) == 300
    # every document of a group shares one split label
    by_group = {}
    for r in rows:
        by_group.setdefault(r["source"], set()).add(r["split"])
    assert all(len(v) == 1 for v in by_group.values()), by_group
    # the group split equals the doc-keyed split of the group value
    # itself (same salt:key hash), so the band arithmetic is shared
    gdf = spark.createDataFrame(
        [(g,) for g in by_group], "doc_id string"
    )
    direct = {
        r["doc_id"]: r["split"] for r in split_corpus(gdf, fr).collect()
    }
    assert all(by_group[g] == {direct[g]} for g in by_group)
    # growth in OTHER groups never moves an existing group's band
    big = spark.range(0, 3000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("host"), (F.col("id") % 97).cast("string")).alias(
            "source"
        ),
    )
    big_groups = {}
    for r in split_corpus(big, fr, group_col="source").collect():
        big_groups.setdefault(r["source"], set()).add(r["split"])
    assert all(big_groups[g] == by_group[g] for g in by_group)


def test_weighted_sample_matches_python_mirror(spark):
    import hashlib
    import math

    from pyspark.sql import functions as F  # noqa: F811

    from geospatial_web_scraper_spark.operators.sampling import (
        weighted_sample,
    )

    rows = [(i, "g" + str(i % 3), (i % 7) + (0 if i != 11 else -8))
            for i in range(40)]  # doc 11 gets weight -4: excluded
    df = spark.createDataFrame(rows, "doc_id long, source string, w long")
    got = {}
    for r in weighted_sample(df, k=2, weight_col="w").collect():
        got.setdefault(r["source"], []).append(
            (r["rank"], r["doc_id"], r["weight"], r["key"])
        )
    for v in got.values():
        v.sort()

    def key(i, w):
        u = max(
            int(hashlib.md5(f"wsample:{i}".encode()).hexdigest()[:15], 16)
            / float(1 << 60),
            2.0 ** -60,
        )
        return int(round(math.log(u) / w * 1_000_000))

    exp = {}
    for i, g, w in rows:
        if w <= 0:
            continue
        exp.setdefault(g, []).append((key(i, w), -i))
    wl = {i: w for i, _, w in rows}
    for g, ks in exp.items():
        ks.sort(reverse=True)
        want = [(r + 1, -ni, wl[-ni], kk) for r, (kk, ni) in enumerate(ks[:2])]
        assert got[g] == sorted(want), (g, got[g], want)
    assert all(11 not in [d for _, d, _, _ in v] for v in got.values())
