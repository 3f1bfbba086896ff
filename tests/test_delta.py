"""Snapshot-delta operator (operators/delta.py): status classification on
a toy two-snapshot corpus, the audit report, the precomputed-hash path,
and the scale-shape pin (content hashing happens under the scan
projection, below the full-outer join's exchange — text never shuffles).
"""

from pyspark.sql import functions as F

from geospatial_web_scraper_spark.operators.delta import (
    STATUSES,
    delta_report,
    snapshot_delta,
)


def _toy(spark):
    old = spark.createDataFrame(
        [
            ("u/keep", "same text"),
            ("u/edit", "old text"),
            ("u/gone", "bye"),
        ],
        ["url", "text"],
    )
    new = spark.createDataFrame(
        [
            ("u/keep", "same text"),
            ("u/edit", "new text"),
            ("u/born", "hi"),
        ],
        ["url", "text"],
    )
    return old, new


def test_statuses(spark):
    old, new = _toy(spark)
    got = {
        r["url"]: r["status"]
        for r in snapshot_delta(old, new).collect()
    }
    assert got == {
        "u/keep": "unchanged",
        "u/edit": "changed",
        "u/gone": "removed",
        "u/born": "added",
    }
    assert set(got.values()) == set(STATUSES)


def test_null_text_is_presence_not_absence(spark):
    # a row whose text is NULL is still PRESENT in its snapshot: status
    # must come from key presence (changed/unchanged), never added/removed
    # — a live page must not be tombstoned because its hash was null (r4
    # review finding).
    old = spark.createDataFrame(
        [("u/nulled", None), ("u/both-null", None)],
        "url string, text string",
    )
    new = spark.createDataFrame(
        [("u/nulled", "now has text"), ("u/both-null", None)],
        "url string, text string",
    )
    got = {
        r["url"]: r["status"] for r in snapshot_delta(old, new).collect()
    }
    assert got == {"u/nulled": "changed", "u/both-null": "unchanged"}


def test_hashes_and_report(spark):
    old, new = _toy(spark)
    d = snapshot_delta(old, new)
    rows = {r["url"]: r for r in d.collect()}
    assert rows["u/born"]["old_hash"] is None
    assert rows["u/gone"]["new_hash"] is None
    assert rows["u/keep"]["old_hash"] == rows["u/keep"]["new_hash"]
    assert rows["u/edit"]["old_hash"] != rows["u/edit"]["new_hash"]
    rep = {r["status"]: r["n"] for r in delta_report(d).collect()}
    assert rep == {"added": 1, "removed": 1, "changed": 1, "unchanged": 1}


def test_precomputed_hash_column(spark):
    """hash_col reuses a persisted content hash — same verdicts as
    hashing the text, without reading it (the snapshot-store path)."""
    old, new = _toy(spark)
    oh = old.select("url", F.md5("text").alias("h"))
    nh = new.select("url", F.md5("text").alias("h"))
    via_hash = {
        r["url"]: r["status"]
        for r in snapshot_delta(oh, nh, hash_col="h").collect()
    }
    via_text = {
        r["url"]: r["status"]
        for r in snapshot_delta(old, new).collect()
    }
    assert via_hash == via_text


def test_text_hashed_below_exchange(spark):
    """Scale pin: md5 of the text column is evaluated in the scan-side
    stage, BELOW the join's hash-partitioning exchange — only (url, hash)
    pairs shuffle. In the executed-plan printout parents precede
    children, so the first Exchange must appear before the first md5."""
    old, new = _toy(spark)
    plan = (
        snapshot_delta(old, new)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange hashpartitioning" in plan, plan
    assert "md5" in plan, plan
    assert plan.index("Exchange hashpartitioning") < plan.index("md5"), plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_delta_feeds_recrawl(spark):
    """Composition: the delta's changed+added slice becomes the expired
    seed batch of CrawlEngine.run_with_seen — exactly the TTL-recrawl
    entry — and the recrawl fetches the changed pages (and anything new
    they now link to) without touching the unchanged slice."""
    from geospatial_web_scraper_spark import corpus
    from geospatial_web_scraper_spark.functions.ordering import (
        with_global_seq,
    )
    from geospatial_web_scraper_spark.plans.bfs import CrawlEngine

    N = 60
    pages = corpus.corpus_df(spark, N)
    first = CrawlEngine(spark, pages, max_crawl=None, collect_text=True).run(
        corpus.seeds_df(spark, N)
    )
    old = first.texts.select("url", "text")
    # today's fetch: host3 pages changed (content drift), rest identical
    new = old.withColumn(
        "text",
        F.when(
            F.col("url").startswith("https://host3."),
            F.concat(F.col("text"), F.lit(" drift")),
        ).otherwise(F.col("text")),
    )
    from geospatial_web_scraper_spark.operators.delta import snapshot_delta

    d = snapshot_delta(old, new)
    stale = d.where(F.col("status").isin("changed", "added")).select("url")
    assert stale.count() > 0
    expired, _ = with_global_seq(stale, ["url"], seq_col="seed_order")
    keep_seen = d.where(F.col("status") == "unchanged").select("url")
    second = CrawlEngine(spark, pages, max_crawl=None).run_with_seen(
        expired.select("seed_order", "url"), keep_seen
    )
    refetched = {r["url"] for r in second.trace.select("url").collect()}
    changed = {r["url"] for r in stale.collect()}
    # every stale URL is refetched; no unchanged URL is unless a stale
    # page links to it beyond the kept seen set (impossible here: seen
    # covers the whole first crawl)
    assert changed <= refetched
    kept = {r["url"] for r in keep_seen.collect()}
    assert refetched.isdisjoint(kept)


def test_change_rates_goldens(spark):
    """Cho–Garcia-Molina estimator branches: never-changed parks at
    max_interval; always-changed stays finite (the +0.5 bias terms);
    added/removed rows are not evidence; mixed history clamps sanely."""
    import math

    from geospatial_web_scraper_spark.operators.delta import change_rates

    hist = spark.createDataFrame(
        # static: 4 unchanged; hot: 2 changed (all obs changed);
        # mixed: 1 changed + 3 unchanged; noise: added/removed ignored
        [("static", "unchanged")] * 4
        + [("hot", "changed")] * 2
        + [("mixed", "changed")]
        + [("mixed", "unchanged")] * 3
        + [("mixed", "added"), ("mixed", "removed"), ("ghost", "added")],
        ["url", "status"],
    )
    rows = {r["url"]: r for r in change_rates(hist, max_interval=8).collect()}
    assert "ghost" not in rows  # no both-sides evidence
    s = rows["static"]
    assert (s["n_obs"], s["n_changed"], s["change_rate"]) == (4, 0, 0.0)
    assert s["next_interval"] == 8  # parked at max
    h = rows["hot"]
    assert (h["n_obs"], h["n_changed"]) == (2, 2)
    assert h["change_rate"] == round(-math.log(0.5 / 2.5), 6)
    assert h["next_interval"] == 1
    m = rows["mixed"]
    assert (m["n_obs"], m["n_changed"]) == (4, 1)
    assert m["change_rate"] == round(-math.log(3.5 / 4.5), 6)
    # 1/0.251314 = 3.979 -> 4
    assert m["next_interval"] == 4
