"""Engine-vs-oracle golden-trace parity (the correctness bar of the north
rule: exact crawl ordering + URL-seen set + byte-identical text per url)."""

import pytest

from geospatial_web_scraper_spark import corpus
from geospatial_web_scraper_spark.oracle import crawl_oracle
from geospatial_web_scraper_spark.plans.bfs import CrawlEngine
from geospatial_web_scraper_spark.plans.store import SnapshotStore

N = 120


@pytest.fixture(scope="module")
def oracle_run():
    pages = corpus.pages_dict(N)
    seeds = [corpus.url_of(i) for i in corpus.seed_ids(N)]
    return crawl_oracle(pages, seeds, max_crawl=400)


@pytest.fixture(scope="module")
def engine_run(spark):
    eng = CrawlEngine(
        spark,
        corpus.corpus_df(spark, N),
        max_crawl=400,
        collect_text=True,
    )
    return eng.run(corpus.seeds_df(spark, N))


def _trace_rows(df):
    return [
        (r["seq"], r["url"], r["depth"], r["parent_url"], r["round"])
        for r in df.orderBy("seq").collect()
    ]


def test_exact_trace_parity(engine_run, oracle_run):
    assert _trace_rows(engine_run.trace) == oracle_run.trace


def test_seen_set_parity(engine_run, oracle_run):
    got = {r["url"] for r in engine_run.trace.collect()}
    assert got == set(oracle_run.seen)


def test_downloads_parity(engine_run, oracle_run):
    got = sorted(r["url"] for r in engine_run.downloads.collect())
    assert got == sorted(oracle_run.downloads)


def test_download_bytes_equal_page_bodies(spark, oracle_run):
    """K1 with download_bytes=True: the downloads branch carries the fetched
    body, and the written bytes equal the corpus page body for every
    geo-MIME (zip-formula) row (reference crawler.go:194-229 io.Copy)."""
    eng = CrawlEngine(
        spark, corpus.corpus_df(spark, N), max_crawl=400, download_bytes=True
    )
    run = eng.run(corpus.seeds_df(spark, N))
    got = {r["url"]: bytes(r["body"]) for r in run.downloads.collect()}
    assert sorted(got) == sorted(oracle_run.downloads)
    pages = corpus.pages_dict(N)
    assert len(got) > 0
    for url, body in got.items():
        assert body == pages[url]["html"].encode("utf-8"), url


def test_byte_identical_text(engine_run, oracle_run):
    got = {r["url"]: r["text"] for r in engine_run.texts.collect()}
    assert got == oracle_run.texts
    # and the corpus golden text column agrees (three-way check)
    for url, text in got.items():
        i = int(url.rsplit("/", 1)[-1].removesuffix(".html"))
        assert text == corpus.text_of(i)


def test_crawl_texts_with_feeds_fold(spark):
    """CrawlEngine(feeds=…): the collect_text path runs the full
    ExtractMetadata INCLUDING the offline RSS harvest (reference parity —
    the fetch happens during the crawl). Every collected text must equal the
    kernel's fold of the same page against the same feed corpus."""
    from geospatial_web_scraper_spark.kernel import extract_metadata_with_feeds

    eng = CrawlEngine(
        spark,
        corpus.corpus_df(spark, N),
        max_crawl=400,
        collect_text=True,
        feeds=corpus.xml_docs_df(spark),
    )
    run = eng.run(corpus.seeds_df(spark, N))
    lookup = corpus.xml_docs_dict()
    got = {r["url"]: (r["title"], r["text"]) for r in run.texts.collect()}
    assert got
    pages = corpus.pages_dict(N)
    folded = 0
    for url, (title, text) in got.items():
        md = extract_metadata_with_feeds(pages[url]["html"], url, lookup.get)
        assert (title, text) == (md["title"], md["description"]), url
        if "Feed host" in title:
            folded += 1
    # the corpus guarantees both branches appear among crawled xml pages
    assert folded > 0
    assert folded < len(got)


def test_budget_cut_exact(spark, oracle_run):
    """Budget B records exactly the first B+1 of the unbudgeted total order."""
    budget = 30
    eng = CrawlEngine(spark, corpus.corpus_df(spark, N), max_crawl=budget)
    run = eng.run(corpus.seeds_df(spark, N))
    pages = corpus.pages_dict(N)
    seeds = [corpus.url_of(i) for i in corpus.seed_ids(N)]
    oracle_capped = crawl_oracle(pages, seeds, max_crawl=budget)
    assert _trace_rows(run.trace) == oracle_capped.trace
    assert run.recorded == budget + 1


def test_lineage_partition_rows(engine_run):
    rows = engine_run.lineage.collect()
    per_round = [r for r in rows if r["partition_id"] == -1]
    assert [r["round"] for r in sorted(per_round, key=lambda r: r["round"])] == list(
        range(engine_run.rounds)
    )
    # per-partition fetch rows exist and bytes are positive where pages matched
    part = [r for r in rows if r["partition_id"] >= 0]
    assert part and any(r["bytes_fetched"] > 0 for r in part)


def test_checkpoint_resume_equivalence(spark, tmp_path_factory, oracle_run):
    """Run 2 rounds with a store, then resume in a fresh engine: the final
    trace must equal an uninterrupted run (north rule: exact resume)."""
    base = str(tmp_path_factory.mktemp("snap"))
    store = SnapshotStore(spark, base)
    eng = CrawlEngine(
        spark, corpus.corpus_df(spark, N), max_crawl=400, store=store, max_rounds=2
    )
    partial = eng.run(corpus.seeds_df(spark, N))
    assert partial.rounds == 2
    assert store.last_committed() == 1

    eng2 = CrawlEngine(
        spark, corpus.corpus_df(spark, N), max_crawl=400, store=store
    )
    resumed = eng2.resume()
    assert _trace_rows(resumed.trace) == oracle_run.trace


def test_compacted_store_resume_equivalence(spark, tmp_path_factory, oracle_run):
    """compact() merges per-round snapshots into one base; a resume from
    the compacted store must be byte-identical to an uncompacted resume
    (= the uninterrupted oracle trace), and the per-round directories it
    superseded must be gone (bounded restart cost on long crawls)."""
    import os

    base = str(tmp_path_factory.mktemp("snapc"))
    store = SnapshotStore(spark, base)
    eng = CrawlEngine(
        spark, corpus.corpus_df(spark, N), max_crawl=400, store=store,
        max_rounds=3, collect_text=True,
    )
    eng.run(corpus.seeds_df(spark, N))
    assert store.last_committed() == 2
    store.compact()
    assert store.compacted_upto() == 2
    # superseded round dirs removed; exactly one base per series remains
    assert sorted(os.listdir(os.path.join(base, "trace"))) == ["base=2"]
    assert not store.exists("trace", 0)

    eng2 = CrawlEngine(
        spark, corpus.corpus_df(spark, N), max_crawl=400,
        store=SnapshotStore(spark, base), collect_text=True,
    )
    resumed = eng2.resume()
    assert _trace_rows(resumed.trace) == oracle_run.trace
    assert {r["url"]: r["text"] for r in resumed.texts.collect()} == oracle_run.texts

    # compacting again after more committed rounds folds the old base + tail
    store2 = SnapshotStore(spark, base)
    assert store2.last_committed() > 2
    store2.compact()
    assert sorted(os.listdir(os.path.join(base, "trace"))) == [
        f"base={store2.last_committed()}"
    ]
    restitched = CrawlEngine(
        spark, corpus.corpus_df(spark, N), max_crawl=400,
        store=SnapshotStore(spark, base),
    )
    # drained crawl: resume returns the stitched history unchanged
    assert _trace_rows(restitched.resume().trace) == oracle_run.trace


def test_shuffle_fetch_fallback_trace_identical(spark, engine_run):
    """broadcast_fetch_limit=0 forces the shuffle-join fetch path (the
    huge-round fallback on a real cluster); the trace must be identical to
    the broadcast path's."""
    eng = CrawlEngine(
        spark,
        corpus.corpus_df(spark, N),
        max_crawl=400,
        broadcast_fetch_limit=0,
    )
    run = eng.run(corpus.seeds_df(spark, N))
    cols = ["seq", "url", "depth", "parent_url", "round"]
    got = sorted(tuple(r[c] for c in cols) for r in run.trace.collect())
    want = sorted(
        tuple(r[c] for c in cols) for r in engine_run.trace.select(*cols).collect()
    )
    assert got == want


def test_resume_with_toggled_download_bytes(spark, tmp_path_factory, oracle_run):
    """Review r3: a crawl checkpointed WITHOUT bodies then resumed with
    download_bytes=True (and the reverse) must stitch instead of crashing
    on the missing/extra `body` column. Old url-only rounds surface
    body=NULL (their bytes were never captured); rounds crawled after the
    toggle carry real bytes; resuming without bytes drops stored bodies."""
    pages = corpus.pages_dict(N)

    # url-only checkpoint -> resume WITH bytes
    store = SnapshotStore(spark, str(tmp_path_factory.mktemp("snap_dlb")))
    eng = CrawlEngine(
        spark, corpus.corpus_df(spark, N), max_crawl=400,
        store=store, max_rounds=2,
    )
    eng.run(corpus.seeds_df(spark, N))
    eng2 = CrawlEngine(
        spark, corpus.corpus_df(spark, N), max_crawl=400,
        store=store, download_bytes=True,
    )
    run = eng2.resume()
    assert run.downloads.columns == ["url", "body"]
    rows = {r["url"]: r["body"] for r in run.downloads.collect()}
    assert sorted(rows) == sorted(oracle_run.downloads)
    for url, body in rows.items():
        if body is not None:  # post-toggle rounds carry the true bytes
            assert bytes(body) == pages[url]["html"].encode("utf-8"), url

    # bytes checkpoint -> resume WITHOUT bytes
    store2 = SnapshotStore(spark, str(tmp_path_factory.mktemp("snap_dlb2")))
    eng3 = CrawlEngine(
        spark, corpus.corpus_df(spark, N), max_crawl=400,
        store=store2, max_rounds=2, download_bytes=True,
    )
    eng3.run(corpus.seeds_df(spark, N))
    eng4 = CrawlEngine(
        spark, corpus.corpus_df(spark, N), max_crawl=400, store=store2,
    )
    run2 = eng4.resume()
    assert run2.downloads.columns == ["url"]
    assert sorted(r["url"] for r in run2.downloads.collect()) == sorted(
        oracle_run.downloads
    )
