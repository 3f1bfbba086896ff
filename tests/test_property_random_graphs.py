"""Property-style robustness: on RANDOM link graphs (not the arithmetic
corpus), the engine must still match the oracle exactly — trace, texts,
downloads — including under bloom + politeness + checkpoint/resume
combined. Graphs are seeded (deterministic) to keep CI stable."""

import random

import pytest
from pyspark.sql import types as T

from geospatial_web_scraper_spark.oracle import crawl_oracle
from geospatial_web_scraper_spark.operators.politeness import PolitenessScheduler
from geospatial_web_scraper_spark.operators.seen import ShardedBloomSeenFilter
from geospatial_web_scraper_spark.plans.bfs import CrawlEngine
from geospatial_web_scraper_spark.plans.store import SnapshotStore

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("status", T.IntegerType()),
        T.StructField("content_type", T.StringType()),
    ]
)


def random_corpus(seed: int, n: int = 80, n_hosts: int = 5):
    rng = random.Random(seed)
    hosts = [f"h{h}.test.org" for h in range(n_hosts)]
    urls = [f"https://{rng.choice(hosts)}/p/{i}.html" for i in range(n)]
    pages = {}
    for i, url in enumerate(urls):
        anchors = []
        for _ in range(rng.randint(0, 6)):
            tgt = rng.randrange(n)
            if rng.random() < 0.3:
                anchors.append(f'<a href="/p/{tgt}.html">r</a>')  # relative
            else:
                anchors.append(f'<a href="{urls[tgt]}">a</a>')
        if rng.random() < 0.2:
            anchors.append(f'<a href="/files/d{i}.zip">z</a>')  # geo leaf
        if rng.random() < 0.15:
            anchors.append('<a href="mailto:x@y.z">m</a>')  # decoy
        if rng.random() < 0.15:
            anchors.append(
                f'<div class="nav-x"><a href="/p/{rng.randrange(n)}.html">d</a></div>'
            )  # boilerplate decoy
        body = "".join(anchors)
        status = 404 if rng.random() < 0.05 else 200
        ctype = "application/zip" if rng.random() < 0.05 else "text/html"
        html = (
            f"<html><head><title>T{i}</title>"
            f'<meta name="description" content="D{i} page.">'
            f"</head><body><p>Body {i} text.</p>{body}</body></html>"
        )
        pages[url] = {
            "page_id": i,
            "url": url,
            "html": html,
            "status": status,
            "content_type": ctype,
        }
    seeds = sorted(rng.sample(urls, 5))
    return pages, seeds


def _pages_df(spark, pages):
    rows = [
        (r["url"], bytearray(r["html"].encode()), r["status"], r["content_type"])
        for r in pages.values()
    ]
    return spark.createDataFrame(rows, PAGES_SCHEMA)


def _seeds_df(spark, seeds):
    return spark.createDataFrame(
        [(i, u, f"seed {i}") for i, u in enumerate(seeds)],
        "seed_order int, url string, description string",
    )


def _trace(df):
    return [
        (r["seq"], r["url"], r["depth"], r["parent_url"], r["round"])
        for r in df.orderBy("seq").collect()
    ]


@pytest.mark.parametrize("seed", [7, 23, 101])
def test_random_graph_fifo_parity(spark, seed):
    pages, seeds = random_corpus(seed)
    want = crawl_oracle(pages, seeds, max_crawl=60)
    run = CrawlEngine(
        spark, _pages_df(spark, pages), max_crawl=60, collect_text=True
    ).run(_seeds_df(spark, seeds))
    assert _trace(run.trace) == want.trace
    assert {r["url"]: r["text"] for r in run.texts.collect()} == want.texts
    assert sorted(r["url"] for r in run.downloads.collect()) == sorted(want.downloads)


@pytest.mark.parametrize("seed", [7, 23])
def test_random_graph_all_features_combined(spark, tmp_path_factory, seed):
    """bloom + priority scheduler + snapshot store + resume, all at once,
    still exactly equals the oracle's priority mode."""
    pages, seeds = random_corpus(seed)
    cfg = dict(default_tokens=3, n_salts=2, host_budgets={}, robots={})
    want = crawl_oracle(pages, seeds, max_crawl=None, scheduler=cfg, max_rounds=12)

    def engine(store=None, max_rounds=12):
        return CrawlEngine(
            spark,
            _pages_df(spark, pages),
            max_crawl=None,
            seen_filter=ShardedBloomSeenFilter(
                spark, n_shards=4, bits_per_shard=1 << 14
            ),
            scheduler=PolitenessScheduler(
                default_tokens_per_round=3, n_salts=2
            ),
            store=store,
            max_rounds=max_rounds,
        )

    run = engine().run(_seeds_df(spark, seeds))
    assert _trace(run.trace) == want.trace

    # interrupt after 3 rounds, resume in a fresh engine → identical trace
    base = str(tmp_path_factory.mktemp(f"snap{seed}"))
    store = SnapshotStore(spark, base)
    partial = engine(store=store, max_rounds=3).run(_seeds_df(spark, seeds))
    assert partial.rounds <= 3
    resumed = engine(store=SnapshotStore(spark, base)).resume()
    assert _trace(resumed.trace) == want.trace
