"""Corpus triangle tests: the Spark-native generator, the Python mirror, and
the DuckDB SQL formula must describe the exact same corpus."""

import duckdb
import pytest

from geospatial_web_scraper_spark import corpus
from geospatial_web_scraper_spark.kernel import extract_links, extract_metadata
from geospatial_web_scraper_spark.oracle import crawl_oracle

N = 120  # small but covers every modulus branch (97, 41, 29, 23, 17, 13, 11)


def test_python_html_matches_spark_html(spark):
    rows = {
        r["page_id"]: r
        for r in corpus.corpus_df(spark, N).select("page_id", "url", "html", "text").collect()
    }
    assert len(rows) == N
    for i in range(N):
        assert rows[i]["url"] == corpus.url_of(i)
        assert rows[i]["html"] == corpus.html_of(i, N).encode("utf-8"), f"html mismatch @ {i}"
        assert rows[i]["text"] == corpus.text_of(i), f"text mismatch @ {i}"


def test_filler_parity_and_invariance(spark):
    """Filler blocks change bytes, not semantics: Spark==Python bytes, and
    extraction output is identical with and without filler."""
    rows = {
        r["page_id"]: r
        for r in corpus.corpus_df(spark, 40, filler_paras=3)
        .select("page_id", "html", "text")
        .collect()
    }
    for i in range(40):
        assert rows[i]["html"] == corpus.html_of(i, 40, filler_paras=3).encode("utf-8")
        assert (
            extract_links(corpus.html_of(i, 40, filler_paras=3), corpus.url_of(i))
            == extract_links(corpus.html_of(i, 40), corpus.url_of(i))
        )
        md = extract_metadata(corpus.html_of(i, 40, filler_paras=3), corpus.url_of(i))
        assert md["description"] == corpus.text_of(i)


def test_kernel_extraction_matches_edge_formula():
    for i in range(N):
        got = [(l["url"], l["is_geo"]) for l in extract_links(corpus.html_of(i, N), corpus.url_of(i))]
        assert got == corpus.edges_of(i, N), f"edges mismatch @ {i}"


def test_kernel_text_matches_text_formula():
    for i in range(N):
        md = extract_metadata(corpus.html_of(i, N), corpus.url_of(i))
        assert md["description"] == corpus.text_of(i), f"text mismatch @ {i}"
        assert md["title"] == corpus.title_of(i), f"title mismatch @ {i}"
        assert md["keywords"] == ["geo", f"data{i % 3}"]


def test_oracle_seen_set_matches_recursive_sql():
    """The single-threaded oracle BFS (budget off) must equal an independent
    DuckDB recursive-CTE reachability computation over the edge formula."""
    pages = corpus.pages_dict(N)
    seeds = [corpus.url_of(i) for i in corpus.seed_ids(N)]
    res = crawl_oracle(pages, seeds, max_crawl=None)

    sql = f"""
WITH RECURSIVE {corpus.sql_prelude(N)},
walk(url, depth) AS (
  SELECT url, 0 FROM seeds
  UNION ALL
  SELECT e.dst, w.depth + 1
  FROM walk w
  JOIN pgu p ON p.url = w.url
  JOIN edges e ON e.src = p.i
  WHERE w.depth + 1 < 4
)
SELECT url, MIN(depth) AS depth FROM walk GROUP BY url ORDER BY url
"""
    got_sql = dict(duckdb.connect().execute(sql).fetchall())
    got_oracle = {t[1]: t[2] for t in res.trace}
    assert got_oracle == got_sql


def test_oracle_budget_quirk():
    """Budget B records exactly B+1 URLs (reference crawler.go:52-55 quirk)."""
    pages = corpus.pages_dict(N)
    seeds = [corpus.url_of(i) for i in corpus.seed_ids(N)]
    full = crawl_oracle(pages, seeds, max_crawl=None)
    if len(full.trace) > 21:
        capped = crawl_oracle(pages, seeds, max_crawl=20)
        assert len(capped.trace) == 21
        assert [t[1] for t in capped.trace] == [t[1] for t in full.trace[:21]]


def test_oracle_terminal_and_404_are_leaves():
    pages = corpus.pages_dict(N)
    seeds = [corpus.url_of(i) for i in corpus.seed_ids(N)]
    res = crawl_oracle(pages, seeds, max_crawl=None)
    seen = set(res.seen)
    # terminal-download pages that were reached are in downloads, not expanded
    for u in res.downloads:
        assert pages[u]["content_type"] == "application/zip"
    # geo file urls (not in pages) may be seen but contribute no text
    geo_seen = [u for u in seen if "/data/file_" in u]
    assert geo_seen, "corpus should have reachable geo leaves"
    for u in geo_seen:
        assert u not in res.texts


def test_seed_ids_all_fetchable():
    for i in corpus.seed_ids(corpus.N_DEFAULT):
        assert corpus.status_of(i) == 200
        assert corpus.content_type_of(i) == "text/html"


@pytest.mark.parametrize("n", [60, 300])
def test_seeds_df_matches_sql_seeds(spark, n):
    eng = {r["seed_order"]: r["url"] for r in corpus.seeds_df(spark, n).collect()}
    sql = dict(
        duckdb.connect()
        .execute(f"WITH {corpus.sql_prelude(n)} SELECT seed_order, url FROM seeds")
        .fetchall()
    )
    assert eng == sql
