"""robots.txt parsing + rules-table plumbing + end-to-end scheduler use."""

from geospatial_web_scraper_spark import corpus
from geospatial_web_scraper_spark.operators.politeness import PolitenessScheduler
from geospatial_web_scraper_spark.operators.robots import (
    budgets_from_delays,
    parse_robots_txt,
    robots_rules_df,
)
from geospatial_web_scraper_spark.plans.bfs import CrawlEngine

CLASSIC = """
# comments are ignored
User-agent: googlebot
Disallow: /private/

User-agent: *
Disallow: /data/
Disallow: /tmp/
Allow: /data/public/
Crawl-delay: 2

User-agent: badbot
Disallow: /
"""


def test_parse_star_group():
    r = parse_robots_txt(CLASSIC, agent="*")
    assert r["disallow"] == ["/data/", "/tmp/"]
    assert r["allow"] == ["/data/public/"]
    assert r["crawl_delay"] == 2.0


def test_parse_specific_agent_wins():
    r = parse_robots_txt(CLASSIC, agent="googlebot")
    assert r["disallow"] == ["/private/"]
    assert r["crawl_delay"] is None
    r = parse_robots_txt(CLASSIC, agent="badbot")
    assert r["disallow"] == ["/"]


def test_parse_edge_cases():
    assert parse_robots_txt("", "*") == {
        "disallow": [], "allow": [], "crawl_delay": None
    }
    # empty Disallow value = allow all; rules before any UA line ignored
    r = parse_robots_txt("Disallow: /x/\nUser-agent: *\nDisallow:\n", "*")
    assert r["disallow"] == []
    # multiple consecutive UA lines share one group
    r = parse_robots_txt("User-agent: a\nUser-agent: *\nDisallow: /q/", "*")
    assert r["disallow"] == ["/q/"]


def test_rules_df_and_budgets(spark):
    docs = spark.createDataFrame(
        [("h0.org", CLASSIC), ("h1.org", ""), ("h2.org", "User-agent: *\nCrawl-delay: 30")],
        "host string, robots_txt string",
    )
    rules = robots_rules_df(docs)
    got = {r["host"]: r for r in rules.collect()}
    assert got["h0.org"]["disallow_prefixes"] == ["/data/", "/tmp/"]
    assert got["h0.org"]["crawl_delay"] == 2.0
    assert got["h1.org"]["disallow_prefixes"] == []
    budgets = {
        r["host"]: r["tokens_per_round"]
        for r in budgets_from_delays(rules, round_seconds=60, default_tokens=40).collect()
    }
    assert budgets == {"h0.org": 30, "h1.org": 40, "h2.org": 2}


def test_end_to_end_robots_cache_feeds_scheduler(spark):
    """robots docs → rules table → scheduler: /data/ on host0 never crawled."""
    docs = spark.createDataFrame(
        [("host0.example.org", "User-agent: *\nDisallow: /data/")],
        "host string, robots_txt string",
    )
    rules = robots_rules_df(docs)
    sched = PolitenessScheduler(robots=rules, default_tokens_per_round=40)
    run = CrawlEngine(
        spark, corpus.corpus_df(spark, 120), max_crawl=None, scheduler=sched,
        max_rounds=8,
    ).run(corpus.seeds_df(spark, 120))
    urls = [r["url"] for r in run.trace.collect()]
    assert urls
    assert not any(u.startswith("https://host0.example.org/data/") for u in urls)
    assert any("/data/file_" in u for u in urls)  # other hosts unaffected


def test_robots_bodies_two_form_parity_and_parse_golden():
    """corpus.robots_txt_of_host (Spark input) and corpus.robots_sql_body
    (oracle input) must stay byte-identical, and the parser goldens pin
    the precedence semantics the robots_parse catalog query value-checks:
    exact-agent groups override the * group, UA runs survive blank lines,
    empty Disallow ignored."""
    import duckdb

    con = duckdb.connect()
    sql_bodies = dict(
        con.execute(
            f"SELECT h, {corpus.robots_sql_body('h')} FROM "
            f"(SELECT unnest(range({corpus.N_HOSTS}))::BIGINT AS h)"
        ).fetchall()
    )
    for h in range(corpus.N_HOSTS):
        assert sql_bodies[h] == corpus.robots_txt_of_host(h), h

    assert parse_robots_txt(corpus.robots_txt_of_host(0), "gwssbot")[
        "disallow"
    ] == ["/page/0", "/data/0/"]  # * and gwssbot in ONE group (blank inside run)
    assert parse_robots_txt(corpus.robots_txt_of_host(1), "gwssbot")[
        "disallow"
    ] == ["/private/1"]  # exact group overrides the * group entirely
    assert parse_robots_txt(corpus.robots_txt_of_host(9), "gwssbot")[
        "disallow"
    ] == ["/page/4", "/data/1/", "/private/0"]  # two exact groups concat
    assert parse_robots_txt(corpus.robots_txt_of_host(2), "otherbot")[
        "disallow"
    ] == ["/other/2"]


def test_allow_overrides_disallow_longest_match(spark):
    """RFC 9309 §2.2.2: the most specific matching rule wins; Allow wins
    exact-length ties. /data/public/ survives a /data/ disallow; plain
    /data/x stays dropped; hosts without rules are untouched."""
    docs = spark.createDataFrame(
        [
            (
                "host0.example.org",
                "User-agent: *\nDisallow: /data/\nAllow: /data/public/",
            ),
            ("host1.example.org", "User-agent: *\nDisallow: /p\nAllow: /p"),
        ],
        "host string, robots_txt string",
    )
    rules = robots_rules_df(docs)
    frontier = spark.createDataFrame(
        [
            ("https://host0.example.org/data/secret.csv", 0, None, -1, 0, False),
            ("https://host0.example.org/data/public/a.csv", 0, None, -1, 1, False),
            ("https://host0.example.org/other.html", 0, None, -1, 2, False),
            ("https://host1.example.org/page.html", 0, None, -1, 3, False),
            ("https://host2.example.org/data/x.html", 0, None, -1, 4, False),
        ],
        "url string, depth int, parent_url string, parent_seq long,"
        " pos int, is_geo boolean",
    )
    sched = PolitenessScheduler(robots=rules, default_tokens_per_round=40)
    got = {r["url"] for r in sched.apply(frontier, 0).collect()}
    assert got == {
        "https://host0.example.org/data/public/a.csv",
        "https://host0.example.org/other.html",
        # tie: Allow /p == Disallow /p -> allowed
        "https://host1.example.org/page.html",
        # no rules for host2 -> untouched
        "https://host2.example.org/data/x.html",
    }
