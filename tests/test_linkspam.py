"""host_link_report (operators/linkspam.py) — semantics pinned on a
hand-built host graph where every signal is computable by eye.

Graph (one row per page-level link; host ids):
  host 0: 4 intra links, 2 → host1, 1 → host2     (nepotistic)
  host 1: 1 → host0, 1 → host2, 1 → host3         (spread, recip w/ 0)
  host 2: 3 → host3                                (concentrated, no recip)
  host 3: (no outlinks — absent from the report)
"""

import pytest
from pyspark.sql import functions as F

from geospatial_web_scraper_spark.operators import linkspam


EDGES = (
    [(0, 0)] * 4
    + [(0, 1)] * 2
    + [(0, 2)]
    + [(1, 0), (1, 2), (1, 3)]
    + [(2, 3)] * 3
)


@pytest.fixture(scope="module")
def report(spark):
    e = spark.createDataFrame(EDGES, "src long, dst long")
    rows = linkspam.host_link_report(e).collect()
    return {r["host_id"]: r.asDict() for r in rows}


def test_hosts_with_outlinks_only(report):
    assert sorted(report) == [0, 1, 2]


def test_intra_fraction(report):
    r0 = report[0]
    assert (r0["n_links"], r0["n_intra"]) == (7, 4)
    assert r0["intra_ppm"] == 4 * linkspam.PPM // 7
    assert report[1]["n_intra"] == 0 and report[1]["intra_ppm"] == 0


def test_external_concentration_and_tiebreak(report):
    # host0 external: host1 w=2, host2 w=1 → top host1
    assert (report[0]["top_dst"], report[0]["top_w"]) == (1, 2)
    assert report[0]["top_ext_ppm"] == 2 * linkspam.PPM // 3
    # host1: all three targets w=1 — tie resolves to SMALLEST host id
    assert (report[1]["top_dst"], report[1]["top_w"]) == (0, 1)
    # host2: fully concentrated
    assert report[2]["top_ext_ppm"] == linkspam.PPM


def test_reciprocal_rings(report):
    # 0↔1 is the only reciprocal pair
    assert report[0]["n_recip_hosts"] == 1
    assert report[0]["recip_ppm"] == linkspam.PPM // 2  # 1 of 2 ext hosts
    assert report[1]["n_recip_hosts"] == 1
    assert report[1]["recip_ppm"] == linkspam.PPM // 3
    assert report[2]["n_recip_hosts"] == 0 and report[2]["recip_ppm"] == 0


def test_plan_is_join_and_agg_only(spark):
    e = spark.createDataFrame(EDGES, "src long, dst long")
    plan = (
        linkspam.host_link_report(e)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "Window" not in plan  # argmax is max(struct), never a window


def test_spam_rank_table_demotes_nepotistic_host(spark):
    # the scheduler's demotion table: every rank ≤ 0, and host0 — the
    # corpus's hot, most-nepotistic host (30% of pages) — carries the
    # most negative rank, so its pages sink in the dequeue order
    # (measured on the composed trace: host0 mean position 40.2 → 76.7,
    # 107/121 positions reordered vs the plain priority trace)
    from geospatial_web_scraper_spark.entry_queries import (
        _corpus_spam_rank_table,
    )

    rt = _corpus_spam_rank_table(spark)
    rows = rt.withColumn(
        "hid",
        F.regexp_extract("url", r"host(\d+)", 1).cast("long"),
    ).groupBy("hid").agg(F.first("rank_fp").alias("r")).collect()
    ranks = {r["hid"]: r["r"] for r in rows}
    assert all(v <= 0 for v in ranks.values())
    assert min(ranks, key=ranks.get) == 0
