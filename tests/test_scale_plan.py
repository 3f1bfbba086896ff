"""Plan-shape pins for the scale design claims (SURVEY §4 / README):
these assert the PHYSICAL plan, not results — a regression that silently
reintroduces a shuffle or loses pushdown fails here even though answers
stay correct.
"""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_is_shuffle_free(spark):
    """Equal-bucketed tables on the join key sort-merge WITHOUT an
    exchange on either side — the co-located join lever for repeated
    frontier ⋈ seen joins at 10^10 rows."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice"
    )
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode(
        "overwrite"
    ).saveAsTable("t_li_bucketed")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode(
        "overwrite"
    ).saveAsTable("t_orders_bucketed")
    try:
        a = spark.table("t_li_bucketed")
        b = spark.table("t_orders_bucketed")
        # force the sort-merge path (no broadcast) to expose any shuffle
        joined = a.join(b.hint("merge"), a["l_orderkey"] == b["o_orderkey"])
        plan = _plan(joined)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan
        assert joined.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS t_li_bucketed")
        spark.sql("DROP TABLE IF EXISTS t_orders_bucketed")


def test_q1_filter_reaches_parquet_scan(spark):
    df = entry_mod.queries()["q1_lineitem_agg"](spark, SF)
    plan = _plan(df)
    assert "PushedFilters: [" in plan
    assert "LessThanOrEqual(l_shipdate" in plan, plan


def test_q3_small_dims_broadcast(spark):
    df = entry_mod.queries()["q3_topk_join"](spark, SF)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan, plan


def test_no_unpartitioned_window_in_topk_paths(spark):
    """T2 and the seed ranker express their global-order cuts as
    TakeOrderedAndProject (per-partition partial top-k merged on the
    driver), never as an unpartitioned row_number window — which would be a
    single-reducer sort of the full table at 10^10 rows."""
    df = entry_mod.queries()["t2_topk_quirk"](spark, SF)
    plan = _plan(df)
    assert "Window" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan

    from geospatial_web_scraper_spark import corpus
    from geospatial_web_scraper_spark.plans.harvest import rank_seeds

    rs = rank_seeds(corpus.seeds_df(spark, 300, k=13), "q", top_k=10)
    plan = _plan(rs)
    assert "Window" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_ann_topk_never_windows_on_query_id_alone(spark):
    """The full-scan ANN reducers (brute-force cosine, PQ/ADC) and the
    bucket/cell-bounded ones must never hash-partition a window on the
    tiny-cardinality query_id alone — that funnels every scored corpus row
    of a query into ONE reducer task (the skewed-shuffle scale-killer at
    10^10 rows). The only window allowed is the salted pre-cut, whose spec
    carries the _salt column; the final per-query top-k must be a hash
    aggregate (grouped_topk), not a window."""
    for key in ("ann_cosine_topk", "ann_lsh_topk", "ann_ivf_topk", "ann_pq_adc"):
        df = entry_mod.queries()[key](spark, SF)
        plan = _plan(df)
        for line in plan.splitlines():
            if "windowspecdefinition" in line and "query_id" in line:
                assert "_salt" in line, (key, line)


def test_neardup_embedding_is_bucket_blocked(spark):
    """The driver's embedding near-dup query must execute the LSH bucket
    equi-join (blocked candidates), never an all-pairs theta join."""
    df = entry_mod.queries()["neardup_embedding"](spark, SF)
    plan = _plan(df)
    assert "_bucket" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_c10_feed_fold_never_shuffles_html(spark):
    """The feed-fold join/groupBy move only (url, href, xml) rows; HTML
    bytes stay in the pages scan's partitions (feeds + regrouped side are
    broadcast back into it). An Exchange carrying html would re-ship the
    dominant data volume at every round."""
    import re

    df = entry_mod.queries()["c10_xml_meta"](spark, SF)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan, plan
    for m in re.finditer(r"Exchange [^\n]*", plan):
        assert "html" not in m.group(0), m.group(0)


def test_column_pruning_on_projection(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id")
    plan = _plan(docs)
    assert "ReadSchema: struct<doc_id:bigint>" in plan, plan
