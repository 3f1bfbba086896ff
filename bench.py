#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line:

  {"metric": "urls_per_sec", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline metric: BFS frontier throughput (URLs recorded / sec) on a
bench-scale synthetic corpus (extraction-UDF-dominated, the hot path of the
north rule). Also times the operator headliners on $SPARK_GRAFT_SF_DIR
parquet: exact dedup, TPC-H Q1-style agg, brute-force ANN top-k, and raw
link-extraction throughput.

Scaling evidence (north rule: efficiency >= 0.8 from N to 4N executors,
evidenced here as local[8] vs local[32]):

  python bench.py --scaling   # runs both levels, prints both, updates BENCH.md
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from geospatial_web_scraper_spark import corpus
from geospatial_web_scraper_spark.operators import dedup, similarity
from geospatial_web_scraper_spark.operators.extract import extract_links_udf
from geospatial_web_scraper_spark.plans.bfs import CrawlEngine
from geospatial_web_scraper_spark.session import get_spark

N_PAGES = int(os.environ.get("BENCH_PAGES", "200000"))
N_SEED = int(os.environ.get("BENCH_SEEDS", "2000"))


def run_level(cores: int, sf_dir: str) -> dict:
    spark = get_spark(
        app=f"gwss-bench-{cores}", cores=cores, shuffle_partitions=cores * 2
    )
    try:
        times: dict[str, float] = {}

        # --- headline: BFS crawl over the synthetic corpus -----------------
        pages = corpus.corpus_df(spark, N_PAGES, partitions=cores * 2)
        t0 = time.time()
        eng = CrawlEngine(spark, pages, max_crawl=None, lineage_detail=False)
        run = eng.run(corpus.seeds_df(spark, N_PAGES, k=N_SEED))
        crawl_sec = time.time() - t0
        times["crawl_bfs"] = round(crawl_sec, 3)
        urls_per_sec = run.recorded / crawl_sec

        # --- raw extraction throughput (X1 UDF over every fetchable page) --
        t0 = time.time()
        n_links = (
            pages.filter((F.col("status") == 200) & (F.col("content_type") == "text/html"))
            .select(F.explode(extract_links_udf(F.col("html"), F.col("url"))).alias("l"))
            .count()
        )
        times["x1_extract_all"] = round(time.time() - t0, 3)

        # --- parquet-table operators ---------------------------------------
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        t0 = time.time()
        dedup.exact_dedup(docs).count()
        times["dedup_exact"] = round(time.time() - t0, 3)

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        t0 = time.time()
        (
            li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum("l_quantity"), F.sum("l_extendedprice"), F.count("*"))
            .collect()
        )
        times["q1_lineitem_agg"] = round(time.time() - t0, 3)

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        queries = emb.filter(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        t0 = time.time()
        similarity.ann_bruteforce_topk(emb, queries, k=10).count()
        times["ann_bruteforce_topk"] = round(time.time() - t0, 3)

        return {
            "cores": cores,
            "urls_per_sec": round(urls_per_sec, 1),
            "recorded": run.recorded,
            "rounds": run.rounds,
            "n_pages": N_PAGES,
            "links_extracted": n_links,
            "queries": times,
        }
    finally:
        spark.stop()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    if "--scaling" in sys.argv:
        low = run_level(8, sf_dir)
        high = run_level(32, sf_dir)
        eff = (high["urls_per_sec"] / low["urls_per_sec"]) / (32 / 8)
        out = {
            "metric": "urls_per_sec",
            "value": high["urls_per_sec"],
            "unit": "sec",
            "queries": high["queries"],
            "sf": sf,
            "scaling": {
                "local8_urls_per_sec": low["urls_per_sec"],
                "local32_urls_per_sec": high["urls_per_sec"],
                "efficiency_8_to_32": round(eff, 3),
            },
        }
        print(json.dumps(out))
        return

    res = run_level(cpus, sf_dir)
    print(
        json.dumps(
            {
                "metric": "urls_per_sec",
                "value": res["urls_per_sec"],
                "unit": "sec",
                "queries": res["queries"],
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
