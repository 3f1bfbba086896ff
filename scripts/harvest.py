#!/usr/bin/env python
"""Cluster entry point — engine #2 (embedding-ranked seed harvest) via
spark-submit. The counterpart of scripts/crawl.py for the reference's
``Manager.FindLinks`` flow (crawler2.go:18-117)::

    spark-submit --py-files dist/gwss.zip scripts/harvest.py \
        --pages  s3://bucket/pages \
        --seeds  data/seeds.parquet \
        --query  "geospatial dataset download" \
        --output s3://bucket/harvest_out \
        [--endpoint http://embedder:8000/embed]   # real RPC embeddings
        [--top-k 10] [--no-quirk]                 # intended top-k, no T2 drop
        [--synthetic-pages N]                     # arithmetic corpus instead

Without --endpoint the deterministic pseudo-embedding ranks the seeds (the
sandbox/no-network path); with it, seed descriptions are embedded by the
Arrow-batched ≤50-text RPC source and the query text by one driver-side
call — exactly the reference's split (crawler2.go:25 vs api.go:179).
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser(description="embedding-ranked link harvest")
    ap.add_argument("--pages", help="pages table path (parquet/iceberg)")
    ap.add_argument("--synthetic-pages", type=int, default=0)
    ap.add_argument("--seeds", help="seeds parquet (seed_order, url, description)")
    ap.add_argument("--query", required=True)
    ap.add_argument("--top-k", type=int, default=10)
    ap.add_argument("--no-quirk", action="store_true",
                    help="intended top-k (skip the reference's T2 best-drop)")
    ap.add_argument("--endpoint",
                    help="embedding service URL; omit for pseudo-embeddings")
    ap.add_argument("--output", required=True)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("gwss-harvest").getOrCreate()

    from geospatial_web_scraper_spark import corpus
    from geospatial_web_scraper_spark.plans.harvest import harvest

    if args.synthetic_pages:
        pages = corpus.corpus_df(spark, args.synthetic_pages)
        seeds = corpus.seeds_df(spark, args.synthetic_pages, k=10**9)
    else:
        if not args.pages or not args.seeds:
            ap.error("--pages and --seeds required without --synthetic-pages")
        pages = spark.read.parquet(args.pages)
        seeds = spark.read.parquet(args.seeds)

    emb_col = query_vec = None
    if args.endpoint:
        from geospatial_web_scraper_spark.sources.embed_rpc import (
            _post_batch,
            rpc_embed,
        )

        seeds = rpc_embed(seeds, args.endpoint, text_col="description")
        query_vec = _post_batch(args.endpoint, [args.query], timeout=30.0)[0]
        emb_col = "embedding"

    out = harvest(
        spark, pages, seeds, args.query,
        top_k=args.top_k, quirk_compat=not args.no_quirk,
        emb_col=emb_col, query_vec=query_vec,
    )
    out.write.mode("overwrite").parquet(f"{args.output}/harvest")
    n = spark.read.parquet(f"{args.output}/harvest").count()
    print(f"harvest done: links={n} output={args.output}")
    spark.stop()


if __name__ == "__main__":
    main()
