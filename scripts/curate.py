#!/usr/bin/env python
"""Corpus curation CLI — the composed training-data pipeline over a
documents table:

    spark-submit --py-files dist/gwss.zip scripts/curate.py \
        --docs  s3://bucket/documents_parquet \
        --output s3://bucket/curated \
        [--languages en,de] [--min-quality 0.3] [--neardup-threshold 0.5] \
        [--report out/report.json]

Stages: language gate → quality gate → exact dedup (keep min id) →
MinHash near-dup → connected components → keep canonical. See
geospatial_web_scraper_spark/operators/curate.py for the plan shape.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser(description="curate a documents table")
    ap.add_argument("--docs", required=True, help="documents parquet "
                    "(doc_id, text, ...)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--languages", default="en",
                    help="comma-separated language codes to keep")
    ap.add_argument("--min-quality", type=float, default=0.3)
    ap.add_argument("--neardup-threshold", type=float, default=0.5)
    ap.add_argument("--report", help="also write per-stage yield counts "
                    "(runs the pipeline stages eagerly)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("gwss-curate").getOrCreate()

    from geospatial_web_scraper_spark.operators import curate

    docs = spark.read.parquet(args.docs)
    langs = tuple(s.strip() for s in args.languages.split(",") if s.strip())
    kept = curate.curate_corpus(
        docs,
        languages=langs,
        min_quality=args.min_quality,
        neardup_threshold=args.neardup_threshold,
    )
    kept.write.mode("overwrite").parquet(args.output)
    n = spark.read.parquet(args.output).count()
    print(f"curated corpus written: {n} docs -> {args.output}")

    if args.report:
        rep = curate.curation_report(
            docs,
            languages=langs,
            min_quality=args.min_quality,
            neardup_threshold=args.neardup_threshold,
        )
        with open(args.report, "w") as f:
            json.dump(rep, f)
        print(f"yield report: {rep}")


if __name__ == "__main__":
    main()
