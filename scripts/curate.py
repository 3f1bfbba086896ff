#!/usr/bin/env python
"""Cluster entry point — run the corpus-curation pipeline via spark-submit.

The LLM-data twin of scripts/crawl.py: point it at a documents table
(what the crawl's text sink or a WARC ingest produced), run the composed
curation pipeline (optional CCNet LM-perplexity gate → language →
quality → repetition gate → optional eval-set decontamination → exact
dedup → near-dup canonical keep), and
optionally sample the survivors to a token budget and split them into
train/val/test. Outputs under --output: curated/ (surviving documents,
original columns + split when requested), report/ (per-source audit of
the survivors), and stages/ (per-stage yield counts).

    python scripts/package.py                      # → dist/gwss.zip
    spark-submit --py-files dist/gwss.zip scripts/curate.py \
        --input  s3://bucket/documents.parquet \
        --output s3://bucket/curated_out \
        [--languages en] [--min-quality 0.3] [--neardup-threshold 0.5] \
        [--max-top2gram-frac 0.2] [--lang-gate vote|ngram] \
        [--ppl-drop tail] \
        [--eval-set s3://bucket/eval.parquet --max-contam-frac 0.0] \
        [--budget-tokens N] [--split 0.8,0.1,0.1]

On a cluster the SparkSession comes from spark-submit's conf; locally
this falls back to local[*]. Every stage is the library operator the
catalog queries value-check — the CLI only wires them together.
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser(description="curate a documents table")
    ap.add_argument("--input", required=True, help="documents parquet "
                    "(doc_id, text, source, …)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--languages", default="en",
                    help="comma-separated lang-id allow-list")
    ap.add_argument("--min-quality", type=float, default=0.3)
    ap.add_argument("--neardup-threshold", type=float, default=0.5)
    ap.add_argument("--max-top2gram-frac", type=float, default=None,
                    help="Gopher repetition gate (off when omitted)")
    ap.add_argument("--lang-gate", choices=("vote", "ngram"),
                    default="vote", help="stage-1 language classifier: "
                    "the frozen stopword vote or the char-trigram NB "
                    "kernel (operators/langid.py)")
    ap.add_argument("--ppl-drop", default="",
                    help="comma-separated LM-perplexity buckets to drop "
                    "BEFORE curation (CCNet gate, Wenzek et al. 2020 — "
                    "usually 'tail'). The bigram LM is trained on the "
                    "input corpus itself; docs with <2 tokens carry no "
                    "LM evidence and leave with the dropped set. Off "
                    "when omitted. Same composition as the catalog's "
                    "curate_corpus_perplexity row.")
    ap.add_argument("--eval-set", help="eval documents parquet for n-gram "
                    "decontamination (doc_id, text)")
    ap.add_argument("--max-contam-frac", type=float, default=0.0)
    ap.add_argument("--budget-tokens", type=int, default=0,
                    help=">0 samples each source down to ~N whitespace "
                    "tokens (deterministic unit-hash sampling)")
    ap.add_argument("--split", default="",
                    help="train,val,test fractions (e.g. 0.8,0.1,0.1) — "
                    "adds a growth-stable split column")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("gwss-curate").getOrCreate()

    from geospatial_web_scraper_spark.operators import textstats
    from geospatial_web_scraper_spark.operators.curate import curate_corpus
    from geospatial_web_scraper_spark.operators.sampling import (
        sample_token_budget,
        split_corpus,
    )

    docs = spark.read.parquet(args.input)
    n_in = docs.count()
    eval_docs = spark.read.parquet(args.eval_set) if args.eval_set else None

    stages = [("input", n_in)]
    if args.ppl_drop:
        from geospatial_web_scraper_spark.operators.lm import (
            bigram_lm_scores,
        )

        drop = [b.strip() for b in args.ppl_drop.split(",") if b.strip()]
        keep = (
            bigram_lm_scores(docs)
            .where(~F.col("bucket").isin(drop))
            .select("doc_id")
        )
        # checkpoint: the gated table fans out into curate's gate stages
        docs = docs.join(keep, "doc_id").localCheckpoint()
        stages.append(("ppl_gated", docs.count()))

    curated = curate_corpus(
        docs,
        languages=tuple(args.languages.split(",")),
        min_quality=args.min_quality,
        neardup_threshold=args.neardup_threshold,
        max_top2gram_frac=args.max_top2gram_frac,
        eval_docs=eval_docs,
        max_contam_frac=args.max_contam_frac,
        lang_gate=args.lang_gate,
    ).localCheckpoint()  # fans out to sampling/split/report below
    stages.append(("curated", curated.count()))
    if args.budget_tokens > 0:
        flags = sample_token_budget(curated, args.budget_tokens)
        curated = curated.join(
            flags.where("kept").select("doc_id"), "doc_id", "left_semi"
        ).localCheckpoint()
        stages.append(("sampled", curated.count()))

    if args.split:
        fr = [float(x) for x in args.split.split(",")]
        labels = ["train", "val", "test"][: len(fr)]
        sp = split_corpus(curated, dict(zip(labels, fr)))
        curated = curated.join(sp.select("doc_id", "split"), "doc_id")

    curated.write.mode("overwrite").parquet(f"{args.output}/curated")

    if "source" in curated.columns:
        report = curated.groupBy("source").agg(
            F.count("*").alias("n_docs"),
            F.sum(
                textstats.token_count_expr(F.col("text"))
            ).alias("n_tokens"),
        )
        # corpus-law audits over the SURVIVORS (operators/profile.py):
        # token entropy + type-token ratio, Zipf slope (→ 0 flags
        # template spam the gates missed), OOV rate vs the survivors'
        # own top-256 vocabulary — all exact-integer/micro-nat, the
        # same operators the catalog rows value-check
        from geospatial_web_scraper_spark.operators.profile import (
            token_entropy,
            vocab_coverage,
            zipf_fit,
        )

        toks = curated.select(
            "source",
            F.explode(
                F.transform(
                    textstats.tokens_expr(F.col("text")),
                    lambda x: F.lower(x),
                )
            ).alias("w"),
        ).localCheckpoint()  # fans out to the three audits below
        report = (
            report.join(
                token_entropy(toks).select(
                    "source", "ttr_ppm", "entropy6"
                ),
                "source",
                "left",
            )
            .join(
                zipf_fit(toks).select("source", "slope6"), "source", "left"
            )
            .join(
                vocab_coverage(toks, k=256).select("source", "oov_ppm"),
                "source",
                "left",
            )
        )
    else:
        report = curated.agg(F.count("*").alias("n_docs"))
    report.write.mode("overwrite").parquet(f"{args.output}/report")
    spark.createDataFrame(stages, "stage string, n long").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{args.output}/stages")
    print(
        "curate done: "
        + " -> ".join(f"{s}={n}" for s, n in stages)
        + f" output={args.output}"
    )


if __name__ == "__main__":
    main()
