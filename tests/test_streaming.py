"""Structured Streaming: watermarked per-host rates + foreachBatch crawl round."""

import pytest
from pyspark.sql import functions as F

from geospatial_web_scraper_spark import corpus
from geospatial_web_scraper_spark.streaming.frontier_stream import (
    host_rate_stream,
    run_stream_once,
)

N = 120


@pytest.fixture()
def pages_dir(spark, tmp_path):
    out = str(tmp_path / "pages")
    corpus.corpus_df(spark, N).write.mode("overwrite").parquet(out)
    return out


def test_host_rate_stream(spark, pages_dir):
    schema = spark.read.parquet(pages_dir).schema
    stream = spark.readStream.schema(schema).parquet(pages_dir)
    agg = host_rate_stream(stream, window="1 minute", watermark="2 minutes")
    q = (
        agg.writeStream.outputMode("update")
        .format("memory")
        .queryName("host_rates")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM host_rates").collect()
    assert rows
    hosts = {r["host"] for r in rows}
    assert "host0.example.org" in hosts
    batch = (
        corpus.corpus_df(spark, N)
        .groupBy(F.col("host"))
        .agg(F.count("*").alias("pages"))
    )
    batch_counts = {r["host"]: r["pages"] for r in batch.collect()}
    stream_counts = {}
    for r in rows:
        stream_counts[r["host"]] = stream_counts.get(r["host"], 0) + r["pages"]
    assert stream_counts == batch_counts  # no loss, no double-count


def test_foreachbatch_round(spark, pages_dir):
    schema = spark.read.parquet(pages_dir).schema
    stream = spark.readStream.schema(schema).parquet(pages_dir)
    seen_batches = []

    def sink(df, epoch_id):
        seen_batches.append(df.count())

    run_stream_once(stream.select("url", "html", "status", "content_type"), sink)
    assert sum(seen_batches) == N
