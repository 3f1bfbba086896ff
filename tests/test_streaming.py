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


def test_token_bucket_admit_stateful(spark, tmp_path):
    """applyInPandasWithState politeness: per-host token budget persists
    across micro-batches (refill + carry, cap on burst)."""
    from geospatial_web_scraper_spark.streaming.politeness_stream import (
        token_bucket_admit,
    )

    src = str(tmp_path / "cand")
    ckpt = str(tmp_path / "ckpt")
    # two files → two micro-batches (maxFilesPerTrigger=1); hot host has 10
    # candidates per batch vs tokens_per_batch=4; cold host has 1
    for b in range(2):
        rows = [("hot.example.org", f"https://hot.example.org/b{b}/p{i}") for i in range(10)]
        rows.append(("cold.example.org", f"https://cold.example.org/b{b}/only"))
        spark.createDataFrame(rows, "host string, url string").coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = spark.readStream.schema("host string, url string").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        token_bucket_admit(stream, tokens_per_batch=4, bucket_cap=8)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("admitted")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM admitted").collect()
    by_host = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(r)
    # hot host: 4 admitted per batch (demand 10 > tokens 4, nothing carried)
    assert len(by_host["hot.example.org"]) == 8
    assert all(r["tokens_left"] == 0 for r in by_host["hot.example.org"])
    # cold host: 1 admitted per batch, surplus carries (4-1=3, then 3+4-1=6)
    cold = sorted(by_host["cold.example.org"], key=lambda r: r["url"])
    assert len(cold) == 2
    assert sorted(r["tokens_left"] for r in cold) == [3, 6]
    # deterministic url-order admission within the hot host
    batch0 = sorted(
        r["url"] for r in by_host["hot.example.org"] if "/b0/" in r["url"]
    )
    assert batch0 == [f"https://hot.example.org/b0/p{i}" for i in [0, 1, 2, 3]]


def test_token_bucket_idle_refill(spark, tmp_path):
    """batch_id mode: a host absent for several micro-batches is credited
    tokens_per_batch × elapsed on return, capped at bucket_cap."""
    from geospatial_web_scraper_spark.streaming.politeness_stream import (
        token_bucket_admit,
    )

    src = str(tmp_path / "cand2")
    ckpt = str(tmp_path / "ckpt2")
    # batch 0: idle host shows up with 1 candidate (4 tokens → 3 carried)
    # batches 1-2: absent  → elapsed accrues
    # batch 3: returns with 10 candidates; credit = 3 + 4×3 = 15 → cap 8
    for b in range(4):
        if b == 0:
            rows = [("idle.example.org", "https://idle.example.org/b0/only", 0)]
        elif b == 3:
            rows = [
                ("idle.example.org", f"https://idle.example.org/b3/p{i}", 3)
                for i in range(10)
            ]
        else:
            rows = [("busy.example.org", f"https://busy.example.org/b{b}/x", b)]
        spark.createDataFrame(
            rows, "host string, url string, batch_id long"
        ).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(
        "host string, url string, batch_id long"
    ).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        token_bucket_admit(
            stream, tokens_per_batch=4, bucket_cap=8, batch_id_col="batch_id"
        )
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("admitted_idle")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT * FROM admitted_idle WHERE host = 'idle.example.org'"
    ).collect()
    b3 = [r for r in rows if "/b3/" in r["url"]]
    # cap 8 of the 10 candidates admitted (NOT 15 — bucket_cap bounds burst)
    assert len(b3) == 8
    assert all(r["tokens_left"] == 0 for r in b3)


def test_harvest_stream_parity_and_replay(spark, tmp_path):
    """Continuous harvest: 3 page segments (with cross-segment duplicate
    URLs) drained one micro-batch at a time must yield exactly the batch
    X2 extraction over distinct URLs — no loss, no double-extract — and a
    replayed epoch (foreachBatch at-least-once) must leave the table
    unchanged (epoch-partition overwrite = exactly-once)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from geospatial_web_scraper_spark.operators.extract import extract_meta_udf
    from geospatial_web_scraper_spark.streaming.harvest_stream import (
        harvest_table,
        make_harvest_sink,
        run_harvest_stream,
    )

    pages = corpus.corpus_df(spark, N).select(
        "url", "html", "status", "content_type"
    )
    src = str(tmp_path / "segments")
    out = str(tmp_path / "harvest")
    ckpt = str(tmp_path / "ckpt_h")
    # segment 0: pages 0..59; segment 1: 40..99 (20 dupes); segment 2: 80..119
    segs = [(0, 60), (40, 100), (80, N)]
    idx = pages.withColumn(
        "i", F.row_number().over(Window.orderBy("url")) - 1
    )
    for lo, hi in segs:
        idx.where((F.col("i") >= lo) & (F.col("i") < hi)).drop("i").coalesce(
            1
        ).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(pages.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    run_harvest_stream(stream, out, ckpt)

    got = harvest_table(spark, out)
    assert got.count() == got.select("url").distinct().count() == N
    batch = pages.select(
        "url", extract_meta_udf(F.col("html"), F.col("url")).alias("m")
    ).select("url", "m.title", "m.description", "m.keywords")
    assert (
        got.exceptAll(batch).count() == 0 and batch.exceptAll(got).count() == 0
    )

    # replay the LAST epoch with the same input: table must not change
    last_epoch = (
        spark.read.parquet(out + "/meta").agg(F.max("epoch")).collect()[0][0]
    )
    lo, hi = segs[-1]
    replay_df = idx.where((F.col("i") >= lo) & (F.col("i") < hi)).drop("i")
    make_harvest_sink(out)(replay_df, int(last_epoch))
    got2 = harvest_table(spark, out)
    assert got2.count() == N
    assert got2.exceptAll(batch).count() == 0

    # gated variant (streaming curation-lite): harvest rows equal the
    # batch extraction filtered by the same quality gate; rejected URLs
    # remain in the table as kept=false (seen stays a URL decision)
    from geospatial_web_scraper_spark.operators.textstats import (
        quality_score_expr,
    )

    out_g = str(tmp_path / "harvest_gated")
    stream_g = (
        spark.readStream.schema(pages.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    run_harvest_stream(
        stream_g, out_g, str(tmp_path / "ckpt_hg"), min_quality=0.3685
    )
    got_g = harvest_table(spark, out_g)
    want_g = batch.where(quality_score_expr(F.col("description")) >= 0.3685)
    assert 0 < got_g.count() < N
    assert (
        got_g.exceptAll(want_g).count() == 0
        and want_g.exceptAll(got_g).count() == 0
    )
    allrows = spark.read.parquet(out_g + "/meta")
    assert allrows.count() == N  # rejected urls recorded with kept=false
    assert allrows.where(~F.col("kept")).count() == N - got_g.count()


def test_harvest_gate_null_description_is_kept_false(spark, tmp_path):
    """A page with no meta description makes the language/quality gate
    evaluate NULL; kept must coalesce to strict False (ADVICE r2) so
    ``~kept`` accounting works and the docstring contract holds."""
    from geospatial_web_scraper_spark.streaming.harvest_stream import (
        make_harvest_sink,
    )

    df = spark.createDataFrame(  # NULL html (failed fetch) => NULL meta
        [("http://a.example/x", None, 500, "text/html")],
        "url string, html binary, status int, content_type string",
    )
    out = str(tmp_path / "h_null")
    make_harvest_sink(out, languages=("en",))(df, 0)
    rows = spark.read.parquet(out + "/meta").collect()
    assert len(rows) == 1
    assert rows[0]["description"] is None
    assert rows[0]["kept"] is False  # strictly boolean, never NULL


def test_await_drained_raises_and_stops_on_timeout():
    """awaitTermination(timeout) returning False must stop the query and
    raise — callers must never read a half-drained table (ADVICE r2)."""
    import pytest

    from geospatial_web_scraper_spark.streaming.drain import await_drained

    class FakeQuery:
        name, id = "fq", "deadbeef"

        def __init__(self, drained):
            self._drained = drained
            self.stopped = False

        def awaitTermination(self, timeout_s=None):
            return self._drained

        def stop(self):
            self.stopped = True

    ok = FakeQuery(True)
    await_drained(ok, 1.0)
    assert not ok.stopped
    slow = FakeQuery(False)
    with pytest.raises(TimeoutError):
        await_drained(slow, 1.0)
    assert slow.stopped


def test_foreachbatch_round(spark, pages_dir):
    schema = spark.read.parquet(pages_dir).schema
    stream = spark.readStream.schema(schema).parquet(pages_dir)
    seen_batches = []

    def sink(df, epoch_id):
        seen_batches.append(df.count())

    run_stream_once(stream.select("url", "html", "status", "content_type"), sink)
    assert sum(seen_batches) == N


def test_crawl_stream_continuous_seeds(spark, tmp_path):
    """Continuous crawl: seed batches streamed one micro-batch at a time
    against one persistent store reach exactly the URL set of a single
    batch crawl over the union of seeds, and a replayed seed batch is a
    no-op. Budget and depth limits are lifted: reachability (transitive
    closure) is batch-order independent, whereas a depth-limited crawl is
    not — a URL first reached deep stops expanding even if a later seed
    batch would reach it shallow (first-wins pins the depth)."""
    from pyspark.sql import functions as F

    from geospatial_web_scraper_spark.plans.bfs import CrawlEngine
    from geospatial_web_scraper_spark.plans.store import SnapshotStore
    from geospatial_web_scraper_spark.streaming.crawl_stream import (
        run_crawl_stream,
        stitched_trace,
    )

    pages = corpus.corpus_df(spark, N)
    seeds = corpus.seeds_df(spark, N)
    n_seeds = seeds.count()
    assert n_seeds >= 4
    batch_a = seeds.where(F.col("seed_order") < 2)
    batch_b = seeds.where(F.col("seed_order") >= 2)
    src = str(tmp_path / "seedstream")
    batch_a.coalesce(1).write.mode("append").parquet(src)
    batch_b.coalesce(1).write.mode("append").parquet(src)

    store_dir = str(tmp_path / "crawlstore")
    stream = (
        spark.readStream.schema(seeds.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    run_crawl_stream(
        stream, pages, store_dir, str(tmp_path / "ckpt_c"),
        max_crawl=None, max_depth=60, lineage_detail=False,
    )

    streamed = stitched_trace(spark, store_dir)
    ref = CrawlEngine(spark, pages, max_crawl=None, max_depth=60,
                      lineage_detail=False).run(seeds).trace
    a = {r["url"] for r in streamed.select("url").collect()}
    b = {r["url"] for r in ref.select("url").collect()}
    assert a == b
    # each URL recorded exactly once across all batches
    assert streamed.count() == len(a)

    # replay batch B (at-least-once foreachBatch): nothing advances
    last = SnapshotStore(spark, store_dir).last_committed()
    eng = CrawlEngine(spark, pages, store=SnapshotStore(spark, store_dir),
                      max_crawl=None, max_depth=60, lineage_detail=False)
    eng.resume_with_seeds(batch_b)
    assert SnapshotStore(spark, store_dir).last_committed() == last
    assert stitched_trace(spark, store_dir).count() == len(a)

    # same stream with per-batch compaction: identical trace, one base dir
    import os

    store2 = str(tmp_path / "crawlstore2")
    stream2 = (
        spark.readStream.schema(seeds.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    run_crawl_stream(
        stream2, pages, store2, str(tmp_path / "ckpt_c2"),
        compact_every=1, max_crawl=None, max_depth=60, lineage_detail=False,
    )
    rows1 = sorted(tuple(r) for r in streamed.collect())
    rows2 = sorted(tuple(r) for r in stitched_trace(spark, store2).collect())
    assert rows1 == rows2
    assert len(os.listdir(os.path.join(store2, "trace"))) == 1
