"""Streaming rollup == batch rollup on the same events, and the coarser
levels folded from the STREAM's emitted finest table equal the batch
hierarchy — the full continuous-aggregate round trip.

Harness mirrors test_streaming_sessions: real events in micro-batch 1, a
far-future sentinel in micro-batch 2 advances the watermark past every
real bucket's close so append mode emits exactly the batch result (the
sentinel's own still-open bucket stays withheld)."""

import datetime as dt
import os
import time

from geospatial_web_scraper_spark.operators.temporal import (
    coarsen_rollup,
    rollup_time,
)
from geospatial_web_scraper_spark.streaming.drain import await_drained
from geospatial_web_scraper_spark.streaming.rollup_stream import rollup_stream

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
SENTINEL_TYPE = "zz_sentinel"


def _events(spark):
    rows = []
    for i in range(60):
        rows.append(
            (
                i,
                T0 + dt.timedelta(seconds=i * 907),  # spans ~15 hours
                "click" if i % 3 else "view",
                float(i % 17) + 0.125,
            )
        )
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )


def _key(r):
    return (r["gran_s"], r["bucket_start"], r["event_type"])


def _stats(r):
    return (r["n"], r["sum_value_micro"], r["min_value"], r["max_value"])


def test_stream_rollup_equal_batch_and_coarsens(spark, tmp_path):
    ev = _events(spark)
    src = str(tmp_path / "events_src")
    ev.coalesce(1).write.mode("overwrite").parquet(src)
    before = set(os.listdir(src))
    sentinel = spark.createDataFrame(
        [(100000, T0 + dt.timedelta(days=30), SENTINEL_TYPE, 0.0)],
        "event_id long, ts timestamp, event_type string, value double",
    )
    sentinel.coalesce(1).write.mode("append").parquet(src)
    now = time.time()
    for name in os.listdir(src):
        p = os.path.join(src, name)
        t = now + 60 if name not in before else now - 60
        os.utime(p, (t, t))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = rollup_stream(
        stream, 3600, ["event_type"], "value", watermark="1 minute"
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("rollup_out")
        .trigger(availableNow=True)
        .start()
    )
    await_drained(q, 180)

    emitted = [
        r
        for r in spark.sql("SELECT * FROM rollup_out").collect()
        if r["event_type"] != SENTINEL_TYPE
    ]
    got = {_key(r): _stats(r) for r in emitted}
    batch = rollup_time(ev, "ts", ["event_type"], "value", [3600])
    want = {_key(r): _stats(r) for r in batch.collect()}
    assert got == want and len(want) > 5

    # coarser levels folded from the STREAM's emitted finest table must
    # equal the batch hierarchy computed straight from raw events
    finest = spark.createDataFrame(emitted, batch.schema)
    rolled = {
        _key(r): _stats(r)
        for r in coarsen_rollup(
            finest, ["event_type"], [3600, 86400]
        ).collect()
    }
    full = {
        _key(r): _stats(r)
        for r in rollup_time(
            ev, "ts", ["event_type"], "value", [3600, 86400]
        ).collect()
    }
    assert rolled == full
