"""Streaming sessionization == batch sessionization on the same events.

The stream processes the real events in micro-batch 1 and a far-future
sentinel event in micro-batch 2; the sentinel advances the watermark past
every real session's close, so append mode emits exactly the batch
result (the sentinel's own still-open session stays withheld)."""

import datetime as dt
import os
import time

from geospatial_web_scraper_spark.operators.sessions import sessionize
from geospatial_web_scraper_spark.streaming.drain import await_drained
from geospatial_web_scraper_spark.streaming.session_stream import session_stream

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
SENTINEL_USER = 999


def _events(spark):
    rows = []
    eid = 0
    for uid in range(3):
        for s in range(3):  # 3 sessions per user
            base = uid * 37 + s * 7200  # sessions 2 h apart
            for j in range(4):  # 4 events, 10 min apart
                rows.append(
                    (
                        eid,
                        T0 + dt.timedelta(seconds=base + j * 600),
                        uid,
                        float(eid % 13) + 0.25,
                    )
                )
                eid += 1
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )


def test_stream_sessions_equal_batch(spark, tmp_path):
    ev = _events(spark)
    src = str(tmp_path / "events_src")
    ev.coalesce(1).write.mode("overwrite").parquet(src)
    before = set(os.listdir(src))
    sentinel = spark.createDataFrame(
        [(100000, T0 + dt.timedelta(days=30), SENTINEL_USER, 0.0)],
        "event_id long, ts timestamp, user_id long, value double",
    )
    sentinel.coalesce(1).write.mode("append").parquet(src)
    # pin mtimes explicitly so the sentinel file sorts into micro-batch 2
    # regardless of filesystem mtime granularity or clock skew (a shared
    # sub-second mtime could land both files in one trigger, advancing the
    # watermark in the same batch — flaky, not wrong; review r4)
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
    out = session_stream(stream, gap_minutes=30, watermark="1 minute")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions_out")
        .trigger(availableNow=True)
        .start()
    )
    await_drained(q, 180)

    got = sorted(
        (
            (r["user_id"], r["session_start"], r["session_end"],
             r["n_events"], r["first_event"], r["value_sum"])
            for r in spark.sql("SELECT * FROM sessions_out").collect()
            if r["user_id"] != SENTINEL_USER
        )
    )
    want = sorted(
        (r["user_id"], r["session_start"], r["session_end"],
         r["n_events"], r["first_event"], r["value_sum"])
        for r in sessionize(ev, gap_minutes=30).collect()
    )
    assert got == want
    assert len(want) == 9  # 3 users x 3 sessions — nothing withheld
