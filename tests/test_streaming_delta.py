"""Streaming change-rate state == batch change_rates over the same delta
history (counts are associative), plus epoch-replay idempotence."""

from pyspark.sql import functions as F

from geospatial_web_scraper_spark.operators.delta import change_rates
from geospatial_web_scraper_spark.streaming.delta_stream import ChangeRateState
from geospatial_web_scraper_spark.streaming.drain import await_drained


def _history(spark):
    # 4 runs over 40 urls: the crawl_change_rates moduli (n_obs 1..4,
    # all-changed and never-changed branches both present)
    rows = []
    for d in range(40):
        for r in range(4):
            if (d + 2 * r) % 5 == 4:
                continue
            m = (d * 7 + r * 3) % 4
            status = "changed" if m == 0 else ("added" if m == 3 else "unchanged")
            rows.append((f"u{d}", status, r))
    return spark.createDataFrame(rows, "url string, status string, run int")


def test_stream_rates_equal_batch(spark, tmp_path):
    hist = _history(spark)
    src = str(tmp_path / "delta_src")
    # one file per run -> one micro-batch per run (maxFilesPerTrigger=1)
    for r in range(4):
        hist.where(F.col("run") == r).coalesce(1).write.mode("append").parquet(src)

    state = ChangeRateState(spark, str(tmp_path / "state"))
    stream = (
        spark.readStream.schema(hist.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(state.sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    await_drained(q, 120)

    got = {r["url"]: r for r in state.rates().collect()}
    exp = {r["url"]: r for r in change_rates(hist).collect()}
    assert set(got) == set(exp)
    for u in exp:
        for c in ("n_obs", "n_changed", "change_rate", "next_interval"):
            assert got[u][c] == exp[u][c], (u, c, got[u], exp[u])

    # replayed epoch is a no-op: drive a second state directly (known
    # run -> epoch mapping), then re-sink one run under its original
    # epoch id — the partition rewrites with identical content
    state2 = ChangeRateState(spark, str(tmp_path / "state2"))
    for r in range(4):
        state2.sink(hist.where(F.col("run") == r), r)
    before = {r["url"]: tuple(r) for r in state2.rates().collect()}
    assert before == {u: tuple(r) for u, r in exp.items()}
    state2.sink(hist.where(F.col("run") == 2), 2)
    after = {r["url"]: tuple(r) for r in state2.rates().collect()}
    assert after == before


def test_rates_queryable_before_any_evidence(spark, tmp_path):
    # fresh state dir missing entirely -> empty rates, not an exception
    state = ChangeRateState(spark, str(tmp_path / "nostate"))
    assert state.rates().count() == 0
    # first batch all 'added' (a fresh crawl's first delta): evidence
    # filter leaves nothing; rates stays queryable and empty
    batch = spark.createDataFrame(
        [("u1", "added"), ("u2", "added")], "url string, status string"
    )
    state2 = ChangeRateState(spark, str(tmp_path / "emptystate"))
    state2.sink(batch, 0)
    assert state2.rates().count() == 0
