"""Sessionization (operators/sessions.py): boundary semantics (strict
gap), equal-timestamp merging, and cents-exact value sums."""

import datetime as dt

from geospatial_web_scraper_spark.operators.sessions import sessionize

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _df(spark, rows):
    """rows: (event_id, user_id, offset_seconds, value)"""
    data = [
        (eid, T0 + dt.timedelta(seconds=off), uid, float(v))
        for eid, uid, off, v in rows
    ]
    return spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, value double"
    )


def test_gap_boundary_is_inclusive(spark):
    """An exact 30-minute gap still MERGES (Spark merges a window that
    starts exactly at the previous window's end); 30min+1s splits. The
    DuckDB oracle's `> gap` break condition mirrors exactly this."""
    rows = [
        (0, 1, 0, 1.0),
        (1, 1, 1800, 1.0),        # exactly 30 min after e0 -> merges
        (2, 1, 1800 + 1801, 1.0), # 30:01 after e1 -> new session
    ]
    out = sorted(
        sessionize(_df(spark, rows), gap_minutes=30).collect(),
        key=lambda r: r["first_event"],
    )
    assert len(out) == 2
    assert out[0]["n_events"] == 2 and out[0]["first_event"] == 0
    assert out[1]["n_events"] == 1 and out[1]["first_event"] == 2


def test_sessions_chain_transitively(spark):
    """Each consecutive gap under 30 min chains, even when the total span
    exceeds 30 min."""
    rows = [(i, 7, i * 1700, 2.5) for i in range(5)]  # 28:20 apart each
    out = sessionize(_df(spark, rows), gap_minutes=30).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_events"] == 5
    assert r["value_sum"] == 12.5
    assert (r["session_end"] - r["session_start"]).total_seconds() == 4 * 1700


def test_users_are_independent(spark):
    rows = [(0, 1, 0, 1.0), (1, 2, 60, 1.0), (2, 1, 120, 1.0)]
    out = sessionize(_df(spark, rows), gap_minutes=30).collect()
    assert sorted((r["user_id"], r["n_events"]) for r in out) == [(1, 2), (2, 1)]


def test_equal_timestamps_share_a_session(spark):
    rows = [(0, 3, 0, 0.1), (1, 3, 0, 0.2), (2, 3, 0, 0.33)]
    out = sessionize(_df(spark, rows)).collect()
    assert len(out) == 1
    assert out[0]["n_events"] == 3
    assert out[0]["value_sum"] == 0.63  # cents-exact, no float drift
