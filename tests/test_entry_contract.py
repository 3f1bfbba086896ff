"""Local mirror of the driver's correctness gate: run every queries() entry
and its oracle_sql() through DuckDB side-by-side at sf0.001 and compare
row multisets (order-insensitive, column-name-aligned) — exactly what
CORRECTNESS_r{N}.json will measure at sf0.01."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF = os.environ.get("GWSS_TEST_SF", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return c


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, bool):
        return bool(v)
    return v


def _rows_spark(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(_norm(r[c]) for c in cols) for r in df.collect()
    ), cols


def _rows_duck(con, sql):
    res = con.execute(sql)
    cols = [d[0] for d in res.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = sorted(
        tuple(_norm(row[i]) for i in order) for row in res.fetchall()
    )
    return rows, sorted(cols)


ALL = sorted(entry_mod.queries().keys())
SQL_CHECKED = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_query_matches_oracle(spark, con, name):
    q = entry_mod.queries()[name]
    df = q(spark, SF)
    got, got_cols = _rows_spark(df)
    want, want_cols = _rows_duck(con, entry_mod.oracle_sql()[name])
    assert got_cols == want_cols, (got_cols, want_cols)
    assert len(got) == len(want), (name, len(got), len(want))
    mism = [(g, w) for g, w in zip(got, want) if g != w]
    assert not mism, (name, mism[:5])


@pytest.mark.parametrize("name", [n for n in ALL if n not in SQL_CHECKED])
def test_rows_only_queries_run(spark, name):
    df = entry_mod.queries()[name](spark, SF)
    assert df.count() >= 0  # runs, stable schema
    assert df.columns


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"seq", "url", "depth", "parent_url", "round", "host"}
