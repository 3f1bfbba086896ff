"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: the full BFS crawl engine (budget 400, FIFO
total order) over the deterministic synthetic Common-Crawl-style corpus,
seeded from sf0.001 (reads documents.parquet to anchor on driver testdata).

``queries()`` / ``oracle_sql()`` — the operator catalog in
``geospatial_web_scraper_spark.entry_queries``: one entry per implemented
operator from SURVEY.md §2 plus the training-data pipeline operators, each
with a DuckDB-runnable oracle where SQL-expressible (crawl BFS itself is
oracle-checked via a recursive CTE over the corpus's arithmetic link graph).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from geospatial_web_scraper_spark import corpus  # noqa: E402
from geospatial_web_scraper_spark.entry_queries import ORACLES, QUERIES  # noqa: E402
from geospatial_web_scraper_spark.plans.bfs import CrawlEngine  # noqa: E402

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
_SHIPPED: set[int] = set()


def _ensure_shipped(spark: SparkSession) -> None:
    """Ship the package to executors (the `spark-submit --py-files` analog).

    The harness may import this module with a CWD outside the repo; Python
    UDF workers then can't resolve `geospatial_web_scraper_spark` from their
    inherited PYTHONPATH. addPyFile of a package zip fixes that for any
    externally-created SparkSession."""
    key = id(spark)
    if key in _SHIPPED:
        return
    import tempfile
    import zipfile

    zpath = os.path.join(tempfile.gettempdir(), "gwss_pkg.zip")
    pkg_root = os.path.join(_REPO_DIR, "geospatial_web_scraper_spark")
    with zipfile.ZipFile(zpath, "w") as zf:
        for dirpath, _dirs, files in os.walk(pkg_root):
            for fname in files:
                if not fname.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fname)
                zf.write(full, os.path.relpath(full, _REPO_DIR))
    spark.sparkContext.addPyFile(zpath)
    _SHIPPED.add(key)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: budget-400 BFS crawl trace over the N=300 corpus (anchored
    to sf0.001 by deriving the seed count from documents.parquet)."""
    _ensure_shipped(spark)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n_docs = docs.count()
    n = 300 if n_docs >= 8 else 60  # sf-anchored sanity fallback
    eng = CrawlEngine(
        spark, corpus.corpus_df(spark, n), max_crawl=400, lineage_detail=False
    )
    run = eng.run(corpus.seeds_df(spark, n))
    return run.trace.select("seq", "url", "depth", "parent_url", "round", "host")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def _wrap(fn: Callable[[SparkSession, str], DataFrame]):
        def inner(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_shipped(spark)
            return fn(spark, sf_dir)

        return inner

    return {name: _wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
