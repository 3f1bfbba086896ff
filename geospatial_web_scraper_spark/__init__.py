"""geospatial_web_scraper_spark — a from-scratch PySpark-native crawl/analytics engine.

Re-expresses the query and data-processing capabilities of the reference
(`atharva789/geospatial-web-scraper`, a Go BFS web crawler) as an idiomatic
Spark DataFrame program: a URL-frontier + fetch-scheduler over snapshot
tables (Iceberg in production, parquet snapshots in this sandbox), with

* a partitioned Bloom URL-seen prefilter backed by an exact left-anti join,
* a per-host politeness scheduler (token buckets + robots prefix rules),
* a salted priority dequeue favouring geospatial-dataset link signals,
* vectorized Arrow/pandas UDFs for HTML link/metadata extraction
  (no per-row Python on the hot path),
* per-round checkpointed snapshots with per-partition lineage rows,

plus the large-scale training-data operators a 100 TB pipeline needs
(exact/MinHash/SimHash dedup, ANN similarity search, text quality stats,
multimodal column plumbing).

Nothing in here is ported from the reference's Go code; the reference only
defines WHAT to compute (SURVEY.md cites every behavior to file:line).
"""

__version__ = "0.1.0"
