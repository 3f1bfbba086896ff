"""Sitemap ingestion — the seed source that closes the robots loop.

robots.txt bodies advertise ``Sitemap:`` URLs (the parser keeps them out
of the rules table by design); the fetched sitemap documents land in a
``(host, xml)`` cache table, and this module turns that table into the
crawl's depth-0 seed list. The reference has no sitemap handling
(``internal/crawler/crawler.go`` seeds from a hard-coded URL list); this
is a beyond-the-reference crawl-pipeline source in the same spirit as the
WARC reader.

Parsing is deliberately a NATIVE regexp over the raw XML, not the
kernel's Go-flat-unmarshal model: sitemap ``<loc>`` values live two
levels deep (``urlset → url → loc`` / ``sitemapindex → sitemap → loc``),
which the frozen flat unmarshal binds nothing from, and the sitemap spec
constrains loc to XML-escaped character data — so
``regexp_extract_all('<loc>([^<]*)</loc>')`` + trim is exact for
spec-conforming documents, runs in whole-stage codegen with zero Python,
and has a byte-identical DuckDB mirror (the ``sitemap_seeds`` catalog
query value-checks it). Both urlset and sitemapindex documents yield
their loc lists; callers route index entries back to fetch (the two-level
expansion is a second pass over the fetched children, same dataflow).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.ordering import with_global_seq

__all__ = ["sitemap_locs_expr", "sitemap_seeds"]


def sitemap_locs_expr(xml: Column) -> Column:
    """→ array<string>: every ``<loc>`` value in document order,
    whitespace-trimmed (the spec permits padding inside the element)."""
    return F.transform(
        F.regexp_extract_all(xml, F.lit("<loc>([^<]*)</loc>"), F.lit(1)),
        lambda x: F.trim(x),
    )


def sitemap_seeds(
    sitemaps: DataFrame,
    host_col: str = "host",
    xml_col: str = "xml",
) -> DataFrame:
    """(seed_order, url): the crawl-ready seed list from a sitemap cache
    table — locs exploded in document order, first-wins dedup (min
    (host, doc, pos) claims a URL listed twice), globally sequenced by
    (host, doc, pos) via the two-pass distributed rank (never a
    single-reducer window). ``doc`` is the document's content md5: a host
    contributing SEVERAL sitemap documents (the sitemapindex expansion
    routes children back into the cache) would otherwise tie on
    (host, pos) across documents and leave the seed order to physical row
    order — the md5 key makes the order a pure function of the cache's
    contents. Feed straight into ``CrawlEngine.run``."""
    flat = sitemaps.select(
        F.col(host_col).alias("_h"),
        F.md5(F.col(xml_col)).alias("_doc"),
        F.posexplode(sitemap_locs_expr(F.col(xml_col))).alias("_pos", "url"),
    ).where(F.col("url") != "")
    first = (
        flat.groupBy("url")
        .agg(
            F.min(
                F.struct(F.col("_h"), F.col("_doc"), F.col("_pos"))
            ).alias("_w")
        )
        .select(
            "url",
            F.col("_w._h").alias("_h"),
            F.col("_w._doc").alias("_doc"),
            F.col("_w._pos").alias("_pos"),
        )
    )
    seeded, _ = with_global_seq(
        first, ["_h", "_doc", "_pos"], seq_col="seed_order"
    )
    return seeded.select(F.col("seed_order").cast("int").alias("seed_order"), "url")


#: Sitemap: directive inside robots.txt — per sitemaps.org the field is
#: file-global (never group-scoped), case-insensitive, and the value runs
#: to the first whitespace; a same-line comment starts at '#'. Inline
#: (?im) flags + the negated class are in the Java∩RE2 portable subset,
#: so the DuckDB oracle applies the IDENTICAL pattern (the robots_sitemaps
#: catalog query value-checks it).
ROBOTS_SITEMAP_RE = r"(?im)^[ \t]*sitemap[ \t]*:[ \t]*([^#\s]+)"


def robots_sitemap_urls_expr(robots_txt: Column) -> Column:
    """→ array<string>: every ``Sitemap:`` directive value in a robots.txt
    body, in document order. Pure whole-stage codegen — this is the
    discovery edge of the robots → sitemap → seeds pipeline: run it over
    the per-host robots cache, fetch the advertised documents into the
    ``(host, xml)`` sitemap cache, and :func:`sitemap_seeds` turns that
    into the crawl's depth-0 frontier."""
    return F.regexp_extract_all(
        robots_txt, F.lit(ROBOTS_SITEMAP_RE), F.lit(1)
    )
