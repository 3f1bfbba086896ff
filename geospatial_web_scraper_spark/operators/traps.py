"""Crawl-trap detection — URL template profiling and the denylist gate.

Infinite URL spaces (calendar pages, session ids, faceted-search
permutations) are the classic way a production frontier fills with
garbage: every URL is new to the seen filter, so dedup never helps, and
one host drowns the crawl. The standard defense is TEMPLATE profiling —
collapse the volatile parts of a path (digit runs, long hex runs) into
placeholders and count distinct URLs per (host, template): a template
with 10^6 distinct URLs on one host is a trap signature no static
blocklist anticipates. The reference has no such guard (its frontier is
a bounded in-memory queue); at the 10^10-frontier design point it is a
first-class pipeline stage.

Dataflow: :func:`url_template_expr` is a pure codegen expression (two
``regexp_replace`` passes — no UDF, no shuffle), so the report is ONE
map-side-combining count-distinct groupBy on (host, template), and the
online gate is a broadcast anti-join in the politeness scheduler
(``PolitenessScheduler(trap_templates=...)``), exactly the robots-rule
shape. Detection feeds denial: run :func:`trap_report` over yesterday's
trace or frontier, review, and ship the flagged (host, template) rows as
the denylist. Trap URLs are DROPPED, never deferred — deferring a trap
keeps it in the frontier forever.

The regex alphabet is the Java∩RE2 portable subset (same rule as
operators/pii.py) so the DuckDB oracle applies the identical
normalization; the ``url_template_report`` catalog query value-checks
template + count for the whole corpus URL universe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.urls import url_host, url_path

#: long-hex first (a hex session id contains digit runs; collapsing
#: digits first would shred it into fragments), then digit runs. BOTH
#: collapse to the SAME placeholder: a pure-digit run of >=8 chars is a
#: valid hex run, so distinct placeholders would split one logical
#: template across two variants on the run-length boundary (/id/1234567
#: -> N but /id/12345678 -> hex) and let a trap stay under min_urls in
#: each half (r4 review finding). RE2 — the oracle's engine — has no
#: lookahead, so "hex run containing a letter" is not portably
#: expressible; one placeholder only ever MERGES templates, which for
#: trap detection is strictly safer than splitting them. COMPAT: denylist
#: tables persisted by pre-r4 builds carry 'H' placeholders that no
#: longer match anything — re-mine them with trap_report (flagged in the
#: crawl CLI's --trap-templates help).
_HEX_RUN = "[0-9a-f]{8,}"
_DIGIT_RUN = "[0-9]+"


def url_template_expr(url: Column) -> Column:
    """Path template of a URL: the path component with long lowercase-hex
    runs (≥8 chars — session ids, content hashes) and digit runs both
    collapsed to ``N``. Pure whole-stage codegen."""
    path = url_path(url)
    return F.regexp_replace(
        F.regexp_replace(path, _HEX_RUN, "N"), _DIGIT_RUN, "N"
    )


def trap_report(
    urls: DataFrame,
    url_col: str = "url",
    min_urls: int = 0,
) -> DataFrame:
    """→ (host, template, n_urls): distinct-URL count per (host, path
    template), descending-count order within the result, filtered to
    templates with more than ``min_urls`` distinct URLs (0 = full
    profile). One count-distinct aggregate — partial aggregation folds
    duplicate URLs map-side; at 10^10 rows this is the cheapest full-pass
    audit the frontier supports."""
    d = urls.select(
        url_host(F.col(url_col)).alias("host"),
        url_template_expr(F.col(url_col)).alias("template"),
        F.col(url_col).alias("_u"),
    )
    return (
        d.groupBy("host", "template")
        .agg(F.countDistinct("_u").alias("n_urls"))
        .where(F.col("n_urls") > min_urls)
    )
