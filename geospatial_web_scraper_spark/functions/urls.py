"""URL column expressions — all native Catalyst (whole-stage codegen), no UDFs.

The reference keys its seen set on the exact resolved URL string
(``crawler.go:57``); the engine generalizes to canonicalized ``xxhash64``
keys per the north rule. Canonicalization here is deliberately limited to
transformations that are also expressible in ANSI SQL (so DuckDB can act as
an oracle): fragment stripping + lowercasing of the scheme://authority head.
Resolution of *relative* URLs needs page context and lives in the extraction
kernel (J3 — ``crawler.go:109``), not here.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def strip_fragment(url: Column) -> Column:
    return F.split(url, "#", 2).getItem(0)


def url_head(url: Column) -> Column:
    """``scheme://authority`` — the first three '/'-separated parts."""
    return F.substring_index(url, "/", 3)


def canonicalize_url(url: Column) -> Column:
    """Lowercased scheme+authority, original path/query, fragment stripped."""
    nofrag = strip_fragment(url)
    head = url_head(nofrag)
    tail = F.substring(nofrag, F.length(head) + F.lit(1), F.length(nofrag))
    return F.concat(F.lower(head), tail)


def url_host(url: Column) -> Column:
    """Lowercased host: authority minus userinfo and port."""
    auth = F.split(strip_fragment(url), "/").getItem(2)
    no_user = F.element_at(F.split(auth, "@"), -1)
    return F.lower(F.split(no_user, ":").getItem(0))


def url_path(url: Column) -> Column:
    """Path component (no query/fragment), '' when absent."""
    nofrag = strip_fragment(url)
    head = url_head(nofrag)
    tail = F.substring(nofrag, F.length(head) + F.lit(1), F.length(nofrag))
    return F.split(tail, r"\?", 2).getItem(0)


def url_hash(url: Column) -> Column:
    """64-bit frontier/seen key: xxhash64 of the canonical URL (north rule)."""
    return F.xxhash64(canonicalize_url(url))


def go_ext(path: Column) -> Column:
    """Go ``path.Ext`` as a native expression: lowercased suffix from the last
    dot of the last path segment, '' when dotless (``crawler.go:113``)."""
    base = F.element_at(F.split(path, "/"), -1)
    return F.when(
        base.contains("."),
        F.lower(F.concat(F.lit("."), F.element_at(F.split(base, r"\."), -1))),
    ).otherwise(F.lit(""))


def filename_for_download(url: Column) -> Column:
    """Download-sink filename (``crawler.go:208-211``): basename of the URL
    path with ``'download'`` fallback for empty/'.'/'/'."""
    p = url_path(url)
    trimmed = F.regexp_replace(p, "/+$", "")
    base = F.element_at(F.split(trimmed, "/"), -1)
    return F.when(
        (p == "") | (trimmed == "") | base.isin("", ".", "/"), F.lit("download")
    ).otherwise(base)
