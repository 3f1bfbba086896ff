"""Semantic constants frozen from the reference's static data tables.

These are *data*, not code: the classification allow-lists and boilerplate
blacklists that define the reference's crawl semantics. Sources:

* ``GEO_MIME_TYPES``       — reference ``internal/crawler/data.go:3-31`` (27 types)
* ``GEO_FILE_EXTENSIONS``  — reference ``internal/crawler/data.go:34-46`` (11 exts)
* ``UNWANTED_CLASS_OR_ID`` — reference ``internal/crawler/data.go:48-93``
  (crawl-side boilerplate gate, class/id substrings)
* ``UNWANTED_META``        — reference ``internal/crawler/metadata.go:17-20``
  (metadata-side boilerplate gate: tag names OR class/id/role substrings;
  note this list is *different* from the crawl-side one)

Engine knobs mirror the reference's hardcoded operating parameters
(BASELINE.md): fetch budget 400/600, max depth 4, 40-way fetch concurrency.
"""

from __future__ import annotations

GEO_MIME_TYPES: frozenset[str] = frozenset(
    {
        "application/csv",
        "application/zip",
        "application/json",
        "application/geo+json",
        "application/x-geotiff",
        "application/x-shapefile",
        "application/x-esri-shape",
        "application/x-filegdb",
        "application/x-esri-geodatabase",
        "application/x-netcdf",
        "application/x-hdf",
        "application/x-hdf5",
        "application/x-hdf4",
        "application/x-grib",
        "application/grib",
        "application/x-bil",
        "application/x-bip",
        "application/x-bsq",
        "application/vnd.las",
        "application/vnd.laz",
        "application/vnd.google-earth.kml+xml",
        "application/vnd.google-earth.kmz",
        "application/x-sqlite3",
        "application/geopackage+sqlite3",
        "application/vnd.ogc.wms_xml",
        "application/vnd.ogc.wfs_xml",
        "application/topo+json",
    }
)

GEO_FILE_EXTENSIONS: frozenset[str] = frozenset(
    {
        ".zip",
        ".csv",
        ".json",
        ".geojson",
        ".kml",
        ".kmz",
        ".tif",
        ".tiff",
        ".nc",
        ".grib",
        ".xml",
    }
)

# Crawl-side boilerplate gate (applies to class/id attribute values,
# case-insensitive substring match) — reference data.go:48-93.
UNWANTED_CLASS_OR_ID: tuple[str, ...] = (
    "nav",
    "menu",
    "header",
    "breadcrumb",
    "skip",
    "sidebar",
    "aside",
    "related",
    "footer",
    "banner",
    "cookie",
    "consent",
    "disclaimer",
    "notice",
    "privacy",
    "alert",
    "accessibility",
    "social",
    "share",
    "subscribe",
    "newsletter",
    "feedback",
    "modal",
    "popup",
    "search",
    "contact",
    "foia",
    "policies",
    "identifier",
)

# Metadata-side boilerplate gate: matches tag names exactly OR appears as a
# substring of class/id/role attribute values — reference metadata.go:17-20.
UNWANTED_META: tuple[str, ...] = (
    "nav",
    "menu",
    "header",
    "footer",
    "sidebar",
    "aside",
    "ads",
    "cookie",
    "usa-banner",
)

# Visible-text parent tags for description accumulation — metadata.go:168-169.
VISIBLE_TEXT_PARENTS: frozenset[str] = frozenset({"p", "h1", "h2", "h3", "h4", "li"})

# Operating parameters (reference crawler.go:16-17,33,98; crawler2.go:88).
MAX_DEPTH = 4  # gate is depth + 1 < MAX_DEPTH, i.e. children at depth <= 3
MAX_CRAWL_ENGINE1 = 400
MAX_CRAWL_ENGINE2 = 600
FETCH_CONCURRENCY = 40  # generalized to per-host token budgets in the engine
TOP_K_SEEDS = 10
EMBED_BATCH_SIZE = 50
