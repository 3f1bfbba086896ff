"""HTML extraction as vectorized pandas/Arrow UDFs (the only Python on the
hot path, batched through Arrow — never row-at-a-time serde).

``extract_links_udf`` is the X1 UDTF (reference ``crawler.go:97-131``):
one page row in → array of link structs out, exploded engine-side with
``posexplode`` so document order survives as an explicit column.

``extract_meta_udf`` is X2 (reference ``metadata.go:40-220``): returns the
title/description/keywords struct whose ``description`` is the
byte-identical extracted text per url.

Both delegate per-document work to the shared pure-Python kernel
(:mod:`..kernel`), which the single-threaded oracle also uses — Spark adds
the distribution, Arrow the batching; the semantics live in one place.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..kernel import extract_links, extract_metadata

LINK_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("is_geo", T.BooleanType()),
            T.StructField("pos", T.IntegerType()),
        ]
    )
)

META_TYPE = T.StructType(
    [
        T.StructField("title", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("keywords", T.ArrayType(T.StringType())),
    ]
)


@F.pandas_udf(LINK_TYPE)
def extract_links_udf(html: pd.Series, base_url: pd.Series) -> pd.Series:
    out = []
    for h, u in zip(html, base_url):
        if h is None or u is None:
            out.append([])
            continue
        out.append(
            [(l["url"], l["is_geo"], l["pos"]) for l in extract_links(bytes(h), u)]
        )
    return pd.Series(out, dtype=object)


@F.pandas_udf(META_TYPE)
def extract_meta_udf(html: pd.Series, base_url: pd.Series) -> pd.DataFrame:
    titles, descs, kws = [], [], []
    for h, u in zip(html, base_url):
        if h is None or u is None:
            titles.append(None)
            descs.append(None)
            kws.append(None)
            continue
        md = extract_metadata(bytes(h), u)
        titles.append(md["title"])
        descs.append(md["description"])
        kws.append(md["keywords"])
    return pd.DataFrame({"title": titles, "description": descs, "keywords": kws})


def exploded_links(df, html_col: str = "html", url_col: str = "url") -> "Column":
    """Convenience: page rows → (page cols…, pos, link struct) rows."""
    withl = df.withColumn("_links", extract_links_udf(F.col(html_col), F.col(url_col)))
    return withl.select(
        *[c for c in df.columns if c != html_col],
        F.posexplode_outer("_links").alias("pos_in_doc", "link"),
    )
