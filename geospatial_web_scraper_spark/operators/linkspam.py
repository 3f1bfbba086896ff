"""Host-level link-spam / nepotism signals over the crawl's link graph.

A frontier scheduler at 10^10 URLs needs to DEMOTE link farms before it
needs to rank authorities: nepotistic (intra-host) linking, reciprocal
link rings, and single-target link concentration are the classic
pre-PageRank spam signals (Davison 2000, "Recognizing nepotistic links
on the Web"; Fetterly/Manasse/Najork 2004 on spam statistics). The
reference crawler has no graph pass at all (``internal/crawler/
crawler.go`` — BFS only), so this is one of the engine's
beyond-the-reference crawl-quality operators, feeding the same
rank-table slot of ``PolitenessScheduler`` that PageRank/OPIC do.

Everything is integer counting plus floor division into parts-per-
million units, so every row is digit-exact under any shuffle order and
reproducible in the DuckDB oracle — the same fixed-point discipline as
operators/graph.py.

Scale shape: the page→page edge table collapses to HOST pairs by pure
string projection (no join — host ids come out of the URL), then ONE
map-side-combining groupBy produces the weighted host-pair table
(≤ |hosts|² rows, the broadcastable scale PageRank's docstring argues
for at 10^7 hosts); every later step — per-host totals, external
concentration argmax, the reciprocal-pair semi-join — runs on that
collapsed table, never on page-level rows. No windows, no cartesian
products, no text columns past the first projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: parts-per-million unit for the exact ratio columns
PPM = 1_000_000


def host_link_report(host_edges: DataFrame) -> DataFrame:
    """Per-source-host link-spam signals over ``host_edges`` — one row
    per page-level link, projected to ``(src, dst)`` BIGINT host ids
    (self-pairs KEPT: intra-host links are the nepotism signal).

    Returns one row per host with at least one outgoing link::

        host_id       source host
        n_links       total outgoing page-links (intra + external)
        n_intra       links staying on the host (nepotism numerator)
        intra_ppm     n_intra · 1e6 div n_links
        n_dst_hosts   distinct EXTERNAL destination hosts
        top_dst       external host receiving the most links
                      (ties → smallest host id; -1 when none)
        top_w         links to top_dst
        top_ext_ppm   top_w · 1e6 div external link count (0 when none)
        n_recip_hosts external dst hosts that also link back
                      (reciprocal ring size)
        recip_ppm     n_recip_hosts · 1e6 div n_dst_hosts (0 when none)

    All columns BIGINT; ratios are floor divisions in ppm units, so the
    DuckDB oracle reproduces every digit. The concentration argmax uses
    ``max(struct(w, -dst))`` — max weight, then smallest destination id
    — the same deterministic tie rule as the catalog's other argmaxes.
    """
    hw = (
        host_edges.select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
        )
        .groupBy("src", "dst")
        .agg(F.count("*").cast("long").alias("w"))
    )
    tot = hw.groupBy("src").agg(
        F.sum("w").cast("long").alias("n_links"),
        F.coalesce(
            F.sum(F.when(F.col("src") == F.col("dst"), F.col("w"))), F.lit(0)
        )
        .cast("long")
        .alias("n_intra"),
    )
    ext = hw.filter(F.col("src") != F.col("dst"))
    extagg = ext.groupBy("src").agg(
        F.count("*").cast("long").alias("n_dst_hosts"),
        F.max(F.struct(F.col("w"), (-F.col("dst")).alias("md"))).alias("top"),
    )
    back = ext.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    recip = (
        ext.join(back, ["src", "dst"], "leftsemi")
        .groupBy("src")
        .agg(F.count("*").cast("long").alias("n_recip_hosts"))
    )
    out = (
        tot.join(extagg, "src", "left")
        .join(recip, "src", "left")
        .select(
            F.col("src").alias("host_id"),
            "n_links",
            "n_intra",
            F.expr(f"n_intra * {PPM} div n_links").alias("intra_ppm"),
            F.coalesce("n_dst_hosts", F.lit(0)).cast("long").alias(
                "n_dst_hosts"
            ),
            F.coalesce(-F.col("top.md"), F.lit(-1)).cast("long").alias(
                "top_dst"
            ),
            F.coalesce(F.col("top.w"), F.lit(0)).cast("long").alias("top_w"),
            F.coalesce("n_recip_hosts", F.lit(0)).cast("long").alias(
                "n_recip_hosts"
            ),
        )
        .withColumn(
            "top_ext_ppm",
            F.expr(
                f"CASE WHEN n_links > n_intra THEN"
                f" top_w * {PPM} div (n_links - n_intra) ELSE 0L END"
            ).cast("long"),
        )
        .withColumn(
            "recip_ppm",
            F.expr(
                f"CASE WHEN n_dst_hosts > 0 THEN"
                f" n_recip_hosts * {PPM} div n_dst_hosts ELSE 0L END"
            ).cast("long"),
        )
    )
    return out.select(
        "host_id",
        "n_links",
        "n_intra",
        "intra_ppm",
        "n_dst_hosts",
        "top_dst",
        "top_w",
        "top_ext_ppm",
        "n_recip_hosts",
        "recip_ppm",
    )
