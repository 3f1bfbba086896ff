"""Mirror-site detection: host pairs serving the same content.

A production crawler wastes its fetch budget re-downloading mirrored
sites (country mirrors, CDN vanity domains, scraped re-hosts) — the
classic frontier-level dedup that *URL* canonicalization cannot catch
because the URLs share nothing. The standard signal is content overlap:
two hosts whose document content-hash sets overlap heavily are mirrors,
and the scheduler keeps one and demotes the other (the same consumer as
``traps.py``'s template denylist and ``graph.host_pagerank``'s authority
signal).

Shape: this is HOST-level containment — the host-granular sibling of
``dedup.containment_pairs`` — computed entirely on content *hashes*
(document text never shuffles; hashing happens in the input projection):

1. distinct ``(host, hash)`` — ONE map-side-combining shuffle;
2. **document-frequency cap**: content present on more than ``max_df``
   hosts is cross-site boilerplate (footers, license pages) and is
   dropped BEFORE pair generation — the same fan-out bound as the
   containment deduper: a hash contributes at most ``max_df·(max_df-1)/2``
   pairs, so the self-join is linear in the (host, hash) relation with a
   constant cap, never quadratic in corpus size;
3. hash self-equi-join (``host_a < host_b`` kills mirrors-of-mirrors
   double counting) + a map-side-combining pair count;
4. overlap score = ``shared / min(|A|, |B|)`` over the df-capped
   universe (Szymkiewicz–Simpson / overlap coefficient — containment of
   the smaller side, robust when a small mirror carries a subset of a
   big original). Sizes are computed on the SAME df-capped universe so
   a perfect mirror scores exactly 1.0.

Scale shape (10^10 docs, 10^7 hosts): two hash-key shuffles with
map-side combine + one df-bounded equi-join; the pair aggregate's key
space is mirror pairs only (sparse). No window, no cartesian, no text
movement. Skewed mega-hosts don't skew the join — the join key is the
content hash, df-capped by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mirror_hosts(
    docs: DataFrame,
    host_col: str = "host",
    hash_col: str = "content_hash",
    min_shared: int = 2,
    max_df: int = 64,
) -> DataFrame:
    """→ ``(host_a, host_b, shared, size_a, size_b, score)`` for every
    host pair sharing ≥ ``min_shared`` distinct df-capped content
    hashes; ``score`` = overlap coefficient rounded to 6 dp, ``size_*``
    = the host's distinct df-capped hash count. See module docstring
    for the plan shape and the ``max_df`` boilerplate cap."""
    if min_shared <= 0 or max_df <= 1:
        raise ValueError(
            f"need min_shared > 0 and max_df > 1; got {min_shared}, {max_df}"
        )
    hh = docs.select(
        F.col(host_col).alias("_host"), F.col(hash_col).alias("_h")
    ).distinct()
    capped = hh.join(
        hh.groupBy("_h")
        .agg(F.count(F.lit(1)).alias("_df"))
        .where(F.col("_df") <= max_df)
        .select("_h"),
        "_h",
    )
    sizes = capped.groupBy("_host").agg(F.count(F.lit(1)).alias("_n"))
    pairs = (
        capped.select("_h", F.col("_host").alias("host_a"))
        .join(capped.select("_h", F.col("_host").alias("host_b")), "_h")
        .where(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .where(F.col("shared") >= min_shared)
    )
    return (
        pairs.join(
            sizes.select(F.col("_host").alias("host_a"), F.col("_n").alias("size_a")),
            "host_a",
        )
        .join(
            sizes.select(F.col("_host").alias("host_b"), F.col("_n").alias("size_b")),
            "host_b",
        )
        .select(
            "host_a",
            "host_b",
            "shared",
            "size_a",
            "size_b",
            F.round(
                F.col("shared") / F.least("size_a", "size_b"), 6
            ).alias("score"),
        )
    )
