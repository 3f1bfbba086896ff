"""Redirect-chain resolution: every URL's final landing URL in
O(log max_hops) equi-joins (pointer jumping), never a per-hop loop.

The reference's fetch layer inherits Go ``net/http``'s redirect policy:
the client silently follows 3xx chains up to **10 hops**, then errors
("stopped after 10 redirects") — reference scraper.go's plain
``http.Get`` calls. In a distributed recrawl/audit pipeline the same
resolution runs as a *set* operation over the fetch table's
``(url, redirect_to)`` column pair: canonical-URL election, frontier
dedup (two frontier URLs that 301 to one landing page are one fetch),
and redirect-loop detection (the classic crawler trap) all need "the
terminal URL after ≤ H hops, or a loop flag".

Naive resolution walks one hop per iteration — H equi-joins and a
driver-synchronized loop of depth H. This operator uses **pointer
jumping** (Wyllie's list-ranking step, the same doubling trick batch
connected-components uses): maintain ``g = f^(2^i)`` where ``f`` maps
every URL one hop (terminals self-map, absorbing), and square it
``ceil(log2 H)`` times — 4 joins resolve 10 hops, 7 joins resolve 100.

Semantics (exact, engine-independent):

- ``resolved`` ⇔ the walk reaches a NON-REDIRECTING URL within
  ``max_hops`` single steps. Then ``final_id`` = that URL and ``hops``
  = the exact step count; otherwise both are NULL (redirect loop, or a
  chain deeper than ``max_hops`` — the Go client's error case).
- A redirect target with NO row in ``edges`` (an unfetched URL) is
  terminal by definition: the chain's end is *known* even though the
  page was never fetched, so the walk absorbs there. Callers therefore
  need not close the URL set.
- Hop counts accumulate exactly under doubling because terminals are
  absorbing with step weight 0: after ``r`` squarings ``g(u)`` is the
  node ``min(2^r, L)`` steps from ``u`` (L = true chain length) and the
  accumulated distance equals ``L`` whenever the terminal was reached.
  ``2^r ≥ max_hops`` guarantees every admissible chain is complete, and
  chains that reach a terminal in ``max_hops < d ≤ 2^r`` steps are
  rejected by the final ``d ≤ max_hops`` gate — identical to the
  oracle's hop-bounded recursive walk.

Scale shape (10^10 fetched URLs): ``ceil(log2 H)`` self-equi-joins of a
three-column ``(id, id, BIGINT)`` relation — each ONE balanced shuffle
on the high-cardinality URL id, map-side nothing to combine, no window,
no cartesian, no driver loop proportional to data. ``localCheckpoint``
per squaring truncates the doubling lineage (the iterative-plan idiom
shared with ``dedup.connected_components`` / ``graph.pagerank``).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_redirects(
    edges: DataFrame,
    max_hops: int = 10,
    id_col: str = "url_id",
    dst_col: str = "redirect_to",
) -> DataFrame:
    """→ ``(id_col, final_id, hops, resolved)`` for every row of
    ``edges`` (one row per fetched URL; ``dst_col`` NULL ⇔ the fetch
    terminated, non-NULL ⇔ it 3xx'd to that URL id). ``final_id``/
    ``hops`` are BIGINT, NULL when unresolved; see module docstring for
    the exact contract. Default ``max_hops=10`` mirrors Go
    ``net/http``'s redirect limit (the reference's fetch policy)."""
    if max_hops <= 0:
        raise ValueError(f"max_hops must be positive, got {max_hops}")
    rounds = math.ceil(math.log2(max_hops)) if max_hops > 1 else 0

    # f^(2^0): one hop, terminals absorbing with weight 0
    g = edges.select(
        F.col(id_col).alias("u"),
        F.coalesce(F.col(dst_col), F.col(id_col)).alias("nxt"),
        F.when(F.col(dst_col).isNull(), F.lit(0))
        .otherwise(F.lit(1))
        .cast("long")
        .alias("d"),
    )
    for _ in range(rounds):
        right = g.select(
            F.col("u").alias("_ru"),
            F.col("nxt").alias("_rn"),
            F.col("d").alias("_rd"),
        )
        # left join: a dangling target (no edges row) is terminal —
        # absorb in place with weight 0
        g = (
            g.join(right, F.col("nxt") == F.col("_ru"), "left")
            .select(
                "u",
                F.coalesce("_rn", "nxt").alias("nxt"),
                (F.col("d") + F.coalesce(F.col("_rd"), F.lit(0))).alias("d"),
            )
            .localCheckpoint(eager=False)
        )

    redirecting = edges.where(F.col(dst_col).isNotNull()).select(
        F.col(id_col).alias("_t"), F.lit(True).alias("_loops_on")
    )
    ok = F.col("_loops_on").isNull() & (F.col("d") <= F.lit(int(max_hops)))
    return (
        g.join(redirecting, F.col("nxt") == F.col("_t"), "left")
        .select(
            F.col("u").alias(id_col),
            F.when(ok, F.col("nxt")).cast("long").alias("final_id"),
            F.when(ok, F.col("d")).cast("long").alias("hops"),
            ok.alias("resolved"),
        )
    )
