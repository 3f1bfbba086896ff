"""Link-graph analytics over the crawl's extracted edges — fixed-point
PageRank for frontier prioritization.

The reference crawls breadth-first and (in priority mode) dequeues by a
static per-URL priority; a production recrawl scheduler wants a *link-graph*
signal — pages many fetched pages point at should be fetched (and refreshed)
first. PageRank over the (src, dst) edge table the extraction kernel already
produces is that signal. There is no counterpart in the reference
(``internal/crawler/crawler.go`` has no graph pass); this is one of the
engine's beyond-the-reference training-/crawl-pipeline operators.

Why fixed-point (integer) arithmetic
------------------------------------
A float PageRank is not reproducible across engines or even across runs:
``sum()`` over doubles is order-dependent, and shuffle partitioning decides
the order. Every rank here is a BIGINT in units of 1e-12 (``SCALE``), and
every iteration uses only integer +, *, and floor division — integer
addition is associative and commutative, so the result is bit-exact under
ANY aggregation order, any partitioning, and in any engine (the DuckDB
oracle reproduces it digit-for-digit). The truncation each ``div`` applies
loses at most ``n_edges + n_nodes`` units of 1e-12 of probability mass per
iteration — irrelevant for ranking, invaluable for reproducibility at
100 TB (re-running the job on a different cluster layout yields the same
bytes).

Iteration (damping d = ``damping_pct``/100, nodes N, scale S)::

    r_0(v)   = S div N
    share(u) = r_t(u) div outdeg(u)                   (u with outlinks)
    dang_t   = sum of r_t(u) over sink nodes (outdeg 0)
    r_{t+1}(v) = (15*S div 100) div N
               + (85 * (sum_{u->v} share(u) + dang_t div N)) div 100

Scale shape: per iteration ONE shuffle equi-join (edges ⋈ ranks on src,
map-side partial aggregation into the dst groupBy) plus one scalar
aggregate (the dangling mass — a single BIGINT to the driver, same class
as the engine's per-round counters). The edge table with its out-degrees
is materialized once (``localCheckpoint``) and reused every iteration;
ranks are checkpointed per iteration so the plan stays O(1) deep (the
same lineage-truncation rule as the crawl round loop, plans/bfs.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**12

#: HITS fixed-point unit — smaller than PageRank's SCALE because the
#: rescale multiplies a raw in-link sum (≤ max_indeg · HITS_SCALE) by the
#: scale again before the floor divide; HITS_SCALE² · max_indeg must stay
#: under 2^63, which 1e6 satisfies for any max_indeg < ~9.2e6 (pre-collapse
#: heavier graphs, e.g. to hosts, first — same guidance as weighted
#: PageRank's w bound above).
HITS_SCALE = 10**6


def pagerank_fixed_point(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    iters: int = 5,
    node_col: str = "node_id",
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
) -> DataFrame:
    """PageRank over ``edges`` (BIGINT endpoints, deduplicated here) for the
    node set ``nodes`` (one row per ``node_col``; nodes absent from the edge
    table are dangling and receive teleport + dangling mass like any sink).

    Returns one row per node: ``(node_id, out_deg, in_deg, rank_fp)`` with
    ``rank_fp`` the fixed-point rank in units of 1e-12 (all BIGINT).
    Damping is fixed at 0.85 / 5 iterations by default — the conventional
    web-graph setting (Page et al. 1999); both constants are exact in the
    integer iteration above.

    ``weight_col`` switches to WEIGHTED PageRank (positive BIGINT edge
    weights; duplicate (src, dst) rows are weight-summed rather than
    deduplicated): share(u→v) = r(u)·w(u,v) div Σw(u,·), the natural form
    for collapsed graphs — a host graph weighs each host pair by its
    page-level link count. ``out_deg``/``in_deg`` then report weight sums.
    Unweighted is exactly the w≡1 case (identical values). Weights must
    keep ``max_w · 1e12 < 2^63`` (w < ~9.2e6) — pre-bucket (e.g. log-cap)
    heavier multiplicities before calling.
    """
    spark = nodes.sparkSession
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.select(
            F.col(node_col).cast("long").alias("node_id"),
            F.lit(0).cast("long").alias("out_deg"),
            F.lit(0).cast("long").alias("in_deg"),
            F.lit(0).cast("long").alias("rank_fp"),
        )

    if weight_col is None:
        e = (
            edges.select(
                F.col(src_col).cast("long").alias("src"),
                F.col(dst_col).cast("long").alias("dst"),
            )
            .distinct()
            .select("src", "dst", F.lit(1).cast("long").alias("w"))
            .localCheckpoint()
        )
    else:
        e = (
            edges.select(
                F.col(src_col).cast("long").alias("src"),
                F.col(dst_col).cast("long").alias("dst"),
                F.col(weight_col).cast("long").alias("w"),
            )
            .groupBy("src", "dst")
            .agg(F.sum("w").alias("w"))
            .localCheckpoint()
        )
    deg = e.groupBy("src").agg(F.sum("w").alias("od")).localCheckpoint()

    base = (15 * SCALE // 100) // n_nodes  # teleport term, exact
    node_ids = nodes.select(F.col(node_col).cast("long").alias("v"))
    # rank state carries od so the dangling filter and the share division
    # never re-join the degree table inside the loop
    ranks = (
        node_ids.join(deg, node_ids["v"] == deg["src"], "left")
        .select(
            "v",
            F.coalesce(F.col("od"), F.lit(0)).cast("long").alias("od"),
            F.lit(SCALE // n_nodes).cast("long").alias("r"),
        )
        .localCheckpoint()
    )

    for _ in range(iters):
        dang = (
            ranks.filter(F.col("od") == 0).agg(F.sum("r").alias("s")).collect()
        )[0]["s"] or 0
        contrib = (
            e.join(ranks.filter(F.col("od") > 0), e["src"] == ranks["v"])
            .select("dst", F.expr("r * w div od").alias("share"))
            .groupBy("dst")
            .agg(F.sum("share").alias("c"))
        )
        ranks = (
            ranks.join(contrib, ranks["v"] == contrib["dst"], "left")
            .select(
                "v",
                "od",
                (
                    F.lit(base)
                    + F.expr(
                        f"85 * (coalesce(c, 0L) + {dang // n_nodes}L) div 100"
                    )
                )
                .cast("long")
                .alias("r"),
            )
            .localCheckpoint()
        )

    indeg = e.groupBy("dst").agg(F.sum("w").alias("ind"))
    return (
        ranks.join(indeg, ranks["v"] == indeg["dst"], "left")
        .select(
            F.col("v").alias("node_id"),
            F.col("od").alias("out_deg"),
            F.coalesce(F.col("ind"), F.lit(0)).cast("long").alias("in_deg"),
            F.col("r").alias("rank_fp"),
        )
    )


def hits_fixed_point(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    iters: int = 5,
    node_col: str = "node_id",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999) over ``edges`` (BIGINT
    endpoints, deduplicated here) for the node set ``nodes`` — the
    complementary link signal to :func:`pagerank_fixed_point`: a good
    *hub* links to many good authorities (a directory/sitemap page worth
    recrawling often because it surfaces new URLs), a good *authority* is
    linked from many good hubs (a page worth fetching early).

    Same reproducibility contract as PageRank above, with the classic
    L2 normalization replaced by the ∞-norm rescale the fixed-point power
    iteration uses (operators/spectral.py): after each update the score
    vector is rescaled to max = ``HITS_SCALE`` via one integer multiply +
    floor divide — max() and integer sums are order-independent, so the
    result is bit-exact under any partitioning and the DuckDB oracle
    reproduces every digit. Rescaling changes no ordering (it is a
    positive scalar multiple, exactly like the L2 norm it replaces).

    Iteration (scale S = ``HITS_SCALE``)::

        h_0(v)   = S
        a_t(v)   = (Σ_{u→v} h_{t-1}(u)) · S div max_v Σ_{u→v} h_{t-1}(u)
        h_t(u)   = (Σ_{u→v} a_t(v))     · S div max_u Σ_{u→v} a_t(v)

    Returns one row per node: ``(node_id, out_deg, in_deg, hub_fp,
    auth_fp)``, all BIGINT, scores in [0, S]. Scale shape: per iteration
    TWO shuffle equi-joins (edges ⋈ scores on src, then on dst — both
    map-side partially aggregated) and two scalar max() collects; the
    deduplicated edge table is checkpointed once and reused. Each raw
    in-/out-sum table is checkpointed the moment it is aggregated —
    it fans out to its max() collect, the rescale join AND the next
    half-iteration, and left lazy every consumer re-runs the edge join
    (the projection-collapse recompute gotcha; measured 27 s → the
    pagerank-proportional time on the 2M-edge bench graph). The state is
    checkpointed once per iteration so the plan stays O(1) deep."""
    spark = nodes.sparkSession
    if nodes.isEmpty():
        return nodes.select(
            F.col(node_col).cast("long").alias("node_id"),
            F.lit(0).cast("long").alias("out_deg"),
            F.lit(0).cast("long").alias("in_deg"),
            F.lit(0).cast("long").alias("hub_fp"),
            F.lit(0).cast("long").alias("auth_fp"),
        )
    S = HITS_SCALE
    e = (
        edges.select(
            F.col(src_col).cast("long").alias("src"),
            F.col(dst_col).cast("long").alias("dst"),
        )
        .distinct()
        .localCheckpoint()
    )
    state = (
        nodes.select(F.col(node_col).cast("long").alias("v"))
        .withColumn("h", F.lit(S).cast("long"))
        .withColumn("a", F.lit(0).cast("long"))
        .localCheckpoint()
    )

    # max(1, ...) below guards the all-zero vector (edge-less graph)
    for _ in range(iters):
        araw = (
            e.join(state.select("v", "h"), e["src"] == F.col("v"))
            .groupBy("dst")
            .agg(F.sum("h").alias("s"))
            .select(F.col("dst").alias("v"), "s")
            .localCheckpoint()
        )
        am = max(int(araw.agg(F.max("s")).collect()[0][0] or 0), 1)
        state = state.join(araw, state["v"] == araw["v"], "left").select(
            state["v"],
            "h",
            F.expr(f"coalesce(s, 0L) * {S}L div {am}L").alias("a"),
        )
        hraw = (
            e.join(state.select("v", "a"), e["dst"] == F.col("v"))
            .groupBy("src")
            .agg(F.sum("a").alias("s"))
            .select(F.col("src").alias("v"), "s")
            .localCheckpoint()
        )
        hm = max(int(hraw.agg(F.max("s")).collect()[0][0] or 0), 1)
        state = (
            state.join(hraw, state["v"] == hraw["v"], "left")
            .select(
                state["v"],
                F.expr(f"coalesce(s, 0L) * {S}L div {hm}L").alias("h"),
                "a",
            )
            .localCheckpoint()
        )

    odeg = e.groupBy("src").agg(F.count("*").alias("od"))
    ideg = e.groupBy("dst").agg(F.count("*").alias("ind"))
    return (
        state.join(odeg, state["v"] == odeg["src"], "left")
        .join(ideg, state["v"] == ideg["dst"], "left")
        .select(
            F.col("v").alias("node_id"),
            F.coalesce(F.col("od"), F.lit(0)).cast("long").alias("out_deg"),
            F.coalesce(F.col("ind"), F.lit(0)).cast("long").alias("in_deg"),
            F.col("h").alias("hub_fp"),
            F.col("a").alias("auth_fp"),
        )
    )


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Exact per-node triangle counts over the UNDIRECTED view of
    ``edges (src, dst)`` — the local-clustering signal that separates
    genuinely interlinked page neighborhoods from star-shaped link farms
    (a hub with 10^4 outlinks and zero triangles is navigation, not
    community). Beyond-the-reference graph analytics beside PageRank and
    HITS above; all counting is integer, so the result is bit-exact in
    any engine and under any shuffle order.

    Returns ``(node_id, degree BIGINT, n_triangles BIGINT)`` — one row
    per node incident to at least one (deduplicated, non-loop) edge;
    each triangle increments all three corners.

    Scale shape (Suri & Vassilvitskii 2011, "Counting triangles and the
    curse of the last reducer"): edges are ORIENTED low→high by
    ``(degree, id)`` before the wedge self-join, so a node's wedge
    fan-out is its ORIENTED out-degree — bounded by O(√E) on any graph —
    and the total wedge count is O(E^1.5) instead of Σ deg² (a 10^6-way
    star produces zero wedges instead of 10^12). Both the wedge build
    and the closure check are plain equi-joins (never a theta join or a
    window); the per-corner count is one map-side-combining groupBy over
    exploded triangle corners."""
    und = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("n"))
        .unionAll(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count("*").cast("long").alias("d"))
    )
    da = deg.select(F.col("n").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("n").alias("b"), F.col("d").alias("db"))
    j = und.join(da, "a").join(db, "b")
    keep = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    ore = j.select(
        F.when(keep, F.col("a")).otherwise(F.col("b")).alias("s"),
        F.when(keep, F.col("b")).otherwise(F.col("a")).alias("t"),
        F.when(keep, F.col("db")).otherwise(F.col("da")).alias("td"),
    )
    e1 = ore.select(
        F.col("s"), F.col("t").alias("b"), F.col("td").alias("tdb")
    )
    e2 = ore.select(
        F.col("s"), F.col("t").alias("c"), F.col("td").alias("tdc")
    )
    wedge = (
        e1.join(e2, "s")
        .where(
            (F.col("tdb") < F.col("tdc"))
            | ((F.col("tdb") == F.col("tdc")) & (F.col("b") < F.col("c")))
        )
        .select(F.col("s").alias("ta"), "b", "c")
    )
    # closure: the (b, c) pair is oriented by the SAME (degree, id) order
    # as every edge in `ore`, so one equi-semi-join decides it
    tri = wedge.join(
        ore.select(F.col("s").alias("b"), F.col("t").alias("c")),
        ["b", "c"],
        "leftsemi",
    )
    per = (
        tri.select(
            F.explode(F.array(F.col("ta"), F.col("b"), F.col("c"))).alias("n")
        )
        .groupBy("n")
        .agg(F.count("*").cast("long").alias("n_triangles"))
    )
    return (
        deg.join(per, "n", "left")
        .select(
            F.col("n").alias("node_id"),
            F.col("d").alias("degree"),
            F.coalesce("n_triangles", F.lit(0).cast("long")).alias(
                "n_triangles"
            ),
        )
    )


def personalized_pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    seeds: DataFrame,
    *,
    iters: int = 5,
    node_col: str = "node_id",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Personalized (topic-sensitive) PageRank (Haveliwala 2002): the
    teleport vector is uniform over ``seeds`` instead of all nodes — the
    crawl reading is "importance as seen from MY seed list", the natural
    recrawl priority for a focused crawler whose budget should stay near
    its topic rather than drift to globally-popular hubs.

    Same integer fixed-point discipline as :func:`pagerank_fixed_point`
    (BIGINT 1e-12 units, floor division only — bit-exact under any
    shuffle order and in any engine)::

        r_0(v)     = S div |seeds|            if v ∈ seeds else 0
        r_{t+1}(v) = [v ∈ seeds]·(15·S div 100) div |seeds|
                   + 85·(Σ_{u→v} r_t(u) div od(u)
                         + [v ∈ seeds]·(dang_t div |seeds|)) div 100

    (dangling mass teleports to the seeds too — the personalization
    vector, not the uniform one). Two exact consequences are pinned in
    tests/test_graph.py: seeds == all nodes reproduces
    ``pagerank_fixed_point`` digit-for-digit (the formulas coincide at
    |seeds| = N), and a node unreachable from every seed holds rank
    EXACTLY 0 through every iteration — not merely a small rank.

    Returns ``(node_id, is_seed, out_deg, in_deg, rank_fp)``. Scale
    shape identical to the plain operator: per iteration ONE equi-join
    shuffle + a scalar dangling aggregate; the seed flag rides in the
    O(nodes) rank state, never re-joined.

    ``seeds`` is normalized before |seeds| is taken: duplicate seed rows
    and seed ids absent from ``nodes`` are dropped FIRST, so the teleport
    denominator always equals the number of nodes that actually receive
    mass (a duplicate row would otherwise silently shrink every rank)."""
    e = (
        edges.select(
            F.col(src_col).cast("long").alias("src"),
            F.col(dst_col).cast("long").alias("dst"),
        )
        .distinct()
        .localCheckpoint()
    )
    deg = e.groupBy("src").agg(F.count("*").alias("od")).localCheckpoint()

    node_ids = nodes.select(F.col(node_col).cast("long").alias("v"))
    seed_ids = (
        seeds.select(F.col(node_col).cast("long").alias("v"))
        .distinct()
        .join(node_ids.distinct(), "v", "leftsemi")
        .select("v", F.lit(True).alias("is_seed"))
        .localCheckpoint()
    )
    n_seeds = seed_ids.count()
    if n_seeds == 0:
        raise ValueError(
            "personalized_pagerank: empty seed set (after dedup and"
            " restriction to `nodes`)"
        )
    base = (15 * SCALE // 100) // n_seeds
    ranks = (
        node_ids.join(seed_ids, "v", "left")
        .join(deg, node_ids["v"] == deg["src"], "left")
        .select(
            "v",
            F.coalesce(F.col("is_seed"), F.lit(False)).alias("is_seed"),
            F.coalesce(F.col("od"), F.lit(0)).cast("long").alias("od"),
            F.when(F.coalesce(F.col("is_seed"), F.lit(False)),
                   F.lit(SCALE // n_seeds))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("r"),
        )
        .localCheckpoint()
    )

    for _ in range(iters):
        dang = (
            ranks.filter(F.col("od") == 0).agg(F.sum("r").alias("s")).collect()
        )[0]["s"] or 0
        contrib = (
            e.join(ranks.filter(F.col("od") > 0), e["src"] == ranks["v"])
            .select("dst", F.expr("r div od").alias("share"))
            .groupBy("dst")
            .agg(F.sum("share").alias("c"))
        )
        ranks = (
            ranks.join(contrib, ranks["v"] == contrib["dst"], "left")
            .select(
                "v",
                "is_seed",
                "od",
                F.expr(
                    f"(case when is_seed then {base}L else 0L end)"
                    f" + 85 * (coalesce(c, 0L)"
                    f" + (case when is_seed then {dang // n_seeds}L"
                    f" else 0L end)) div 100"
                )
                .cast("long")
                .alias("r"),
            )
            .localCheckpoint()
        )

    indeg = e.groupBy("dst").agg(F.count("*").alias("ind"))
    return (
        ranks.join(indeg, ranks["v"] == indeg["dst"], "left")
        .select(
            F.col("v").alias("node_id"),
            "is_seed",
            F.col("od").alias("out_deg"),
            F.coalesce(F.col("ind"), F.lit(0)).cast("long").alias("in_deg"),
            F.col("r").alias("rank_fp"),
        )
    )


def bfs_distances(
    nodes: DataFrame,
    edges: DataFrame,
    seeds: DataFrame,
    *,
    rounds: int = 8,
    node_col: str = "node_id",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Multi-source BFS hop distance from ``seeds`` over the link graph —
    the "true link distance" a crawl analyst compares against the crawl's
    *discovered* depth (first-wins crawl depth ≥ link distance, with
    equality only when the frontier never cuts a shallow path; the crawl
    traces record the former, this operator computes the latter). Also
    the standard frontier-expansion primitive the graph family was
    missing next to PageRank/HITS/triangles/components.

    Synchronous level-at-a-time expansion, frontier-only relaxation:
    round t joins ONLY the level-(t-1) frontier against the edge table
    (one equi-join shuffle), anti-joins the cumulative distance table to
    keep first (= shortest) labels, and stops early when the frontier
    empties — each edge is relaxed at most once per endpoint level, the
    textbook O(E) BFS work bound, vs. the O(rounds·E) of re-expanding
    every reached node per round. Distances are exact BIGINTs (a level
    counter, no arithmetic at all), so any engine reproduces them; the
    DuckDB oracle unrolls the same fixed round count with the same
    anti-join (extra rounds past convergence are no-ops on both sides,
    so early stopping never breaks parity).

    Returns one row per node: ``(node_id, dist)`` with ``dist`` = -1 for
    nodes unreachable from every seed within ``rounds`` hops (a sentinel,
    not NULL — the catalog's result comparison sorts row tuples, and the
    whole catalog keeps NULL out of result columns for that reason). Seeds are
    normalized first (dedup + restrict to ``nodes``) like
    personalized_pagerank. Scale shape: per round one equi-join + one
    anti-join on node ids (never on text); frontier and distance tables
    are localCheckpoint-ed so the plan stays O(1) deep; the per-round
    emptiness check is one scalar count (same class as the crawl
    engine's per-round counters)."""
    e = (
        edges.select(
            F.col(src_col).cast("long").alias("src"),
            F.col(dst_col).cast("long").alias("dst"),
        )
        .distinct()
        .localCheckpoint()
    )
    node_ids = nodes.select(F.col(node_col).cast("long").alias("v"))
    frontier = (
        seeds.select(F.col(node_col).cast("long").alias("v"))
        .distinct()
        .join(node_ids.distinct(), "v", "leftsemi")
        .select("v", F.lit(0).cast("long").alias("d"))
        .localCheckpoint()
    )
    dist = frontier

    for t in range(1, rounds + 1):
        if frontier.count() == 0:
            break
        cand = (
            e.join(frontier, e["src"] == frontier["v"])
            .select(F.col("dst").alias("v"))
            .distinct()
        )
        frontier = (
            cand.join(dist, "v", "left_anti")
            .select("v", F.lit(t).cast("long").alias("d"))
            .localCheckpoint()
        )
        dist = dist.unionByName(frontier).localCheckpoint()

    return node_ids.join(dist, "v", "left").select(
        F.col("v").alias("node_id"),
        F.coalesce(F.col("d"), F.lit(-1)).cast("long").alias("dist"),
    )


def lpa_communities(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    rounds: int = 4,
    node_col: str = "node_id",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Synchronous label propagation (Raghavan, Albert & Kumara 2007)
    over the UNDIRECTED view of ``edges`` — near-linear-time community
    detection, the structural complement of connected components
    (operators/dedup.py groups entire components; LPA splits a component
    into densely-linked neighborhoods — the granularity at which mirror
    farms and nepotistic link clusters actually appear).

    The textbook algorithm breaks frequency ties RANDOMLY and iterates
    asynchronously — neither is reproducible. This variant is the
    deterministic synchronous form::

        l_0(v)     = v
        l_{t+1}(v) = argmax over neighbor labels L of
                     (count of neighbors carrying L, then SMALLEST L)
                     — isolated nodes keep their current label

    for a FIXED round count on both engines. Labels are node ids
    (BIGINT) and the update is pure counting with a (count desc, label
    asc) argmax — ``max(struct(cnt, -label))`` on the Spark side, the
    identical ORDER BY in the oracle — so every round is digit-exact
    under any shuffle order. Synchronous LPA can oscillate 2-cycles on
    bipartite structure instead of converging (Raghavan §IV); a fixed
    round count makes that irrelevant for reproducibility — both
    engines report round T's labels, converged or not.

    Returns one row per node: ``(node_id, label, comm_size)`` —
    ``comm_size`` the final label's population (1 for isolated nodes).
    Scale shape: per round ONE shuffle equi-join (symmetric edges ⋈
    labels on the neighbor endpoint) feeding a map-side-combining
    (v, label) count groupBy and a second map-side ``max(struct)``
    argmax groupBy — no windows anywhere; the symmetric edge table is
    checkpointed once, the O(nodes) label state per round (the same
    lineage-truncation rule as every iterative operator here)."""
    und = (
        edges.where(F.col(src_col) != F.col(dst_col))
        .select(
            F.least(src_col, dst_col).cast("long").alias("a"),
            F.greatest(src_col, dst_col).cast("long").alias("b"),
        )
        .distinct()
    )
    sym = (
        und.select(F.col("a").alias("v"), F.col("b").alias("u"))
        .unionAll(und.select(F.col("b").alias("v"), F.col("a").alias("u")))
        .localCheckpoint()
    )
    labels = (
        nodes.select(F.col(node_col).cast("long").alias("v"))
        .withColumn("l", F.col("v"))
        .localCheckpoint()
    )

    for _ in range(rounds):
        pick = (
            sym.join(
                labels.select(F.col("v").alias("u"), F.col("l").alias("nl")),
                "u",
            )
            .groupBy("v", "nl")
            .agg(F.count("*").alias("cnt"))
            .groupBy("v")
            .agg(F.max(F.struct(F.col("cnt"), (-F.col("nl")).alias("mnl"))).alias("m"))
            .select("v", (-F.col("m.mnl")).cast("long").alias("pl"))
        )
        labels = (
            labels.join(pick, "v", "left")
            .select("v", F.coalesce("pl", "l").cast("long").alias("l"))
            .localCheckpoint()
        )

    sz = labels.groupBy("l").agg(F.count("*").cast("long").alias("comm_size"))
    return labels.join(sz, "l").select(
        F.col("v").alias("node_id"),
        F.col("l").alias("label"),
        "comm_size",
    )


def graph_summary(edges: DataFrame) -> DataFrame:
    """One-row health summary of the DIRECTED link graph — the numbers a
    crawl dashboard shows every round: size, self-loop and reciprocity
    rates (Garlaschelli & Loffredo 2004 — reciprocity is the classic
    link-exchange/spam-ring smell at whole-graph granularity, the global
    sibling of linkspam's per-host reciprocal rings), degree extremes
    (is one hub dominating the frontier?) and the dangling count
    (PageRank's sink mass). Everything is exact integer counting plus
    ppm floor divisions — digit-exact in any engine.

    Returns ONE row::

        (n_nodes, n_edges, n_self_loops, n_recip_pairs, recip_ppm,
         max_out_deg, max_in_deg, n_dangling)

    with ``n_edges`` the distinct non-loop directed edges, ``recip_ppm``
    = 2·n_recip_pairs·1e6 div n_edges (the fraction of directed edges
    whose reverse also exists), and ``n_dangling`` the nodes with NO
    outgoing edge at all (self-loops count as outlinks — matching
    pagerank_fixed_point's out-degree, whose sink mass this predicts).
    Scale shape: one distinct, one
    self-semi-join on (dst, src) for reciprocity, two map-side degree
    groupBys reduced to scalar maxima, one anti-join for dangling —
    no windows, nothing cartesian, all single-row aggregates."""
    e = edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
    ).distinct().localCheckpoint()
    d = e.where(F.col("src") != F.col("dst"))
    loops = e.where(F.col("src") == F.col("dst")).count()
    n_edges = d.count()
    recip2 = d.join(
        d.select(F.col("dst").alias("src"), F.col("src").alias("dst")),
        ["src", "dst"],
        "leftsemi",
    ).count()  # directed edges whose reverse exists (= 2 · pairs)
    nodes = (
        d.select(F.col("src").alias("n"))
        .unionAll(d.select(F.col("dst").alias("n")))
        .unionAll(e.where(F.col("src") == F.col("dst")).select(F.col("src").alias("n")))
        .distinct()
        .localCheckpoint()
    )
    n_nodes = nodes.count()
    max_out = (
        d.groupBy("src").agg(F.count("*").alias("c")).agg(F.max("c")).collect()
    )[0][0] or 0
    max_in = (
        d.groupBy("dst").agg(F.count("*").alias("c")).agg(F.max("c")).collect()
    )[0][0] or 0
    n_dangling = nodes.join(
        e.select(F.col("src").alias("n")).distinct(), "n", "left_anti"
    ).count()
    recip_ppm = recip2 * 1_000_000 // n_edges if n_edges else 0
    spark = edges.sparkSession
    return spark.createDataFrame(
        [
            (
                n_nodes,
                n_edges,
                loops,
                recip2 // 2,
                recip_ppm,
                int(max_out),
                int(max_in),
                n_dangling,
            )
        ],
        "n_nodes long, n_edges long, n_self_loops long, n_recip_pairs long,"
        " recip_ppm long, max_out_deg long, max_in_deg long, n_dangling long",
    )


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """Degree assortativity coefficient (Newman 2002) of the UNDIRECTED
    view of ``edges`` — the one-number structural fingerprint that
    separates social-style graphs (assortative, hubs link hubs, r > 0)
    from web/spam-style graphs (disassortative, hubs link leaves,
    r < 0): a link farm's star topology drives r sharply negative, so
    this is the cheapest whole-graph spam smell next to the per-node
    signals (triangles, k-core, linkspam).

    r is the Pearson correlation of endpoint degrees over both edge
    orientations. Every Pearson component is an EXACT BIGINT sum of
    integer degrees (order-independent under any shuffle) —

        m2  = 2|E|,  sx = Σ d(u)²,  sxy = Σ_{u~v} 2·d(u)·d(v),
        sx2 = Σ d(u)³

    — and only the final ratio is floating point: one fixed-shape IEEE
    expression over the four scalars, identical in both engines, so the
    6-decimal report matches digit-for-digit. Returns ONE row:
    ``(n_nodes, m2, sx, sxy, sx2, assort6)`` (assort6 = 0.0 for the
    degenerate regular graph whose variance is zero). Component sums
    stay in BIGINT while Σd³ < 2^63 — collapse heavier graphs (e.g. to
    hosts) first, the same guidance as weighted PageRank's bound.

    Scale shape: one distinct + one degree groupBy + two broadcast-size
    joins of the degree table onto the edge list + ONE global aggregate
    (six scalars). No windows, nothing cartesian."""
    und = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("n"))
        .unionAll(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count("*").cast("long").alias("d"))
    )
    j = (
        und.join(deg.select(F.col("n").alias("a"), F.col("d").alias("da")), "a")
        .join(deg.select(F.col("n").alias("b"), F.col("d").alias("db")), "b")
    )
    s = j.agg(
        F.count("*").cast("long").alias("m"),
        F.sum(F.col("da") + F.col("db")).cast("long").alias("sx"),
        F.sum(2 * F.col("da") * F.col("db")).cast("long").alias("sxy"),
        F.sum(F.col("da") * F.col("da") + F.col("db") * F.col("db"))
        .cast("long")
        .alias("sx2"),
    )
    n_nodes = deg.agg(F.count("*").cast("long").alias("nn"))
    out = s.crossJoin(F.broadcast(n_nodes)).select(
        F.col("nn").alias("n_nodes"),
        (2 * F.col("m")).cast("long").alias("m2"),
        "sx",
        "sxy",
        "sx2",
    )
    m2d = F.col("m2").cast("double")
    sxd = F.col("sx").cast("double")
    return out.withColumn(
        "assort6",
        F.when(
            m2d * F.col("sx2").cast("double") - sxd * sxd == 0.0, F.lit(0.0)
        ).otherwise(
            F.round(
                (m2d * F.col("sxy").cast("double") - sxd * sxd)
                / (m2d * F.col("sx2").cast("double") - sxd * sxd),
                6,
            )
        ),
    )


def kcore_members(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    k: int = 3,
    rounds: int = 8,
    node_col: str = "node_id",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """k-core membership by synchronous peeling (Seidman 1983; the
    Batagelj-Zaveršnik peel run level-synchronously) over the UNDIRECTED
    view of ``edges``: repeatedly delete every node whose degree in the
    SURVIVING subgraph is < ``k``. What remains is the k-core — the
    maximal subgraph of minimum degree ≥ k, the standard
    dense-neighborhood filter between triangles (too local) and
    components (too global): a page cluster that survives the 3-core is
    genuinely interlinked, while star hubs and chains peel away in the
    first rounds.

    Pure integer degree counting and set membership — digit-exact in
    any engine. Peeling is monotone (the alive set only shrinks), so a
    FIXED round count is parity-safe: once no node drops, every further
    round is a no-op on both engines; ``rounds`` bounds work, early
    stop never changes the answer (the same argument as bfs_distances).
    Seidman's peel converges in ≤ |V| rounds; real link graphs settle
    in a handful because each round deletes whole frontier layers.

    Returns one row per node: ``(node_id, in_core, deg_in_core)`` —
    ``in_core`` whether the node survived round ``rounds``,
    ``deg_in_core`` its degree among survivors (0 when peeled). Scale
    shape: per round TWO semi-joins restricting the checkpointed edge
    table to alive endpoints plus one map-side-combining degree groupBy
    over exploded endpoints; the alive set (O(nodes), ids only) is
    checkpointed per round; one scalar count drives the early stop —
    no windows, no text, nothing cartesian."""
    und = (
        edges.where(F.col(src_col) != F.col(dst_col))
        .select(
            F.least(src_col, dst_col).cast("long").alias("a"),
            F.greatest(src_col, dst_col).cast("long").alias("b"),
        )
        .distinct()
        .localCheckpoint()
    )
    node_ids = nodes.select(F.col(node_col).cast("long").alias("v"))
    alive = node_ids.distinct().localCheckpoint()
    n_alive = alive.count()

    def _deg(alive_df: DataFrame) -> DataFrame:
        ea = (
            und.join(alive_df.select(F.col("v").alias("a")), "a", "leftsemi")
            .join(alive_df.select(F.col("v").alias("b")), "b", "leftsemi")
        )
        return (
            ea.select(F.explode(F.array(F.col("a"), F.col("b"))).alias("n"))
            .groupBy("n")
            .agg(F.count("*").cast("long").alias("d"))
        )
    for _ in range(rounds):
        deg = _deg(alive)
        alive = (
            deg.where(F.col("d") >= k)
            .select(F.col("n").alias("v"))
            .localCheckpoint()
        )
        nxt = alive.count()
        if nxt == n_alive:
            break
        n_alive = nxt

    dfin = _deg(alive)
    return (
        node_ids.join(
            alive.select("v", F.lit(True).alias("_in")), "v", "left"
        )
        .join(dfin, node_ids["v"] == dfin["n"], "left")
        .select(
            F.col("v").alias("node_id"),
            F.coalesce(F.col("_in"), F.lit(False)).alias("in_core"),
            F.coalesce(F.col("d"), F.lit(0)).cast("long").alias(
                "deg_in_core"
            ),
        )
    )


def opic_fixed_point(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    rounds: int = 5,
    node_col: str = "node_id",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """OPIC — Adaptive On-line Page Importance Computation (Abiteboul,
    Preda & Cobéna, WWW 2003): THE crawl-time importance estimator. Where
    PageRank is a batch fixed point over a frozen snapshot, OPIC is the
    estimator a crawler updates *while crawling*: every page holds
    ``cash``; when processed it distributes its cash equally over its
    outlinks and banks the amount in its ``history``; importance is the
    banked total (history + in-hand cash) — it converges to the
    undamped principal eigenvector without ever storing the graph's
    transition matrix. This is the synchronous (batch-round) variant —
    every round ALL pages distribute simultaneously, matching the
    engine's round-synchronous crawl loop; dangling cash is re-spread
    uniformly (the paper's virtual page, collapsed to one round)::

        c_0(v)     = S div N                    (S = 1e12, BIGINT units)
        h_0(v)     = 0
        dang_t     = Σ c_t(u) over sinks (outdeg 0)
        c_{t+1}(v) = Σ_{u→v} c_t(u) div od(u)  +  dang_t div N
        h_{t+1}(v) = h_t(v) + c_t(v)

    Same integer fixed-point discipline as :func:`pagerank_fixed_point`
    (floor division only — bit-exact under any shuffle order, digit-for-
    digit reproducible in the DuckDB oracle); distinct algorithm and
    distinct output: no damping, and the HISTORY column is the estimate
    (cash alone oscillates; history is a Cesàro-style average that
    doesn't — the paper's central observation).

    Returns ``(node_id, out_deg, cash_fp, hist_fp)`` with ``hist_fp`` =
    h_T + c_T, the paper's importance estimate, in 1e-12 units. Scale
    shape: per round ONE equi-join shuffle (edges ⋈ cash on src, map-side
    partial agg into the dst groupBy) + one scalar dangling aggregate;
    state is (v, od, c, h) — O(nodes) — localCheckpoint-ed per round."""
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.select(
            F.col(node_col).cast("long").alias("node_id"),
            F.lit(0).cast("long").alias("out_deg"),
            F.lit(0).cast("long").alias("cash_fp"),
            F.lit(0).cast("long").alias("hist_fp"),
        )
    e = (
        edges.select(
            F.col(src_col).cast("long").alias("src"),
            F.col(dst_col).cast("long").alias("dst"),
        )
        .distinct()
        .localCheckpoint()
    )
    deg = e.groupBy("src").agg(F.count("*").alias("od")).localCheckpoint()

    node_ids = nodes.select(F.col(node_col).cast("long").alias("v"))
    state = (
        node_ids.join(deg, node_ids["v"] == deg["src"], "left")
        .select(
            "v",
            F.coalesce(F.col("od"), F.lit(0)).cast("long").alias("od"),
            F.lit(SCALE // n_nodes).cast("long").alias("c"),
            F.lit(0).cast("long").alias("h"),
        )
        .localCheckpoint()
    )

    for _ in range(rounds):
        dang = (
            state.filter(F.col("od") == 0).agg(F.sum("c").alias("s")).collect()
        )[0]["s"] or 0
        contrib = (
            e.join(state.filter(F.col("od") > 0), e["src"] == state["v"])
            .select("dst", F.expr("c div od").alias("share"))
            .groupBy("dst")
            .agg(F.sum("share").alias("g"))
        )
        state = (
            state.join(contrib, state["v"] == contrib["dst"], "left")
            .select(
                "v",
                "od",
                (F.coalesce(F.col("g"), F.lit(0)) + F.lit(dang // n_nodes))
                .cast("long")
                .alias("c"),
                (F.col("h") + F.col("c")).cast("long").alias("h"),
            )
            .localCheckpoint()
        )

    return state.select(
        F.col("v").alias("node_id"),
        F.col("od").alias("out_deg"),
        F.col("c").alias("cash_fp"),
        (F.col("h") + F.col("c")).cast("long").alias("hist_fp"),
    )
