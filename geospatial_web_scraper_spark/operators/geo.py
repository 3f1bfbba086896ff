"""Grid-cell spatial join: all point pairs within a radius, without a
range join.

The reference is a *geospatial* scraper (its crawl targets are map/data
portals — reference data.go seed list), and the downstream workload over
a harvested point corpus is the spatial self-join: "which scraped places
fall within r of each other" (dedup of scraped POIs, cluster detection,
coverage audits). A naive theta-join on the distance predicate is a
cartesian scale-killer; the standard distributed plan is grid bucketing:

1. assign every point the integer cell ``(x div r, y div r)`` — any two
   points within ``r`` are in the same or an adjacent cell;
2. explode one side to its 3×3 cell neighborhood (a fixed ×9 fan-out,
   NOT data-dependent);
3. EQUI-join on the cell id (balanced shuffle on a spatially-uniform
   key), then verify the exact distance predicate on the ~constant-size
   candidate set.

Each qualifying pair is emitted exactly once: the partner's home cell
matches exactly one of the 9 probed neighbor cells, and ``id_a < id_b``
kills the mirror duplicate.

Coordinates here are integer micro-degrees on a planar box, and the
distance test is exact 64-bit integer arithmetic (``dlat² + dlon² ≤ r²``)
— no floating point anywhere, so Spark and the DuckDB brute-force oracle
agree bit-for-bit. (Geodesic metrics change the verify expression only;
the bucketing plan is identical — cells sized to the max metric radius.)

Scale shape (10^10 points): one shuffle of 10 copies of the (id, lat,
lon) triple — never the payload — on a uniform cell key; the per-cell
verify is the paper-standard local join. No window, no cartesian, no
skew beyond true spatial hot spots (which AQE's skew split handles, or a
finer grid — cell size is the knob).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import _md5_hash64_expr

#: side of the synthetic planar box, micro-degrees (1° × 1°)
BOX_MICRODEG = 1_000_000


def synth_point_expr(id_col: Column, axis: str) -> Column:
    """Deterministic micro-degree coordinate in [0, BOX) for an id: the
    60-bit md5 hash of ``'<axis>:<id>'`` mod the box — pure integer
    arithmetic, bit-identical in any engine (same construction as the
    sampling unit hash)."""
    return _md5_hash64_expr(
        F.concat(F.lit(axis), F.lit(":"), id_col)
    ) % F.lit(BOX_MICRODEG)


def synth_points(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """→ ``(id_col, lat, lon)`` synthetic deterministic points (test /
    bench harness for the join; a real corpus supplies its own extracted
    coordinates)."""
    c = F.col(id_col)
    return df.select(
        c,
        synth_point_expr(c, "lat").alias("lat"),
        synth_point_expr(c, "lon").alias("lon"),
    )


def _in_radius_candidates(
    points: DataFrame,
    radius: int,
    id_col: str,
    lat_col: str,
    lon_col: str,
    mirror_cut: bool,
) -> DataFrame:
    """Shared grid-probe candidate generator → ``(a_id, b_id, dist2)``
    rows with ``dist2 <= radius²`` exact BIGINT. ``mirror_cut=True``
    emits each unordered pair once (``a_id < b_id``, the pair-join
    form); ``False`` keeps both directions minus self (the per-point
    neighbor-list form)."""
    if radius <= 0:
        raise ValueError(f"radius must be positive, got {radius}")
    # r² computed in PYTHON (exact int) — an int-literal r*r in the plan
    # would wrap at radius > 46341
    r2 = F.lit(int(radius) * int(radius)).cast("long")
    base = points.select(
        F.col(id_col).alias("_id"),
        F.col(lat_col).cast("long").alias("_lat"),
        F.col(lon_col).cast("long").alias("_lon"),
    )
    cells = base.select(
        "*",
        F.expr(f"_lat div {int(radius)}").alias("_cy"),
        F.expr(f"_lon div {int(radius)}").alias("_cx"),
    )
    # mirror_cut probes only the 5 FORWARD offsets (r5): a cross-cell
    # pair with cell delta d is found by exactly one side — d ∈ FWD or
    # −d ∈ FWD, and FWD ∪ −FWD covers all 9 offsets intersecting only at
    # (0,0) — so the probe explosion drops 9× → 5× with the identical
    # output pair set. Same-cell pairs are still found from both ends
    # and keep the id gate; cross-cell finds are emitted as
    # (least, greatest). The neighbor-list form (mirror_cut=False) needs
    # per-point rows in both directions and keeps the full 3×3.
    fwd = [(0, 0), (0, 1), (1, -1), (1, 0), (1, 1)]
    all9 = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    offsets = F.array(
        *[
            F.struct(F.lit(dy).alias("dy"), F.lit(dx).alias("dx"))
            for dy, dx in (fwd if mirror_cut else all9)
        ]
    )
    probes = cells.select(
        F.col("_id").alias("a_id"),
        F.col("_lat").alias("_alat"),
        F.col("_lon").alias("_alon"),
        F.explode(offsets).alias("_o"),
        "_cy",
        "_cx",
    ).select(
        "a_id",
        "_alat",
        "_alon",
        (F.col("_cy") + F.col("_o.dy")).alias("_ncy"),
        (F.col("_cx") + F.col("_o.dx")).alias("_ncx"),
        ((F.col("_o.dy") == 0) & (F.col("_o.dx") == 0)).alias("_same"),
    )
    pair_gate = (
        # same cell: both ends probe it — keep one orientation; forward
        # cells: found once, any id order
        F.when(F.col("_same"), F.col("a_id") < F.col("b_id")).otherwise(
            F.lit(True)
        )
        if mirror_cut
        else F.col("a_id") != F.col("b_id")
    )
    joined = probes.join(
        cells.select(
            F.col("_id").alias("b_id"),
            F.col("_lat").alias("_blat"),
            F.col("_lon").alias("_blon"),
            F.col("_cy").alias("_ncy"),
            F.col("_cx").alias("_ncx"),
        ),
        ["_ncy", "_ncx"],
    ).where(pair_gate)
    dlat = F.col("_alat") - F.col("_blat")
    dlon = F.col("_alon") - F.col("_blon")
    dist2 = (dlat * dlat + dlon * dlon).cast("long")
    if mirror_cut:
        out = joined.select(
            F.least("a_id", "b_id").alias("a_id"),
            F.greatest("a_id", "b_id").alias("b_id"),
            dist2.alias("dist2"),
        )
    else:
        out = joined.select("a_id", "b_id", dist2.alias("dist2"))
    return out.where(F.col("dist2") <= r2)


def radius_pairs(
    points: DataFrame,
    radius: int,
    id_col: str = "doc_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """All unordered point pairs within ``radius`` (planar, integer
    micro-degrees) → ``(a_id, b_id, dist2)`` with ``a_id < b_id`` and
    ``dist2 = dlat² + dlon²`` exact BIGINT. See module docstring for the
    grid-bucket plan."""
    return _in_radius_candidates(
        points, radius, id_col, lat_col, lon_col, mirror_cut=True
    )


def knn_within(
    points: DataFrame,
    k: int,
    radius: int,
    id_col: str = "doc_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Per-point k-nearest-neighbors within ``radius`` → ``(a_id, b_id,
    dist2, rank)``, rank 1-based by (dist2 asc, b_id asc); points with no
    neighbor in range emit no rows. ``radius`` bounds the candidate set
    (the distributed-kNN contract: an unbounded global kNN degenerates to
    all-pairs for isolated points — callers widen r and re-query the
    still-unmatched residue, which stays a driver-side loop over a
    shrinking set).

    Scale shape: the same ×9 grid-probe equi-join as :func:`radius_pairs`
    (both directions kept, self dropped), then a per-point hash-aggregate
    top-k (``grouped_topk`` unsalted: the group key is the HIGH-cardinality
    point id, so the shuffle is balanced by construction and the per-group
    candidate set is density-bounded) — no window over anything global."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    cand = _in_radius_candidates(
        points, radius, id_col, lat_col, lon_col, mirror_cut=False
    )
    from .similarity import grouped_topk

    top = grouped_topk(
        cand.select("a_id", "b_id", (-F.col("dist2")).alias("_nd")),
        "a_id",
        "b_id",
        "_nd",
        k,
    )
    return top.select(
        "a_id",
        "b_id",
        (-F.col("_nd")).alias("dist2"),
        F.col("rank").cast("long").alias("rank"),
    )


def synth_polygons(df: DataFrame, id_col: str = "doc_id", every: int = 50) -> DataFrame:
    """Deterministic synthetic polygon corpus → ``(poly_id, xs, ys)``
    (closed implicitly, vertex arrays BIGINT micro-degrees): one convex
    diamond quad per ``id % every == 0`` row, centered at the md5 point
    ``('pcx:'|'pcy:' salts)`` with four independently-hashed arm lengths
    in [10000, 50000). Pure integer md5 arithmetic — the DuckDB oracle
    rebuilds the identical vertices (same construction as
    :func:`synth_point_expr`). A real corpus supplies extracted footprint
    polygons instead."""
    c = F.col(id_col)
    cx = synth_point_expr(c, "pcx")
    cy = synth_point_expr(c, "pcy")

    def arm(i: int) -> Column:
        return F.lit(10_000) + _md5_hash64_expr(
            F.concat(F.lit(f"pr{i}:"), c)
        ) % F.lit(40_000)

    base = df.where(c % every == 0).select(
        c.alias("poly_id"),
        cx.cast("long").alias("_cx"),
        cy.cast("long").alias("_cy"),
        *[arm(i).cast("long").alias(f"_r{i}") for i in range(4)],
    )
    return base.select(
        "poly_id",
        F.array(
            F.col("_cx") + F.col("_r0"),
            F.col("_cx"),
            F.col("_cx") - F.col("_r2"),
            F.col("_cx"),
        ).alias("xs"),
        F.array(
            F.col("_cy"),
            F.col("_cy") + F.col("_r1"),
            F.col("_cy"),
            F.col("_cy") - F.col("_r3"),
        ).alias("ys"),
    )


def crossings_expr(px: Column, py: Column, xs: Column, ys: Column) -> Column:
    """Ray-casting crossing count of the +x horizontal ray from ``(px,
    py)`` against the simple polygon ``(xs, ys)`` (closed implicitly),
    EXACT 64-bit integer arithmetic — no division, no floating point.
    Per edge (i → i%n+1) the PNPOLY half-open rule: the edge spans the
    ray's line iff ``(y1 > py) != (y2 > py)``, and the intersection lies
    strictly right of the point iff the cross product
    ``t = (x2-x1)(py-y1) - (px-x1)(y2-y1)`` has the sign of ``y2-y1``
    (``t = 0`` — point exactly on the edge line — never counts, the
    strict-< rule, identical in the oracle). Inside ⇔ odd count.
    Coordinates < 2^21 keep every product < 2^42: overflow-free.

    Degenerate inputs are never "inside": an EMPTY vertex array returns
    0 directly (guarded — ``sequence(1, 0)`` is DESCENDING in Spark and
    would index ``element_at(xs, 0)``), a 1-gon has no spanning edge,
    and a 2-gon's two opposite traversals produce an even count."""
    n = F.size(xs)

    def term(acc: Column, i: Column) -> Column:
        j = (i % n) + F.lit(1)
        x1, y1 = F.element_at(xs, i), F.element_at(ys, i)
        x2, y2 = F.element_at(xs, j), F.element_at(ys, j)
        spans = (y1 > py) != (y2 > py)
        t = (x2 - x1) * (py - y1) - (px - x1) * (y2 - y1)
        hit = spans & ((t > 0) == ((y2 - y1) > 0)) & (t != 0)
        return acc + F.when(hit, 1).otherwise(0)

    return F.when(n >= 1, F.aggregate(F.sequence(F.lit(1), n), F.lit(0), term)).otherwise(F.lit(0))


def point_in_polygon(
    points: DataFrame,
    polygons: DataFrame,
    cell: int = 65_536,
    id_col: str = "doc_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Spatial containment join → ``(id_col, poly_id)``: every (point,
    polygon) pair where the point lies strictly inside the polygon
    (ray-casting parity, exact integers — see :func:`crossings_expr`).

    Scale shape (10^10 points × 10^6 polygons): never a theta join.
    Polygons explode to the grid cells their bbox covers (fan-out =
    ⌈extent/cell⌉² — bounded by polygon size over the ``cell`` knob, ~4-9
    for footprint-sized shapes); points carry their single home cell; the
    candidate set is the cell EQUI-join (balanced shuffle on a uniform
    spatial key, broadcastable when the polygon side is small), and the
    exact parity verify runs on the ~constant candidates per cell. A
    point's home cell matches each polygon's exploded cell list at most
    once, so no candidate dedup is needed. lat = y, lon = x."""
    if cell <= 0:
        raise ValueError(f"cell must be positive, got {cell}")
    pts = points.select(
        F.col(id_col).alias("_id"),
        F.col(lat_col).cast("long").alias("_py"),
        F.col(lon_col).cast("long").alias("_px"),
    ).select(
        "*",
        F.expr(f"_py div {int(cell)}").alias("_ncy"),
        F.expr(f"_px div {int(cell)}").alias("_ncx"),
    )
    polys = polygons.select(
        "poly_id",
        "xs",
        "ys",
        F.explode(
            F.sequence(
                F.expr(f"array_min(ys) div {int(cell)}"),
                F.expr(f"array_max(ys) div {int(cell)}"),
            )
        ).alias("_ncy"),
        F.expr(f"array_min(xs) div {int(cell)}").alias("_cx0"),
        F.expr(f"array_max(xs) div {int(cell)}").alias("_cx1"),
    ).select(
        "poly_id",
        "xs",
        "ys",
        "_ncy",
        F.explode(F.sequence(F.col("_cx0"), F.col("_cx1"))).alias("_ncx"),
    )
    cand = pts.join(polys, ["_ncy", "_ncx"])
    inside = cand.where(
        crossings_expr(
            F.col("_px"), F.col("_py"), F.col("xs"), F.col("ys")
        ) % 2
        == 1
    )
    return inside.select(F.col("_id").alias(id_col), "poly_id")


#: the synthetic box [0, 2^20) covers every micro-degree coordinate
ZORDER_BOX_BITS = 20


def zorder_key_sql(
    lat: str, lon: str, level: int, div_op: str = "div"
) -> str:
    """The level-``level`` Z-order (Morton) cell key of ``(lat, lon)`` as
    a SQL expression string — pure non-negative integer div/mod
    arithmetic, valid in Spark SQL (``div_op='div'``) and DuckDB
    (``div_op='//'``) with identical values (both truncate, and every
    operand is ≥ 0 so truncate == floor). The grid is 2^level × 2^level
    over [0, 2^ZORDER_BOX_BITS); bit i of each cell coordinate lands at
    output bit 2i (lon/x) / 2i+1 (lat/y) — the standard interleave that
    makes the key a data-layout clustering column: a cell's children at
    any finer level are the contiguous key range ``[k·4^d, (k+1)·4^d)``,
    so sorting by the finest key physically co-locates every coarser
    cell too (the 100 TB layout story: ZORDER-cluster the corpus once,
    and every grid-blocked operator in this module scans contiguous
    files)."""
    if not 1 <= level <= ZORDER_BOX_BITS:
        raise ValueError(f"level must be in [1, {ZORDER_BOX_BITS}]")
    w = 1 << (ZORDER_BOX_BITS - level)
    terms = []
    for i in range(level):
        terms.append(f"(({lon} {div_op} {w << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"(({lat} {div_op} {w << i}) % 2) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"


def zorder_rollup(
    points: DataFrame,
    fine_level: int,
    coarse_level: int,
    id_col: str = "doc_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Spatial density rollup → ``(level, zkey, n_points)`` at two grid
    levels. Raw points shuffle exactly ONCE (the fine-level groupBy,
    map-side combining on the uniform Morton key); the coarse level
    re-aggregates the checkpointed fine output via the Z-curve's prefix
    property (``zkey div 4^(fine-coarse)`` IS the parent cell) — the same
    no-second-raw-scan hierarchy as ``temporal.rollup_time``."""
    if not 1 <= coarse_level < fine_level <= ZORDER_BOX_BITS:
        raise ValueError("need 1 <= coarse_level < fine_level <= box bits")
    key = F.expr(
        zorder_key_sql(lat_col, lon_col, fine_level, "div")
    ).cast("long")
    fine = (
        points.select(key.alias("zkey"))
        .groupBy("zkey")
        .agg(F.count(F.lit(1)).alias("n_points"))
        .localCheckpoint(eager=False)
    )
    shift = 4 ** (fine_level - coarse_level)
    coarse = (
        fine.select(
            F.expr(f"zkey div {shift}").alias("zkey"), "n_points"
        )
        .groupBy("zkey")
        .agg(F.sum("n_points").alias("n_points"))
    )
    lvl = lambda n, d: d.select(  # noqa: E731
        F.lit(n).cast("long").alias("level"), "zkey", "n_points"
    )
    return lvl(fine_level, fine).unionByName(lvl(coarse_level, coarse))


def cluster_points(
    points: DataFrame,
    radius: int,
    id_col: str = "doc_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    max_iters: int = 50,
) -> DataFrame:
    """Density clustering of the point corpus → ``(id_col, cluster_id,
    cluster_size)``: two points share a cluster iff connected by a chain
    of hops each ≤ ``radius`` (DBSCAN with minPts=2 where every in-radius
    point is core; singletons keep their own id as cluster_id, size 1).
    Deterministic: cluster_id = min member id.

    Composition of two already-scale-shaped pieces: the grid-bucket
    radius join (:func:`radius_pairs` — equi-join, never a distance
    theta-join) feeds the same star-contraction components engine that
    turns near-dup pairs into dedup groups
    (``dedup.connected_components``). Since the r5 rewrite rounds are
    ≤ log₂(points), NOT hop-diameter-bounded — past the continuum
    percolation threshold (mean degree ≈ 4.5, i.e. point density ·
    π·radius² per point) a giant component forms whose hop diameter
    grows with the spatial extent, and the old one-hop propagation hit
    its fail-loud guard there (measured: diameter 65 at sf0.1 with
    r=20 000); contraction handles it in a handful of rounds. Sizes
    come from a map-side-combining groupBy on the high-cardinality
    cluster_id + an equi-join back — never a window."""
    from .dedup import connected_components

    pairs = radius_pairs(points, radius, id_col, lat_col, lon_col)
    comp = connected_components(
        pairs, id_a="a_id", id_b="b_id", max_iters=max_iters
    )
    lab = (
        points.select(F.col(id_col).alias("id"))
        .join(comp, "id", "left")
        .select(
            "id", F.coalesce("component", F.col("id")).alias("cluster_id")
        )
    )
    sizes = lab.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return lab.join(sizes, "cluster_id").select(
        F.col("id").alias(id_col), "cluster_id", "cluster_size"
    )
