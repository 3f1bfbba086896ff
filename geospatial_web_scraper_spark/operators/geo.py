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
    offsets = F.array(
        *[
            F.struct(F.lit(dy).alias("dy"), F.lit(dx).alias("dx"))
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
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
    )
    pair_gate = (
        F.col("a_id") < F.col("b_id")
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
    return (
        joined.select("a_id", "b_id", dist2.alias("dist2"))
        .where(F.col("dist2") <= r2)
    )


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
    theta-join) feeds the same iterative min-label propagation that turns
    near-dup pairs into dedup groups (``dedup.connected_components`` —
    one join + one min-agg per iteration, localCheckpoint lineage
    truncation, fail-loud past ``max_iters``). Iterations needed = the
    largest cluster's hop diameter: shallow below the continuum
    percolation threshold (mean degree ≈ 4.5 — i.e. point density ·
    π·radius² per point), but past it a giant component forms whose
    diameter grows with the spatial extent and the propagation will hit
    the ``max_iters`` fail-loud guard — shrink the radius or raise
    ``max_iters`` deliberately. Sizes come from a map-side-combining
    groupBy on the high-cardinality cluster_id + an equi-join back —
    never a window."""
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
