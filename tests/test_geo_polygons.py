"""Semantic corners for point-in-polygon, Z-order keys, and the exact
Lloyd fit — the cases the uniform synthetic corpus can't reach (on-edge /
on-vertex points, ray-through-vertex robustness, curve-prefix hierarchy,
blob separation). Full-corpus value parity lives in the oracle mirror
(test_entry_contract)."""

import pytest
from pyspark.sql import functions as F

from geospatial_web_scraper_spark.operators.geo import (
    ZORDER_BOX_BITS,
    point_in_polygon,
    synth_polygons,
    zorder_key_sql,
    zorder_rollup,
)


def _pts(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lat long, lon long")


def _diamond(spark, poly_id=7, cx=0, cy=0, r=10):
    return spark.createDataFrame(
        [(poly_id, [cx + r, cx, cx - r, cx], [cy, cy + r, cy, cy - r])],
        "poly_id long, xs array<long>, ys array<long>",
    )


def _inside(spark, points, polys):
    out = point_in_polygon(_pts(spark, points), polys, cell=16)
    return sorted((r["doc_id"], r["poly_id"]) for r in out.collect())


def test_pip_center_inside_far_outside(spark):
    polys = _diamond(spark)
    assert _inside(spark, [(1, 0, 0), (2, 50, 50), (3, 0, 9)], polys) == [
        (1, 7),
        (3, 7),
    ]


def test_pip_boundary_half_open_rule(spark):
    """Boundary points resolve DETERMINISTICALLY by the PNPOLY half-open
    rule (identical in the oracle): right/top boundary excluded, left
    boundary included — so two polygons sharing an edge partition their
    boundary points instead of double-counting them. Rows 1-3 sit on the
    right vertex / top vertex / right edge (outside); rows 4-5 on the
    left edge / left vertex (inside)."""
    polys = _diamond(spark)
    rows = [(1, 0, 10), (2, 10, 0), (3, 5, 5), (4, 5, -5), (5, 0, -10)]
    assert _inside(spark, rows, polys) == [(4, 7), (5, 7)]


def test_pip_ray_through_vertex_counts_once_per_side(spark):
    """The classic robustness corner: a +x ray at the exact latitude of
    two opposite vertices. The half-open rule counts the two upper edges
    exactly (even → outside on the left, and the interior point at the
    same latitude stays inside via its single remaining crossing)."""
    polys = _diamond(spark)
    rows = [(1, 0, -20), (2, 0, -9)]
    assert _inside(spark, rows, polys) == [(2, 7)]


def test_pip_point_in_two_overlapping_polygons(spark):
    polys = _diamond(spark, poly_id=1, cx=0).unionByName(
        _diamond(spark, poly_id=2, cx=5)
    )
    assert _inside(spark, [(9, 0, 3)], polys) == [(9, 1), (9, 2)]


def test_pip_cell_smaller_and_larger_than_polygon_agree(spark):
    """The cell size is a pure performance knob: any positive value
    yields the identical pair set (bbox coverage is exact)."""
    polys = _diamond(spark, r=12)
    rows = [(1, 0, 0), (2, 6, 5), (3, -9, 0), (4, 11, 0), (5, 0, -12)]
    small = point_in_polygon(_pts(spark, rows), polys, cell=3)
    big = point_in_polygon(_pts(spark, rows), polys, cell=1_000_000)
    assert sorted(map(tuple, small.collect())) == sorted(
        map(tuple, big.collect())
    )


def test_pip_rejects_bad_cell(spark):
    with pytest.raises(ValueError):
        point_in_polygon(_pts(spark, [(1, 0, 0)]), _diamond(spark), cell=0)


def test_synth_polygons_deterministic_and_filtered(spark):
    docs = spark.range(0, 100).select(F.col("id").alias("doc_id"))
    a = synth_polygons(docs, every=25).collect()
    b = synth_polygons(docs, every=25).collect()
    assert sorted(r["poly_id"] for r in a) == [0, 25, 50, 75]
    assert sorted(map(str, a)) == sorted(map(str, b))
    for r in a:
        assert len(r["xs"]) == 4 and len(r["ys"]) == 4
        assert r["xs"][1] == r["xs"][3]  # both axis vertices share cx
        assert r["ys"][0] == r["ys"][2]


def test_zorder_key_unit_values(spark):
    """Bit-level spot checks at level 1: the four quadrant cells of the
    2^20 box map to keys 0..3 with lon at bit 0 and lat at bit 1."""
    w = 1 << (ZORDER_BOX_BITS - 1)
    df = _pts(
        spark, [(0, 0, 0), (1, 0, w), (2, w, 0), (3, w, w)]
    ).select("doc_id", F.expr(zorder_key_sql("lat", "lon", 1)).alias("k"))
    got = {r["doc_id"]: r["k"] for r in df.collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_zorder_parent_is_child_div4(spark):
    """Curve-prefix property on arbitrary points: the level-(l-1) key is
    exactly the level-l key div 4 — the invariant the rollup hierarchy
    and the file-layout story both rest on."""
    pts = _pts(
        spark,
        [(i, (i * 37_003) % 1_000_000, (i * 91_007) % 1_000_000)
         for i in range(64)],
    )
    for lvl in (2, 6, 10):
        df = pts.select(
            F.expr(zorder_key_sql("lat", "lon", lvl)).alias("child"),
            F.expr(zorder_key_sql("lat", "lon", lvl - 1)).alias("parent"),
        )
        bad = df.where(F.expr("child div 4 <> parent")).count()
        assert bad == 0, f"level {lvl}"


def test_zorder_rollup_counts_sum(spark):
    pts = _pts(spark, [(i, i * 1000, i * 2000) for i in range(50)])
    out = zorder_rollup(pts, fine_level=6, coarse_level=3).collect()
    fine = [r for r in out if r["level"] == 6]
    coarse = [r for r in out if r["level"] == 3]
    assert sum(r["n_points"] for r in fine) == 50
    assert sum(r["n_points"] for r in coarse) == 50
    for r in coarse:
        assert r["n_points"] == sum(
            f["n_points"] for f in fine if f["zkey"] // 64 == r["zkey"]
        )


def test_zorder_rejects_bad_levels(spark):
    pts = _pts(spark, [(1, 0, 0)])
    with pytest.raises(ValueError):
        zorder_rollup(pts, fine_level=3, coarse_level=6)
    with pytest.raises(ValueError):
        zorder_key_sql("lat", "lon", 0)


def test_kmeans_exact_separates_blobs(spark):
    """Two well-separated blobs, init one seed vector in each: the exact
    fit must label every vector by its blob, and dist2 must be the true
    integer squared distance to the final (blob-mean) centroid."""
    from geospatial_web_scraper_spark.operators.clustering import (
        kmeans_lloyd_exact,
    )

    rows = []
    for i in range(20):
        base = 1.0 if i % 2 == 0 else -1.0  # vec_id 0 → blob +, 1 → blob −
        rows.append((i, [base + (i % 5) * 0.01, base * 2.0]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in
           kmeans_lloyd_exact(emb, k=2, iters=2).collect()}
    assert len(out) == 20
    for i in range(20):
        assert out[i]["cid"] == i % 2, (i, out[i])
    assert all(r["dist2"] >= 0 for r in out.values())


def test_kmeans_rejects_bad_args_and_missing_init(spark):
    from geospatial_web_scraper_spark.operators.clustering import (
        kmeans_lloyd_exact,
    )

    emb = spark.createDataFrame(
        [(5, [1.0, 2.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError):
        kmeans_lloyd_exact(emb, k=0)
    with pytest.raises(ValueError):
        kmeans_lloyd_exact(emb, k=2)  # no vec_id < 2 rows to seed


def test_pip_degenerate_polygons_never_match(spark):
    """Empty / 1-gon / 2-gon vertex arrays: no crash (the empty array
    would otherwise build a DESCENDING sequence(1,0) and index 0), no
    containment."""
    polys = spark.createDataFrame(
        [
            (1, [], []),
            (2, [5], [5]),
            (3, [-10, 10], [0, 0]),
        ],
        "poly_id long, xs array<long>, ys array<long>",
    )
    assert _inside(spark, [(1, 0, 0), (2, 5, 5)], polys) == []
