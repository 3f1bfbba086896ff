"""Edge-case units for the r4 session-4 operators: redirect-chain
resolution corners (terminal, exact hop counts at the budget boundary,
self-loop and long-cycle traps, dangling targets, chains deeper than the
doubling horizon) and mirror-host detection (overlap scoring, the df
boilerplate cap, min_shared gate). Full-corpus value checks live in the
oracle mirror (test_entry_contract); these pin the semantic corners."""

import pytest
from pyspark.sql import functions as F

from geospatial_web_scraper_spark.operators.mirrors import mirror_hosts
from geospatial_web_scraper_spark.operators.redirects import resolve_redirects


def _edges(spark, rows):
    return spark.createDataFrame(rows, "url_id bigint, redirect_to bigint")


def _resolve(spark, rows, **kw):
    out = resolve_redirects(_edges(spark, rows), **kw)
    return {r.url_id: (r.final_id, r.hops, r.resolved) for r in out.collect()}


def test_terminal_and_simple_chain(spark):
    # 3 -> 2 -> 1 -> 0 (terminal)
    res = _resolve(
        spark, [(0, None), (1, 0), (2, 1), (3, 2)], max_hops=10
    )
    assert res[0] == (0, 0, True)
    assert res[1] == (0, 1, True)
    assert res[3] == (0, 3, True)


def test_hop_budget_boundary_exact(spark):
    """A chain of exactly max_hops resolves; one hop deeper does not —
    and max_hops=3 (not a power of two) exercises the 2^r > max_hops
    overshoot gate: the doubling reaches the terminal in 4 steps but the
    d <= 3 filter must still reject the depth-4 row."""
    chain = [(0, None)] + [(i, i - 1) for i in range(1, 5)]
    res = _resolve(spark, chain, max_hops=3)
    assert res[3] == (0, 3, True)
    assert res[4] == (None, None, False)


def test_self_loop_and_long_cycle_unresolved(spark):
    # 1 -> 1 (self-loop); 2 -> 3 -> 4 -> 2 (3-cycle); 5 -> 2 (tail into cycle)
    res = _resolve(
        spark,
        [(0, None), (1, 1), (2, 3), (3, 4), (4, 2), (5, 2)],
        max_hops=10,
    )
    for u in (1, 2, 3, 4, 5):
        assert res[u] == (None, None, False)
    assert res[0] == (0, 0, True)


def test_dangling_target_is_terminal(spark):
    """A redirect to a URL with no edges row resolves THERE: the landing
    URL is known even though it was never fetched."""
    res = _resolve(spark, [(1, 99), (2, 1)], max_hops=10)
    assert res[1] == (99, 1, True)
    assert res[2] == (99, 2, True)


def test_max_hops_one(spark):
    res = _resolve(spark, [(0, None), (1, 0), (2, 1)], max_hops=1)
    assert res[1] == (0, 1, True)
    assert res[2] == (None, None, False)


def test_resolve_rejects_bad_budget(spark):
    with pytest.raises(ValueError):
        resolve_redirects(_edges(spark, [(0, None)]), max_hops=0)


def _mirror(spark, rows, **kw):
    df = spark.createDataFrame(rows, "host bigint, content_hash string")
    out = mirror_hosts(df, **kw)
    return {
        (r.host_a, r.host_b): (r.shared, r.size_a, r.size_b, r.score)
        for r in out.collect()
    }


def test_mirror_overlap_scoring(spark):
    """Host 1 carries {a,b,c}, host 2 {a,b} (a perfect sub-mirror),
    host 3 {a} only — the (1,2) pair scores 2/min(3,2)=1.0; pairs with
    host 3 share just one hash and fall under min_shared."""
    rows = [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"),
        (3, "a"),
    ]
    res = _mirror(spark, rows, min_shared=2, max_df=16)
    assert res == {(1, 2): (2, 3, 2, 1.0)}


def test_mirror_df_cap_drops_boilerplate(spark):
    """A hash on > max_df hosts is excluded from pairs AND sizes: with
    the cap at 2, the 3-host boilerplate hash 'x' disappears and only
    the genuine 2-host overlap {p,q} remains (sizes drop to 2)."""
    rows = [
        (1, "x"), (2, "x"), (3, "x"),
        (1, "p"), (2, "p"), (1, "q"), (2, "q"),
    ]
    res = _mirror(spark, rows, min_shared=2, max_df=2)
    assert res == {(1, 2): (2, 2, 2, 1.0)}
    # with a looser cap the boilerplate counts again; the single-shared
    # (1,3)/(2,3) pairs stay below min_shared either way
    res2 = _mirror(spark, rows, min_shared=2, max_df=16)
    assert res2 == {(1, 2): (3, 3, 3, 1.0)}


def test_mirror_duplicate_docs_count_once(spark):
    """(host, hash) multiplicity collapses — shared counts DISTINCT
    content, not document copies."""
    rows = [(1, "a"), (1, "a"), (2, "a"), (1, "b"), (2, "b"), (2, "b")]
    res = _mirror(spark, rows, min_shared=2, max_df=16)
    assert res == {(1, 2): (2, 2, 2, 1.0)}


def test_mirror_rejects_bad_params(spark):
    df = None
    with pytest.raises(ValueError):
        mirror_hosts(df, min_shared=0)
    with pytest.raises(ValueError):
        mirror_hosts(df, max_df=1)


# --- resize plumbing corners (operators/multimodal.py resize_images) ----

from geospatial_web_scraper_spark.operators.multimodal import resize_images


def _media(spark, rows):
    return spark.createDataFrame(
        rows,
        "asset_id bigint, kind string, payload binary, "
        "width int, height int, duration_ms int",
    )


def test_resize_letterbox_fit_exact(spark):
    """Width-limited, height-limited, exact-fit and upscale rows all fit
    within 640x480 with the aspect preserved by exact integer division."""
    rows = [
        (1, "image", b"a", 1600, 900, None),   # width-limited: 640x360
        (2, "image", b"a", 900, 1600, None),   # height-limited: 270x480
        (3, "image", b"a", 640, 480, None),    # exact fit
        (4, "image", b"a", 64, 48, None),      # upscale to 640x480
        (5, "image", b"a", 1000, 750, None),   # 4:3 at odd scale: 640x480
    ]
    out = {
        r.asset_id: (r.out_width, r.out_height, r.n_bytes)
        for r in resize_images(_media(spark, rows), 640, 480).collect()
    }
    assert out[1] == (640, 360, 640 * 360 * 3)
    assert out[2] == (270, 480, 270 * 480 * 3)
    assert out[3] == (640, 480, 640 * 480 * 3)
    assert out[4] == (640, 480, 640 * 480 * 3)
    assert out[5] == (640, 480, 640 * 480 * 3)


def test_resize_drops_non_images_and_degenerate_dims(spark):
    rows = [
        (1, "video", b"a", 100, 100, 5),
        (2, "image", b"a", None, 100, None),
        (3, "image", b"a", 100, 0, None),
        (4, "image", b"a", 10, 10, None),
    ]
    out = resize_images(_media(spark, rows), 640, 480).collect()
    assert [r.asset_id for r in out] == [4]


def test_resize_checksum_is_source_md5(spark):
    import hashlib

    payload = "café contents".encode()
    [row] = resize_images(
        _media(spark, [(7, "image", payload, 10, 10, None)]), 640, 480
    ).collect()
    assert row.checksum == int(hashlib.md5(payload).hexdigest()[:15], 16)
    # empty payload is a defined checksum, not an error
    [row0] = resize_images(
        _media(spark, [(8, "image", b"", 10, 10, None)]), 640, 480
    ).collect()
    assert row0.checksum == int(hashlib.md5(b"").hexdigest()[:15], 16)


def test_resize_rejects_bad_target(spark):
    with pytest.raises(ValueError):
        resize_images(_media(spark, []), 0, 480)


# --- sampled quantiles (operators/profile.py sampled_quantiles) ---------

from geospatial_web_scraper_spark.operators.profile import (
    group_quantiles,
    sampled_quantiles,
)


def test_sampled_quantiles_merge_across_shards(spark):
    """The keep decision is a pure function of the row id, so quantiles
    over the union of per-shard samples equal sampled_quantiles over the
    whole relation — the mergeability claim, tested literally."""
    from geospatial_web_scraper_spark.operators.dedup import _md5_hash64_expr

    rows = [(i, "s" if i % 2 else "t", (i * 13) % 50) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, g string, v long")
    whole = sampled_quantiles(df, "g", "v", "doc_id", rate_denom=4)
    keep = (
        _md5_hash64_expr(
            F.concat(F.lit("qsk"), F.lit(":"), F.col("doc_id").cast("string"))
        )
        % 4
        == 0
    )
    shard_a = df.where("doc_id < 123").where(keep)
    shard_b = df.where("doc_id >= 123").where(keep)
    merged = group_quantiles(shard_a.unionByName(shard_b), "g", "v")
    key = lambda r: (r.g, r.q)  # noqa: E731
    assert {key(r): (r.n, r.value) for r in whole.collect()} == {
        key(r): (r.n, r.value) for r in merged.collect()
    }


def test_sampled_quantiles_rejects_bad_rate(spark):
    with pytest.raises(ValueError):
        sampled_quantiles(None, "g", "v", "doc_id", rate_denom=0)
