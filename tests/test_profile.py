"""Corpus profiling (operators/profile.py) and KMV overlap
(sketch.kmv_jaccard): parity with straight-line Python references."""

import hashlib
import math

from geospatial_web_scraper_spark.operators.profile import (
    group_quantiles,
    heavy_hitters,
)
from geospatial_web_scraper_spark.operators.sketch import kmv_jaccard, kmv_sketch


def test_heavy_hitters_exact_and_tiebreak(spark):
    rows = (
        [("a", "x")] * 5
        + [("a", "y")] * 5  # tie with x -> y ranks after x (lexicographic)
        + [("a", "z")] * 7
        + [("a", "w")] * 1
        + [("b", "only")] * 2
    )
    df = spark.createDataFrame(rows, "g string, v string")
    got = {
        (r["g"], r["rank"]): (r["v"], r["cnt"])
        for r in heavy_hitters(df, "g", "v", k=3).collect()
    }
    assert got == {
        ("a", 1): ("z", 7),
        ("a", 2): ("x", 5),
        ("a", 3): ("y", 5),
        ("b", 1): ("only", 2),
    }


def _py_quantiles(vals, qs):
    s = sorted(vals)
    n = len(s)
    return {q: s[max(0, math.ceil(q * n) - 1)] for q in qs}


def test_group_quantiles_matches_python(spark):
    qs = (0.25, 0.5, 0.75, 0.95)
    ga = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5]
    gb = list(range(100))
    rows = [("a", v) for v in ga] + [("b", v) for v in gb]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {
        (r["g"], r["q"]): (r["n"], r["value"])
        for r in group_quantiles(df, "g", "v", qs=qs).collect()
    }
    pa, pb = _py_quantiles(ga, qs), _py_quantiles(gb, qs)
    want = {("a", q): (len(ga), pa[q]) for q in qs}
    want.update({("b", q): (len(gb), pb[q]) for q in qs})
    assert got == want


def test_group_quantiles_single_value(spark):
    df = spark.createDataFrame([("g", 7)] * 9, "g string, v long")
    out = group_quantiles(df, "g", "v").collect()
    assert all(r["value"] == 7 and r["n"] == 9 for r in out)
    assert len(out) == 4


def _h(v):
    return int(hashlib.md5(v.encode()).hexdigest()[:15], 16)


def test_kmv_jaccard_exact_below_k(spark):
    """Union under k => sketch holds the whole union: jaccard and the
    intersection count are EXACT."""
    a = [("g", f"v{i}") for i in range(30)]          # v0..v29
    b = [("g", f"v{i}") for i in range(20, 50)]      # v20..v49; |∩|=10 |∪|=50
    dfa = spark.createDataFrame(a, "g string, v string")
    dfb = spark.createDataFrame(b, "g string, v string")
    ska = kmv_sketch(dfa, "g", "v", k=64)
    skb = kmv_sketch(dfb, "g", "v", k=64)
    row = kmv_jaccard(ska, skb, "g", k=64).collect()[0]
    assert row["n_union_sketch"] == 50
    assert row["n_both"] == 10
    assert row["jaccard6"] == round(10 / 50, 6)
    assert row["est_union"] == 50.0
    assert row["est_intersection"] == 10.0


def test_kmv_jaccard_matches_python_kmv(spark):
    """Above k, the estimate must equal the straight-line KMV computation
    over the same md5 hashes (no RNG anywhere)."""
    k = 64
    va = [f"t{i}" for i in range(400)]
    vb = [f"t{i}" for i in range(200, 700)]
    dfa = spark.createDataFrame([("g", v) for v in va], "g string, v string")
    dfb = spark.createDataFrame([("g", v) for v in vb], "g string, v string")
    row = kmv_jaccard(
        kmv_sketch(dfa, "g", "v", k=k), kmv_sketch(dfb, "g", "v", k=k), "g", k=k
    ).collect()[0]

    sa = set(sorted(map(_h, set(va)))[:k])
    sb = set(sorted(map(_h, set(vb)))[:k])
    union_k = sorted(sa | sb)[:k]
    n_both = sum(1 for h in union_k if h in sa and h in sb)
    assert row["n_union_sketch"] == k
    assert row["n_both"] == n_both
    assert row["kth_hash"] == union_k[-1]
    assert row["jaccard6"] == round(n_both / k, 6)
    # and the true jaccard (300/700 ≈ 0.43) is inside a loose 3σ band
    assert 0.2 < row["jaccard6"] < 0.65


# ---------------------------------------------------------------------------
# vocab_coverage — OOV rate vs the global top-k vocabulary (r5k)
# ---------------------------------------------------------------------------

from geospatial_web_scraper_spark.operators.profile import (  # noqa: E402
    PPM,
    vocab_coverage,
)


def test_vocab_coverage_hand_corpus(spark):
    # vocab k=2 → {'a' (5×), 'b' (3×)}; 'c'/'d' are OOV
    rows = [
        ("s1", "a"), ("s1", "a"), ("s1", "b"), ("s1", "c"),
        ("s2", "a"), ("s2", "a"), ("s2", "a"), ("s2", "b"), ("s2", "b"),
        ("s2", "c"), ("s2", "d"), ("s2", "d"),
    ]
    t = spark.createDataFrame(rows, "source string, w string")
    got = {
        r["source"]: r.asDict()
        for r in vocab_coverage(t, k=2).collect()
    }
    assert got["s1"]["n_tokens"] == 4 and got["s1"]["n_oov"] == 1
    assert got["s1"]["oov_ppm"] == PPM // 4
    assert got["s1"]["distinct_oov"] == 1
    assert got["s2"]["n_oov"] == 3 and got["s2"]["distinct_oov"] == 2
    assert got["s2"]["oov_ppm"] == 3 * PPM // 8
    # every token is 1 char → cpt exactly 1.0
    assert got["s1"]["cpt_micro"] == PPM == got["s2"]["cpt_micro"]


def test_vocab_coverage_tie_prefers_lex_smaller_token(spark):
    # 'x' and 'y' both occur twice; k=1 keeps 'x' (count tie → token asc)
    rows = [("s", "x"), ("s", "x"), ("s", "y"), ("s", "y")]
    t = spark.createDataFrame(rows, "source string, w string")
    got = vocab_coverage(t, k=1).collect()[0]
    assert got["n_oov"] == 2 and got["distinct_oov"] == 1


def test_vocab_coverage_full_vocab_means_zero_oov(spark):
    rows = [("s", w) for w in "abcde"]
    t = spark.createDataFrame(rows, "source string, w string")
    got = vocab_coverage(t, k=10).collect()[0]
    assert got["n_oov"] == 0 and got["oov_ppm"] == 0


# ---------------------------------------------------------------------------
# token_entropy — per-source diversity audit (r5k)
# ---------------------------------------------------------------------------

import math  # noqa: E402

from geospatial_web_scraper_spark.operators.profile import (  # noqa: E402
    token_entropy,
)


def _py_entropy(counts):
    n = sum(counts)
    return (
        sum(
            round(((math.log(n) - math.log(c)) * c / n) * 1e6)
            for c in counts
        )
        / 1e6
    )


def test_entropy_matches_python_mirror(spark):
    rows = (
        [("s1", "a")] * 5 + [("s1", "b")] * 3 + [("s1", "c")] * 2
        + [("s2", "x")] * 10
    )
    t = spark.createDataFrame(rows, "source string, w string")
    got = {r["source"]: r.asDict() for r in token_entropy(t).collect()}
    assert got["s1"]["entropy6"] == round(_py_entropy([5, 3, 2]), 6)
    assert got["s1"]["n_tokens"] == 10 and got["s1"]["n_types"] == 3
    assert got["s1"]["ttr_ppm"] == 3 * PPM // 10
    # a single-type source has exactly zero entropy
    assert got["s2"]["entropy6"] == 0.0 and got["s2"]["ttr_ppm"] == PPM // 10


def test_entropy_uniform_is_log_k(spark):
    # 8 equally frequent types → H = ln 8, exactly representable in the
    # micro-nat rounding to the reported 6 decimals
    rows = [("s", w) for w in "abcdefgh" for _ in range(4)]
    t = spark.createDataFrame(rows, "source string, w string")
    got = token_entropy(t).collect()[0]
    assert abs(got["entropy6"] - math.log(8)) < 1e-5


def test_entropy_order_independent(spark):
    # same multiset, different physical layout → identical output
    rows = [("s", "a")] * 7 + [("s", "b")] * 5 + [("s", "c")] * 1
    a = token_entropy(
        spark.createDataFrame(rows, "source string, w string").repartition(7)
    ).collect()[0]
    b = token_entropy(
        spark.createDataFrame(rows[::-1], "source string, w string").coalesce(1)
    ).collect()[0]
    assert a.asDict() == b.asDict()


# ---------------------------------------------------------------------------
# zipf_fit — rank-frequency OLS (r5k)
# ---------------------------------------------------------------------------

from geospatial_web_scraper_spark.operators.profile import (  # noqa: E402
    zipf_fit,
)


def _py_zipf(counts):
    # counts sorted by (cnt desc, token asc) → ranks 1..n; micro-nat OLS
    xs = [round(math.log(r + 1) * 1e6) for r in range(len(counts))]
    ys = [round(math.log(c) * 1e6) for c in counts]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sx2 = sum(a * a for a in xs)
    den = n * sx2 - sx * sx
    if den == 0:
        return 0.0, round(sy / n / 1e6, 6)
    slope = (n * sxy - sx * sy) / den
    return round(slope, 6), round((sy - slope * sx) / n / 1e6, 6)


def test_zipf_exact_power_law_recovers_slope(spark):
    # counts 64,32,16,8,4,2,1 at ranks 1,2,4,8,... no — use freq = 2^7/r
    # for r=1,2,4: instead, freq_i = round(c/r) exact powers so the fit
    # is checked against the python mirror, and a 1/r law lands near -1
    counts = {chr(ord('a') + i): max(1, 128 // (i + 1)) for i in range(12)}
    rows = [("s", w) for w, c in counts.items() for _ in range(c)]
    t = spark.createDataFrame(rows, "source string, w string")
    got = zipf_fit(t).collect()[0]
    ordered = [c for _, c in sorted(counts.items(),
                                    key=lambda kv: (-kv[1], kv[0]))]
    slope, intercept = _py_zipf(ordered)
    assert got["n_types"] == 12
    assert abs(got["slope6"] - slope) < 2e-6
    assert abs(got["intercept6"] - intercept) < 2e-6
    assert -1.2 < got["slope6"] < -0.8  # the 1/r law fits near -1


def test_zipf_flat_distribution_has_zero_slope(spark):
    # all types equally frequent → y constant → slope 0
    rows = [("s", w) for w in "abcd" for _ in range(5)]
    got = zipf_fit(spark.createDataFrame(rows, "source string, w string")
                   ).collect()[0]
    assert got["slope6"] == 0.0


def test_zipf_single_type_guarded(spark):
    rows = [("s", "x")] * 7
    got = zipf_fit(spark.createDataFrame(rows, "source string, w string")
                   ).collect()[0]
    assert got["slope6"] == 0.0
    assert abs(got["intercept6"] - round(math.log(7), 6)) < 2e-6
