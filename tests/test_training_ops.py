"""Training-data operators: dedup families, ANN similarity, text stats,
multimodal plumbing — micro-fixtures with hand-checked goldens plus
sf0.001 smoke."""

import pytest
from pyspark.sql import functions as F

from geospatial_web_scraper_spark.operators import dedup, similarity, textstats
from geospatial_web_scraper_spark.operators.multimodal import (
    decode_features,
    sample_frames,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (
                0,
                "the quick brown fox jumps over the lazy dog "
                "and then runs far away into the deep dark forest today",
            ),
            (
                1,  # exact dup of 0
                "the quick brown fox jumps over the lazy dog "
                "and then runs far away into the deep dark forest today",
            ),
            (
                2,  # true near dup of 0: long shared prefix, one-word suffix edit
                "the quick brown fox jumps over the lazy dog "
                "and then runs far away into the deep dark forest tonight",
            ),
            (3, "completely different content about spark engines"),
            (4, ""),
            (
                5,  # whitespace-only variant of 0 → exact dup after normalize
                "  the   quick brown fox jumps over the lazy dog \n"
                "and then runs far  away into the deep dark forest today  ",
            ),
        ],
        "doc_id long, text string",
    )


def test_exact_dedup(docs):
    rows = {r["content_hash"]: r for r in dedup.exact_dedup(docs).collect()}
    by_keep = {r["keep_id"]: r["n_dups"] for r in rows.values()}
    assert by_keep[0] == 3  # 0, 1, 5 normalize identically
    assert by_keep[2] == 1 and by_keep[3] == 1 and by_keep[4] == 1


def test_minhash_lsh_finds_near_dups(docs):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_neardup_pairs(docs, threshold=0.5).collect()
    }
    assert (0, 1) in pairs and (0, 5) in pairs and (1, 5) in pairs
    assert (0, 2) in pairs  # near dup shares most 3-gram shingles
    assert not any(3 in p for p in pairs)


def test_wordset_jaccard(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.wordset_jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert pairs[(0, 1)] == 1.0
    assert pairs[(0, 5)] == 1.0
    # 0 vs 2: 18 distinct words each, 17 shared (today/tonight differ)
    assert abs(pairs[(0, 2)] - round(17 / 19, 6)) < 1e-9


def test_simhash_near_dups(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_neardup_pairs(docs, max_hamming=12).collect()
    }
    assert pairs[(0, 1)] == 0 and pairs[(0, 5)] == 0
    assert (0, 2) in pairs  # one word swap → small hamming distance
    assert not any(3 in p and 4 in p for p in pairs)


def test_cosine_expr(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0], [1.0, 2.0]), ([1.0, 0.0], [0.0, 1.0]), ([0.0, 0.0], [1.0, 1.0])],
        "a array<float>, b array<float>",
    )
    got = [
        r["c"]
        for r in df.select(
            F.round(similarity.cosine_expr(F.col("a"), F.col("b")), 6).alias("c")
        ).collect()
    ]
    assert got[0] == 1.0 and got[1] == 0.0 and got[2] is None  # zero-vector → null


def test_ann_bruteforce_and_lsh_recall(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = similarity.ann_bruteforce_topk(emb, queries, k=5)
    ex = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    assert len(ex) == 15
    # self-match must rank first
    firsts = {
        r["query_id"]: r["vec_id"]
        for r in exact.filter(F.col("rank") == 1).collect()
    }
    assert all(q == v for q, v in firsts.items())
    # NOTE: the test embeddings are uniform random vectors, so "neighbors"
    # are near-orthogonal and LSH recall ≈ fraction of buckets probed
    # ((1+n_planes)/2^n_planes with multiprobe=1); real embedding spaces
    # cluster and recall is far higher. 3 planes → probe 4/8 of the space.
    approx = similarity.ann_lsh_topk(emb, queries, k=5, n_planes=3, multiprobe=1)
    ap = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(ap & ex) / len(ex)
    assert recall >= 0.45, recall
    # every LSH hit self-matches too
    assert all((q, q) in ap for q in firsts)


def test_simhash_native_matches_udf_families(docs):
    """The all-native 48-bit signature finds the same dup structure as the
    numpy-UDF 64-bit one (values differ — different hash families)."""
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_neardup_pairs_native(docs, max_hamming=10).collect()
    }
    assert pairs[(0, 1)] == 0 and pairs[(0, 5)] == 0 and pairs[(1, 5)] == 0
    assert (0, 2) in pairs
    assert not any(3 in p or 4 in p for p in pairs)


def test_embedding_neardup_pairs(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    exact = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in similarity.embedding_neardup_pairs(emb, threshold=0.4).collect()
    }
    assert len(exact) > 0
    assert all(a < b and c >= 0.4 for (a, b), c in exact.items())
    # LSH-blocked variant returns a subset (same-bucket candidates only),
    # and every returned pair carries the identical exact cosine
    blocked = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in similarity.embedding_neardup_pairs(
            emb, threshold=0.4, planes=similarity.md5_planes(64, 4)
        ).collect()
    }
    assert set(blocked) <= set(exact)
    assert all(exact[p] == c for p, c in blocked.items())
    assert len(blocked) > 0  # 4 planes leave enough collisions to matter


def test_ann_ivf_topk(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cent = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), "embedding"
    )
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = similarity.ann_ivf_topk(emb, cent, queries, k=5, n_probe=2).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1, 2}
    for q, rows in by_q.items():
        assert len(rows) == 5
        ranks = sorted(r["rank"] for r in rows)
        assert ranks == [1, 2, 3, 4, 5]
        # the query vector itself lives in a probed cell → exact self-match first
        best = min(rows, key=lambda r: r["rank"])
        assert best["vec_id"] == q and abs(best["score"] - 1.0) < 1e-9
    # probing ALL cells must recover the exact brute-force answer
    all_cells = similarity.ann_ivf_topk(emb, cent, queries, k=5, n_probe=8)
    exact = similarity.ann_bruteforce_topk(emb, queries, k=5)
    assert {(r["query_id"], r["vec_id"], r["rank"]) for r in all_cells.collect()} == {
        (r["query_id"], r["vec_id"], r["rank"]) for r in exact.collect()
    }


def test_kmeans_ivf_pipeline(spark):
    """kmeans_fit → ann_ivf_topk end-to-end: on well-separated synthetic
    clusters the centroids converge to the cluster means and IVF with
    learned centroids returns the exact per-cluster neighbors."""
    import itertools

    # 3 tight clusters around orthogonal axes in 4-dim; ids interleaved so
    # the deterministic init (k smallest ids) seeds one centroid per
    # cluster — the init contract a production caller meets with
    # k-means||-style sampling
    protos = [[10.0, 0, 0, 0], [0, 10.0, 0, 0], [0, 0, 10.0, 0]]
    rows = []
    for i, (off, c) in enumerate(itertools.product(range(5), range(3))):
        v = list(protos[c])
        v[3] = 0.1 * off  # small within-cluster variation
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    cent = similarity.kmeans_fit(emb, k=3, iters=4)
    assert cent.count() == 3
    # each learned centroid points at exactly one proto axis
    axes = set()
    for r in cent.collect():
        v = r["embedding"]
        axes.add(max(range(3), key=lambda d: v[d]))
    assert axes == {0, 1, 2}

    queries = emb.filter(F.col("vec_id").isin(0, 1, 2)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = similarity.ann_ivf_topk(emb, cent, queries, k=5, n_probe=1)
    got = {}
    for r in out.collect():
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    # with 1 probe each query retrieves exactly its own 5-member cluster
    # (cluster c = ids {c, c+3, c+6, c+9, c+12} under the interleaving)
    for c in range(3):
        assert got[c] == {c + 3 * j for j in range(5)}, got[c]

    # determinism: a second fit returns identical centroids
    cent2 = similarity.kmeans_fit(emb, k=3, iters=4)
    a = sorted((r["cid"], tuple(r["embedding"])) for r in cent.collect())
    b = sorted((r["cid"], tuple(r["embedding"])) for r in cent2.collect())
    assert a == b


def test_connected_components_chain_and_islands(spark):
    """Chain 1-2-3-4-5 needs multiple label-propagation iterations to
    converge to min-id 1; disjoint pair and triangle stay separate."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (20, 21), (21, 22), (20, 22)],
        "id_a long, id_b long",
    )
    comp = {
        r["id"]: r["component"]
        for r in dedup.connected_components(pairs).collect()
    }
    assert all(comp[i] == 1 for i in (1, 2, 3, 4, 5))
    assert comp[10] == 10 and comp[11] == 10
    assert comp[20] == 20 and comp[21] == 20 and comp[22] == 20


def test_connected_components_long_increasing_chain(spark):
    """r5 regression: a 200-hop path with ids INCREASING along it. The
    pre-r5 one-hop min-label propagation needed diameter-many rounds and
    hit its 50-iteration fail-loud guard on exactly this shape (and
    plain pointer jumping doesn't help — each node's best label is only
    one hop closer to the min); star contraction with full pointer
    compression must converge in ≤ log₂(n) rounds."""
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(199)], "id_a long, id_b long"
    )
    comp = {
        r["id"]: r["component"]
        for r in dedup.connected_components(path).collect()
    }
    assert len(comp) == 200
    assert all(v == 0 for v in comp.values())


def test_stats_reset_checkpoint_bounds_size_estimates(spark):
    """r5 regression: ``Dataset.localCheckpoint`` copies origin-plan
    statistics, so a checkpointed self-join chain SQUARES sizeInBytes
    per step — bit length doubles per doubling and the driver ends up
    in multi-megabit BigInteger multiplications inside the stats
    visitor (measured: a 2-row contraction round cost 43 s of pure
    driver CPU). functions.ckpt.checkpoint must keep the estimate at
    the flat default across an iterated self-join chain."""
    from geospatial_web_scraper_spark.functions.ckpt import checkpoint

    def bits(df):
        return int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        ).bit_length()

    d = checkpoint(
        spark.range(64).select(F.col("id"), F.col("id").alias("lbl"))
    )
    base = bits(d)
    for _ in range(4):
        d = checkpoint(
            d.alias("x")
            .join(d.alias("y"), F.col("x.lbl") == F.col("y.id"), "left")
            .select(
                F.col("x.id").alias("id"),
                F.coalesce(F.col("y.lbl"), F.col("x.lbl")).alias("lbl"),
            )
        )
    assert bits(d) == base  # un-reset checkpoints: ~16× base after 4 rounds
    assert d.count() == 64


def test_textstats_goldens(spark):
    df = spark.createDataFrame(
        [
            (0, "The quick brown fox and the lazy dog are in the yard"),
            (1, "el perro y el gato en la casa de la playa"),
            (2, ""),
            (3, "xyzzy qwerty asdf"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            textstats.token_count_expr(F.col("text")).alias("n_tok"),
            textstats.lang_id_expr(F.col("text")).alias("lang"),
            textstats.quality_score_expr(F.col("text")).alias("q"),
            textstats.fingerprint_expr(F.col("text")).alias("fp"),
        ).collect()
    }
    assert got[0]["n_tok"] == 12 and got[0]["lang"] == "en"
    assert got[1]["lang"] == "es"
    assert got[2]["n_tok"] == 0 and got[2]["lang"] == "und" and got[2]["q"] == 0.0
    assert got[3]["lang"] == "und"
    assert len(got[0]["fp"]) == 16 and got[0]["fp"] != got[3]["fp"]
    assert 0 < got[0]["q"] <= 1.0


def test_winnow_fingerprints_robust_to_prefix(spark):
    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    b = "PREFIX " + a
    df = spark.createDataFrame([(0, a), (1, b)], "doc_id long, text string")
    fps = {
        r["doc_id"]: set(r["fp"])
        for r in df.select(
            "doc_id", textstats.winnow_fingerprints_expr(F.col("text")).alias("fp")
        ).collect()
    }
    overlap = len(fps[0] & fps[1]) / len(fps[0] | fps[1])
    assert overlap >= 0.5, overlap


def test_multimodal_plumbing(spark):
    media = spark.createDataFrame(
        [
            (0, "image", bytearray(b"\x01\x02\x03\x04"), 10, 10, None),
            (1, "video", bytearray(b"\x05" * 100), 64, 48, 3500),
            (2, "audio", bytearray(b""), None, None, 2000),
        ],
        "asset_id long, kind string, payload binary, width int, height int, duration_ms int",
    )
    feats = {r["asset_id"]: r for r in decode_features(media).collect()}
    assert feats[0]["n_bytes"] == 4 and len(feats[0]["feature"]) == 8
    assert feats[2]["n_bytes"] == 0
    # deterministic: same payload → same feature
    feats2 = {r["asset_id"]: r for r in decode_features(media).collect()}
    assert feats[1]["feature"] == feats2[1]["feature"]
    frames = sample_frames(media, every_ms=1000).collect()
    assert [r["frame_idx"] for r in sorted(frames, key=lambda r: r["ts_ms"])] == [0, 1, 2, 3]
    assert all(r["asset_id"] == 1 for r in frames)


def test_docs_table_smoke(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = dedup.exact_dedup(docs).count()
    assert out > 0
    stats = docs.select(
        textstats.token_count_expr(F.col("text")).alias("n"),
        textstats.lang_id_expr(F.col("text")).alias("lang"),
    ).collect()
    assert all(r["n"] >= 0 for r in stats)


def test_pq_fit_encode_adc_numpy_mirror(spark):
    """Product quantization: codebooks, codes, and ADC scores all equal a
    pure-numpy mirror of the same deterministic algorithm (init = k
    smallest ids, L2 argmin with first-index ties, mean update)."""
    import numpy as np

    from geospatial_web_scraper_spark.operators import pq

    rng = np.random.default_rng(7)
    n, dim, m, k, iters = 60, 8, 4, 4, 3
    mat = rng.standard_normal((n, dim)).round(3)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )

    cb_df = pq.pq_fit(emb, m=m, k=k, iters=iters)
    ds = dim // m

    # ---- numpy mirror ----
    subs = mat.reshape(n, m, ds)
    cb = np.stack([subs[:k, j] for j in range(m)]).astype(np.float64)
    for _ in range(iters):
        nxt = cb.copy()
        for j in range(m):
            d = (subs[:, j, None, :] - cb[j][None]) ** 2
            codes_j = d.sum(-1).argmin(axis=1)
            for t in range(k):
                sel = codes_j == t
                if sel.any():
                    nxt[j, t] = subs[sel, j].mean(axis=0)
        cb = nxt
    got = {(r["sub_id"], r["code"]): np.array(r["codeword"]) for r in cb_df.collect()}
    assert len(got) == m * k
    for (j, t), v in got.items():
        assert np.allclose(v, cb[j, t], atol=1e-9), (j, t)

    # ---- encode parity ----
    codes_df = pq.pq_encode(emb, cb_df)
    want_codes = {
        i: [
            int(((subs[i, j][None] - cb[j]) ** 2).sum(-1).argmin())
            for j in range(m)
        ]
        for i in range(n)
    }
    for r in codes_df.collect():
        assert list(r["codes"]) == want_codes[r["vec_id"]], r["vec_id"]

    # ---- ADC score parity + refine ----
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = pq.ann_pq_topk(codes_df, cb_df, queries, k=5)
    for r in out.collect():
        q = mat[r["query_id"]].reshape(m, ds)
        adc = sum(float(q[j] @ cb[j, want_codes[r["vec_id"]][j]]) for j in range(m))
        assert abs(r["adc"] - round(adc, 6)) < 1e-6

    # refine: exact cosine rerank of ADC candidates ⊇ plenty of true hits
    brute = similarity.ann_bruteforce_topk(
        emb, queries, k=5, corpus_id="vec_id"
    )
    refined = pq.ann_pq_topk(
        codes_df, cb_df, queries, k=5, refine=20, corpus=emb
    )
    b = {}
    for r in brute.collect():
        b.setdefault(r["query_id"], set()).add(r["vec_id"])
    rf = {}
    for r in refined.collect():
        rf.setdefault(r["query_id"], set()).add(r["vec_id"])
    recall = np.mean([len(b[q] & rf[q]) / 5 for q in b])
    assert recall >= 0.6, recall
    # the query vector itself always survives refinement at rank 1
    for q in range(3):
        assert q in rf[q]


def test_pq_lut_pandas_fallback_matches_native(spark, monkeypatch):
    """Past the literal budget the LUT moves to an Arrow pandas_udf on the
    query side (ADVICE r2: k=256 codebooks blow Janino's constant pool) —
    force the fallback and pin its ADC output byte-for-byte against the
    native-codegen LUT path."""
    import numpy as np

    from geospatial_web_scraper_spark.operators import pq

    rng = np.random.default_rng(11)
    n, dim, m, k = 40, 8, 4, 4
    mat = rng.standard_normal((n, dim)).round(3)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    cb_df = pq.pq_fit(emb, m=m, k=k, iters=2)
    codes = pq.pq_encode(emb, cb_df)
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    native = sorted(
        map(tuple, pq.ann_pq_topk(codes, cb_df, queries, k=5).collect())
    )
    monkeypatch.setattr(pq, "_LUT_LITERAL_BUDGET", 0)
    fallback = sorted(
        map(tuple, pq.ann_pq_topk(codes, cb_df, queries, k=5).collect())
    )
    assert native == fallback


def test_pq_compression_on_sf_embeddings(spark):
    """sf0.001 embeddings end-to-end: 64-dim float → m=4 smallint codes;
    every vector encodes, codebook is full, ADC self-query ranks the
    query's own code-cell neighbors on top."""
    from geospatial_web_scraper_spark.operators import pq

    emb = spark.read.parquet(SF + "/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    cb = pq.pq_fit(emb.limit(40), m=4, k=8, iters=2)
    assert cb.count() == 32
    codes = pq.pq_encode(emb, cb)
    n = emb.count()
    assert codes.where(F.col("codes").isNotNull()).count() == n
    assert codes.select(F.size("codes")).distinct().collect()[0][0] == 4
    q = emb.limit(2).select(F.col("vec_id").alias("query_id"), "embedding")
    out = pq.ann_pq_topk(codes, cb, q, k=3, refine=10, corpus=emb)
    assert out.where(F.col("rank") == 1).count() == 2


def test_keep_canonical_pipeline(spark):
    """find-pairs → components → keep_canonical end-to-end on the sf0.001
    documents: one survivor per dup group (the min doc_id), all ungrouped
    docs untouched, and the survivor set matches a pure-Python fold of the
    same pairs."""
    docs = spark.read.parquet(SF + "/documents.parquet").select("doc_id", "text")
    pairs = dedup.minhash_neardup_pairs(docs, threshold=0.5)
    comps = dedup.connected_components(pairs)
    kept = dedup.keep_canonical(docs, comps)

    ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    edge_rows = [(r["id_a"], r["id_b"]) for r in pairs.collect()]
    # python mirror: union-find over the pairs, keep min of each group
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_rows:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    drop = {x for x in parent if find(x) != x}
    want = ids - drop
    got = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert got == want
    assert len(edge_rows) > 0  # the corpus really has near-dups


def test_curate_corpus_pipeline(spark):
    """The composed curation pipeline on sf0.001 documents: every survivor
    passes the language + quality gates, content hashes are unique, each
    near-dup group keeps only its min id, and the stage report's final
    count equals the curated DataFrame."""
    from geospatial_web_scraper_spark.operators import curate, textstats

    docs = spark.read.parquet(SF + "/documents.parquet").select("doc_id", "text")
    kept = curate.curate_corpus(docs, min_quality=0.2, neardup_threshold=0.5)
    rep = curate.curation_report(docs, min_quality=0.2, neardup_threshold=0.5)

    n_in = docs.count()
    assert rep["input"] == n_in
    assert rep["input"] >= rep["gated"] >= rep["exact_unique"] >= rep["curated"] > 0
    assert kept.count() == rep["curated"]

    checked = kept.select(
        "doc_id",
        textstats.lang_id_expr(F.col("text")).alias("lang"),
        textstats.quality_score_expr(F.col("text")).alias("q"),
        F.md5(F.col("text")).alias("h"),
    )
    rows = checked.collect()
    assert all(r["lang"] == "en" and r["q"] >= 0.2 for r in rows)
    # exact dedup held: raw-text hashes unique among survivors
    hs = [r["h"] for r in rows]
    assert len(hs) == len(set(hs))
    # near-dup groups: no surviving pair is still a near-dup of each other
    from geospatial_web_scraper_spark.operators import dedup as dd

    leftover = dd.minhash_neardup_pairs(kept, threshold=0.5)
    assert leftover.count() == 0


def test_curate_corpus_perplexity_gate(spark):
    """The CCNet composition (entry_queries.q_curate_corpus_perplexity):
    no survivor sits in the LM 'tail' tertile, docs with <2 tokens never
    survive (no LM evidence), the gate genuinely bites vs the plain
    pipeline, and the result equals independently running curate_corpus
    over the manually ppl-filtered corpus — pinning the join plumbing."""
    from geospatial_web_scraper_spark.entry_queries import (
        q_curate_corpus,
        q_curate_corpus_perplexity,
    )
    from geospatial_web_scraper_spark.operators.curate import curate_corpus
    from geospatial_web_scraper_spark.operators.lm import bigram_lm_scores

    got = {r["doc_id"] for r in q_curate_corpus_perplexity(spark, SF).collect()}
    base = {r["doc_id"] for r in q_curate_corpus(spark, SF).collect()}
    docs = spark.read.parquet(SF + "/documents.parquet").select(
        "doc_id", "text"
    )
    scores = {
        r["doc_id"]: r["bucket"] for r in bigram_lm_scores(docs).collect()
    }
    tail = {d for d, b in scores.items() if b == "tail"}
    assert got and got.isdisjoint(tail)
    assert all(d in scores for d in got)  # <2-token docs never survive
    assert got != base  # the gate bites on this corpus
    manual = docs.where(
        F.col("doc_id").isin([d for d, b in scores.items() if b != "tail"])
    )
    want = {
        r["doc_id"]
        for r in curate_corpus(
            manual, languages=("en",), min_quality=0.3, neardup_threshold=0.5
        ).collect()
    }
    assert got == want


def test_ann_ivf_pq_topk(spark):
    """IVF-PQ composition: kmeans cells + PQ codes; with full probing and
    generous refine the result equals brute force; with 1 probe the scan
    is restricted to the query's own cell."""
    import numpy as np

    from geospatial_web_scraper_spark.operators import pq

    rng = np.random.default_rng(11)
    # 3 well-separated clusters in 8-dim so cells are unambiguous
    protos = np.eye(3, 8) * 10.0
    rows = []
    for i in range(45):
        v = protos[i % 3] + rng.standard_normal(8) * 0.05
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    cent = similarity.kmeans_fit(emb, k=3, iters=3)
    cells = similarity.ivf_assign_cells(emb, cent)
    # every cluster lands in one cell
    assert cells.select("cid").distinct().count() == 3
    cb = pq.pq_fit(emb, m=4, k=8, iters=2)
    codes = pq.pq_encode(emb, cb)
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    full = pq.ann_ivf_pq_topk(
        codes, cells, cent, cb, queries, k=5, n_probe=3, refine=45, corpus=emb
    )
    brute = similarity.ann_bruteforce_topk(emb, queries, k=5)
    fa, ba = {}, {}
    for r in full.collect():
        fa.setdefault(r["query_id"], set()).add(r["vec_id"])
    for r in brute.collect():
        ba.setdefault(r["query_id"], set()).add(r["vec_id"])
    assert fa == ba  # all-probe + full refine == exact

    one = pq.ann_ivf_pq_topk(codes, cells, cent, cb, queries, k=5, n_probe=1)
    cell_of = {r["vec_id"]: r["cid"] for r in cells.collect()}
    for r in one.collect():
        assert cell_of[r["vec_id"]] == cell_of[r["query_id"]]


def test_ivf_pq_residual_encode_and_serve(spark):
    """FAISS-style by_residual IVF-PQ: the fused one-pass ivf_pq_encode
    (a) assigns cells byte-identically to ivf_assign_cells, (b) encodes
    the residual v − centroid[cid] such that ADC == q·centroid + Σ_j
    q_sub_j·codeword_j (numpy mirror), and (c) with all cells probed and
    full refine the served top-k equals brute force."""
    import numpy as np

    from geospatial_web_scraper_spark.operators import pq

    rng = np.random.default_rng(17)
    protos = np.eye(3, 8) * 10.0
    rows = []
    for i in range(45):
        v = protos[i % 3] + rng.standard_normal(8) * 0.4
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    cent = similarity.kmeans_fit(emb, k=3, iters=3)
    res = pq.residuals(emb, cent)
    cb = pq.pq_fit(res.select("vec_id", "embedding"), m=4, k=8, iters=2)
    coded = pq.ivf_pq_encode(emb, cent, cb)

    # (a) cell parity with the oracle-checked assignment
    want_cells = {
        r["vec_id"]: r["cid"]
        for r in similarity.ivf_assign_cells(emb, cent).collect()
    }
    got = {r["vec_id"]: (r["cid"], list(r["codes"])) for r in coded.collect()}
    assert {v: c for v, (c, _) in got.items()} == want_cells

    # (a') residuals() agrees with encode on cid and subtracts the centroid
    cmat = {r["cid"]: np.array(r["embedding"]) for r in cent.collect()}
    vmat = {i: np.array(v) for i, v in rows}
    for r in res.collect():
        assert r["cid"] == want_cells[r["vec_id"]]
        assert np.allclose(
            np.array(r["embedding"]),
            vmat[r["vec_id"]] - cmat[r["cid"]],
            atol=1e-9,
        )

    # (b) ADC mirror: adc(q, v) = q·centroid[cid_v] + Σ_j q_subj·cw[j][code]
    cbnp = pq._codebook_np(cb)
    m, _, ds = cbnp.shape
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    served = pq.ann_ivf_pq_topk(
        coded, None, cent, cb, queries, k=45, n_probe=3, by_residual=True
    )
    for r in served.collect():
        q = vmat[r["query_id"]]
        cid, code = got[r["vec_id"]]
        want = float(q @ cmat[cid]) + sum(
            float(q[j * ds:(j + 1) * ds] @ cbnp[j, code[j]]) for j in range(m)
        )
        assert abs(r["adc"] - round(want, 6)) < 1e-6, (r, want)

    # (c) all-probe + full refine == brute force
    full = pq.ann_ivf_pq_topk(
        coded, None, cent, cb, queries, k=5, n_probe=3, refine=45,
        corpus=emb, by_residual=True,
    )
    brute = similarity.ann_bruteforce_topk(emb, queries, k=5)
    fa, ba = {}, {}
    for r in full.collect():
        fa.setdefault(r["query_id"], set()).add(r["vec_id"])
    for r in brute.collect():
        ba.setdefault(r["query_id"], set()).add(r["vec_id"])
    assert fa == ba


def test_grouped_topk_property_vs_reference(spark):
    """Property pin for the reducer every ANN path rides: salted and
    unsalted grouped_topk both equal the naive per-group sort — including
    tie handling ((-score, id) total order), NULL-score drops, and
    carry-column passthrough — on arbitrary small inputs."""
    from hypothesis import given, settings, strategies as st

    row_st = st.tuples(
        st.integers(0, 3),                       # group
        st.integers(0, 40),                      # id
        st.one_of(st.none(), st.integers(-4, 4)) # score (small: forces ties)
    )

    @settings(max_examples=12, deadline=None)
    @given(st.lists(row_st, min_size=1, max_size=60), st.integers(1, 4))
    def check(rows, k):
        df = spark.createDataFrame(
            [(g, i, float(s) if s is not None else None, g * 100 + i)
             for g, i, s in rows],
            "g long, id long, score double, carry long",
        )
        want = {}
        best = {}
        for g, i, s in rows:
            if s is None:
                continue
            best.setdefault(g, []).append((-float(s), i))
        for g, lst in best.items():
            lst.sort()
            out = []
            for rank, (ns, i) in enumerate(lst[:k], start=1):
                out.append((g, i, -ns, g * 100 + i, rank))
            want[g] = out
        expect = sorted(t for lst in want.values() for t in lst)
        for salt in (None, "id"):
            got = sorted(
                map(tuple, similarity.grouped_topk(
                    df, "g", "id", "score", k,
                    salt_col=salt, carry_cols=("carry",),
                ).collect())
            )
            assert got == expect, (salt, k, got, expect)

    check()


def test_pq_fit_null_safe_on_residual_output(spark):
    """Review r3: residuals() emits (id, cid=NULL, embedding=NULL) for
    zero-norm vectors (the cosine NULL contract), and the documented
    by_residual flow trains pq_fit on exactly that output. pq_fit must
    drop NULL/empty rows (matching the ann_ivf_pq_residual oracle's
    norm>0 init filter) instead of crashing in the dim probe, the init
    window, or the Lloyd assign np.stack."""
    import numpy as np

    from geospatial_web_scraper_spark.operators import pq

    rng = np.random.default_rng(5)
    rows = [(0, [0.0] * 8)]  # zero vector with the SMALLEST id → would
    # otherwise enter the k-smallest-ids init as a NULL codeword
    for i in range(1, 30):
        rows.append((i, [float(x) for x in rng.standard_normal(8)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cent = spark.createDataFrame(
        [
            (0, [1.0] + [0.0] * 7),
            (1, [0.0, 1.0] + [0.0] * 6),
        ],
        "cid long, embedding array<double>",
    )
    res = pq.residuals(emb, cent)
    assert res.where(F.col("embedding").isNull()).count() == 1  # the zero row
    cb = pq.pq_fit(res.select("vec_id", "embedding"), m=4, k=8, iters=2)
    got = cb.collect()
    assert len(got) == 4 * 8
    assert all(r["codeword"] is not None for r in got)
    # and the trained codebook round-trips through encode (no NULL codes
    # for real vectors; the NULL residual row gets NULL codes)
    coded = pq.pq_encode(res, cb)
    assert coded.where(F.col("codes").isNull()).count() == 1
    # an all-NULL training set fails loudly, not cryptically
    empty = spark.createDataFrame(
        [(9, None)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="no non-null"):
        pq.pq_fit(empty, m=4, k=8, iters=0)


def test_pack_chunks_golden_and_spanning(spark):
    """Concat-and-chunk packing: hand-checked placement at budget=5 over
    token counts [3, 4, 0, 7, 2] in id order → stream of 16 tokens, chunks
    of 5. Doc 3 (offset 7, len 7) spans chunks 1-2; the empty doc occupies
    zero chunks at its boundary offset."""
    from geospatial_web_scraper_spark.operators.packing import pack_chunks

    docs = spark.createDataFrame(
        [
            (0, "a b c"),
            (1, "d e f g"),
            (2, "   "),
            (3, "h i j k l m n"),
            (4, "o p"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (
            r["n_tok"], r["tok_offset"], r["first_chunk"],
            r["last_chunk"], r["chunks_spanned"],
        )
        for r in pack_chunks(docs, budget=5).collect()
    }
    assert got == {
        0: (3, 0, 0, 0, 1),
        1: (4, 3, 0, 1, 2),   # spans the chunk-0/1 boundary
        2: (0, 7, 1, 1, 0),   # empty doc: zero chunks
        3: (7, 7, 1, 2, 2),   # spans chunks 1-2
        4: (2, 14, 2, 3, 2),  # tokens at 14,15 → chunk 2 then chunk 3
    }
    # two-pass correctness is partition-count invariant
    got2 = {
        r["doc_id"]: r["tok_offset"]
        for r in pack_chunks(docs, budget=5, num_partitions=3).collect()
    }
    assert got2 == {i: off for i, (_, off, *_rest) in got.items()}
    with pytest.raises(ValueError, match="positive"):
        pack_chunks(docs, budget=0)


def test_incremental_dedup_golden(spark):
    """Admission gates against a committed corpus: exact-vs-corpus (raw and
    whitespace-variant), first-wins within batch, near-dup-vs-corpus via
    LSH bands + n-gram Jaccard verify; empty and genuinely-new docs are
    admitted. Within-batch near-dups are admitted by contract."""
    text_a = (
        "the quick brown fox jumps over the lazy dog "
        "and then runs far away into the deep dark forest today"
    )
    corpus_docs = spark.createDataFrame(
        [(0, text_a), (3, "completely different content about spark engines")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (1, text_a),                               # exact dup of corpus 0
            (2, text_a.replace("today", "tonight")),   # near dup of corpus 0
            (4, ""),                                   # empty → admitted
            (5, "  " + text_a.replace(" dog ", "  dog \n") + "  "),  # ws variant of 0
            (6, "a genuinely new document with enough words to shingle"),
            (7, "a genuinely new document with enough words to shingle"),  # batch dup of 6
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]
        for r in dedup.incremental_dedup(
            batch, corpus_docs, threshold=0.5
        ).collect()
    }
    assert got == {4, 6}


def test_incremental_dedup_accepts_persisted_artifacts(spark):
    """The O(batch + collisions) production path: a batch admitted against
    PERSISTED commit-time artifacts (content-hash set, minhash band table,
    per-doc gram counts) must admit exactly the same docs as the
    derive-from-text path — the committed text is then only read for the
    candidate-sliced verify join."""
    from pyspark.sql import functions as F

    from geospatial_web_scraper_spark.operators.dedup import (
        minhash_bands,
        normalized_text_expr,
    )
    from geospatial_web_scraper_spark.operators.textstats import (
        word_ngrams_expr,
    )

    text_a = (
        "the quick brown fox jumps over the lazy dog "
        "and then runs far away into the deep dark forest today"
    )
    corpus_docs = spark.createDataFrame(
        [(0, text_a), (3, "completely different content about spark engines")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (1, text_a),
            (2, text_a.replace("today", "tonight")),
            (6, "a genuinely new document with enough words to shingle"),
        ],
        "doc_id long, text string",
    )
    hashes = corpus_docs.select(
        F.md5(normalized_text_expr(F.col("text"))).alias("content_hash")
    )
    bands = minhash_bands(corpus_docs)
    gram_counts = corpus_docs.select(
        "doc_id",
        F.size(F.array_distinct(word_ngrams_expr(F.col("text"), 3))).alias(
            "n_grams"
        ),
    )
    want = {
        r["doc_id"]
        for r in dedup.incremental_dedup(
            batch, corpus_docs, threshold=0.5
        ).collect()
    }
    got = {
        r["doc_id"]
        for r in dedup.incremental_dedup(
            batch,
            corpus_docs,
            threshold=0.5,
            corpus_hashes=hashes,
            corpus_bands=bands,
            corpus_gram_counts=gram_counts,
        ).collect()
    }
    assert got == want == {6}


def test_balanced_shards_snake_and_balance(spark):
    """balanced_shards mirrors the python snake exactly (rank by n_tok
    DESC, id ASC; even pass r%S, odd pass S-1-r%S), covers every shard,
    and the shard token totals land within one max-item of each other —
    the load-balance property the operator exists for. Empty docs get
    rank-tail positions (n_tok 0), never an error."""
    import pytest

    from geospatial_web_scraper_spark.operators.packing import (
        balanced_shards,
    )

    rows = [(i, "w " * ((i * 7) % 23)) for i in range(60)] + [(60, "  ")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    S = 4
    got = {
        r["doc_id"]: (r["n_tok"], r["rank"], r["shard"])
        for r in balanced_shards(docs, n_shards=S).collect()
    }
    toks = {i: len(t.split()) for i, t in rows}
    order = sorted(toks, key=lambda i: (-toks[i], i))
    want = {}
    for r, i in enumerate(order):
        pos = r % S
        want[i] = (toks[i], r, pos if (r // S) % 2 == 0 else S - 1 - pos)
    assert got == want
    totals = {}
    for _, (n, _, sh) in got.items():
        totals[sh] = totals.get(sh, 0) + n
    assert set(totals) == set(range(S))
    assert max(totals.values()) - min(totals.values()) <= max(toks.values())
    with pytest.raises(ValueError):
        balanced_shards(docs, n_shards=0)


def test_chunk_manifest_inverts_packing(spark):
    """chunk_manifest over the pack_chunks golden: every chunk holds
    exactly `budget` tokens except the last, doc spans appear in every
    chunk they cross, empty docs appear nowhere, and total manifest
    tokens equal total doc tokens."""
    from geospatial_web_scraper_spark.operators.packing import (
        chunk_manifest,
        pack_chunks,
    )

    docs = spark.createDataFrame(
        [
            (0, "a b c"),
            (1, "d e f g"),
            (2, "   "),
            (3, "h i j k l m n"),
            (4, "o p"),
        ],
        "doc_id long, text string",
    )
    packed = pack_chunks(docs, budget=5)
    got = {
        r["chunk_id"]: (list(r["doc_ids"]), r["n_docs"], r["n_tokens"])
        for r in chunk_manifest(packed, budget=5).collect()
    }
    # stream: doc0 tokens 0-2, doc1 3-6, doc3 7-13, doc4 14-15 (16 total)
    assert got == {
        0: ([0, 1], 2, 5),
        1: ([1, 3], 2, 5),
        2: ([3, 4], 2, 5),
        3: ([4], 1, 1),   # final partial chunk
    }
    assert sum(t for _, _, t in got.values()) == 16


def test_repetition_stats_goldens(spark):
    df = spark.createDataFrame(
        [(0, "a b a b a b"), (1, "x y z"), (2, "")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            F.round(textstats.dup_word_frac_expr(F.col("text")), 6).alias("dw"),
            F.round(textstats.top_ngram_char_frac_expr(F.col("text"), 2), 6).alias("t2"),
            F.round(textstats.dup_ngram_frac_expr(F.col("text"), 3), 6).alias("d3"),
        ).collect()
    }
    # doc 0: 6 tokens 2 distinct; "a b" occurs 3x of len 3 over 11 norm chars;
    # 4 trigrams 2 distinct
    assert out[0]["dw"] == round(1 - 2 / 6, 6)
    assert out[0]["t2"] == round(9 / 11, 6)
    assert out[0]["d3"] == 0.5
    # doc 1: no repetition; top 2-gram is any single occurrence (3 chars / 5)
    assert out[1]["dw"] == 0.0
    assert out[1]["t2"] == 0.6
    assert out[1]["d3"] == 0.0
    assert tuple(out[2][c] for c in ("dw", "t2", "d3")) == (0.0, 0.0, 0.0)


def test_span_dedup_first_wins(spark):
    import hashlib

    docs = spark.createDataFrame(
        [
            (0, "a b c d e f"),  # spans "a b c", "d e f" — both first
            (1, "a b c x y z"),  # "a b c" is a cross-doc dup; "x y z" kept
            (2, "d e f"),        # entirely shadowed by doc 0's second span
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in dedup.span_dedup(
            docs, spans_expr=dedup.token_window_spans_expr(F.col("text"), 3)
        ).collect()
    }
    assert (out[0]["n_spans"], out[0]["n_kept"]) == (2, 2)
    assert (out[1]["n_spans"], out[1]["n_kept"]) == (2, 1)
    assert (out[2]["n_spans"], out[2]["n_kept"]) == (1, 0)
    assert out[0]["kept_hash"] == hashlib.md5(b"a b c d e f").hexdigest()
    assert out[1]["kept_hash"] == hashlib.md5(b"x y z").hexdigest()
    assert out[2]["kept_hash"] == hashlib.md5(b"").hexdigest()


def test_line_dedup_frequency_rule(spark):
    """CCNet frequency rule vs span_dedup's first-wins: a cross-document
    segment is dropped EVERYWHERE (including its first occurrence), while
    a segment repeated only WITHIN one document (df = 1) fully survives."""
    import hashlib

    docs = spark.createDataFrame(
        [
            (0, "a b c d e f"),  # "a b c" shared with doc 1 → dropped here too
            (1, "a b c x y z"),  # "x y z" unique → kept
            (2, "k k k k k k"),  # "k k k" twice IN ONE doc, df=1 → both kept
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in dedup.line_dedup(
            docs, spans_expr=dedup.token_window_spans_expr(F.col("text"), 3)
        ).collect()
    }
    assert (out[0]["n_lines"], out[0]["n_kept"]) == (2, 1)
    assert (out[1]["n_lines"], out[1]["n_kept"]) == (2, 1)
    assert (out[2]["n_lines"], out[2]["n_kept"]) == (2, 2)
    assert out[0]["kept_hash"] == hashlib.md5(b"d e f").hexdigest()
    assert out[1]["kept_hash"] == hashlib.md5(b"x y z").hexdigest()
    assert out[2]["kept_hash"] == hashlib.md5(b"k k k k k k").hexdigest()
    # min_df=3 keeps everything in this corpus (max df is 2)
    relaxed = dedup.line_dedup(
        docs,
        spans_expr=dedup.token_window_spans_expr(F.col("text"), 3),
        min_df=3,
    ).collect()
    assert all(r["n_kept"] == r["n_lines"] for r in relaxed)


def test_decontaminate_golden(spark):
    train = spark.createDataFrame(
        [
            (1, "a b c d e f"),  # 5-grams: "a b c d e", "b c d e f"
            (2, "p q r s t"),    # 5-gram:  "p q r s t"
            (3, "short text"),   # fewer than 5 tokens → 0 grams
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "z a b c d e")], "doc_id long, text string"
    )  # eval grams: "z a b c d", "a b c d e"
    out = {r["doc_id"]: r for r in dedup.decontaminate(train, ev).collect()}
    assert (out[1]["n_grams"], out[1]["n_overlap"], out[1]["contam_frac"]) == (2, 1, 0.5)
    assert (out[2]["n_overlap"], out[2]["contam_frac"]) == (0, 0.0)
    assert (out[3]["n_grams"], out[3]["n_overlap"], out[3]["contam_frac"]) == (0, 0, 0.0)


def test_sample_token_budget_matches_python_mirror(spark):
    import hashlib

    from geospatial_web_scraper_spark.operators.sampling import (
        sample_token_budget,
    )

    rows = [
        # src "big": 4 docs x 6 tokens = 24 tokens, budget 12 → rate 0.5
        *[(i, "big", "t u v w x y") for i in range(4)],
        # src "small": 2 docs x 2 tokens = 4 tokens ≤ 12 → rate 1, all kept
        (10, "small", "a b"),
        (11, "small", "c d"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        r["doc_id"]: r
        for r in sample_token_budget(df, budget_tokens=12).collect()
    }

    def u(source, doc_id):
        return int(hashlib.md5(f"{source}:{doc_id}".encode()).hexdigest()[:15], 16) / 2**60

    for i in range(4):
        assert got[i]["kept"] == (u("big", i) < 12.0 / 24.0), i
        assert got[i]["u"] == round(u("big", i), 6)
    assert got[10]["kept"] and got[11]["kept"]  # under-budget source kept whole
    assert got[10]["n_tok"] == 2


def test_pii_scrub_golden(spark):
    from geospatial_web_scraper_spark.operators.pii import (
        pii_counts_exprs,
        scrub_pii_expr,
    )

    df = spark.createDataFrame(
        [
            (0, "mail a.b+c@foo-bar.org or 555-123-0042, host 10.0.3.7 end"),
            (1, "no pii here"),
            (2, "x@y.io x@y.io 1.2.3.4"),
        ],
        "doc_id long, text string",
    )
    counts = pii_counts_exprs(F.col("text"))
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            *[counts[k].alias(k) for k in ("n_emails", "n_phones", "n_ips")],
            scrub_pii_expr(F.col("text")).alias("scrubbed"),
        ).collect()
    }
    assert out[0]["scrubbed"] == "mail <EMAIL> or <PHONE>, host <IP> end"
    assert (out[0]["n_emails"], out[0]["n_phones"], out[0]["n_ips"]) == (1, 1, 1)
    assert out[1]["scrubbed"] == "no pii here"
    assert (out[1]["n_emails"], out[1]["n_phones"], out[1]["n_ips"]) == (0, 0, 0)
    assert out[2]["scrubbed"] == "<EMAIL> <EMAIL> <IP>"
    assert (out[2]["n_emails"], out[2]["n_ips"]) == (2, 1)


def test_semdedup_matches_naive(spark):
    """semdedup vs a naive numpy mirror of the same rule (argmax-cosine
    cell around given centroids; drop iff a smaller-id cell-mate has
    round(cos,6) >= t) on a hand-built set: two tight clusters with exact
    and near duplicates, one outlier, one zero vector."""
    import numpy as np

    vecs = {
        0: [1.0, 0.0, 0.0],      # centroid 0
        1: [0.0, 1.0, 0.0],      # centroid 1
        2: [1.0, 0.01, 0.0],     # ~dup of 0 -> dropped (mate 0)
        3: [2.0, 0.0, 0.0],      # scaled dup of 0 -> dropped
        4: [0.0, 1.0, 0.05],     # ~dup of 1 -> dropped
        5: [0.7, 0.72, 0.0],     # between clusters, far from mates
        6: [0.0, 0.0, 0.0],      # zero-norm -> excluded entirely
        7: [-1.0, 0.2, 0.0],     # negative-cos outlier
    }
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id long, embedding array<double>",
    )
    cent = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("cid"), "embedding"
    )
    t = 0.95
    got = {
        r["vec_id"]: (r["cid"], r["kept"])
        for r in similarity.semdedup(emb, cent, threshold=t).collect()
    }

    # naive mirror
    ids = [i for i in sorted(vecs) if np.linalg.norm(vecs[i]) > 0]
    cmat = np.array([vecs[0], vecs[1]])
    cn = np.linalg.norm(cmat, axis=1)

    def cell(i):
        v = np.array(vecs[i])
        cos = cmat @ v / (cn * np.linalg.norm(v))
        return int(cos.argmax())

    want = {}
    for i in ids:
        kept = True
        for j in ids:
            if j < i and cell(j) == cell(i):
                a, b = np.array(vecs[j]), np.array(vecs[i])
                c = round(
                    float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 6
                )
                if c >= t:
                    kept = False
        want[i] = (cell(i), kept)

    assert got == want
    assert 6 not in got                      # zero vector excluded
    assert got[2] == (0, False) and got[3] == (0, False) and got[4] == (1, False)
    assert got[0][1] and got[1][1] and got[5][1] and got[7][1]


def test_semdedup_zero_norm_centroid_never_owns_a_cell(spark):
    """A zero-norm CENTROID must be excluded from the candidate set (the
    oracle's contract): before the r4 mask, its clamped cosine 0.0 won the
    argmax whenever every real-centroid cosine was negative, silently
    diverging from the SQL oracle. All-negative vectors must land in the
    best REAL cell; an all-zero centroid table yields an empty result."""
    emb = spark.createDataFrame(
        [
            (0, [-1.0, 0.0]),   # cos to cid0 = -1 < 0: the pre-mask trap
            (1, [-1.0, -0.2]),
            (2, [1.0, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    cent = spark.createDataFrame(
        [(0, [1.0, 0.0]), (7, [0.0, 0.0])],
        "cid long, embedding array<double>",
    )
    got = {
        r["vec_id"]: r["cid"]
        for r in similarity.semdedup(emb, cent, threshold=0.99).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0}

    all_zero = spark.createDataFrame(
        [(7, [0.0, 0.0])], "cid long, embedding array<double>"
    )
    empty = similarity.semdedup(emb, all_zero, threshold=0.5)
    assert empty.columns == ["vec_id", "cid", "kept"]
    assert empty.count() == 0


def test_semdedup_oversized_cell_guard(spark):
    """One mega-cluster (every vector in one cell) past max_cell must
    raise — the documented quadratic cost model becomes enforceable
    instead of a silent hot task — and max_cell=None opts out."""
    import pytest as _pytest

    emb = spark.createDataFrame(
        [(i, [1.0, float(i) / 100.0]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    cent = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [-1.0, 0.0])],
        "cid long, embedding array<double>",
    )
    with _pytest.raises(ValueError, match="max_cell"):
        similarity.semdedup(emb, cent, threshold=0.99, max_cell=10)
    assert (
        similarity.semdedup(emb, cent, threshold=0.99, max_cell=None).count()
        == 40
    )
    assert (
        similarity.semdedup(emb, cent, threshold=0.99, max_cell=40).count()
        == 40
    )


def test_containment_pairs_directional_and_df_capped(spark):
    # small doc quoted verbatim inside a much longer doc: containment is
    # directional (small ⊆ big, not the reverse) — the case symmetric
    # Jaccard near-dup structurally misses.
    small = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon "
        "phi chi psi omega aleph bet gimel dalet he vav"
    )
    big = (
        "intro words before the quoted passage starts here now " + small +
        " closing remarks trail the quotation with many extra words "
        "that keep the big document much longer than the small one "
        "so its own fingerprint set is far larger overall in the end "
        "and no fragment of it repeats the quoted passage again ever"
    )
    # 25 docs sharing identical boilerplate (> max_df=20): every
    # boilerplate fingerprint is df-capped out, so no boiler-boiler pair
    # survives — the skew guard doubling as a precision filter.
    boiler = (
        "this site uses cookies accept our terms privacy policy "
        "all rights reserved contact us subscribe newsletter footer"
    )
    rows = [(0, small), (1, big)]
    rows += [
        (10 + i, boiler + f" unique{i} tail{i} words{i} differ{i} end{i}")
        for i in range(25)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["src_id"], r["dst_id"]): r["containment"]
        for r in dedup.containment_pairs(df, threshold=0.5).collect()
    }
    assert (0, 1) in got and got[(0, 1)] >= 0.5, got
    assert (1, 0) not in got, got          # asymmetric: big ⊄ small
    assert all(s < 10 or d < 10 for (s, d) in got), got  # boiler capped out


def test_power_iteration_matches_numpy_direction(spark):
    """The fixed-point power iteration converges to numpy's dominant
    eigenvector of GᵀG (up to the ~1e-6 quantization scales): cosine of
    the unit directions > 0.999 after 8 rounds on a well-separated
    spectrum, and |pc1_q| stays within the documented ~2·SV bound."""
    import numpy as np

    from geospatial_web_scraper_spark.operators import spectral

    rng = np.random.RandomState(7)
    # rank-ish-1 + noise: dominant direction well separated
    u = rng.rand(96, 1)
    v = rng.rand(1, 16) - 0.3
    g = (0.5 * u @ v + 0.02 * rng.rand(96, 16)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(g)],
        "vec_id long, embedding array<float>",
    )
    out = spectral.power_iteration_top_component(df, iters=8).collect()
    got = np.zeros(16)
    for r in out:
        got[r["dim_id"]] = r["pc1_q"]
        assert abs(r["pc1_q"]) <= 2 * spectral.SV
    want = np.linalg.eigh(g.T.astype(np.float64) @ g.astype(np.float64))[1][:, -1]
    cos = abs(got @ want) / (np.linalg.norm(got) * np.linalg.norm(want))
    assert cos > 0.999, cos


def test_power_iteration_rejects_empty_input(spark):
    """An empty embeddings shard must fail loud naming the cause, not
    TypeError on first() returning None (r5 review)."""
    import pytest as _pytest

    from geospatial_web_scraper_spark.operators import spectral

    df = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with _pytest.raises(ValueError, match="empty"):
        spectral.power_iteration_top_component(df, iters=1)


def test_spectral_tdiv_truncates_toward_zero():
    from geospatial_web_scraper_spark.operators.spectral import _tdiv

    # Python // floors; Spark div / DuckDB // truncate — _tdiv must too
    assert _tdiv(-7, 2) == -3 and _tdiv(7, 2) == 3 and _tdiv(-6, 2) == -3


def test_ann_recall_eval_full_probe_is_one(spark):
    """The recall@k evaluation row (entry_queries.q_ann_recall_eval):
    per-query hit counts are bounded by the truth size, and re-running
    the same composition with n_probe = n_cells (probe everything) gives
    recall exactly 1.0 for every query — IVF over all cells IS brute
    force over the assigned (nonzero-norm) corpus."""
    from geospatial_web_scraper_spark.entry_queries import q_ann_recall_eval

    rows = q_ann_recall_eval(spark, SF).collect()
    assert len(rows) == 50
    for r in rows:
        assert 0 <= r["n_hits"] <= r["n_truth"] <= 10
        assert r["recall6"] == round(r["n_hits"] / r["n_truth"], 6)

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cent = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), "embedding"
    )
    queries = emb.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    truth = similarity.ann_bruteforce_topk(emb, queries, k=10)
    full = similarity.ann_ivf_topk(emb, cent, queries, k=10, n_probe=8)
    t = {(r["query_id"], r["vec_id"]) for r in truth.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in full.collect()}
    assert t == a
