"""Differential tests for the LLM-pipeline queries + operator invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from weatherapi_data_engineering_project_spark.operators import dedup as DD
from weatherapi_data_engineering_project_spark.operators import similarity as SIM
from weatherapi_data_engineering_project_spark.plans import llm
from weatherapi_data_engineering_project_spark.schemas import load_table
from tests.conftest import SF_DIR, compare_query_to_oracle


@pytest.mark.parametrize("name", sorted(llm.QUERIES))
def test_llm_query_matches_oracle(spark, name):
    if name not in llm.ORACLE:
        pytest.skip("rows-only query")
    compare_query_to_oracle(spark, name, llm.QUERIES[name], llm.ORACLE[name], SF_DIR)


def test_minhash_is_subset_of_allpairs(spark):
    """LSH candidates can only *miss* true pairs, never invent them."""
    d = load_table(spark, SF_DIR, "documents")
    allp = {
        (r.id1, r.id2)
        for r in DD.jaccard_pairs(d, "text", "doc_id", 0.4).collect()
    }
    lsh = {
        (r.id1, r.id2)
        for r in DD.minhash_lsh_pairs(d, "text", "doc_id", 0.4).collect()
    }
    assert lsh <= allp
    # with 25 planted high-jaccard pairs, 4 bands of 2 should catch most
    if allp:
        assert len(lsh) >= len(allp) * 0.6


def test_cosine_topk_self_is_rank1(spark):
    e = load_table(spark, SF_DIR, "embeddings")
    top = SIM.cosine_topk(e, query_id=0, k=3).collect()
    assert top[0].vec_id == 0 and abs(top[0].cosine - 1.0) < 1e-12


def test_signlsh_ann_matches_brute_force_within_bucket(spark):
    """Every ANN hit must score exactly what brute force says."""
    e = load_table(spark, SF_DIR, "embeddings")
    ann = SIM.signlsh_topk(e, k=3, max_query_id=5).collect()
    if not ann:
        pytest.skip("no same-bucket candidates at this SF")
    by_query = {}
    for r in ann:
        by_query.setdefault(r.query_id, []).append(r)
    for qid, rows in by_query.items():
        brute = {
            r.vec_id: r.cosine
            for r in SIM.cosine_topk(e, query_id=qid, k=500).collect()
        }
        for r in rows:
            assert abs(brute[r.vec_id] - r.cosine) < 1e-12


def test_exact_dedup_counts(spark):
    d = load_table(spark, SF_DIR, "documents")
    res = DD.exact_dedup(d, "text", "doc_id")
    assert res.agg(F.sum("n_docs")).collect()[0][0] == d.count()


def test_q47_clusters_converged_and_consistent(spark):
    """4 rounds reach the fixpoint on this data (one extra round changes
    nothing), reps are cluster minima, and every paired doc is labeled."""
    from weatherapi_data_engineering_project_spark.operators import dedup as DD
    from weatherapi_data_engineering_project_spark.plans.llm import (
        JACCARD_THRESHOLD,
    )
    from weatherapi_data_engineering_project_spark.schemas import load_table

    d = load_table(spark, SF_DIR, "documents")
    pairs = DD.jaccard_pairs(d, "text", "doc_id", JACCARD_THRESHOLD)
    r4 = {(r.doc_id, r.cluster_rep)
          for r in DD.label_propagation_clusters(pairs, rounds=4).collect()}
    r5 = {(r.doc_id, r.cluster_rep)
          for r in DD.label_propagation_clusters(pairs, rounds=5).collect()}
    assert r4 == r5, "label propagation not converged in 4 rounds"
    reps = {}
    for doc, rep in r4:
        reps.setdefault(rep, []).append(doc)
        assert rep <= doc
    for rep, members in reps.items():
        assert rep == min(members)
    paired = {x for r in pairs.collect() for x in (r.id1, r.id2)}
    assert {d for d, _ in r4} == paired


def test_df_cap_drops_hot_shingles(spark):
    """cap_shingle_doc_freq: a stopword-trigram shared by the whole
    corpus is excluded from the join and set sizes; genuinely similar
    docs are still paired. Guards the q24 all-pairs O(df^2) blow-up."""
    hot_prefix = "the cat sat on the mat and looked around slowly "
    rows = [(i, hot_prefix + f"unique tail {i} alpha beta gamma delta")
            for i in range(30)]
    # one true near-dup pair with rare shared content
    rows += [(100, "rare shared content block one two three four five six"),
             (101, "rare shared content block one two three four five seven")]
    d = spark.createDataFrame(rows, "doc_id long, text string")

    ex = DD.shingle_sets(d, "text", "doc_id")
    capped = DD.cap_shingle_doc_freq(ex, max_doc_freq=10)
    # no surviving shingle appears in more than 10 docs
    maxdf = (
        capped.groupBy("shingle").count().agg(F.max("count")).collect()[0][0]
    )
    assert maxdf <= 10
    # n_sh was recomputed over the capped sets
    bad = capped.groupBy("doc").agg(
        F.count(F.lit(1)).alias("n"), F.max("n_sh").alias("n_sh")
    ).filter(F.col("n") != F.col("n_sh")).count()
    assert bad == 0

    pairs = {
        (r.id1, r.id2)
        for r in DD.jaccard_pairs(
            d, "text", "doc_id", 0.3, max_doc_freq=10
        ).collect()
    }
    assert (100, 101) in pairs
    # the hot-prefix docs share ONLY capped shingles -> no pair among them
    assert all(p == (100, 101) for p in pairs)


def test_lsh_verify_path_has_no_broadcast_hint(spark):
    """The candidate side of the LSH verifier must not be hard-broadcast
    (at corpus scale it can exceed driver limits); AQE decides at
    runtime instead."""
    d = load_table(spark, SF_DIR, "documents")
    res = DD.minhash_lsh_pairs(d, "text", "doc_id", 0.4)
    analyzed = res._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed
    assert "UnresolvedHint" not in analyzed


def test_label_slots_scale_with_graph_size(spark):
    """VERDICT r03 #2: the label frames' partition count must scale
    with the pair-graph size — a fixed coalesce(16) caps a
    billion-edge clustering at 16-way parallelism. Tiny graphs keep
    the 16-slot floor; big graphs (simulated via a test-sized
    rows_per_slot) widen up to the shuffle width."""
    import weatherapi_data_engineering_project_spark.operators.dedup as DDm

    edges = [(i, i + 1) for i in range(0, 4000, 2)]  # 2000 edges
    pairs = spark.createDataFrame(edges, "id1 long, id2 long")
    e = pairs.selectExpr("id1 as a", "id2 as b")
    lo = min(16, spark.sparkContext.defaultParallelism)
    # production constant: tiny graph keeps today's floor
    assert DDm._label_slots(e) == lo
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    try:
        assert DDm._label_slots(e, rows_per_slot=50) == 40  # ceil(2000/50)
        assert DDm._label_slots(e, rows_per_slot=10) == 64  # clamped to width
        # and the label frame itself rides the scaled slot count
        # (union of both edge directions: 4000 rows -> clamped to 64).
        # AQE would coalesce this toy shuffle to 1 partition (on real
        # volumes it keeps the width) — disable it to observe the
        # static shape.
        DDm._LABEL_ROWS_PER_SLOT = 50
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            labels = DDm.label_propagation_clusters(pairs, rounds=1)
            assert labels.rdd.getNumPartitions() > 16
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", "true")
            DDm._LABEL_ROWS_PER_SLOT = 1_000_000
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_label_prop_round_join_has_no_broadcast_hint(spark):
    """VERDICT r02 #6: the per-round label join must not hard-broadcast
    the label frame — a duplicate-heavy corpus can have billions of
    paired docs, where a hard broadcast OOMs; AQE sizes the join at
    runtime instead. Both variants must agree on a multi-component
    graph (the shuffled plan changes nothing)."""
    # several components incl. a chain, so propagation does real work
    edges = [(i, i + 1) for i in range(0, 40, 2)]
    edges += [(100 + i, 100 + i + 1) for i in range(7)]  # diameter-7 chain
    edges += [(200, 201), (201, 202), (200, 202)]
    pairs = spark.createDataFrame(edges, "id1 long, id2 long")

    fixed = {(r.doc_id, r.cluster_rep)
             for r in DD.label_propagation_clusters(pairs, rounds=8).collect()}
    conv = {
        (r.doc_id, r.cluster_rep)
        for r in DD.label_propagation_clusters_converged(pairs).collect()
    }
    assert conv == fixed
    comps = {}
    for doc, rep in fixed:
        comps.setdefault(rep, set()).add(doc)
    assert all(rep == min(m) for rep, m in comps.items())

    # the round join carries no hard hint (AQE decides from runtime size)
    e = pairs.selectExpr("id1 as a", "id2 as b")
    labels = pairs.selectExpr("id1 as id", "id1 as rep")
    join = e.join(DD._labels_for_join(labels), on="b")
    analyzed = join._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed and "UnresolvedHint" not in analyzed


def test_converged_clustering_long_chain(spark):
    """Run-to-fixpoint clustering resolves a diameter-9 chain exactly;
    the fixed-4-round oracle variant (documented) cannot."""
    chain = [(i, i + 1) for i in range(9)]  # 0-1-2-...-9
    pairs = spark.createDataFrame(chain, "id1 long, id2 long")
    conv = {r.doc_id: r.cluster_rep
            for r in DD.label_propagation_clusters_converged(pairs).collect()}
    assert set(conv) == set(range(10))
    assert all(rep == 0 for rep in conv.values())
    fixed = {r.doc_id: r.cluster_rep
             for r in DD.label_propagation_clusters(pairs, rounds=4).collect()}
    assert any(rep != 0 for rep in fixed.values())  # 4 hops can't reach


def test_pq_ann_numpy_differential(spark):
    """PQ (q73): codes are valid and complete, training is
    deterministic, and the ADC top-k matches an independent NumPy
    recomputation of codebook distances — the rows-only twin of an
    oracle for the iterative trainer."""
    import numpy as np

    e = load_table(spark, SF_DIR, "embeddings")
    m, k_sub = 4, 16
    books, codes = SIM.pq_codebooks_and_codes(e, m=m, k_sub=k_sub, n_iters=2)
    got_codes = {r.vec_id: list(r.codes) for r in codes.collect()}
    assert len(got_codes) == e.count()
    assert all(
        len(c) == m and all(0 <= x < k_sub for x in c)
        for c in got_codes.values()
    )

    vecs = {
        r.vec_id: np.array([float(x) for x in r.embedding])
        for r in e.collect()
    }
    q = vecs[0]
    d_sub = len(q) // m
    table = [
        [
            float(np.sum((q[j * d_sub:(j + 1) * d_sub]
                          - np.array(books[j][cid])) ** 2))
            for cid in range(k_sub)
        ]
        for j in range(m)
    ]
    adc = {
        vid: sum(table[j][c[j]] for j in range(m))
        for vid, c in got_codes.items()
        if vid != 0
    }
    expect = sorted(adc.items(), key=lambda kv: (kv[1], kv[0]))[:5]

    got = [
        (r.vec_id, r.adc_dist, r.rn)
        for r in SIM.pq_topk(e, query_id=0, k=5, m=m, k_sub=k_sub).collect()
    ]
    assert [v for v, _, _ in got] == [v for v, _ in expect]
    for (gv, gd, _), (ev, ed) in zip(got, expect):
        assert abs(gd - ed) < 1e-6, (gv, gd, ed)
    assert [rn for _, _, rn in got] == [1, 2, 3, 4, 5]

    # determinism across invocations
    again = [
        (r.vec_id, r.adc_dist)
        for r in SIM.pq_topk(e, query_id=0, k=5, m=m, k_sub=k_sub).collect()
    ]
    assert again == [(v, d) for v, d, _ in got]


def test_pq_rerank_exact_over_shortlist(spark):
    """Two-stage PQ: the re-rank must equal an exact NumPy cosine
    ranking restricted to the ADC shortlist, and with a corpus-sized
    shortlist it must reproduce the brute-force answer exactly."""
    import numpy as np

    e = load_table(spark, SF_DIR, "embeddings")
    short_ids = [
        r.vec_id for r in SIM.pq_topk(e, query_id=0, k=20).collect()
    ]
    got = [
        (r.vec_id, r.cosine)
        for r in SIM.pq_topk_rerank(e, query_id=0, k=3, shortlist=20).collect()
    ]
    vecs = {
        r.vec_id: np.array([float(x) for x in r.embedding])
        for r in e.collect()
    }
    q = vecs[0]

    def cosine(v):
        return float(np.dot(v, q) / (np.linalg.norm(v) * np.linalg.norm(q)))

    expect = sorted(
        ((vid, cosine(vecs[vid])) for vid in short_ids),
        key=lambda kv: (-kv[1], kv[0]),
    )[:3]
    assert [v for v, _ in got] == [v for v, _ in expect]
    for (_, gc), (_, ec) in zip(got, expect):
        assert abs(gc - ec) < 1e-6

    # corpus-sized shortlist ⇒ identical to brute force (minus self)
    full = SIM.pq_topk_rerank(e, query_id=0, k=3, shortlist=int(e.count()) - 1)
    brute = [
        r.vec_id
        for r in SIM.cosine_topk(e, query_id=0, k=4).collect()
        if r.vec_id != 0
    ][:3]
    assert [r.vec_id for r in full.collect()] == brute


def test_ivf_kmeans_centroids_invariants(spark):
    """Lloyd's quantizer: k centroids survive every round, refinement is
    deterministic, and every centroid has the corpus dimensionality."""
    e = load_table(spark, SF_DIR, "embeddings")
    c1 = SIM.kmeans_centroids(e, k=8, n_iters=2)
    rows1 = {r.cid: list(r.cvec) for r in c1.collect()}
    assert len(rows1) == 8
    dim = len(e.select("embedding").first().embedding)
    assert all(len(v) == dim for v in rows1.values())
    rows2 = {r.cid: list(r.cvec)
             for r in SIM.kmeans_centroids(e, k=8, n_iters=2).collect()}
    assert rows1 == rows2  # deterministic refinement


def test_ivf_kmeans_hits_score_exactly(spark):
    """Every ANN hit from the k-means path scores exactly what brute
    force computes (the ANN may miss, never mis-score), and per-query
    result counts respect k."""
    e = load_table(spark, SF_DIR, "embeddings")
    res = SIM.ivf_topk_kmeans(e, n_centroids=8, n_iters=2, n_probe=2,
                              k=3, max_query_id=5).collect()
    assert res
    by_query: dict = {}
    for r in res:
        by_query.setdefault(r.query_id, []).append(r)
    for qid, rows in by_query.items():
        assert len(rows) <= 3
        brute = {
            r.vec_id: r.cosine
            for r in SIM.cosine_topk(e, query_id=qid, k=500).collect()
        }
        for r in rows:
            assert abs(brute[r.vec_id] - r.cosine) < 1e-12


def test_incremental_neardup_matches_full_run_cross_pairs(spark):
    """The incremental (new-vs-corpus) pipeline must find exactly the
    full-corpus LSH pairs whose partners straddle the batch boundary —
    same banding, same verification, no corpus×corpus work."""
    d = load_table(spark, SF_DIR, "documents")
    split = llm.INCREMENTAL_SPLIT
    inc = {
        (r.id1, r.id2): r.jaccard
        for r in DD.incremental_neardup_pairs(
            d.filter(F.col("doc_id") >= split),
            d.filter(F.col("doc_id") < split),
            "text",
            "doc_id",
            llm.JACCARD_THRESHOLD,
        ).collect()
    }
    full = {
        # full run orders id1 < id2; incremental puts the NEW doc first
        (max(r.id1, r.id2), min(r.id1, r.id2)): r.jaccard
        for r in DD.minhash_lsh_pairs(
            d, "text", "doc_id", llm.JACCARD_THRESHOLD
        ).collect()
        if (r.id1 >= split) != (r.id2 >= split)
    }
    assert inc == full
    assert inc  # nonzero: the testdata plants cross-boundary dups


def test_resize_kernel_invariants(spark):
    """resize_images: bounded box, aspect preserved under floor
    division, never upscaled, degenerate and null rows handled."""
    from weatherapi_data_engineering_project_spark.functions.multimodal import (
        resize_images,
    )

    rows = [
        (1, "image", b"abc", "png", 2000, 1000, None),   # downscale w-major
        (2, "image", b"abc", "png", 100, 100, None),     # within box: kept
        (3, "image", b"abc", "png", 10000, 3, None),     # extreme ratio
        (4, "image", None, "png", 500, 500, None),       # no payload: drop
        (5, "image", b"abc", "png", None, None, None),   # no dims: drop
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, content binary, format string, "
        "width int, height int, duration_ms int",
    )
    got = {r.media_id: r for r in resize_images(media, max_px=256).collect()}
    assert set(got) == {1, 2, 3}
    assert (got[1].new_width, got[1].new_height) == (256, 128)
    assert (got[2].new_width, got[2].new_height) == (100, 100)
    # 3px side floors to 10000*256//10000=256 wide, 3*256//10000=0 -> 1
    assert (got[3].new_width, got[3].new_height) == (256, 1)
    for r in got.values():
        assert max(r.new_width, r.new_height) <= 256
        assert r.new_width <= r.width and r.new_height <= r.height
        assert len(r.content) == 32  # stub payload: sha256 digest


def test_resize_real_pixel_kernel_with_pil(spark):
    """VERDICT r03 #5: with PIL installed the kernel really resizes
    decodable payloads (skipped in this env — no PIL); synthetic bytes
    still take the sha256 stub so oracle results never change."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io as _io

    from weatherapi_data_engineering_project_spark.functions.multimodal import (
        _resize_blob,
        resize_images,
    )

    buf = _io.BytesIO()
    PIL_Image.new("RGB", (640, 480), (10, 20, 30)).save(buf, format="PNG")
    png = buf.getvalue()
    out = _resize_blob(png, 256, 192)
    with PIL_Image.open(_io.BytesIO(out)) as im:
        assert im.size == (256, 192)
    # non-decodable payload still falls back to the 32-byte stub
    assert len(_resize_blob(b"abc", 8, 8)) == 32
    # end-to-end through the shard layout + Arrow kernel
    media = spark.createDataFrame(
        [(1, "image", png, "png", 640, 480, None)],
        "media_id long, kind string, content binary, format string, "
        "width int, height int, duration_ms int",
    )
    r = resize_images(media, max_px=256).collect()[0]
    with PIL_Image.open(_io.BytesIO(bytes(r.content))) as im:
        assert im.size == (r.new_width, r.new_height)


def test_kmeans_and_ivf_fallback_paths_match_literal(spark, monkeypatch):
    """Above _KMEANS_MAX_LITERAL_TERMS the quantizers switch from
    plan-literal projections to broadcast + max_by / collect_list
    partial aggregation — the branch only production-scale k·dim ever
    exercises. Forcing it (threshold → 0) must reproduce the literal
    path exactly: same centroids, same probe lists, same hits."""
    e = load_table(spark, SF_DIR, "embeddings")
    lit_c = sorted(map(tuple, SIM.kmeans_centroids(e, k=4, n_iters=2).collect()))
    lit_t = sorted(
        map(
            tuple,
            SIM.ivf_topk(
                e, n_centroids=8, n_probe=2, k=3, max_query_id=10
            ).collect(),
        )
    )
    monkeypatch.setattr(SIM, "_KMEANS_MAX_LITERAL_TERMS", 0)
    fb_c = sorted(map(tuple, SIM.kmeans_centroids(e, k=4, n_iters=2).collect()))
    fb_t = sorted(
        map(
            tuple,
            SIM.ivf_topk(
                e, n_centroids=8, n_probe=2, k=3, max_query_id=10
            ).collect(),
        )
    )
    assert fb_c == lit_c
    assert fb_t == lit_t


def test_pack_bins_edges_and_semantics(spark):
    """_pack_bins: empty/singleton inputs survive the bucketed rewrite;
    bin assignment equals the naive per-source cumulative-sum window on
    a multi-source frame with skewed doc_id ranges."""
    from pyspark.sql.window import Window

    from weatherapi_data_engineering_project_spark.plans.llm import _pack_bins

    empty = spark.createDataFrame([], "doc_id long, source string, n_tokens int")
    assert _pack_bins(empty).count() == 0
    one = spark.createDataFrame(
        [(1, "s", 10)], "doc_id long, source string, n_tokens int"
    )
    assert _pack_bins(one).collect()[0].bin_id == 0

    rows = [
        (i, f"src{i % 3}", 500 + (i * 37) % 900) for i in range(300)
    ] + [(10_000 + i, "src0", 4096) for i in range(20)]  # skewed id range
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens int")
    got = {
        (r.doc_id, r.source): r.bin_id for r in _pack_bins(df).collect()
    }
    w = Window.partitionBy("source").orderBy("doc_id")
    cum = F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, 0))
    want = {
        (r.doc_id, r.source): r.bin_id
        for r in df.select(
            "doc_id",
            "source",
            F.floor((cum - F.col("n_tokens")) / F.lit(4096)).alias("bin_id"),
        ).collect()
    }
    assert got == want


def test_containment_catches_subset_dup_jaccard_misses(spark):
    """A short doc embedded verbatim in a much longer one has near-zero
    Jaccard but containment 1.0 — the asymmetric case q123 exists for."""
    short = "alpha beta gamma delta epsilon zeta"
    long_ = short + " " + " ".join(f"w{i} x{i} y{i}" for i in range(30))
    df = spark.createDataFrame(
        [(1, short), (2, long_)], "doc_id long, text string"
    )
    pairs = DD.containment_pairs(df, "text", "doc_id", 0.9).collect()
    assert len(pairs) == 1
    p = pairs[0]
    assert {p.id1, p.id2} == {1, 2}
    # the short side is fully contained; symmetric jaccard is small
    assert max(p.c_1_in_2, p.c_2_in_1) == 1.0
    assert p.jaccard < 0.5
    # and the jaccard path at the same threshold finds nothing
    sym = DD.jaccard_pairs(df, "text", "doc_id", 0.9).collect()
    assert sym == []


def test_containment_pairs_bounds_on_corpus(spark):
    """Both containment directions and jaccard are valid ratios, and
    jaccard never exceeds either containment (set algebra)."""
    d = load_table(spark, SF_DIR, "documents")
    rows = DD.containment_pairs(d, "text", "doc_id", 0.6).collect()
    assert rows, "sf0.01 planted near-dups should produce pairs"
    for r in rows:
        assert 0 < r.c_1_in_2 <= 1.0 and 0 < r.c_2_in_1 <= 1.0
        assert r.jaccard <= min(r.c_1_in_2, r.c_2_in_1) + 1e-9
        assert max(r.c_1_in_2, r.c_2_in_1) >= 0.6


def test_dedup_savings_consistent_with_exact_dedup(spark):
    """Dropped-doc total equals (n_docs - n_fingerprints) from q23's
    exact dedup, and rates are valid ratios."""
    d = load_table(spark, SF_DIR, "documents")
    rows = llm.q141_dedup_savings(spark, SF_DIR).collect()
    n_docs = d.count()
    n_groups = llm.q23_exact_dedup(spark, SF_DIR).count()
    assert sum(r.n_docs for r in rows) == n_docs
    assert sum(r.n_dropped_docs for r in rows) == n_docs - n_groups
    for r in rows:
        assert 0 <= r.token_savings_rate < 1
        assert r.n_dropped_tokens <= r.n_tokens


def test_wav_codec_round_trip_and_chunk_walk(spark):
    """The RIFF parser recovers the exact int16 samples it encoded,
    tolerates extra chunks between fmt and data (real WAVs carry
    LIST/INFO), and rejects non-WAV payloads."""
    import struct

    import numpy as np
    import pytest as _pytest

    from weatherapi_data_engineering_project_spark.functions.multimodal import (
        decode_wav_pcm,
        synth_wav_pcm,
    )

    for mid in (0, 7, 63, 64, 12345):
        b = synth_wav_pcm(mid)
        sr, s = decode_wav_pcm(b)
        p = 64 + mid % 64
        idx = np.arange(2000, dtype=np.int64)
        want = (idx % p) * 2000 // p - 1000
        assert sr == 8000 and (s.astype(np.int64) == want).all()
    # splice a LIST chunk between fmt and data: still decodes
    b = synth_wav_pcm(5)
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    spliced = b[:36] + extra + b[36:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    sr2, s2 = decode_wav_pcm(spliced)
    assert sr2 == 8000 and (s2 == decode_wav_pcm(b)[1]).all()
    with _pytest.raises(ValueError):
        decode_wav_pcm(b"not a wav at all")
    with _pytest.raises(ValueError):
        decode_wav_pcm(b"RIFF\x00\x00\x00\x00WAVE")  # no chunks


def test_audio_energy_features_exact(spark):
    """Per-frame energies from the decoded stream equal the numpy
    closed-form for a sample of media ids."""
    import numpy as np

    rows = {r.media_id: r
            for r in llm.q147_audio_energy(spark, SF_DIR).collect()}
    assert len(rows) == 500
    for mid in (0, 17, 131):
        p = 64 + mid % 64
        idx = np.arange(2000, dtype=np.int64)
        s = (idx % p) * 2000 // p - 1000
        got = rows[mid]
        assert got.sr == 8000 and got.n_samples == 2000
        assert got.duration_ms == 250
        for j in range(8):
            want = int((s[j * 250 : (j + 1) * 250] ** 2).sum())
            assert getattr(got, f"e{j}") == want


def test_prefix_filter_is_lossless_at_threshold(spark):
    """Prefix filtering's theorem: its pair set EQUALS the brute-force
    all-pairs shingle Jaccard >= 1/2 result — no candidate is missed
    (unlike banding) and none invented."""
    d = load_table(spark, SF_DIR, "documents")
    brute = {
        (r.id1, r.id2): round(r.jaccard, 6)
        for r in DD.jaccard_pairs(d, "text", "doc_id", 0.5).collect()
    }
    pf = {
        (r.id1, r.id2): r.jaccard
        for r in DD.prefix_filter_pairs(d, "text", "doc_id").collect()
    }
    assert set(pf) == set(brute)
    for pair, j in pf.items():
        assert abs(j - brute[pair]) < 1e-9
        assert 0.5 <= j <= 1.0


def test_neardup_degrees_account_for_every_vector(spark):
    """Degree histogram covers every vector exactly once, and the
    edge-endpoint total equals twice the q29 pair count."""
    rows = llm.q154_neardup_degrees(spark, SF_DIR).collect()
    n_vecs = load_table(spark, SF_DIR, "embeddings").count()
    assert sum(r.n_vecs for r in rows) == n_vecs
    n_pairs = llm.q29_embed_neardup(spark, SF_DIR).count()
    assert sum(r.degree * r.n_vecs for r in rows) == 2 * n_pairs
    assert any(r.degree == 0 for r in rows), "clean vectors must appear"


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_fuzzy_join_equals_python_bruteforce(spark):
    """The SymSpell deletion-neighborhood join returns EXACTLY the
    pairs a quadratic Python Levenshtein scan finds (losslessness of
    the candidate rule), with correct distances."""
    names = {
        r.c_custkey: r.c_name
        for r in load_table(spark, SF_DIR, "customer").collect()
    }
    got = {
        (r.id1, r.id2): r.dist
        for r in llm.q156_fuzzy_name_join(spark, SF_DIR).collect()
    }
    keys = sorted(names)
    want = {}
    for i, k1 in enumerate(keys):
        for k2 in keys[i + 1 :]:
            d = _lev(names[k1], names[k2])
            if d <= 1:
                want[(k1, k2)] = d
    assert got == want
    assert len(got) > 0, "generator names must yield distance-1 pairs"


def test_triangle_census_equals_python_graph(spark):
    """Edge/wedge/triangle counts equal an adjacency-set computation
    in Python over the operator's own verified edge list."""
    from weatherapi_data_engineering_project_spark.operators import (
        similarity as SIM,
    )

    e = load_table(spark, SF_DIR, "embeddings")
    edges = {
        (r.id1, r.id2)
        for r in SIM.cosine_neardup_pairs(
            e, threshold=0.25, n_bands=4, band_bits=4
        ).collect()
    }
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    wedges = sum(len(v) * (len(v) - 1) // 2 for v in adj.values())
    tris = sum(
        len(adj[a] & adj[b]) for a, b in edges
    ) // 3 if edges else 0
    r = llm.q157_graph_triangles(spark, SF_DIR).collect()[0]
    assert r.n_edges == len(edges)
    assert r.n_wedges == (wedges if edges else None)
    assert r.n_triangles == tris
    if wedges:
        assert abs(r.global_clustering - 3 * tris / wedges) < 1e-6


def test_cluster_silhouette_matches_numpy(spark):
    """Silhouette recomputed with numpy from the SAME trained
    centroids (the trainer itself is pinned by the q60 tests):
    assignment counts exact, means within float tolerance, plus the
    silhouette range invariant."""
    import numpy as np

    from weatherapi_data_engineering_project_spark.operators import (
        similarity as SIM,
    )
    from weatherapi_data_engineering_project_spark.schemas import load_table

    e = load_table(spark, SF_DIR, "embeddings")
    cents = {
        int(r.cid): np.asarray(r.cvec, dtype=np.float64)
        for r in SIM.kmeans_centroids(e, 16, 3).collect()
    }
    agg = {}
    for r in e.select("vec_id", "embedding").collect():
        v = np.asarray(r.embedding, dtype=np.float64)
        ds = sorted(
            (
                1.0
                - round(
                    float(v @ c) / (np.linalg.norm(v) * np.linalg.norm(c)),
                    6,
                ),
                cid,
            )
            for cid, c in cents.items()
        )
        (da, cid), (db, _) = ds[0], ds[1]
        s = (db - da) / db if db > 0 else 0.0
        n, sa, ss = agg.get(cid, (0, 0.0, 0.0))
        agg[cid] = (n + 1, sa + da, ss + s)
    rows = SIM.centroid_silhouette(e, 16, 3).collect()
    assert {r.cid for r in rows} == set(agg)
    for r in rows:
        n, sa, ss = agg[r.cid]
        assert r.n_vecs == n
        assert abs(r.avg_intra_dist - sa / n) < 1e-4
        assert abs(r.avg_silhouette - ss / n) < 1e-4
        assert -1 - 1e-9 <= r.avg_silhouette <= 1 + 1e-9


def test_quality_representatives_argmax_semantics(spark):
    """Representatives recomputed in Python from the q47 clustering and
    q51 scores (both differentially certified): argmax quality with
    min-id tiebreak; every `moved` rep strictly beats the id-based
    pick's score."""
    from weatherapi_data_engineering_project_spark.plans import (
        extensions as X,
    )
    from weatherapi_data_engineering_project_spark.plans import llm as L

    labels = L.q47_dedup_clusters(spark, SF_DIR).collect()
    q = {
        r.doc_id: r.quality_score
        for r in X.q51_quality_score(spark, SF_DIR).collect()
    }
    clusters: dict[int, list[int]] = {}
    for r in labels:
        clusters.setdefault(r.cluster_rep, []).append(r.doc_id)
    got = {
        r.cluster: r
        for r in L.q173_quality_representatives(spark, SF_DIR).collect()
    }
    assert set(got) == set(clusters)
    for cluster, members in clusters.items():
        best = min(members, key=lambda d: (-q[d], d))
        r = got[cluster]
        assert r.n_members == len(members)
        assert r.rep_doc_id == best
        assert r.rep_quality == q[best]
        assert r.moved == (best != cluster)
        if r.moved:
            assert q[best] > q[cluster]


def test_minhash_calibration_matches_python(spark):
    """Bin stats recomputed in pure Python from raw shingle sets and
    md5 signatures (same hash rule); the estimator must be roughly
    unbiased overall (|mean est - mean exact| well under the 8-hash
    standard error)."""
    import hashlib
    import re
    from collections import defaultdict

    from weatherapi_data_engineering_project_spark.schemas import load_table

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text"
    ).collect()
    sh = {}
    for r in docs:
        t = [x for x in re.split(r"\s+", r.text.lower().strip()) if x]
        s = {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}
        if s:
            sh[r.doc_id] = s
    sig = {
        d: tuple(
            min(
                hashlib.md5(f"{i}§{x}".encode()).hexdigest() for x in s
            )
            for i in range(8)
        )
        for d, s in sh.items()
    }
    bands = defaultdict(set)
    for d, sg in sig.items():
        for b in range(4):
            bands[
                (b, hashlib.md5(f"{sg[2*b]}|{sg[2*b+1]}".encode()).hexdigest())
            ].add(d)
    cand = set()
    for ds in bands.values():
        ds = sorted(ds)
        for i, a in enumerate(ds):
            for b in ds[i + 1 :]:
                cand.add((a, b))
    bins = defaultdict(lambda: [0, 0.0, 0.0, 0.0])
    for a, b in cand:
        inter = len(sh[a] & sh[b])
        exact = inter / (len(sh[a]) + len(sh[b]) - inter)
        est = sum(x == y for x, y in zip(sig[a], sig[b])) / 8
        k = min(int(exact * 10), 9)
        rec = bins[k]
        rec[0] += 1
        rec[1] += round(exact, 9)
        rec[2] += round(est, 9)
        rec[3] += round(abs(est - exact), 9)
    rows = {
        r.jaccard_bin: r
        for r in llm.q174_minhash_calibration(spark, SF_DIR).collect()
    }
    assert set(rows) == set(bins)
    for k, (n, sj, se, sa) in bins.items():
        r = rows[k]
        assert r.n_pairs == n
        assert abs(r.avg_exact - round(sj / n, 6)) < 1e-6
        assert abs(r.avg_est - round(se / n, 6)) < 1e-6
        assert abs(r.avg_abs_err - round(sa / n, 6)) < 1e-6
    tot = sum(v[0] for v in bins.values())
    bias = (
        sum(v[2] for v in bins.values()) - sum(v[1] for v in bins.values())
    ) / tot
    assert abs(bias) < 4 * (0.5 / (8**0.5)) / (tot**0.5) + 0.05


def test_q201_knn_classifier_matches_bruteforce(spark):
    """numpy cosine kNN with the same rounded-6 + id tiebreak ranking
    and smallest-label vote break reproduces every prediction."""
    import numpy as np

    from weatherapi_data_engineering_project_spark.plans import llm as L
    from weatherapi_data_engineering_project_spark.schemas import load_table

    rows = load_table(spark, SF_DIR, "embeddings").collect()
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in rows}
    labels = {r.vec_id: r.label for r in rows}
    corpus = [i for i in vecs if i >= 24]
    got = {r.qid: r for r in
           L.q201_knn_classifier(spark, SF_DIR).collect()}
    assert set(got) == {i for i in vecs if i < 24}
    for qid in got:
        qv = vecs[qid]
        scored = sorted(
            ((-round(float(np.dot(vecs[c], qv)
                           / (np.linalg.norm(vecs[c])
                              * np.linalg.norm(qv))), 6), c)
             for c in corpus),
        )[:5]
        votes: dict = {}
        for _s, c in scored:
            votes[labels[c]] = votes.get(labels[c], 0) + 1
        pred = sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        r = got[qid]
        assert r.true_label == labels[qid]
        assert r.predicted_label == pred[0], qid
        assert r.n_votes == pred[1]
        assert r.correct == (pred[0] == labels[qid])
