"""Round-12 unit tests: ADVICE r11 hardening (the JVM
deterministic-flag walk behind corpus_row_count's memo guard, the
integer-exact q295 collision mass) plus the salted-block fingerprint
prefix-stability property (VERDICT r11 #6) and the corpus-derived IVF
geometry (VERDICT r11 #1 — the round's `weak`).
"""

from __future__ import annotations

import pytest

from conftest import SF_DIR


def test_count_memo_rejects_asnondeterministic_udf(spark):
    """ADVICE r11 #4: the memo guard must catch non-deterministic
    sources whose printed plan lacks the rand()/uuid() tokens — a
    Python UDF marked asNondeterministic() is the canonical case. The
    JVM walk reads Catalyst's own Expression.deterministic flag, so
    such a frame is never memoized (two calls = two count jobs, and a
    mutated in-memory view can't serve a stale count)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import IntegerType

    from weatherapi_data_engineering_project_spark.operators.similarity import (
        _COUNT_MEMO,
        _plan_has_nondeterministic,
        corpus_row_count,
    )
    from weatherapi_data_engineering_project_spark.schemas import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    udf = F.udf(lambda: 1, IntegerType()).asNondeterministic()
    tainted = d.withColumn("u", udf()).filter(F.col("u") >= 0)

    jp = tainted._jdf.queryExecution().analyzed()
    txt = jp.toString().lower()
    tokens = (
        "rand(", "randn(", "uuid()", "shuffle(",
        "monotonically_increasing_id",
    )
    # precondition: the token probe alone genuinely misses this plan
    assert not any(t in txt for t in tokens)
    assert _plan_has_nondeterministic(jp)

    size_before = len(_COUNT_MEMO)
    assert corpus_row_count(tainted) == d.count()
    assert len(_COUNT_MEMO) == size_before, "non-deterministic plan memoized"

    # and the deterministic sibling still memoizes (guard is not
    # over-broad): same files, pure-function filter
    clean = d.filter(F.length("text") >= 0)
    n1 = corpus_row_count(clean)
    size_mid = len(_COUNT_MEMO)
    assert corpus_row_count(clean) == n1
    assert len(_COUNT_MEMO) == size_mid


# --- corpus-derived IVF geometry (VERDICT r11 #1) -------------------


def test_scaled_ivf_geometry_rule_points():
    """log2(nlist) = max(4, ⌈⌈log2 n⌉/2⌉ − 4): the 16-list floor holds
    exactly through 2^16 vectors (every historical corpus runs 16/2
    bit-identically), √n-class lists beyond; n_probe = max(2,
    log2(nlist) − 2) grows logarithmically so probed rows/query are
    O(√n·log n), not the pinned geometry's n/8."""
    from weatherapi_data_engineering_project_spark.operators.similarity import (
        scaled_ivf_nlist,
        scaled_ivf_nprobe,
    )

    # floor plateau, boundary, and beyond
    assert scaled_ivf_nlist(2) == 16
    assert scaled_ivf_nlist(500) == 16    # sf0.001/sf0.01 embeddings
    assert scaled_ivf_nlist(2_000) == 16  # sf0.1 embeddings
    assert scaled_ivf_nlist(65_536) == 16  # last floor corpus
    assert scaled_ivf_nlist(65_537) == 32
    assert scaled_ivf_nlist(5_000_000) == 256
    assert scaled_ivf_nlist(2_000_000_000) == 4096  # the 100 TB point
    assert scaled_ivf_nprobe(16) == 2  # floor → the historical probe 2
    assert scaled_ivf_nprobe(32) == 3
    assert scaled_ivf_nprobe(4096) == 10
    # probed fraction shrinks monotonically above the floor:
    # n_probe/nlist at 2e9 = 10/4096 ≈ 0.24%, vs the pinned 2/16=12.5%
    assert 10 / 4096 < 2 / 16 / 10


def test_ivf_cfg_sql_twin_matches_python_rule():
    """The oracle's ivfcfg CTE (plans/llm._IVF_CFG_CTE) must derive the
    SAME nlist/np as the Python rule at ANY corpus size — sweep n
    across the floor boundary, decade points, and powers of two, and
    evaluate the exact SQL arithmetic in DuckDB over a synthetic
    n-row relation."""
    import duckdb

    from weatherapi_data_engineering_project_spark.operators.similarity import (
        scaled_ivf_nlist,
        scaled_ivf_nprobe,
    )
    from weatherapi_data_engineering_project_spark.plans.llm import (
        _IVF_LOG2_NLIST_SQL,
    )

    con = duckdb.connect()
    for n in (1, 2, 3, 16, 255, 256, 257, 500, 2_000, 65_535, 65_536,
              65_537, 131_072, 131_073, 10**6, 5 * 10**6, 10**8,
              2 * 10**9):
        # COUNT(*) over an n-row relation = the oracle's exact idiom
        # (range() keeps the sweep instant even at n=2e9: DuckDB
        # computes the count from the range bounds)
        expr = _IVF_LOG2_NLIST_SQL.replace(
            "COUNT(*)", f"(SELECT COUNT(*) FROM range({n}))"
        )
        nlist_sql, np_sql = con.execute(
            f"SELECT (1 << {expr}), GREATEST(2, {expr} - 2)"
        ).fetchone()
        assert nlist_sql == scaled_ivf_nlist(n), n
        assert np_sql == scaled_ivf_nprobe(int(nlist_sql)), n


def test_ivf_derived_defaults_match_explicit_floor(spark):
    """Wiring proof at test scale: ivf_topk / ivf_topk_kmeans /
    ivfpq_topk with derived (None) geometry return EXACTLY the pinned
    16/2 results — the floor guarantee the oracles rely on."""
    from weatherapi_data_engineering_project_spark.operators import (
        similarity as SIM,
    )
    from weatherapi_data_engineering_project_spark.schemas import load_table

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    got = sorted(map(tuple, SIM.ivf_topk(e, k=3, max_query_id=10).collect()))
    want = sorted(
        map(
            tuple,
            SIM.ivf_topk(
                e, n_centroids=16, n_probe=2, k=3, max_query_id=10
            ).collect(),
        )
    )
    assert got == want
    got_pq = sorted(
        map(tuple, SIM.ivfpq_topk(e, query_id=0, k=5).collect())
    )
    want_pq = sorted(
        map(
            tuple,
            SIM.ivfpq_topk(
                e, query_id=0, k=5, n_centroids=16, n_probe=2
            ).collect(),
        )
    )
    assert got_pq == want_pq


def test_ivf_derived_geometry_above_floor(spark):
    """Above the floor the derived geometry must actually engage: a
    synthetic 70k-vector corpus (> 2^16) derives nlist=32 / np=2, and
    ivf_topk with derived defaults equals ivf_topk explicitly pinned
    at those derived values — proving the derivation reaches the
    centroid selection and the probe slice, not just the docstring."""
    from pyspark.sql import functions as F

    from weatherapi_data_engineering_project_spark.operators import (
        similarity as SIM,
    )

    n = 70_000
    assert SIM.scaled_ivf_nlist(n) == 32
    # deterministic dim-4 vectors, spread across partitions
    e = (
        spark.range(0, n, 1, 8)
        .select(
            F.col("id").alias("vec_id"),
            F.array(
                *[
                    (
                        (F.col("id") * (i + 3) % 97).cast("float") / 97.0
                        - 0.5
                    )
                    for i in range(4)
                ]
            ).alias("embedding"),
        )
    )
    got = sorted(
        map(tuple, SIM.ivf_topk(e, k=2, max_query_id=5).collect())
    )
    want = sorted(
        map(
            tuple,
            SIM.ivf_topk(
                e, n_centroids=32, n_probe=2, k=2, max_query_id=5
            ).collect(),
        )
    )
    assert got == want and len(got) > 0
    # the Lloyd trainer derives the same k above the floor (one
    # iteration keeps the test cheap; only the centroid COUNT is the
    # point here)
    cents = SIM.kmeans_centroids(e, n_iters=1)
    assert cents.count() == 32


# --- salted-block fingerprint prefix-stability (VERDICT r11 #6) ----


_VOCAB = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lambda mu common tail words here other suffix text"
).split()


def _sigs_all_widths(spark, docs, widths):
    """{w: {doc: bits}} for every band width, via ONE Spark action —
    each width's fingerprint is computed independently by the engine
    (the property under test), then unioned; a per-width collect would
    pay ~9 Spark jobs per hypothesis example."""
    from functools import reduce

    from pyspark.sql import functions as F

    from weatherapi_data_engineering_project_spark.operators.dedup import (
        simhash_signatures,
    )

    df = spark.createDataFrame(
        list(enumerate(docs)), ["doc_id", "text"]
    )
    frames = [
        simhash_signatures(df, "text", "doc_id", n_bits=4 * w).select(
            F.lit(w).alias("w"), "doc", "bits"
        )
        for w in widths
    ]
    out: dict[int, dict] = {w: {} for w in widths}
    for r in reduce(lambda a, b: a.unionByName(b), frames).collect():
        out[r["w"]][r["doc"]] = r["bits"]
    return out


def test_salted_block_prefix_stability_property(spark):
    """Property behind the q289/q290/q287 prefix-slicing trick and the
    q28 floor guarantee (VERDICT r11 #6): for random word docs and
    every band width w ∈ {8..16}, the 4·w-bit fingerprint's first 32
    bits ARE the fixed-32 fingerprint (bit i depends only on md5 block
    i//32 — block 0 unsalted, blocks j ≥ 1 salted 'j§'||shingle), and
    floor-width band membership sliced from ANY wider fingerprint is
    invariant. Hypothesis drives the doc corpus; widths are swept
    exhaustively per example (a sampled width would leave untested
    widths per run)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    docs_strategy = st.lists(
        st.lists(
            st.sampled_from(_VOCAB), min_size=3, max_size=10
        ).map(" ".join),
        min_size=2,
        max_size=5,
    )

    @settings(
        max_examples=4,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(docs=docs_strategy)
    def prop(docs):
        widths = list(range(8, 17))
        sigs = _sigs_all_widths(spark, docs, widths)
        base = sigs[8]   # 4·8 = 32 bits — the historical fixed width
        wide = sigs[16]  # the widest grid cell
        assert set(wide) == set(base) and base
        for w in widths:
            for doc, bits in sigs[w].items():
                assert len(bits) == 4 * w
                # prefix-stability against BOTH neighbours: the fixed-32
                # fingerprint and the widest fingerprint
                assert bits[:32] == base[doc]
                assert wide[doc][: 4 * w] == bits
                # floor-width band membership is invariant when sliced
                # from any wider fingerprint (the q289 slicing trick)
                floor_bands = [
                    base[doc][8 * b : 8 * b + 8] for b in range(4)
                ]
                sliced = [bits[8 * b : 8 * b + 8] for b in range(4)]
                assert sliced == floor_bands

    prop()


def test_scaled_bloom_m_rule_and_sql_twin():
    """q108's Bloom width rule: m = 1 << max(8, ⌈log2 n⌉ + 2) — the
    256-bit floor holds through 64 build keys (every test-scale build
    side), m ∈ [4n, 8n) beyond so the fill factor (k=3 seeds) stays
    ≤ 3/4 and the FPR never saturates; the oracle's bcfg CTE derives
    the identical value from COUNT(*) (DuckDB-evaluated here across
    the floor boundary and decade points)."""
    import duckdb

    from weatherapi_data_engineering_project_spark.plans.layout import (
        scaled_bloom_m,
    )

    assert scaled_bloom_m(1) == 256
    assert scaled_bloom_m(12) == 256   # sf0.01/sf0.1 build side
    assert scaled_bloom_m(64) == 256   # last floor build side
    assert scaled_bloom_m(65) == 512
    assert scaled_bloom_m(1000) == 4096
    assert scaled_bloom_m(2_000_000_000) == 2**33
    con = duckdb.connect()
    for n in (1, 2, 63, 64, 65, 128, 129, 1000, 10**6, 2 * 10**9):
        m_sql = con.execute(
            "SELECT (1 << GREATEST(8, LENGTH(bin(GREATEST("
            f"(SELECT COUNT(*) FROM range({n})), 2) - 1)) + 2))"
        ).fetchone()[0]
        assert m_sql == scaled_bloom_m(n), n
        # occupancy band above the floor: 4n <= m < 8n
        if scaled_bloom_m(n) > 256:
            assert 4 * n <= scaled_bloom_m(n) < 8 * n


def test_capped_recall_audit_dominated_by_uncapped(spark):
    """q298 (capped) against q294 (uncapped) on the same corpus: truth
    is IDENTICAL (brute hamming, no banding), so per hamming distance
    n_true must match exactly and the cap can only LOSE candidates
    (n_found ≤ uncapped). The uncapped pigeonhole guarantee (recall
    1.0 at hamming ≤ 3 with 4 bands) must still hold — it is the
    baseline the cap's price is measured against."""
    from weatherapi_data_engineering_project_spark.plans.llm import (
        q294_simhash_recall_audit,
        q298_simhash_capped_recall_audit,
    )

    u = {
        r["hamming"]: r
        for r in q294_simhash_recall_audit(spark, SF_DIR).collect()
    }
    c = {
        r["hamming"]: r
        for r in q298_simhash_capped_recall_audit(spark, SF_DIR).collect()
    }
    assert set(c) == set(u) and u
    for h, ur in u.items():
        assert c[h]["n_true"] == ur["n_true"]
        assert c[h]["n_found"] <= ur["n_found"]
        if h <= 3:
            assert ur["recall"] == 1.0


def test_ivf_sizing_tuner_mechanics(spark):
    """q297's measured-winner mechanics at the floor corpus: the grid
    is {16, 32} (the halved cell collapses into the floor), derived
    marks the rule's 16/2 cell, exactly one cell is chosen, and —
    since neither cell clears the 0.9 ANN floor under the
    deterministic quantizer at this corpus — the winner is the
    max-recall cell (the honest fallback), with candidate volume
    strictly SMALLER at the wider cell (finer lists = fewer rows per
    probe, the whole point of deriving nlist)."""
    from weatherapi_data_engineering_project_spark.plans.corpus import (
        q297_ivf_sizing_tuner,
    )

    rows = {
        r["config"]: r
        for r in q297_ivf_sizing_tuner(spark, SF_DIR).collect()
    }
    assert set(rows) == {"ivf16x2", "ivf32x3"}
    assert rows["ivf16x2"]["derived"] == 1
    assert rows["ivf32x3"]["derived"] == 0
    assert sum(r["chosen"] for r in rows.values()) == 1
    assert all(r["meets_floor"] == 0 for r in rows.values())
    best = max(rows.values(), key=lambda r: r["recall"])
    assert best["chosen"] == 1
    assert (
        rows["ivf32x3"]["n_candidates"] < rows["ivf16x2"]["n_candidates"]
    )


def test_exact_topk_prefilter_lossless_property(spark):
    """The production ANN re-rank prefilter
    (``_exact_topk_from_candidates``, late r12 — now the tail of
    q27/q30/q60/q297) must be bit-identical to decimal-scoring EVERY
    candidate. Hypothesis corpora from a tiny integer domain force the
    adversarial paths on purpose: duplicate vectors create exact
    cosine ties (the id tiebreak and the ±2e-6 margin band both
    engage), and k can exceed a query's candidate count (the NULL
    k-th-double vacuous-margin path). The reference arm is the exact
    pre-r12 plan: decimal fold on all pairs, one ranking window."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from weatherapi_data_engineering_project_spark.operators.similarity import (
        _dot_arrays,
        _exact_topk_from_candidates,
        _norm2_array,
        _score,
    )

    @settings(
        max_examples=3,
        deadline=None,
        suppress_health_check=list(HealthCheck),
    )
    @given(
        vecs=st.lists(
            st.lists(
                st.integers(min_value=-2, max_value=2),
                min_size=3,
                max_size=3,
            ),
            min_size=2,
            max_size=9,
        ),
        k=st.integers(min_value=1, max_value=4),
    )
    def run(vecs, k):
        # trailing constant component: no zero vectors, denser ties
        rows = [(i, [float(x) for x in v] + [1.0]) for i, v in enumerate(vecs)]
        e = spark.createDataFrame(
            rows, "vec_id: long, embedding: array<double>"
        )
        qv = e.select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
        )
        cv = e.select(
            F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
        )
        cands = (
            qv.select("qid")
            .crossJoin(cv.select("cid"))
            .filter(F.col("qid") != F.col("cid"))
        )
        got = sorted(
            map(tuple, _exact_topk_from_candidates(cands, qv, cv, k).collect())
        )
        cos = _score(
            _dot_arrays(F.col("qvec"), F.col("cvec")),
            _norm2_array(F.col("qvec")),
            _norm2_array(F.col("cvec")),
        )
        ref = (
            cands.join(qv, "qid")
            .join(cv, "cid")
            .select(
                F.col("qid").alias("query_id"),
                F.col("cid").alias("vec_id"),
                cos.alias("cosine"),
            )
            .withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("query_id").orderBy(
                        F.col("cosine").desc(), F.col("vec_id")
                    )
                ),
            )
            .filter(F.col("rn") <= k)
        )
        want = sorted(map(tuple, ref.collect()))
        assert got == want

    run()


def test_neardup_ride_join_shape_equivalence(spark, monkeypatch):
    """The corpus-derived join-shape switch (late r12,
    ``_VECTOR_BROADCAST_MAX_ROWS``) must be a pure PLAN choice: forcing
    the above-threshold ride-along shape (vectors enter the band/cell
    self-join, shuffle-hash, flood streamed) on a small corpus must
    reproduce the broadcast-lookup path's rows exactly, for both
    cosine_neardup_pairs and semantic_dedup. Guards the 100×-safe
    shape against semantic drift from the historical plan."""
    from pyspark.sql import functions as F

    import weatherapi_data_engineering_project_spark.operators.similarity as S

    e = spark.range(0, 200).select(
        F.col("id").alias("vec_id"),
        F.array(
            (F.col("id") % 7).cast("double"),
            ((F.col("id") * 3) % 5).cast("double"),
            F.lit(1.0),
            (F.col("id") % 2).cast("double"),
        ).alias("embedding"),
    )
    small_pairs = sorted(
        map(tuple, S.cosine_neardup_pairs(e, threshold=0.9).collect())
    )
    small_dedup = sorted(
        map(
            tuple,
            S.semantic_dedup(
                e, n_clusters=4, n_iters=2, threshold=0.9
            ).collect(),
        )
    )
    assert small_pairs, "fixture produced no near-dup pairs"

    monkeypatch.setattr(S, "_VECTOR_BROADCAST_MAX_ROWS", 10)
    big_pairs = sorted(
        map(tuple, S.cosine_neardup_pairs(e, threshold=0.9).collect())
    )
    big_dedup = sorted(
        map(
            tuple,
            S.semantic_dedup(
                e, n_clusters=4, n_iters=2, threshold=0.9
            ).collect(),
        )
    )
    assert big_pairs == small_pairs
    assert big_dedup == small_dedup


def test_packed_word_hamming_equals_string_hamming(spark):
    """The late-r12 SimHash verifier computes hamming as
    Σ bit_count(xor) over per-band longs packed with conv(bits, 2, 10)
    — pin it against the definitional per-character count on
    adversarial fingerprints: all-zero bands (leading-zero conv),
    all-one bands, single-bit diffs at both ends, and random strings
    at every deployed band width."""
    import random

    from functools import reduce as _reduce

    from pyspark.sql import functions as F

    rng = random.Random(12)
    rows = []
    for w in (8, 12, 16, 24):
        cases = [
            ("0" * w, "0" * w),
            ("1" * w, "1" * w),
            ("0" * w, "1" * w),
            ("1" + "0" * (w - 1), "0" * w),
            ("0" * (w - 1) + "1", "0" * w),
        ] + [
            (
                "".join(rng.choice("01") for _ in range(w)),
                "".join(rng.choice("01") for _ in range(w)),
            )
            for _ in range(10)
        ]
        rows += [(w, x, y) for x, y in cases]
    df = spark.createDataFrame(rows, "w: int, bits1: string, bits2: string")
    packed = (
        F.bit_count(
            F.conv("bits1", 2, 10)
            .cast("long")
            .bitwiseXOR(F.conv("bits2", 2, 10).cast("long"))
        )
    ).alias("ham_packed")
    got = df.select(
        "w", "bits1", "bits2", packed,
    ).collect()
    for r in got:
        want = sum(a != b for a, b in zip(r.bits1, r.bits2))
        assert r.ham_packed == want, (r.w, r.bits1, r.bits2, r.ham_packed)
