"""Deduplication operators for large-scale training-data pipelines.

Engine extensions beyond the reference (SURVEY.md §2.I): exact dedup,
n-gram Jaccard near-dup, and MinHash+LSH near-dup. All pure DataFrame
compositions — no Python in the hot path.

Scale design (the 100 TB story):
- exact_dedup shuffles 16-byte md5 keys, never document bodies.
- jaccard_pairs is the *verifier*: quadratic in the worst case, so it
  must only ever see candidate pairs. Running it standalone (as the
  oracle does at sf0.01) is for correctness only.
- minhash_lsh_pairs is the scale path: signatures are a fixed-width
  aggregation over exploded shingles (map-side partial min), candidate
  generation is an equi-join on band keys (shuffle on small band-key
  strings), and only candidates reach the Jaccard verifier. This is
  the standard shingle→minhash→band→bucket-join pipeline, expressed so
  Catalyst/AQE handle skewed buckets (hot bands) with skew-join
  splitting.

The MinHash family here is md5-keyed: sig_i = MIN(md5(i || '§' ||
shingle)). md5 acts as the random permutation; min over hex strings is
total-ordered and engine-independent, which makes the whole pipeline
differentially testable against ANSI SQL (no engine-specific hash()).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from ..caching import checkpoint_tracked, persist_tracked

from ..functions.text import fingerprint, shingles, tokens

N_HASHES = 8
N_BANDS = 4  # 2 rows per band

from .similarity import (  # noqa: E402 — shared integer log rule + memo
    ceil_log2,
    corpus_row_count,
)


def scaled_rows_per_band(n_docs: int, floor: int = 2) -> int:
    """Corpus-derived MinHash band depth (hashes per band).

    A band of r minhashes collides for an unrelated pair with
    probability ≈ J_bg^r, so false-candidate mass per band is
    ~C(n,2)·J_bg^r — quadratic in n unless r grows with log n. With
    the corpus-typical background shingle Jaccard J_bg ≲ 1/8 (3 bits
    per extra hash), keeping that mass ≤ ~2^7·n needs
    r ≥ (log2 n − 7)/3, i.e. ``max(floor, (⌈log2 n⌉ − 5) // 3)`` —
    the integer identity (x+2)//3 = ⌈x/3⌉ applied to x = ⌈log2 n⌉−7:
    500→2, 5k→2, 50k→3, 2·10^9→8. Same shape as
    similarity.scaled_band_bits (sign-LSH learned this the measured
    way: BENCH_SCALE_r09's 20.5×-at-10× q93); recall per extra hash is
    measured by q288 and the q290 sizing grid. The SQL twin derives r
    as ``GREATEST(2, (LENGTH(bin(COUNT(*) - 1)) - 5) // 3)``.
    NOTE: the static 8-hash × 4-band oracle fragments (_SIG_MIN /
    _BAND_LIST in plans/llm.py) assume r = 2, which this rule yields
    for every corpus up to 2^13 docs — q25's oracle derives r
    dynamically and stays exact at any scale."""
    return max(floor, (ceil_log2(n_docs) - 5) // 3)

# SimHash: banded into N_SIM_BANDS chunks for candidate blocking. The
# fingerprint WIDTH is corpus-derived by default (scaled_simhash_band_bits);
# N_SIM_BITS is the legacy explicit-width default for direct callers and
# the width every corpus up to 2^15 docs derives anyway.
N_SIM_BITS = 32
N_SIM_BANDS = 4


def scaled_simhash_band_bits(n_docs: int, floor: int = 8) -> int:
    """Corpus-derived SimHash bits-per-band (VERDICT r10 #1 — the last
    fixed-width LSH surface).

    A band of w fingerprint bits has 2^w distinct values, so an
    UNRELATED pair collides on a given band with probability ~2^-w
    (sign bits of independent hyperplane votes are ~uniform for
    unrelated docs) and the banded self-join's false-candidate mass is
    ~C(n,2)·n_bands/2^w — quadratic in n at any fixed w. That is
    exactly the shape BENCH_SCALE_r09 measured on q93's fixed-width
    sign-LSH (20.5× wall at 10× corpus). Keeping expected band-bucket
    occupancy ≤ 2^7 = 128 (the same target as
    similarity.scaled_band_bits) needs w ≥ ⌈log2 n⌉ − 7:
    500→8(floor), 5k→8(floor), 50k→9, 500k→12, 2·10^9→24.

    The band COUNT stays fixed (recall at hamming distance d needs one
    of n_bands bands clean; growing w only sharpens unrelated-pair
    rejection, it does not change the d-vs-n_bands recall trade stated
    in simhash_pairs), so total width n_bits = n_bands · w. The SQL
    twin (plans/llm.simhash_pairs_sql_scaled) derives the same w from
    COUNT(*) via GREATEST(8, LENGTH(bin(COUNT(*) − 1)) − 7)."""
    return max(floor, ceil_log2(n_docs) - 7)


def scaled_stop_bucket_cap(n_docs: int, band_bits: int) -> int:
    """Derived stop-bucket cap for simhash_pairs(max_bucket_size=...):
    TWICE the uniform expected band-bucket occupancy, 2·⌈n/2^w⌉.

    The width rule bounds candidate mass under ~uniform buckets; the
    measured skew (BENCH_SCALE_r11::simhash_candidate_mass: 5× the
    uniform collision mass at 10× docs) concentrates in buckets far
    above the expectation — band values acting as stopwords of the
    fingerprint space. Anything past 2× the uniform expectation is,
    by Poisson tail, dominated by correlated-bit pileup rather than
    genuine near-dup clusters, and one bucket of size c costs C(c,2)
    pairs. Integer-exact SQL twin:
    ``2 * ((COUNT(*) + (1 << w) - 1) // (1 << w))`` (the inner
    parens matter: ``*`` and ``//`` are same-precedence left-assoc in
    SQL)."""
    return 2 * -(-int(n_docs) // (1 << band_bits))


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Group by content fingerprint; keep min-id representative.

    Returns (fingerprint, representative id, duplicate count).
    """
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("representative"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


def shingle_sets(df: DataFrame, text_col: str, id_col: str, k: int = 3) -> DataFrame:
    """(id, shingle) exploded distinct-shingle rows + per-doc set size.

    Two deliberate plan shapes:
    - tokenization is materialized behind its own projection so the
      regex split runs once per row — inlining it into the shingle
      lambda would re-evaluate it per shingle position (CollapseProject
      keeps non-cheap expressions separated, which we rely on);
    - thin inputs (a single parquet footer's worth of docs arrives as
      1 partition) are repartitioned up to the session's parallelism
      before the CPU-heavy shingling; wide inputs are left alone — at
      real scale the scan already has enough splits and a blind
      repartition would be a full shuffle of the corpus.
    """
    n_par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < n_par:
        df = df.repartition(n_par)
    toks = df.select(F.col(id_col).alias("doc"), tokens(text_col).alias("toks"))
    sh = toks.select("doc", shingles(F.col("toks"), k).alias("sh"))
    # explode_outer, NOT explode: plain explode makes Catalyst's
    # InferFiltersFromGenerate synthesize a size(sh)>0 scan filter with
    # the whole tokenize+shingle chain inlined — the pipeline would run
    # 3x, partly below the repartition (single-threaded). explode_outer
    # infers nothing; the post-Generate null filter is a cheap column
    # test and drops the same zero-shingle docs.
    return (
        sh.select("doc", F.size("sh").alias("n_sh"), F.explode_outer("sh").alias("shingle"))
        .filter(F.col("shingle").isNotNull())
    )


def jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float,
    k: int = 3,
    candidates: DataFrame | None = None,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """All-pairs (or candidate-restricted) shingle-set Jaccard ≥ threshold.

    Output: (id1, id2, jaccard). With ``candidates`` (id1, id2) given,
    only those pairs are scored — the LSH fast path. ``max_doc_freq``
    caps the blow-up of the all-pairs path: see cap_shingle_doc_freq.
    """
    ex = shingle_sets(df, text_col, id_col, k)
    # Both join sides (and, on the LSH path, the signature build too)
    # read the exploded shingles; without a persist the whole
    # tokenize+shingle pipeline re-runs per consumer — Spark reuses
    # exchanges only for identical subplans, and these projections
    # differ. MEMORY_AND_DISK: at corpus scale the explode output can
    # exceed memory; spilling beats recomputing.
    ex = persist_tracked(ex)
    return jaccard_from_shingles(ex, threshold, candidates, max_doc_freq)


def cap_shingle_doc_freq(ex: DataFrame, max_doc_freq: int) -> DataFrame:
    """Drop shingles present in more than ``max_doc_freq`` documents and
    recompute per-doc set sizes — "df-capped Jaccard".

    This is the standard guard on the all-pairs shingle self-join: a
    single hot shingle (a stopword trigram) contributes O(df²) joined
    rows, so one pathological token can dwarf the rest of the corpus.
    High-df shingles carry almost no pairwise signal (they match
    everything), so capping changes scores marginally while bounding
    the join at max_doc_freq² per shingle. Well-defined semantics —
    Jaccard over the capped shingle sets — which the SQL oracle mirrors
    exactly. The hot-shingle list is df-filtered and tiny, so AQE
    broadcasts the anti-join side.
    """
    kept = _capped_shingles(ex, max_doc_freq)
    # one int per doc via map-side-combined groupBy, joined back — NOT a
    # full-frame window: count().over(partitionBy(doc)) shuffles AND
    # sorts every kept shingle row, while this ships one partial count
    # per (task, doc) and AQE broadcasts the doc-size frame.
    sizes = kept.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))
    return kept.join(sizes, on="doc").select("doc", "n_sh", "shingle")


def _capped_shingles(ex: DataFrame, max_doc_freq: int) -> DataFrame:
    """(doc, shingle) rows with df-capped shingles removed; reads the
    (persisted) shingle frame twice — once for the hot-list aggregate,
    once for the anti-join — instead of re-exploding the corpus."""
    hot = (
        ex.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df_ct"))
        .filter(F.col("df_ct") > max_doc_freq)
        .select("shingle")
    )
    return ex.select("doc", "shingle").join(hot, on="shingle", how="left_anti")


def jaccard_from_shingles(
    ex: DataFrame,
    threshold: float,
    candidates: DataFrame | None = None,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Jaccard scoring over a prebuilt (doc, n_sh, shingle) frame."""
    if candidates is None and max_doc_freq is not None:
        # df-capped all-pairs (q24): score WITHOUT carrying set sizes
        # through the self-join. The capped n_sh is a partial-agg
        # groupBy (one int per doc) joined onto the pair aggregate at
        # the end — the r02 shape instead recomputed it with a
        # count().over(partitionBy(doc)) window that shuffled and
        # sorted the whole kept shingle frame before the join
        # (VERDICT r02 #5: q24's 1.9x regression).
        kept = persist_tracked(_capped_shingles(ex, max_doc_freq))
        sizes = kept.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))
        inter = (
            kept.select(F.col("doc").alias("id1"), "shingle")
            .join(kept.select(F.col("doc").alias("id2"), "shingle"), on="shingle")
            .filter(F.col("id1") < F.col("id2"))
            .groupBy("id1", "id2")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
        scored = inter.join(
            sizes.select(F.col("doc").alias("id1"), F.col("n_sh").alias("n1")),
            on="id1",
        ).join(
            sizes.select(F.col("doc").alias("id2"), F.col("n_sh").alias("n2")),
            on="id2",
        )
        jac = F.col("inter").cast("double") / (
            F.col("n1") + F.col("n2") - F.col("inter")
        )
        return scored.select("id1", "id2", jac.alias("jaccard")).filter(
            F.col("jaccard") >= threshold
        )
    a = ex.select(
        F.col("doc").alias("id1"), F.col("n_sh").alias("n1"), "shingle"
    )
    b = ex.select(
        F.col("doc").alias("id2"), F.col("n_sh").alias("n2"), "shingle"
    )
    if candidates is not None:
        # Candidate-restricted path (the LSH fast path): drive the join
        # FROM the candidate pairs so the quadratic hot-shingle self-join
        # never materializes — cost is O(|candidates| × shingles/doc),
        # not O(Σ per-shingle doc-count²). No broadcast hint: at corpus
        # scale the candidate-pair set can exceed driver/broadcast
        # limits; AQE broadcasts it at runtime whenever it IS small,
        # which a hard hint would force even when it isn't.
        cand = candidates.select("id1", "id2").distinct()
        joined = (
            cand.join(a, on="id1")
            .join(b, on=["id2", "shingle"])
        )
    else:
        joined = a.join(b, on="shingle").filter(F.col("id1") < F.col("id2"))
    inter = joined.groupBy("id1", "id2", "n1", "n2").agg(
        F.count(F.lit(1)).alias("inter")
    )
    jac = F.col("inter").cast("double") / (
        F.col("n1") + F.col("n2") - F.col("inter")
    )
    return (
        inter.select("id1", "id2", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, k: int = 3, n_hashes: int = N_HASHES
) -> DataFrame:
    """Per-doc MinHash signature: sig_i = MIN(md5(i || '§' || shingle)).

    One explode + one groupBy with n_hashes MIN aggregates — partial
    (map-side) min makes the shuffle carry only n_hashes × 32-byte
    strings per doc regardless of document size.
    """
    ex = shingle_sets(df, text_col, id_col, k)
    return minhash_signatures_from_shingles(ex, n_hashes)


def minhash_signatures_from_shingles(
    ex: DataFrame, n_hashes: int = N_HASHES
) -> DataFrame:
    """Signature build over a prebuilt (doc, n_sh, shingle) frame."""
    aggs = [
        F.min(F.md5(F.concat_ws("§", F.lit(str(i)), F.col("shingle")))).alias(
            f"sig{i}"
        )
        for i in range(n_hashes)
    ]
    return ex.groupBy("doc").agg(*aggs)


def minhash_band_frame(
    sigs: DataFrame, n_bands: int = N_BANDS, n_hashes: int = N_HASHES
) -> DataFrame:
    """(doc, band_idx, band_key) LSH banding frame: each band's
    signature rows hashed into one key, all bands riding ONE
    posexplode (the per-band union-of-joins alternative re-derives the
    signature subplan once per band per join side)."""
    rows_per_band = n_hashes // n_bands
    band_keys = F.array(
        *[
            F.md5(
                F.concat_ws(
                    "|",
                    *[
                        F.col(f"sig{b * rows_per_band + r}")
                        for r in range(rows_per_band)
                    ],
                )
            )
            for b in range(n_bands)
        ]
    )
    return sigs.select(
        "doc", F.posexplode(band_keys).alias("band_idx", "band_key")
    )


def minhash_band_candidates(
    sigs: DataFrame, n_bands: int = N_BANDS, n_hashes: int = N_HASHES
) -> DataFrame:
    """LSH banding: docs sharing any band key become candidate pairs
    (id1 < id2, distinct), via one (band_idx, band_key) equi-join."""
    bands = minhash_band_frame(sigs, n_bands, n_hashes)
    lhs = bands.select(F.col("doc").alias("id1"), "band_idx", "band_key")
    rhs = bands.select(F.col("doc").alias("id2"), "band_idx", "band_key")
    return (
        lhs.join(rhs, on=["band_idx", "band_key"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .distinct()
    )


def simhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    n_bits: int = N_SIM_BITS,
) -> DataFrame:
    """Per-doc SimHash bitstring (Charikar): bit i of each shingle's md5
    votes +1/-1; the sign of the per-bit vote sum is fingerprint bit i.

    Bit i of a shingle hash = (hex digit i%32 of the shingle's md5
    BLOCK i//32) >= '8' — the top bit of each nibble, identical and
    deterministic in any engine. One md5 yields 32 bits; wider
    fingerprints (the corpus-derived widths at scale) extend with
    salted blocks md5('j§' || shingle), j = i//32 ≥ 1 — block 0 stays
    the unsalted md5 so every width ≤ 32 produces bit-identical
    fingerprints to the original fixed-width scheme. The per-doc
    reduction is ONE groupBy with n_bits integer SUMs: map-side
    partial aggregation means the shuffle carries n_bits ints per doc,
    never shingles — the same 100 TB shape as MinHash.
    Returns (doc, bits) with bits a fixed-width '0'/'1' string.
    """
    ex = shingle_sets(df, text_col, id_col, k)
    # Pack each 8-hex-char chunk of the md5 blocks into a long ONCE
    # per shingle; "hex digit i >= '8'" is then an integer bit test
    # (bit (7 - i%8)*4 + 3 of word i//8) — ⌈n_bits/8⌉ conv calls +
    # n_bits codegen'd shift/ands per row instead of n_bits substring
    # allocations. The SQL oracle keeps the substring formulation; the
    # bits are identical.
    def _md5_block(j: int):
        if j == 0:
            return F.md5("shingle")
        return F.md5(F.concat(F.lit(f"{j}§"), F.col("shingle")))

    n_words = (n_bits + 7) // 8
    hx = ex.select(
        "doc",
        *[
            F.conv(
                F.substring(_md5_block(w // 4), (w % 4) * 8 + 1, 8), 16, 10
            )
            .cast("long")
            .alias(f"w{w}")
            for w in range(n_words)
        ],
    )
    aggs = [
        F.sum(
            F.shiftright(F.col(f"w{i // 8}"), (7 - i % 8) * 4 + 3).bitwiseAND(
                F.lit(1)
            )
            * 2
            - 1
        ).alias(f"s{i}")
        for i in range(n_bits)
    ]
    sums = hx.groupBy("doc").agg(*aggs)
    bits = F.concat(
        *[
            F.when(F.col(f"s{i}") >= 0, F.lit("1")).otherwise(F.lit("0"))
            for i in range(n_bits)
        ]
    )
    return sums.select("doc", bits.alias("bits"))


def simhash_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 6,
    k: int = 3,
    n_bits: int | None = None,
    n_bands: int = N_SIM_BANDS,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """SimHash near-dup pairs: hamming(bits1, bits2) <= max_hamming.

    Candidate blocking is standard simhash banding — split the
    fingerprint into n_bands contiguous chunks and equi-join per
    (band_idx, band_value); a pair within hamming d of each other on
    n_bits bits must agree exactly on >= n_bands - d bands, so recall
    is 100% whenever max_hamming < n_bands (pigeonhole); above that it
    is the usual probabilistic LSH trade. The verifier compares only
    candidate pairs, never all pairs. Output: (id1, id2, hamming).

    n_bits=None (the default) derives the width from the corpus:
    n_bands · scaled_simhash_band_bits(count) — band-bucket occupancy
    stays ~128 so banded false-candidate mass is linear in n instead
    of ~n²·n_bands/2^(n_bits/n_bands) at a fixed width (the q93
    failure shape, BENCH_SCALE_r09). The count comes from the memoized
    corpus_row_count, so repeated plan builds over the same lake files
    pay no extra job. Pass n_bits explicitly to pin a width.

    max_bucket_size (opt-in, the stop-bucket cap): drop every
    (band_idx, band_value) bucket holding more than this many docs
    from CANDIDATE GENERATION. The width rule sizes for ~uniform
    buckets, but SimHash band bits on natural text are correlated, so
    real bucket distributions are skewed — BENCH_SCALE_r11's curve
    measured 5× the uniform collision mass at 10× docs, concentrated
    in hot buckets (q295 is the per-corpus instrument). A bucket of
    size c costs C(c,2) candidate pairs while carrying almost no
    near-dup signal (its band value is effectively a stopword of the
    fingerprint space); capping trades those pairs away — a pair
    dropped from a hot bucket is still found through any of its other
    n_bands − 1 bands, so recall degrades gracefully rather than
    cliff-dropping (q296's audit measures the price). Deterministic
    and oracle-replicable: the cap is a plain filter on the bucket
    histogram, not sampling.
    """
    if n_bits is None:
        n_bits = n_bands * scaled_simhash_band_bits(corpus_row_count(df))
    w = n_bits // n_bands
    # one fingerprint row per doc; persisted because both band-join
    # sides read it and the shingle pipeline behind it is expensive
    sigs = persist_tracked(simhash_signatures(df, text_col, id_col, k, n_bits))
    band_arr = F.array(*[F.substring("bits", b * w + 1, w) for b in range(n_bands)])
    # per-band fingerprint words (w ≤ 63 bits each): hamming between
    # two docs is Σ bit_count(xor) over the n_bands word pairs — a few
    # codegen'd integer ops per candidate instead of n_bits substring
    # comparisons (late r12, what makes streaming the duplicated flood
    # through the verifier cheaper than deduping it first)
    word_arr = F.array(
        *[
            F.conv(F.substring("bits", b * w + 1, w), 2, 10).cast("long")
            for b in range(n_bands)
        ]
    )
    bands = sigs.select(
        "doc",
        word_arr.alias("fw"),
        F.posexplode(band_arr).alias("band_idx", "band_val"),
    )
    if max_bucket_size is not None:
        # stop-bucket filter: the keep-list is the bucket HISTOGRAM
        # (one row per occupied bucket — broadcast-tiny at sampling
        # scale; at the 2e9-doc design point it is up to
        # n_bands * 2^w ≈ 6.7e7 rows, where the unhinted left-semi
        # join is an ordinary co-partitioned shuffle on the same
        # (band_idx, band_val) key the candidate join shuffles on
        # anyway — AQE picks broadcast vs shuffle from runtime size)
        keep = (
            bands.groupBy("band_idx", "band_val")
            .agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") <= max_bucket_size)
            .select("band_idx", "band_val")
        )
        bands = bands.join(keep, ["band_idx", "band_val"], "left_semi")
    a = bands.select(
        F.col("doc").alias("id1"), F.col("fw").alias("fw1"), "band_idx", "band_val"
    )
    b = bands.select(
        F.col("doc").alias("id2"), F.col("fw").alias("fw2"), "band_idx", "band_val"
    )
    # NO distinct on the raw flood (late r12 — the signlsh convention,
    # signlsh_band_candidates' docstring): a pair matching in m bands
    # appears m times, and deduping HERE would shuffle every candidate
    # row with BOTH fingerprints attached. Instead every duplicate
    # pays the (now trivial) hamming fold in the join's output stage,
    # and the distinct runs on the ≤ max_hamming SURVIVORS —
    # identical rows, near-dup-sized shuffle.
    cand = (
        a.join(b, on=["band_idx", "band_val"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "fw1", "id2", "fw2")
    )
    ham = reduce(
        lambda x, y: x + y,
        [
            F.bit_count(
                F.col("fw1")[i].bitwiseXOR(F.col("fw2")[i])
            ).cast("int")
            for i in range(n_bands)
        ],
    )
    return (
        cand.select("id1", "id2", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# The per-round label join carries NO broadcast hint (VERDICT r02 #6).
# Label frames are usually "node-sized" (the set of PAIRED docs, tiny
# next to the corpus), but the node set grows with duplication: a
# duplicate-heavy 100 TB corpus can pair billions of docs, and
# hard-broadcasting a billion-row frame OOMs the driver and every
# executor. An unhinted join lets AQE broadcast from RUNTIME size when
# the frame proves small and shuffle when it doesn't — and measured
# FASTER than the hint even on tiny frames (the hint forces a fresh
# BroadcastExchange build every round; see also kmeans_centroids'
# literal-vs-broadcast note).


def _labels_for_join(labels: DataFrame):
    return labels.select(F.col("id").alias("b"), F.col("rep").alias("nrep"))


# ~16-byte (long, long) label rows: 1M rows/partition ≈ a few tens of
# MB per task — comfortably in-memory, large enough to amortize task
# startup. Tests shrink this to observe the scaling on tiny graphs.
_LABEL_ROWS_PER_SLOT = 1_000_000


def _label_slots(e: DataFrame, rows_per_slot: int | None = None) -> int:
    """Partition count for the node-sized label frames (VERDICT r03 #2).

    A fixed ``coalesce(16)`` is right at bench scale (avoids hundreds
    of near-empty tasks per round under a wide session) but caps the
    whole clustering at 16-way parallelism — a duplicate-heavy 100 TB
    corpus has billions of paired docs. Scale the slot count with the
    EDGE count instead (nodes <= 2·edges, so edges bound the label
    frame): ceil(edges / rows_per_slot), clamped to
    [min(16, defaultParallelism), max(that, shuffle width)]. Tiny
    graphs keep today's 16; billion-edge graphs widen to the session's
    shuffle width. ``e`` is already persisted by both callers, so the
    scalar count here just front-loads a materialization every round
    reuses.
    """
    rps = rows_per_slot or _LABEL_ROWS_PER_SLOT
    spark = e.sparkSession
    sc = spark.sparkContext
    try:
        width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        width = sc.defaultParallelism
    lo = min(16, sc.defaultParallelism)
    hi = max(lo, width)
    want = -(-e.count() // rps)  # ceil-div
    return max(lo, min(want, hi))


def label_propagation_clusters(pairs: DataFrame, rounds: int = 4) -> DataFrame:
    """Cluster near-dup pairs into groups via min-label propagation.

    The missing last step of dedup: pairs say "these two match", the
    pipeline needs GROUPS with one canonical representative to keep.
    Each round every node adopts the minimum label among itself and its
    neighbors; after r rounds labels are exact for components of
    diameter <= r (near-dup components are chains of transitive matches
    — tiny in practice; a production fixpoint loop just adds rounds
    until a convergence check passes, same plan per round).

    ``rounds`` is FIXED, not run-to-fixpoint, so the result is a
    deterministic function of the input that an unrolled SQL oracle can
    replicate exactly. Each round is one join + one groupBy on the
    (small) node set — the corpus itself is never touched.

    Input: (id1, id2, ...) pairs. Output: (doc_id, cluster_rep).
    """
    # e and each round's labels feed TWO consumers in the next round's
    # plan; without per-round lineage truncation the plan tree doubles
    # every round (2^rounds subplans — the classic iterative-algorithm
    # trap). localCheckpoint (eager, node-sized frames) keeps each
    # round one join + one groupBy with a FLAT plan — measured ~2x
    # faster than lazy persist at bench scale, where the nested plan's
    # analysis/codegen overhead dominates the tiny data.
    e = persist_tracked(
        pairs.select(F.col("id1").alias("a"), F.col("id2").alias("b")).unionByName(
            pairs.select(F.col("id2").alias("a"), F.col("id1").alias("b"))
        )
    )
    # label frames are node-sized; without the coalesce each round's
    # frame keeps the session's full shuffle width and the unions
    # accumulate hundreds of near-empty partitions (600 tiny tasks per
    # round under a 200-partition session) — but the slot count must
    # SCALE with the graph, not sit fixed at 16 (_label_slots)
    n_slots = _label_slots(e)
    labels = checkpoint_tracked(
        e.select(F.col("a").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("rep"))
        .coalesce(n_slots)
    )
    for _ in range(rounds):
        # one round = min over {own label} ∪ {neighbors' labels}: one
        # (unhinted — AQE-sized) join + union + grouped MIN — a single
        # exchange per round, no left-join/coalesce chain.
        nbr = e.join(
            _labels_for_join(labels), on="b"
        ).select(F.col("a").alias("id"), F.col("nrep").alias("rep"))
        labels = checkpoint_tracked(
            labels.unionByName(nbr)
            .groupBy("id")
            .agg(F.min("rep").alias("rep"))
            .coalesce(n_slots)
        )
    return labels.select(F.col("id").alias("doc_id"), F.col("rep").alias("cluster_rep"))


def label_propagation_clusters_converged(
    pairs: DataFrame, max_rounds: int = 50
) -> DataFrame:
    """Production variant of label_propagation_clusters: run min-label
    rounds to a FIXPOINT (no label changed) with a max_rounds guard.

    The fixed-rounds version is exact only for components of diameter
    <= rounds; a long chain of transitive near-dups (A~B~C~...~Z) needs
    diameter many rounds. This loop adds a per-round convergence check
    — a single scalar count of changed labels (driver-side scalar,
    not a data collect) — and stops as soon as a round changes nothing,
    so common corpora (tiny diameters) pay 2-3 rounds while adversarial
    chains still resolve exactly. Each round's plan is identical to the
    fixed version: one broadcast label join + grouped MIN.

    min-label propagation converges monotonically (labels only
    decrease, bounded below by the component minimum), so "no change"
    is a true fixpoint, and one round per diameter step is the worst
    case — max_rounds=50 covers any component of diameter <= 50 and
    bounds runaway cost on degenerate graphs.

    Action-count shape (r12 optimization — the wall at bench scale is
    driver-blocking actions, not data): round 1 over the IDENTITY
    labeling needs neither the init frame nor a join — labels₀(b) = b,
    so round 1's aggregate is min(id ∪ neighbor ids) straight off the
    edge frame, and its convergence check is ``rep != id`` on the
    checkpointed result. Later rounds carry the previous label through
    the aggregation as a second MIN (self rows carry it, neighbor rows
    contribute NULL which MIN ignores; every id has exactly one self
    row), so the changed-count is a filter on the frame the round just
    materialized, never a fresh join job. Two actions per round
    (checkpoint + scan-count) with the init distinct and all per-round
    joins-for-convergence gone; identical labels every round, identical
    fixpoint, identical round count.
    """
    e = persist_tracked(
        pairs.select(F.col("id1").alias("a"), F.col("id2").alias("b")).unionByName(
            pairs.select(F.col("id2").alias("a"), F.col("id1").alias("b"))
        )
    )
    if max_rounds <= 0:
        # parameter contract (ADVICE r12 #1): the guard bounds work to
        # ZERO rounds — the identity labeling, not round-1 labels
        # (round 1 below is computed before the range(max_rounds - 1)
        # loop, so it would otherwise run unconditionally)
        return (
            e.select(F.col("a").alias("doc_id"))
            .distinct()
            .select("doc_id", F.col("doc_id").alias("cluster_rep"))
        )
    n_slots = _label_slots(e)
    # localCheckpoint, not persist: persist caches DATA but the logical
    # plan still nests (labels appears twice per round — once directly,
    # once under the neighbor join), so the plan tree doubles every
    # round and analysis itself OOMs after ~10 rounds. Checkpointing
    # truncates lineage, keeping every round's plan flat. On a real
    # cluster prefer reliable checkpoint() to an HDFS dir (survives
    # executor loss); local mode has no such failure domain.
    labels = checkpoint_tracked(
        e.select(F.col("a").alias("id"), F.col("a").alias("rep"))
        .unionByName(e.select(F.col("a").alias("id"), F.col("b").alias("rep")))
        .groupBy("id")
        .agg(F.min("rep").alias("rep"))
        .coalesce(n_slots)
    )
    changed = labels.filter(F.col("rep") != F.col("id")).count()
    id_type = e.schema["a"].dataType
    for _ in range(max_rounds - 1):
        if changed == 0:
            break
        nbr = e.join(
            _labels_for_join(labels), on="b"
        ).select(
            F.col("a").alias("id"),
            F.col("nrep").alias("rep"),
            F.lit(None).cast(id_type).alias("old"),
        )
        own = labels.select("id", "rep", F.col("rep").alias("old"))
        new_labels = checkpoint_tracked(
            own.unionByName(nbr)
            .groupBy("id")
            .agg(F.min("rep").alias("rep"), F.min("old").alias("old"))
            .coalesce(n_slots)
        )
        changed = new_labels.filter(F.col("rep") != F.col("old")).count()
        labels = new_labels.select("id", "rep")
    return labels.select(
        F.col("id").alias("doc_id"), F.col("rep").alias("cluster_rep")
    )


def incremental_neardup_pairs(
    new_df: DataFrame,
    corpus_df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float,
    k: int = 3,
) -> DataFrame:
    """Incremental dedup — the continuously-ingesting production shape:
    near-dup pairs between an arriving BATCH and the EXISTING corpus
    only, never corpus×corpus. Cost scales with |new| (+ one band-key
    probe of the corpus index), so daily ingestion stays O(day), not
    O(history): shingle/sign the new docs, band-join them against the
    corpus's band frame, exact-Jaccard-verify just the cross
    candidates. In production the corpus's signatures/bands/shingles
    are a precomputed, bucketed-by-band_key index that each batch
    probes; here both sides derive from their input frames.

    Output: (id1 = new doc, id2 = corpus doc, jaccard ≥ threshold).
    Same banding/verification as minhash_lsh_pairs, so a doc that
    would match in the full-corpus run matches here iff its partner
    crosses the batch boundary.
    """
    ex_new = persist_tracked(shingle_sets(new_df, text_col, id_col, k))
    ex_corp = persist_tracked(shingle_sets(corpus_df, text_col, id_col, k))
    bands_new = minhash_band_frame(minhash_signatures_from_shingles(ex_new))
    bands_corp = minhash_band_frame(minhash_signatures_from_shingles(ex_corp))
    cands = (
        bands_new.select(F.col("doc").alias("id1"), "band_idx", "band_key")
        .join(
            bands_corp.select(
                F.col("doc").alias("id2"), "band_idx", "band_key"
            ),
            on=["band_idx", "band_key"],
        )
        .select("id1", "id2")
        .distinct()
    )
    a = ex_new.select(
        F.col("doc").alias("id1"), F.col("n_sh").alias("n1"), "shingle"
    )
    b = ex_corp.select(
        F.col("doc").alias("id2"), F.col("n_sh").alias("n2"), "shingle"
    )
    # candidate-driven two-sided verify (same shape as the LSH fast
    # path in jaccard_from_shingles, across two shingle frames)
    inter = (
        cands.join(a, on="id1")
        .join(b, on=["id2", "shingle"])
        .groupBy("id1", "id2", "n1", "n2")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter").cast("double") / (
        F.col("n1") + F.col("n2") - F.col("inter")
    )
    return inter.select("id1", "id2", jac.alias("jaccard")).filter(
        F.col("jaccard") >= threshold
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float,
    k: int = 3,
    n_bands: int = N_BANDS,
    rows_per_band: int | None = None,
) -> DataFrame:
    """Full near-dup pipeline: shingle → minhash → band → candidate join
    → exact Jaccard verification ≥ threshold.

    The exploded shingle frame is built ONCE and persisted: signatures,
    and the Jaccard verifier's two sides, all read it — without the
    persist the tokenize+shingle pipeline re-runs per consumer (Spark
    reuses exchanges only for identical subplans).

    rows_per_band (hashes per band) defaults to CORPUS-DERIVED
    (scaled_rows_per_band of the doc count, probed at plan-build time)
    so false-candidate mass stays ~linear in n — the text-side twin of
    similarity.cosine_neardup_pairs' derived band_bits. Pass an
    explicit value only where the fixed width is the point (q288's
    recall comparator, q174's calibration curve)."""
    if rows_per_band is None:
        rows_per_band = scaled_rows_per_band(corpus_row_count(df))
    n_hashes = n_bands * rows_per_band
    ex = persist_tracked(shingle_sets(df, text_col, id_col, k))
    sigs = minhash_signatures_from_shingles(ex, n_hashes)
    cands = minhash_band_candidates(sigs, n_bands, n_hashes)
    return jaccard_from_shingles(ex, threshold, candidates=cands)


def containment_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float,
    k: int = 3,
    max_doc_freq: int = 100,
) -> DataFrame:
    """Asymmetric containment dedup: C(A ⊆ B) = |shingles(A) ∩
    shingles(B)| / |shingles(A)| — the Broder containment coefficient.
    Symmetric Jaccard misses subset duplication (a short doc embedded
    verbatim in a much longer one scores J = |A|/|B| ≈ 0 while
    C(A ⊆ B) = 1); curation pipelines score both and drop on EITHER.

    Candidates deliberately do NOT come from MinHash banding: the
    banding collision curve is a function of JACCARD, so a contained
    short doc (J ≈ 0, C = 1) would almost never band-collide with its
    container — the one pair class this operator exists to catch.
    Instead candidates are the df-capped shingle equi-join (the q24
    blocking): any pair sharing ≥1 surviving shingle is scored, which
    is containment-complete up to the cap (a contained doc shares ALL
    its shingles, so it survives unless every one of them is hotter
    than max_doc_freq). Semantics are containment over the CAPPED
    shingle sets — well-defined and mirrored exactly by the oracle,
    like df-capped Jaccard. Every pair reports containment BOTH ways
    plus Jaccard; pairs pass when the larger containment direction
    reaches ``threshold``. All ratios round to 6 decimals BEFORE the
    threshold compare, so the cut is engine-identical.

    Scale shape: q24's — the hot-list is a broadcast anti-join, the
    self-join is bounded at max_doc_freq² rows per shingle, sizes are
    one partial-agg int per doc joined at the end, never a window.
    """
    ex = persist_tracked(shingle_sets(df, text_col, id_col, k))
    kept = persist_tracked(_capped_shingles(ex, max_doc_freq))
    sizes = kept.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))
    inter = (
        kept.select(F.col("doc").alias("id1"), "shingle")
        .join(kept.select(F.col("doc").alias("id2"), "shingle"), on="shingle")
        .filter(F.col("id1") < F.col("id2"))
        .groupBy("id1", "id2")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .join(
            sizes.select(F.col("doc").alias("id1"), F.col("n_sh").alias("n1")),
            on="id1",
        )
        .join(
            sizes.select(F.col("doc").alias("id2"), F.col("n_sh").alias("n2")),
            on="id2",
        )
    )
    c12 = F.round(F.col("n_common").cast("double") / F.col("n1"), 6)
    c21 = F.round(F.col("n_common").cast("double") / F.col("n2"), 6)
    jac = F.round(
        F.col("n_common").cast("double")
        / (F.col("n1") + F.col("n2") - F.col("n_common")),
        6,
    )
    return (
        inter.select(
            "id1",
            "id2",
            "n_common",
            c12.alias("c_1_in_2"),
            c21.alias("c_2_in_1"),
            jac.alias("jaccard"),
        )
        .filter(
            F.greatest(F.col("c_1_in_2"), F.col("c_2_in_1"))
            >= F.lit(threshold)
        )
    )


# Bound for broadcasting the per-doc shingle-set frame in the
# prefix-filter verify, in total SHINGLE ROWS — the quantity broadcast
# size actually scales with (ADVICE r12 #4: a doc-count bound lets a
# sub-32k corpus of very long documents blow past the size estimate).
# 2^21 rows × ~20-char shingles ≈ 40 MB serialized — comfortably
# broadcastable; every historical test/bench corpus (sf0.001–sf0.1,
# ≤ ~0.5M shingle rows) sits far under it, so the bench path is
# unchanged. Above the bound the exploded candidate-driven verify
# (thin shuffle rows) runs instead. The count is the memoized
# corpus_row_count of the shingle frame itself — one job on first
# invocation, free after.
_SHINGLE_SET_BROADCAST_MAX_ROWS = 1 << 21


def prefix_filter_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
) -> DataFrame:
    """Set-similarity self-join at SHINGLE-set Jaccard ≥ 1/2 via
    PREFIX FILTERING (Chaudhuri et al. SSJoin / Bayardo AllPairs):
    order each document's shingles globally by (document frequency,
    shingle) — rarest first — and keep only the first
    n − ceil(n/2) + 1 as the document's prefix. Any pair with J ≥ 1/2
    MUST collide on at least one prefix shingle (pigeonhole on the
    overlap bound ceil(n/2)), so the candidate join runs on prefixes
    only; survivors get an exact verify. The third candidate-
    generation strategy in this engine, algorithmically distinct from
    MinHash banding (q25 — probabilistic recall) and df-capped
    blocking (q24/q123 — semantic cap): prefix filtering is LOSSLESS
    at its threshold, with no banding curve and no cap parameter —
    hot shingles sort LAST, so they fall outside most prefixes
    instead of being dropped.

    Exactness: the global order is the total order (df, shingle) — no
    dense rank materializes, so no vocab-sized window exists; the
    verify threshold is the INTEGER compare 3·inter ≥ n1 + n2
    (equivalent to inter/(n1+n2−inter) ≥ 1/2), and the reported
    jaccard is one rounded double of exact integers.

    Scale shape: df counts are one partial agg joined back onto the
    shingle frame; prefix selection is a per-DOC window (narrow,
    keyed by doc); the candidate join is prefix×prefix, and the
    verify join is candidate-driven."""
    ex = persist_tracked(
        shingle_sets(df, text_col, id_col, k).select("doc", "shingle")
    )
    sizes = ex.groupBy("doc").agg(F.count(F.lit(1)).alias("n"))
    dfreq = ex.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_ct"))
    ranked = (
        ex.join(dfreq, "shingle")
        .join(sizes, "doc")
        .select(
            "doc",
            "shingle",
            "n",
            F.row_number()
            .over(
                Window.partitionBy("doc").orderBy("df_ct", "shingle")
            )
            .alias("pos"),
        )
    )
    # persisted: the candidate self-join consumes this frame TWICE and
    # each side would otherwise re-derive the df join + per-doc window
    prefix = persist_tracked(
        ranked.filter(
            F.col("pos")
            <= F.col("n") - ((F.col("n") + 1) / 2).cast("long") + 1
        )
    )
    cands = (
        prefix.select(F.col("doc").alias("id1"), "shingle")
        .join(prefix.select(F.col("doc").alias("id2"), "shingle"), "shingle")
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .distinct()
    )
    # AllPairs length bound, applied BEFORE the shingle-intersection
    # join: J >= 1/2 forces n1/2 <= n2 <= 2*n1 (inter <= min sizes and
    # 3*min >= n1+n2), so asymmetric candidates can be dropped for the
    # cost of two candidate-frame size joins — every pruned pair would
    # have failed the final integer threshold anyway (result-identical;
    # measured ~24% of candidates on the sf0.1 corpus).
    n1 = sizes.select(F.col("doc").alias("id1"), F.col("n").alias("n1"))
    n2 = sizes.select(F.col("doc").alias("id2"), F.col("n").alias("n2"))
    cands = (
        cands.join(n1, "id1")
        .join(n2, "id2")
        .filter(
            (2 * F.col("n1") >= F.col("n2"))
            & (2 * F.col("n2") >= F.col("n1"))
        )
    )
    if corpus_row_count(ex) <= _SHINGLE_SET_BROADCAST_MAX_ROWS:
        # r12 optimization (small-corpus floor, the cosine_neardup_pairs
        # switch convention): the exploded verify materializes
        # |cands| × shingles-per-doc intermediate rows (16M at sf0.1)
        # through a join+groupBy; below the bound the per-doc shingle
        # SETS broadcast instead and the intersection is one row-local
        # codegen'd array_intersect per candidate pair — nothing wide is
        # exchanged, and `inter` is identical (shingle_sets rows are
        # distinct per doc, so |array_intersect| IS the join-count).
        # Measured 4.8 → 2.9 s at sf0.1 with bit-identical output.
        sets = ex.groupBy("doc").agg(F.collect_list("shingle").alias("sh"))
        s1 = F.broadcast(
            sets.select(F.col("doc").alias("id1"), F.col("sh").alias("sh1"))
        )
        s2 = F.broadcast(
            sets.select(F.col("doc").alias("id2"), F.col("sh").alias("sh2"))
        )
        inter = (
            cands.select("id1", "id2", "n1", "n2")
            .join(s1, "id1")
            .join(s2, "id2")
            .select(
                "id1",
                "id2",
                "n1",
                "n2",
                F.size(F.array_intersect("sh1", "sh2")).alias("inter"),
            )
        )
    else:
        # above the broadcast bound the shingle-set frame cannot ship
        # to every task; the candidate-driven exploded join keeps the
        # shuffle thin (pair ids + one shingle per row). Two r13 scale
        # fixes, measured on the 100× instrument (BENCH_SCALE100_r13):
        # (a) n1/n2 are NOT carried through the exploded exchanges —
        #     the |cands|·shingles-per-doc intermediate (~60 rows per
        #     shingle row at every measured scale) shuffles only
        #     (id1, id2, shingle); sizes re-attach to the aggregated
        #     inter frame, which is candidate-sized (guide §2.3).
        # (b) the (id2, shingle) exchange width derives from the
        #     shingle-row count (one partition per ~2^16 shingle rows
        #     ≈ 2^22 exploded rows ≈ 128 MB of thin rows), floored at
        #     the session width so every local/bench plan keeps its
        #     historical shape: at 32 session partitions the 100×
        #     corpus's ~1.6e9-row sort was ~50M rows per task — an
        #     OOM at local heap sizes and a straggler anywhere
        #     (guide §5 "more partitions, smaller per-task state");
        #     the derived width caps at 4096 like scaled_state_width.
        try:
            sess_w = int(
                df.sparkSession.conf.get("spark.sql.shuffle.partitions")
            )
        except Exception:  # pragma: no cover — non-numeric conf
            sess_w = 200
        n_sh = corpus_row_count(ex)
        width = max(sess_w, min(4096, n_sh // (1 << 16)))
        a = ex.select(F.col("doc").alias("id1"), "shingle")
        b = ex.select(F.col("doc").alias("id2"), "shingle")
        inter0 = (
            cands.select("id1", "id2")
            .join(a, "id1")
            .repartition(width, "id2", "shingle")
            .join(b, ["id2", "shingle"])
            .groupBy("id1", "id2")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
        inter = inter0.join(n1, "id1").join(n2, "id2").select(
            "id1", "id2", "n1", "n2", "inter"
        )
    return (
        inter.filter(3 * F.col("inter") >= F.col("n1") + F.col("n2"))
        .select(
            "id1",
            "id2",
            "inter",
            "n1",
            "n2",
            F.round(
                F.col("inter").cast("double")
                / (F.col("n1") + F.col("n2") - F.col("inter")).cast(
                    "double"
                ),
                6,
            ).alias("jaccard"),
        )
    )
