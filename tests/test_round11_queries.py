"""Round-11 unit tests: corpus-derived SimHash width (the last
fixed-width LSH surface, VERDICT r10 #1) and the multi-block md5
fingerprint extension behind it.

The q93 lesson (BENCH_SCALE_r09: 20.5x wall at 10x corpus from a
fixed band width) already fixed sign-LSH and MinHash in round 10;
these tests pin the same treatment for SimHash: the width rule's
integer identities, block-0 backward compatibility of the wider
fingerprints, and the derived-equals-pinned equivalence at test
scale.
"""

from __future__ import annotations

import pytest

from conftest import SF_DIR

from weatherapi_data_engineering_project_spark.operators.dedup import (
    N_SIM_BANDS,
    scaled_simhash_band_bits,
    simhash_pairs,
    simhash_signatures,
)


def test_scaled_simhash_band_bits_rule_points():
    """w = max(8, ceil_log2(n) - 7): bucket occupancy per band stays
    <= 2^7 = 128, same target as similarity.scaled_band_bits, with an
    8-bit floor so every corpus up to 2^15 docs keeps the original
    32-bit fingerprint exactly."""
    assert scaled_simhash_band_bits(60) == 8
    assert scaled_simhash_band_bits(500) == 8  # sf0.001/sf0.01/sf0.1 docs
    assert scaled_simhash_band_bits(32_768) == 8  # last floor corpus
    assert scaled_simhash_band_bits(32_769) == 9
    assert scaled_simhash_band_bits(50_000) == 9  # the 10x scale corpus
    assert scaled_simhash_band_bits(500_000) == 12  # the 100x corpus
    assert scaled_simhash_band_bits(2_000_000_000) == 24  # 100 TB point
    for n in (100, 1_000, 100_000, 10**7):
        w = scaled_simhash_band_bits(n)
        # occupancy bound above the floor; minimality one bit down
        assert 2**w >= n / 128 or w == 8
        if w > 8:
            assert 2 ** (w - 1) < n / 128


@pytest.fixture(scope="module")
def tiny_docs(spark):
    rows = [
        (i, f"alpha beta gamma delta epsilon zeta eta theta doc {i} "
            f"{'common tail words here' if i % 2 else 'other suffix text'}")
        for i in range(24)
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_wider_fingerprint_extends_block_zero(spark, tiny_docs):
    """Multi-block md5 scheme: the first 32 bits of a 64-bit
    fingerprint ARE the 32-bit fingerprint (block 0 is the unsalted
    md5), so every corpus at or below the floor width is bit-identical
    to the original fixed-width scheme."""
    s32 = {
        r["doc"]: r["bits"]
        for r in simhash_signatures(tiny_docs, "text", "doc_id", n_bits=32)
        .collect()
    }
    s64 = {
        r["doc"]: r["bits"]
        for r in simhash_signatures(tiny_docs, "text", "doc_id", n_bits=64)
        .collect()
    }
    assert set(s32) == set(s64) and s32
    for doc, bits in s64.items():
        assert len(bits) == 64
        assert bits[:32] == s32[doc]
        # block 1 is a different hash family, not a repeat of block 0
    assert any(b[32:] != b[:32] for b in s64.values())


def test_simhash_derived_default_equals_pinned_at_test_scale(spark):
    """At sf0.001 (500 docs, under the 2^15 floor) the derived width
    is exactly the legacy 32 bits, so the default-width q28 plan must
    produce the identical pair set to an explicit n_bits=32 run."""
    from weatherapi_data_engineering_project_spark.schemas import load_table

    d = load_table(spark, SF_DIR, "documents")
    derived = sorted(
        tuple(r) for r in simhash_pairs(d, "text", "doc_id", 6).collect()
    )
    pinned = sorted(
        tuple(r)
        for r in simhash_pairs(d, "text", "doc_id", 6, n_bits=32).collect()
    )
    assert derived == pinned and derived


def test_wider_simhash_prunes_candidates_not_semantics(spark, tiny_docs):
    """Growing the width only sharpens unrelated-pair rejection: every
    pair the wide blocking surfaces within max_hamming ON THE SHARED
    PREFIX bits is also surfaced by the narrow blocking (the wide
    verify is over more bits, so compare on the common 32-bit prefix
    via the signatures, not the per-width hamming column)."""
    narrow = {
        (r["id1"], r["id2"])
        for r in simhash_pairs(
            tiny_docs, "text", "doc_id", max_hamming=3, n_bits=32
        ).collect()
    }
    s32 = {
        r["doc"]: r["bits"]
        for r in simhash_signatures(tiny_docs, "text", "doc_id", n_bits=32)
        .collect()
    }
    wide_cands = {
        (r["id1"], r["id2"])
        for r in simhash_pairs(
            tiny_docs, "text", "doc_id", max_hamming=64, n_bits=64
        ).collect()
    }
    ham32 = lambda a, b: sum(x != y for x, y in zip(s32[a], s32[b]))
    wide_within = {
        (a, b) for a, b in wide_cands if ham32(a, b) <= 3
    }
    assert wide_within <= narrow


def test_simhash_derived_width_uses_band_count():
    """The q28 default is n_bands * scaled_simhash_band_bits(count):
    4 bands stay pinned (the hamming-vs-bands recall trade is the
    query's contract), width grows per band."""
    assert N_SIM_BANDS * scaled_simhash_band_bits(500) == 32
    assert N_SIM_BANDS * scaled_simhash_band_bits(50_000) == 36
    assert N_SIM_BANDS * scaled_simhash_band_bits(2_000_000_000) == 96


# --- bounded_interval_counts: the generalized q292 rewrite (r11 #5) ---

import random
from datetime import datetime, timedelta, timezone

from pyspark.sql import functions as F

from weatherapi_data_engineering_project_spark.streaming.windows import (
    bounded_interval_counts,
    bucketed_side_counts,
)

_EPOCH = datetime(2024, 6, 1, tzinfo=timezone.utc)


def _events_df(spark, rows):
    """rows: (event_id, offset_seconds, user_id)."""
    data = [
        (eid, _EPOCH + timedelta(seconds=off), uid) for eid, off, uid in rows
    ]
    return spark.createDataFrame(data, "event_id bigint, ts timestamp, user_id bigint")


def _brute_pairs_per_bucket(rows, interval_s, bucket_s):
    """Exact interval pairing: right (odd id) within [0, interval]
    AFTER left (even id), same user; counted under the LEFT's bucket.
    Buckets use the operator's ABSOLUTE epoch indexing (floor of epoch
    seconds / bucket); _EPOCH is midnight UTC so offsets add cleanly."""
    base = int(_EPOCH.timestamp())
    assert base % bucket_s == 0
    out = {}
    for lid, loff, luid in rows:
        if lid % 2 != 0:
            continue
        b = (base + loff) // bucket_s
        for rid, roff, ruid in rows:
            if rid % 2 == 0 or ruid != luid:
                continue
            if 0 <= roff - loff <= interval_s:
                out[b] = out.get(b, 0) + 1
    return out


def _op_pairs_per_bucket(spark, rows, interval_s, bucket_s):
    ev = _events_df(spark, rows)
    side = F.when(F.col("event_id") % 2 == 0, F.lit("click")).otherwise(
        F.lit("purchase")
    )
    counts = bucketed_side_counts(ev, bucket_s, side)
    res = bounded_interval_counts(counts, interval_s, bucket_s)
    return {r["bucket_idx"]: r["n_pairs"] for r in res.collect()}


def test_bounded_interval_counts_is_coverage_superset(spark):
    """For random (unaligned) events, the bucket-adjacency pair count
    dominates the exact interval pair count in every bucket — the
    documented coverage-superset guarantee (m = ceil(I/B) adjacent
    buckets always cover a [0, I] offset)."""
    rng = random.Random(11)
    for interval_s, bucket_s in [(3600, 3600), (7200, 1800), (5400, 3600)]:
        rows = [
            (i, rng.randrange(0, 6 * 3600), rng.randrange(3))
            for i in range(120)
        ]
        exact = _brute_pairs_per_bucket(rows, interval_s, bucket_s)
        got = _op_pairs_per_bucket(spark, rows, interval_s, bucket_s)
        for b, n in exact.items():
            assert got.get(b, 0) >= n, (interval_s, bucket_s, b, n, got.get(b))


def test_bounded_interval_counts_exact_when_bucket_aligned(spark):
    """When every timestamp is a bucket multiple and interval = m *
    bucket, offset-in-buckets == offset-in-time/bucket exactly, so the
    coarsening IS the exact interval pairing."""
    rng = random.Random(7)
    for interval_s, bucket_s in [(3600, 3600), (7200, 1800)]:
        rows = [
            (i, bucket_s * rng.randrange(0, 12), rng.randrange(3))
            for i in range(100)
        ]
        exact = _brute_pairs_per_bucket(rows, interval_s, bucket_s)
        got = _op_pairs_per_bucket(spark, rows, interval_s, bucket_s)
        assert {b: n for b, n in got.items() if n} == exact


def test_bounded_interval_counts_m1_matches_q292_arithmetic(spark):
    """The m = 1 case reproduces q292's original hand-rolled
    clicks*(same + next) arithmetic row for row."""
    rows = [
        (0, 100, 1), (2, 3700, 1), (1, 200, 1), (3, 3800, 1), (5, 7300, 1),
        (4, 60, 2), (7, 3500, 2),
    ]
    got = _op_pairs_per_bucket(spark, rows, 3600, 3600)
    # user 1: click@b0 pairs purch@b0(1) + purch@b1(1) = 2;
    #         click@b1 pairs purch@b1(1) + purch@b2(1) = 2
    # user 2: click@b0 pairs purch@b0(1) = 1
    base = int(_EPOCH.timestamp()) // 3600
    assert got == {base: 3, base + 1: 2}


def test_simhash_recall_audit_pigeonhole_floor(spark):
    """q294: with 4 bands, a pair within hamming 3 differs in at most
    3 bits, so at least one band is untouched and MUST collide —
    recall at hamming <= n_bands - 1 is 1.0 by construction, not
    probabilistically. The hamming 4-6 tail is the measured price."""
    from weatherapi_data_engineering_project_spark.plans.llm import (
        q294_simhash_recall_audit,
    )

    rows = q294_simhash_recall_audit(spark, SF_DIR).collect()
    assert rows, "audit found no hamming<=6 probe pairs"
    for r in rows:
        assert 0 <= r.hamming <= 6
        assert 0 <= r.n_found <= r.n_true
        if r.hamming <= 3:
            assert r.n_found == r.n_true, r


def test_simhash_bucket_skew_structure(spark):
    """q295: one row per band; histogram identities hold (buckets
    bounded by the 2^w keyspace, hot bucket bounded by the corpus,
    mass at least the hot bucket's own C(c,2), skew positive)."""
    from weatherapi_data_engineering_project_spark.operators.dedup import (
        N_SIM_BANDS,
        scaled_simhash_band_bits,
    )
    from weatherapi_data_engineering_project_spark.operators.similarity import (
        corpus_row_count,
    )
    from weatherapi_data_engineering_project_spark.plans.llm import (
        q295_simhash_bucket_skew,
    )
    from weatherapi_data_engineering_project_spark.schemas import load_table

    d = load_table(spark, SF_DIR, "documents")
    n = corpus_row_count(d)
    w = scaled_simhash_band_bits(n)
    rows = q295_simhash_bucket_skew(spark, SF_DIR).collect()
    assert sorted(r.band_idx for r in rows) == list(range(N_SIM_BANDS))
    for r in rows:
        assert 1 <= r.n_buckets <= 2**w
        assert 1 <= r.max_bucket <= n
        assert r.collision_mass >= r.max_bucket * (r.max_bucket - 1) // 2
        assert r.skew_vs_uniform > 0


def test_stop_bucket_cap_rule_and_subset(spark):
    """q296: the derived cap is twice the uniform expected occupancy
    (integer-exact), and capping can only REMOVE pairs — the capped
    pair set is a strict subset at SF_DIR (the fixture has hot buckets
    above the cap, so the filter demonstrably fires)."""
    from weatherapi_data_engineering_project_spark.operators.dedup import (
        scaled_simhash_band_bits,
        scaled_stop_bucket_cap,
    )
    from weatherapi_data_engineering_project_spark.plans.llm import (
        q28_simhash,
        q296_simhash_capped,
    )

    assert scaled_stop_bucket_cap(500, 8) == 4  # 2 * ceil(500/256)
    assert scaled_stop_bucket_cap(5000, 8) == 40
    assert scaled_stop_bucket_cap(50_000, 9) == 196
    assert scaled_stop_bucket_cap(2_000_000_000, 24) == 240

    uncapped = {
        (r.id1, r.id2, r.hamming)
        for r in q28_simhash(spark, SF_DIR).collect()
    }
    capped = {
        (r.id1, r.id2, r.hamming)
        for r in q296_simhash_capped(spark, SF_DIR).collect()
    }
    assert capped <= uncapped
    assert capped and len(capped) < len(uncapped)
