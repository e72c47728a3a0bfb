"""Round-9 unit tests: ADVICE r08 fixes (q281 densification, q260
zero-weight guard, session-keyed layout paths)."""

from __future__ import annotations

import os

import pytest

from weatherapi_data_engineering_project_spark.plans.analytics import (
    q260_neyman_allocation,
    q281_cochran_q,
)
from weatherapi_data_engineering_project_spark.plans.layout import (
    session_layout_base,
)


def test_cochran_q_densifies_zero_success_treatments(spark, tmp_path):
    """A treatment NO user favors must still emit a row (c_j = 0) and
    contribute its (k·0 − N)² = N² numerator term to Q."""
    # 3 users × 3 types; type 'z' has 1 event per user vs 10 for a/b,
    # so n_it·k > tot_i (3 > 21) never holds for z — zero successes.
    rows = []
    eid = 0
    for u in (1, 2, 3):
        for t, n in (("a", 10), ("b", 10), ("z", 1)):
            for _ in range(n):
                rows.append((eid, u, t))
                eid += 1
    spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, event_type string"
    ).selectExpr(
        "event_id",
        "timestamp'2024-01-01 00:00:00' as ts",
        "user_id",
        "event_type",
        "1.0 as value",
        "'' as props",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    out = {r.event_type: r for r in q281_cochran_q(spark, str(tmp_path)).collect()}
    assert set(out) == {"a", "b", "z"}, "zero-success type must emit a row"
    assert out["z"].n_users_above == 0
    assert out["a"].n_users_above == 3 and out["b"].n_users_above == 3

    # brute force: k=3, C=(3,3,0), N=6, every user r_i=2
    k, cs, n = 3, [3, 3, 0], 6
    sr, sr2 = 6, 12  # 3 users × r_i=2 / r_i²=4
    num = (k - 1) * sum((k * c - n) ** 2 for c in cs)
    q_expected = round(num / (k * (k * sr - sr2)), 6)
    assert out["z"].cochran_q == pytest.approx(q_expected, abs=0)
    assert out["z"].k_treatments == 3


def test_neyman_allocation_rejects_zero_total_weight(spark, tmp_path):
    """Every stratum a singleton -> every weight 0 -> the query must
    raise loudly instead of emitting NaN allocations."""
    spark.createDataFrame(
        [(1, "t", "en", "s1", 10), (2, "t", "en", "s2", 20),
         (3, "t", "en", "s3", 30)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    with pytest.raises(Exception, match="q260"):
        q260_neyman_allocation(spark, str(tmp_path)).collect()


def test_aqe_skew_join_splits_the_hot_partition(spark):
    """q284 plan pin: the final adaptive plan must show the runtime
    skew split — SortMergeJoin(skew=true) over an AQEShuffleRead
    marked skewed — and the values must equal the plain batch join
    (the differential asserts that; here we re-check the row count)."""
    from weatherapi_data_engineering_project_spark.plans.layout import (
        q284_aqe_skew_join,
    )

    df = q284_aqe_skew_join(spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert len(rows) == 7  # w in 1..7
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin(skew=true)" in plan, plan
    assert "AQEShuffleRead skewed" in plan, plan


def test_timeout_flush_evicts_all_real_user_state(spark):
    """q285 state-metrics assertion (VERDICT r08 #7): the state store
    must SHRINK to exactly the sentinel key after the watermark-driven
    flush — numRowsTotal drops from the full user count to 1, and the
    removals are observable per batch."""
    from weatherapi_data_engineering_project_spark.plans.streaming_queries import (
        LAST_STATE_METRICS,
        q285_stream_timeout_flush,
    )

    sf = "/root/testdata/sf0.001"
    out = q285_stream_timeout_flush(spark, sf).collect()
    n_users = (
        spark.read.parquet(f"{sf}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    assert len(out) == n_users  # every user flushed exactly once
    metrics = LAST_STATE_METRICS["q285"]
    assert metrics, "no state metrics recorded"
    totals = [t for _bid, t, _rm in metrics]
    removed = sum(rm for _bid, _t, rm in metrics)
    assert max(totals) >= n_users  # state actually held every user
    assert totals[-1] == 1  # only the sentinel key survives
    assert removed == n_users  # evictions are counted, not silent


def _np_lsh_pairs(X, ids, n_bands, band_bits, threshold):
    """Brute-force numpy replica of operators/similarity.
    cosine_neardup_pairs: md5-hyperplane sign buckets, OR-banded
    candidates, exact-cosine verify."""
    import hashlib

    import numpy as np

    n_bits = n_bands * band_bits
    d = X.shape[1]
    W = np.array(
        [
            [
                1.0
                if hashlib.md5(f"{b}_{p}".encode()).hexdigest()[0] >= "8"
                else -1.0
                for p in range(d)
            ]
            for b in range(n_bits)
        ]
    )
    bits = (X @ W.T >= 0).astype(np.int8)  # n × n_bits
    norms = np.sqrt((X * X).sum(axis=1))
    out = set()
    n = len(ids)
    for i in range(n):
        for j in range(i + 1, n):
            shared = any(
                (
                    bits[i, b * band_bits : (b + 1) * band_bits]
                    == bits[j, b * band_bits : (b + 1) * band_bits]
                ).all()
                for b in range(n_bands)
            )
            if not shared:
                continue
            cos = round(float(X[i] @ X[j] / (norms[i] * norms[j])), 6)
            if cos >= threshold:
                a, b2 = sorted((ids[i], ids[j]))
                out.add((a, b2, cos))
    return out


def test_lsh_recall_audit_matches_numpy_brute_force(spark):
    """q287's (config, band) truth/found counts against a full numpy
    re-derivation — a third independent implementation next to the
    Spark plan and the DuckDB oracle."""
    import numpy as np
    import pandas as pd

    from weatherapi_data_engineering_project_spark.plans.corpus import (
        q287_lsh_recall_audit,
    )

    sf = "/root/testdata/sf0.001"
    pdf = pd.read_parquet(f"{sf}/embeddings.parquet")
    X = np.array([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    ids = pdf["vec_id"].tolist()
    norms = np.sqrt((X * X).sum(axis=1))

    def band_of(c):
        return (
            "high_0.70+" if c >= 0.7 else "mid_0.50" if c >= 0.5 else "low_0.35"
        )

    idx = {v: i for i, v in enumerate(ids)}
    truth = {}
    for a in sorted(ids):
        if a >= 64:
            continue
        for b in sorted(ids):
            if b <= a:
                continue
            i, j = idx[a], idx[b]
            cos = round(float(X[i] @ X[j] / (norms[i] * norms[j])), 6)
            if cos >= 0.35:
                truth[(a, b)] = band_of(cos)

    expected = {}
    for bits in (4, 8):
        found = {
            (a, b)
            for a, b, _c in _np_lsh_pairs(X, ids, 4, bits, 0.35)
            if a < 64
        }
        for (a, b), band in truth.items():
            key = (f"bands4x{bits}", band)
            t, f = expected.get(key, (0, 0))
            expected[key] = (t + 1, f + (1 if (a, b) in found else 0))

    got = {
        (r.config, r.cos_band): (r.n_true, r.n_found)
        for r in q287_lsh_recall_audit(spark, sf).collect()
    }
    assert got == expected


def test_scaled_lsh_contamination_matches_numpy_brute_force(spark):
    """q286's full rollup against a numpy re-derivation (wide 32-bit
    banding + the q79 md5 split rule + cross-split aggregation). NOTE:
    q286 is NOT a subset of q93 — bits 16-31 are new hyperplanes, so
    its bands 2/3 can admit pairs the 16-bit scheme never bucketed."""
    import hashlib

    import numpy as np
    import pandas as pd

    from weatherapi_data_engineering_project_spark.plans.corpus import (
        q286_scaled_lsh_contamination,
    )

    sf = "/root/testdata/sf0.001"
    pdf = pd.read_parquet(f"{sf}/embeddings.parquet")
    X = np.array([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    ids = pdf["vec_id"].tolist()

    def split_of(v):
        h = hashlib.md5(str(v).encode()).hexdigest()[:2]
        return "test" if h < "0d" else ("val" if h < "1a" else "train")

    expected = {}
    for a, b, cos in _np_lsh_pairs(X, ids, 4, 8, 0.35):
        s1, s2 = split_of(a), split_of(b)
        if {s1, s2} != {"test", "train"}:
            continue
        tid = a if s1 == "test" else b
        n, m = expected.get(tid, (0, -1.0))
        expected[tid] = (n + 1, max(m, cos))

    got = {
        r.test_id: (r.n_train_neighbors, r.max_cosine)
        for r in q286_scaled_lsh_contamination(spark, sf).collect()
    }
    assert got == expected and expected  # nonempty at sf0.001


def test_minhash_recall_audit_matches_python_brute_force(spark):
    """q288's per-band truth counts against a pure-Python shingle
    Jaccard re-derivation (integer threshold arithmetic), and the
    found ⊆ truth containment with recall = found/true."""
    import re

    import pandas as pd

    from weatherapi_data_engineering_project_spark.plans.llm import (
        q288_minhash_recall_audit,
    )

    sf = "/root/testdata/sf0.001"
    pdf = pd.read_parquet(f"{sf}/documents.parquet")
    sh = {}
    for _i, row in pdf.iterrows():
        toks = re.split(r"\s+", row["text"].strip().lower())
        sh[row["doc_id"]] = {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }

    def band_of(inter, union):
        if 10 * inter >= 7 * union:
            return "high_0.70+"
        if 2 * inter >= union:
            return "mid_0.50"
        return "low_0.40"

    truth_bands = {}
    ids = sorted(sh)
    for a in ids:
        if a >= 64:
            continue
        for b in ids:
            if b <= a:
                continue
            inter = len(sh[a] & sh[b])
            union = len(sh[a] | sh[b])
            if union and 5 * inter >= 2 * union:
                truth_bands[(a, b)] = band_of(inter, union)

    expected_true = {}
    for band in truth_bands.values():
        expected_true[band] = expected_true.get(band, 0) + 1

    rows = {r.jac_band: r for r in q288_minhash_recall_audit(spark, sf).collect()}
    assert {b: r.n_true for b, r in rows.items()} == expected_true
    for r in rows.values():
        assert 0 <= r.n_found <= r.n_true
        assert r.recall == round(r.n_found / r.n_true, 6)


def test_session_layout_base_is_session_and_dataset_keyed(spark):
    a = session_layout_base(spark, "bkt_tables", "/root/testdata/sf0.001")
    b = session_layout_base(spark, "bkt_tables", "/root/testdata/sf0.01")
    assert a != b  # dataset-keyed
    assert a == session_layout_base(spark, "bkt_tables", "/root/testdata/sf0.001")
    assert spark.sparkContext.applicationId.replace("-", "")[-16:] in a
    assert os.path.basename(a).startswith("bkt_tables_")
