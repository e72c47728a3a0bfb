"""Round-13 optimization pins.

- exact_brute_topk margin losslessness (VERDICT r12 #6): the double
  top-k prefilter's 2e-6 margin band must never exclude a row of the
  exact decimal top-k, property-tested across adversarial NEAR-TIE
  vector sets (k-th and k+1-th cosine within ~1e-7, exact float32
  duplicates broken by id) at dims {8, 64, 512}.
- label_propagation_clusters_converged(max_rounds<=0) parameter
  contract (ADVICE r12 #1): the guard value must return the identity
  labeling, not round-1 labels.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from weatherapi_data_engineering_project_spark.operators import (
    dedup as DD,
    similarity as SIM,
)


def _adversarial_corpus(seed: int, dim: int, spread: float):
    """(ids, float32 vectors) with cosines-to-query clustered within
    ``spread`` around the k-th best — the tie structure the margin
    proof must survive. Includes one exact bit-duplicate pair (pure
    id tiebreak) and a far-below tail (prunable mass)."""
    rng = np.random.RandomState(seed)
    q = rng.randn(dim)
    q /= np.linalg.norm(q)

    def unit_orth():
        u = rng.randn(dim)
        u -= u.dot(q) * q
        return u / np.linalg.norm(u)

    # 2 clear winners, an 8-wide near-tie cluster straddling the k-th
    # slot, a 6-wide tail well below the margin band
    targets = (
        [0.93, 0.91]
        + [0.80 + spread * (i - 4) / 4.0 for i in range(8)]
        + [0.40 - 0.03 * i for i in range(6)]
    )
    vecs = []
    for t in targets:
        mag = float(rng.uniform(0.5, 2.0))
        vecs.append(
            ((t * q + np.sqrt(max(0.0, 1 - t * t)) * unit_orth()) * mag)
            .astype(np.float32)
        )
    # exact float32 duplicate of a cluster row: identical stored bits,
    # so the decimal cosines tie exactly and only the id orders them
    vecs.append(vecs[4].copy())
    ids = list(range(len(vecs)))
    return ids, vecs, q.astype(np.float32)


def _frames(spark, ids, vecs, qvec):
    rows = [(i, [float(x) for x in v]) for i, v in zip(ids, vecs)]
    e = spark.createDataFrame(rows, schema="vec_id long, embedding array<float>")
    qv = spark.createDataFrame(
        [(1000, [float(x) for x in qvec])],
        schema="qid long, qvec array<float>",
    ).select("qid", "qvec", SIM._norm2_array(F.col("qvec")).alias("qn2"))
    cv = e.select(
        F.col("vec_id").alias("cid2"),
        F.col("embedding").alias("cvec"),
        SIM._norm2_array(F.col("embedding")).alias("cn2"),
    )
    return qv, cv


def _reference_topk(qv, cv, k):
    """exact_brute_topk WITHOUT the double prefilter: decimal-rescore
    every pair, rank, keep k — the definitionally-exact twin."""
    exact = SIM._score(
        SIM._dot_arrays(F.col("qvec"), F.col("cvec")),
        F.col("qn2"),
        F.col("cn2"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid2"))
    return (
        qv.crossJoin(cv)
        .filter(F.col("qid") != F.col("cid2"))
        .select("qid", "cid2", exact.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "cid2", "rank")
    )


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    seed=st.integers(0, 2**31 - 1),
    dim=st.sampled_from((8, 64, 512)),
    spread=st.sampled_from((0.0, 1e-9, 5e-8, 1e-7)),
)
def test_exact_brute_topk_margin_lossless(spark, seed, dim, spread):
    ids, vecs, qvec = _adversarial_corpus(seed, dim, spread)
    qv, cv = _frames(spark, ids, vecs, qvec)
    k = 3
    got = sorted(
        map(tuple, SIM.exact_brute_topk(qv, cv, k, "qid", "cid2").collect())
    )
    want = sorted(map(tuple, _reference_topk(qv, cv, k).collect()))
    assert got == want


def test_exact_brute_topk_fewer_candidates_than_k(spark):
    """< k candidates: the k-th double is NULL, the margin filter is
    vacuous, every candidate must come back ranked."""
    ids, vecs, qvec = _adversarial_corpus(7, 8, 1e-8)
    qv, cv = _frames(spark, ids[:2], vecs[:2], qvec)
    got = sorted(
        map(tuple, SIM.exact_brute_topk(qv, cv, 5, "qid", "cid2").collect())
    )
    want = sorted(map(tuple, _reference_topk(qv, cv, 5).collect()))
    assert got == want and len(got) == 2


def test_label_prop_converged_zero_rounds_is_identity(spark):
    """ADVICE r12 #1: max_rounds=0 must bound work to ZERO propagation
    rounds — every node keeps itself as representative."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], schema="id1 long, id2 long"
    )
    got = {
        (r["doc_id"], r["cluster_rep"])
        for r in DD.label_propagation_clusters_converged(
            pairs, max_rounds=0
        ).collect()
    }
    assert got == {(1, 1), (2, 2), (3, 3)}
