"""Round-8 batch-7 tests: time-range windows (q267), exact equi-depth
histogram (q268), stratified k-fold (q269), group-safe folds (q270)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

SF1 = "/root/testdata/sf0.001"


def _pd(table):
    return pd.read_parquet(f"{SF1}/{table}.parquet")


def test_q267_trailing_hour_brute_force(spark):
    from weatherapi_data_engineering_project_spark.plans.extensions import (
        q267_time_range_window,
    )
    ev = _pd("events")
    us = (ev.ts - pd.Timestamp(0)) // pd.Timedelta(microseconds=1)
    cents = (ev.value * 100).round().astype(np.int64)
    df = pd.DataFrame(
        {"eid": ev.event_id, "u": ev.user_id, "us": us, "c": cents}
    )
    expect = {}
    for _, g in df.groupby("u"):
        arr = g.sort_values("us")
        for _, r in arr.iterrows():
            m = arr[(arr.us >= r.us - 3600000000) & (arr.us < r.us)]
            expect[int(r.eid)] = (len(m), int(m.c.sum()))
    got = {
        r.event_id: (r.n_prev_hour, r.cents_prev_hour)
        for r in q267_time_range_window(spark, SF1).collect()
    }
    assert got == expect


def test_q268_boundaries_are_exact_order_statistics(spark):
    from weatherapi_data_engineering_project_spark.plans.layout import (
        q268_equidepth_histogram,
    )
    o = _pd("orders")
    cents = (o.o_totalprice * 100).round().astype(np.int64)
    ranked = sorted(zip(cents, o.o_orderkey))
    n = len(ranked)
    rows = q268_equidepth_histogram(spark, SF1).collect()
    assert len(rows) == 8
    for r in rows:
        target = (r.k * n + 7) // 8
        assert r.target_rank == target
        assert r.boundary_cents == ranked[target - 1][0]
    # last boundary is the max
    assert max(r.boundary_cents for r in rows) == int(cents.max())


def test_q269_folds_balanced_within_every_stratum(spark):
    from weatherapi_data_engineering_project_spark.plans.curation import (
        q269_stratified_kfold,
    )
    rows = q269_stratified_kfold(spark, SF1).collect()
    d = _pd("documents")
    per_src = {}
    for r in rows:
        per_src.setdefault(r.source, []).append(r.n_docs)
    for src, counts in per_src.items():
        assert max(counts) - min(counts) <= 1, src
        assert sum(counts) == int((d.source == src).sum())


def test_q270_fold_is_group_pure_and_leak_audit_matches(spark):
    from weatherapi_data_engineering_project_spark.plans.curation import (
        q270_group_safe_folds,
    )
    rows = q270_group_safe_folds(spark, SF1).collect()
    d = _pd("documents")
    import re

    def fp(t):
        return hashlib.md5(
            re.sub(r"\s+", " ", t.strip().lower()).encode()
        ).hexdigest()

    def split(doc_id):
        h2 = hashlib.md5(str(doc_id).encode()).hexdigest()[:2]
        return "test" if h2 < "0d" else ("val" if h2 < "1a" else "train")

    d = d.assign(fp=d.text.map(fp), sp=d.doc_id.map(split))
    leaky = int(
        (d.groupby("fp").sp.nunique() > 1).sum()
    )
    assert all(r.doc_level_leaky_groups == leaky for r in rows)
    assert sum(r.n_docs for r in rows) == len(d)
    assert sum(r.n_groups for r in rows) == d.fp.nunique()