"""Round-8 batch-11 tests: Arrow grouped kernel (q277) and static
partition pruning (q278)."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF1 = "/root/testdata/sf0.001"


def test_q277_arrow_kernel_brute_force_and_arrow_path(spark):
    from weatherapi_data_engineering_project_spark.plans.extensions import (
        q277_arrow_group_mad,
    )
    df = q277_arrow_group_mad(spark, SF1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan  # Arrow group exchange
    assert "BatchEvalPython" not in plan    # never row-at-a-time

    ev = pd.read_parquet(f"{SF1}/events.parquet")
    cents = (ev.value * 100).round().astype(np.int64)
    expect = {}
    for u, g in pd.DataFrame({"u": ev.user_id, "c": cents}).groupby("u"):
        c = np.sort(g.c.to_numpy())
        n = len(c)
        med = int(c[(n - 1) // 2])
        mad = int(np.sort(np.abs(c - med))[(n - 1) // 2])
        expect[int(u)] = (n, med, mad)
    got = {
        r.user_id: (r.n, r.med_cents, r.mad_cents) for r in df.collect()
    }
    assert got == expect


def test_q278_scan_lists_only_matching_partitions(spark):
    from weatherapi_data_engineering_project_spark.plans.extensions import (
        q278_static_partition_prune,
    )
    df = q278_static_partition_prune(spark, SF1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the type filter sits in PartitionFilters (directory pruning at
    # planning time), NOT in DataFilters/PushedFilters (row filtering)
    pf = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "event_type" in pf and "IN (click,purchase)" in pf
    assert "DataFilters: []" in plan
    ev = pd.read_parquet(f"{SF1}/events.parquet")
    m = ev[ev.event_type.isin(["click", "purchase"])]
    got = {r.event_type: (r.n_events, r.n_users) for r in df.collect()}
    expect = {
        t: (len(g), g.user_id.nunique())
        for t, g in m.groupby("event_type")
    }
    assert got == expect