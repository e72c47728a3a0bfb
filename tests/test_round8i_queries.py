"""Round-8 batch-9 tests: interval-union coverage (q273) and type-7
interpolated quantiles (q274)."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF1 = "/root/testdata/sf0.001"


def _pd(table):
    return pd.read_parquet(f"{SF1}/{table}.parquet")


def test_q273_interval_union_brute_force(spark):
    from weatherapi_data_engineering_project_spark.plans.temporal import (
        q273_interval_union_time,
    )
    ev = _pd("events")
    us = (ev.ts - pd.Timestamp(0)) // pd.Timedelta(microseconds=1)
    df = pd.DataFrame({"u": ev.user_id, "s": us, "e": us + 300000000})
    expect = {}
    for u, g in df.groupby("u"):
        ivs = sorted(zip(g.s, g.e))
        islands = []
        cur_s, cur_e = ivs[0]
        for s, e in ivs[1:]:
            if s > cur_e:
                islands.append(cur_e - cur_s)
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        islands.append(cur_e - cur_s)
        expect[int(u)] = (len(islands), int(sum(islands)))
    got = {
        r.user_id: (r.n_islands, r.covered_us)
        for r in q273_interval_union_time(spark, SF1).collect()
    }
    assert got == expect


def test_q274_matches_numpy_linear_percentile(spark):
    from weatherapi_data_engineering_project_spark.plans.analytics import (
        q274_interpolated_quantiles,
    )
    d = _pd("documents")
    rows = q274_interpolated_quantiles(spark, SF1).collect()
    assert len(rows) == d.source.nunique() * 3
    for r in rows:
        vals = d[d.source == r.source].n_chars.to_numpy()
        expect = float(np.percentile(vals, r.p100, method="linear"))
        assert abs(r.q_value - expect) < 1e-9, (r.source, r.p100)
        assert r.n == len(vals)