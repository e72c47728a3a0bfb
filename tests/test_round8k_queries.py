"""Round-8 batch-10b tests: nearest-neighbor as-of join (q276)."""

from __future__ import annotations

import pandas as pd

SF1 = "/root/testdata/sf0.001"


def test_q276_nearest_asof_brute_force(spark):
    from weatherapi_data_engineering_project_spark.plans.temporal import (
        q276_asof_nearest,
    )
    ev = pd.read_parquet(f"{SF1}/events.parquet")
    us = (ev.ts - pd.Timestamp(0)) // pd.Timedelta(microseconds=1)
    df = pd.DataFrame({"eid": ev.event_id, "u": ev.user_id, "us": us})
    clicks = df[df.eid % 2 == 0]
    buys = df[df.eid % 2 == 1]
    expect = {}
    for _, c in clicks.iterrows():
        cand = buys[
            (buys.u == c.u)
            & (buys.us >= c.us - 1800000000)
            & (buys.us <= c.us + 1800000000)
        ]
        if len(cand) == 0:
            continue
        best = sorted(
            (abs(int(b.us - c.us)), int(b.eid), int(b.us - c.us))
            for _, b in cand.iterrows()
        )[0]
        expect[int(c.eid)] = (best[1], best[2], len(cand))
    got = {
        r.click_id: (r.purchase_id, r.lag_us, r.n_candidates)
        for r in q276_asof_nearest(spark, SF1).collect()
    }
    assert got == expect
    assert len(got) > 0