"""Round-8 batch-6 tests: recursive-CTE rollup (q264), schema-evolution
merge read (q265), append-mode finalized stream windows (q266)."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF1 = "/root/testdata/sf0.001"


def _pd(table):
    return pd.read_parquet(f"{SF1}/{table}.parquet")


def test_q264_recursive_rollup_brute_force(spark):
    from weatherapi_data_engineering_project_spark.plans.sql_frontdoor import (
        q264_recursive_rollup,
    )
    p = _pd("part")
    cents = {
        int(k): int(round(v * 100))
        for k, v in zip(p.p_partkey, p.p_retailprice)
    }
    expect: dict[int, list[int]] = {}
    for k in cents:
        a = k
        while True:
            e = expect.setdefault(a, [0, 0])
            e[0] += 1
            e[1] += cents[k]
            if a <= 1:
                break
            a //= 2
    got = {
        r.ancestor: [r.n_desc, r.subtree_cents]
        for r in q264_recursive_rollup(spark, SF1).collect()
    }
    assert got == expect
    # node 1 roots every part except partkey 0 (whose chain stops at 0)
    assert got[1][0] == int((p.p_partkey >= 1).sum())
    assert got[1][1] == sum(v for k, v in cents.items() if k >= 1)


def test_q265_merged_read_preserves_all_rows_and_nulls_old_files(spark):
    from weatherapi_data_engineering_project_spark.plans.layout import (
        q265_schema_evolution,
    )
    d = _pd("documents")
    rows = q265_schema_evolution(spark, SF1).collect()
    got = {
        r.source: (r.n_docs, r.n_with_lang, r.n_langs, r.total_chars)
        for r in rows
    }
    expect = {}
    for src, grp in d.groupby("source"):
        odd = grp[grp.doc_id % 2 == 1]
        expect[src] = (
            len(grp),
            len(odd),
            odd.lang.nunique(),
            int(grp.n_chars.sum()),
        )
    assert got == expect


def test_q266_append_windows_equal_batch_groupby(spark):
    from weatherapi_data_engineering_project_spark.plans.streaming_queries import (
        q266_stream_append_windows,
    )
    got = {
        (r.day_idx, r.event_type): (r.n_events, r.sum_cents)
        for r in q266_stream_append_windows(spark, SF1).collect()
    }
    assert all(t != "__sentinel__" for _, t in got)  # sentinels filtered
    ev = _pd("events")
    us = (ev.ts - pd.Timestamp(0)) // pd.Timedelta(microseconds=1)
    day = us // 86400000000
    cents = (ev.value * 100).round().astype(np.int64)
    g = pd.DataFrame(
        {"day": day, "t": ev.event_type, "c": cents}
    ).groupby(["day", "t"])
    expect = {
        k: (int(v), int(s))
        for k, v, s in zip(g.size().index, g.size(), g.c.sum())
    }
    assert got == expect
