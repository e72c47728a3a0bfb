"""Round-8 batch-8 tests: winnowing dedup (q271) and the windowed SQL
front door (q272)."""

from __future__ import annotations

import hashlib
import re

import pandas as pd

SF1 = "/root/testdata/sf0.001"


def _norm_optimized(df) -> str:
    s = df._jdf.queryExecution().optimizedPlan().canonicalized().toString()
    return re.sub(r"#\d+", "#", s)


def _winnow_fps(text: str) -> set[str]:
    toks = re.split(r"\s+", text.strip().lower())
    grams = [
        hashlib.md5(" ".join(toks[i : i + 4]).encode()).hexdigest()
        for i in range(len(toks) - 3)
    ]
    fps = set()
    for i in range(len(grams) - 3):
        win = [(grams[i + j], i + j) for j in range(4)]
        fps.add(min(win)[0])
    return fps


def test_q271_winnowing_brute_force(spark):
    from weatherapi_data_engineering_project_spark.plans.llm import (
        q271_winnowing_dedup,
    )
    d = pd.read_parquet(f"{SF1}/documents.parquet")
    fps = {int(r.doc_id): _winnow_fps(r.text) for r in d.itertuples()}
    # df cap: fingerprints in <= 10 docs
    from collections import Counter

    df_ct = Counter(h for s in fps.values() for h in s)
    fps = {
        k: {h for h in s if df_ct[h] <= 10} for k, s in fps.items()
    }
    ids = sorted(fps)
    expect = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            shared = len(fps[a] & fps[b])
            if shared >= 2:
                expect[(a, b)] = shared
    got = {
        (r.d1, r.d2): r.n_shared
        for r in q271_winnowing_dedup(spark, SF1).collect()
    }
    assert got == expect
    assert len(got) > 0  # the fixture corpus does contain near-dups


def test_q271_guarantee_shared_long_run_shares_a_fingerprint(spark):
    """Winnowing's coverage guarantee on a constructed pair: two docs
    sharing a 12-token run must share at least one fingerprint."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    a = "xx yy " + base
    b = base + " zz ww"
    assert len(_winnow_fps(a) & _winnow_fps(b)) >= 1


def test_q272_sql_window_plan_equals_dataframe_twin(spark):
    from weatherapi_data_engineering_project_spark.plans.sql_frontdoor import (
        q272_sql_topk_per_group,
    )
    from weatherapi_data_engineering_project_spark.plans.star import (
        q16_topk_per_group,
    )
    sql_plan = _norm_optimized(q272_sql_topk_per_group(spark, SF1))
    df_plan = _norm_optimized(q16_topk_per_group(spark, SF1))
    assert sql_plan == df_plan
    # the rank filter pushes into a WindowGroupLimit (no full sort of
    # every group materializes ranks beyond k)
    phys = (
        q272_sql_topk_per_group(spark, SF1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in phys