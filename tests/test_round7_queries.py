"""Round-7 extension queries (q202+): brute-force semantic checks.

The oracle differentials run through each module's parametrized
test (QUERIES/ORACLE registration); these pin the SEMANTICS against
independent pure-Python recomputations.
"""

from __future__ import annotations

import math
import re

from tests.conftest import SF_DIR
from weatherapi_data_engineering_project_spark.schemas import load_table


def _docs(spark):
    return load_table(spark, SF_DIR, "documents").collect()


def test_q202_rrf_fusion_matches_bruteforce(spark):
    from weatherapi_data_engineering_project_spark.plans import corpus as CP

    docs = _docs(spark)
    k1 = {r.doc_id: r.n_chars for r in docs}
    k2 = {
        r.doc_id: len(re.split(r"\s+", r.text.lower().strip()))
        for r in docs
    }
    ids = sorted(k1)
    r1 = {i: rank for rank, i in enumerate(
        sorted(ids, key=lambda i: (-k1[i], i)), start=1)}
    r2 = {i: rank for rank, i in enumerate(
        sorted(ids, key=lambda i: (-k2[i], i)), start=1)}
    score = {
        i: round(1 / (60 + r1[i]), 9) + round(1 / (60 + r2[i]), 9)
        for i in ids
    }
    want = sorted(ids, key=lambda i: (-score[i], i))[:20]
    got = CP.q202_rrf_fusion(spark, SF_DIR).collect()
    assert [r.doc_id for r in
            sorted(got, key=lambda r: (-r.rrf_score, r.doc_id))] == want
    for r in got:
        assert r.r1 == r1[r.doc_id] and r.r2 == r2[r.doc_id]
        assert abs(r.rrf_score - score[r.doc_id]) < 1e-9


def test_q203_mcnemar_matches_bruteforce(spark):
    from weatherapi_data_engineering_project_spark.plans import (
        analytics as A,
    )

    docs = _docs(spark)
    n10 = n01 = ca = cb = 0
    for r in docs:
        y = r.lang == "en"
        a = r.n_chars >= 120
        b = len(re.split(r"\s+", r.text.lower().strip())) >= 25
        ca += a == y
        cb += b == y
        n10 += (a == y) and (b != y)
        n01 += (a != y) and (b == y)
    got = A.q203_mcnemar_test(spark, SF_DIR).collect()[0]
    assert (got.n_docs, got.n_a_correct, got.n_b_correct) == (
        len(docs), ca, cb)
    assert (got.n10, got.n01) == (n10, n01)
    assert n10 + n01 > 0, "degenerate fixture: no discordant pairs"
    chi2 = (n10 - n01) ** 2 / (n10 + n01)
    assert abs(got.chi2 - chi2) < 1e-6
    assert got.significant == (10000 * (n10 - n01) ** 2
                               > 38415 * (n10 + n01))


def test_q204_calibration_bins_matches_bruteforce(spark):
    from collections import defaultdict

    from weatherapi_data_engineering_project_spark.plans import (
        analytics as A,
    )

    docs = _docs(spark)
    agg = defaultdict(lambda: [0, 0, 0, 0])  # n, sm, sy, sq
    for r in docs:
        m = min(r.n_chars, 200)
        y = 1 if r.lang == "en" else 0
        b = min(m * 10 // 200, 9)
        a = agg[b]
        a[0] += 1
        a[1] += m
        a[2] += y
        a[3] += (m - 200 * y) ** 2
    rows = {r.bin: r for r in
            A.q204_calibration_bins(spark, SF_DIR).collect()}
    assert set(rows) == set(agg)
    for b, (n, sm, sy, sq) in agg.items():
        r = rows[b]
        assert r.n_docs == n
        assert abs(r.avg_pred - sm / (200 * n)) < 1e-6
        assert abs(r.obs_rate - sy / n) < 1e-6
        assert abs(r.brier - sq / (40000 * n)) < 1e-6
        # a calibrated bin's Brier decomposes >= (avg_pred-obs)^2
        assert r.brier >= (r.avg_pred - r.obs_rate) ** 2 - 1e-6


def test_q205_winsorized_stats_matches_bruteforce(spark):
    from collections import defaultdict

    from weatherapi_data_engineering_project_spark.plans import (
        analytics as A,
    )

    docs = _docs(spark)
    by_src = defaultdict(list)
    for r in docs:
        by_src[r.source].append((r.n_chars, r.doc_id))
    rows = {r.source: r for r in
            A.q205_winsorized_stats(spark, SF_DIR).collect()}
    assert set(rows) == set(by_src)
    for src, vals in by_src.items():
        vals.sort()
        n = len(vals)
        k5 = (5 * n + 99) // 100
        k95 = (95 * n + 99) // 100
        p5 = vals[k5 - 1][0]
        p95 = vals[k95 - 1][0]
        raw = sum(v for v, _ in vals) / n
        win = sum(max(p5, min(v, p95)) for v, _ in vals) / n
        r = rows[src]
        assert (r.n_docs, r.p5, r.p95) == (n, p5, p95)
        assert abs(r.raw_mean - raw) < 1e-6
        assert abs(r.winsorized_mean - win) < 1e-6
        assert r.p5 <= r.winsorized_mean <= r.p95


def test_q206_seasonal_profile_matches_bruteforce(spark):
    import datetime
    from collections import defaultdict

    from weatherapi_data_engineering_project_spark.plans import (
        temporal as T,
    )

    ev = load_table(spark, SF_DIR, "events").collect()
    daily = defaultdict(int)
    for r in ev:
        daily[r.ts.date()] += 1
    slots = defaultdict(lambda: [0, 0])
    epoch = datetime.date(1970, 1, 1)
    for day, c in daily.items():
        dow = (day - epoch).days % 7
        slots[dow][0] += 1
        slots[dow][1] += c
    d_total = sum(v[0] for v in slots.values())
    s_total = sum(v[1] for v in slots.values())
    rows = {r.dow: r for r in
            T.q206_seasonal_profile(spark, SF_DIR).collect()}
    assert set(rows) == set(slots)
    for dow, (nd, s) in slots.items():
        r = rows[dow]
        assert (r.n_days, r.n_events) == (nd, s)
        assert abs(r.avg_daily - s / nd) < 1e-6
        assert abs(r.seasonal_index - (s * d_total) / (nd * s_total)) < 1e-6
    # indices average to 1 when weighted by day counts
    w = sum(rows[d].seasonal_index * slots[d][0] for d in slots) / d_total
    assert abs(w - 1.0) < 1e-4


def test_q207_l_diversity_matches_bruteforce(spark):
    import math
    from collections import defaultdict

    from weatherapi_data_engineering_project_spark.plans import (
        curation as C,
    )

    cust = load_table(spark, SF_DIR, "customer").collect()
    groups = defaultdict(lambda: (set(), [0]))
    for r in cust:
        key = (r.c_nationkey, math.floor(float(r.c_acctbal) / 1000))
        segs, cnt = groups[key]
        segs.add(r.c_mktsegment)
        cnt[0] += 1
    hist = defaultdict(lambda: [0, 0])
    for segs, cnt in groups.values():
        h = hist[len(segs)]
        h[0] += 1
        h[1] += cnt[0]
    n_total = len(cust)
    rows = {r.l: r for r in C.q207_l_diversity(spark, SF_DIR).collect()}
    assert set(rows) == set(hist)
    for l_val, (ng, nr) in hist.items():
        r = rows[l_val]
        assert (r.n_groups, r.n_rows) == (ng, nr)
        assert abs(r.row_share - nr / n_total) < 1e-6
        assert r.exposed == (l_val < 3)


def test_q208_dispersion_matches_bruteforce(spark):
    from collections import defaultdict

    from weatherapi_data_engineering_project_spark.plans import (
        behavior as B,
    )

    ev = load_table(spark, SF_DIR, "events").collect()
    users = {r.user_id for r in ev}
    n = len(users)
    counts = defaultdict(lambda: defaultdict(int))
    for r in ev:
        counts[r.event_type][r.user_id] += 1
    rows = {r.event_type: r for r in
            B.q208_dispersion_audit(spark, SF_DIR).collect()}
    assert set(rows) == set(counts)
    for et, per_user in counts.items():
        xs = [per_user.get(u, 0) for u in users]
        sx = sum(xs)
        sx2 = sum(x * x for x in xs)
        mean = sx / n
        var = (n * sx2 - sx * sx) / (n * (n - 1))
        r = rows[et]
        assert (r.n_users, r.n_events) == (n, sx)
        assert abs(r.mean - mean) < 1e-6
        assert abs(r.variance - var) < 1e-6
        assert abs(r.dispersion - var / mean) < 1e-5
        assert r.overdispersed == ((n * sx2 - sx * sx) * 10
                                   > 15 * (n - 1) * sx)
