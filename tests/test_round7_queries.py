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


def test_q209_hhi_matches_bruteforce(spark):
    from collections import defaultdict

    from weatherapi_data_engineering_project_spark.plans import (
        curation as C,
    )

    docs = _docs(spark)
    t = defaultdict(int)
    for r in docs:
        t[r.source] += len(re.split(r"\s+", r.text.lower().strip()))
    total = sum(t.values())
    hhi = sum(v * v for v in t.values()) / (total * total)
    got = C.q209_hhi_concentration(spark, SF_DIR).collect()[0]
    assert got.n_sources == len(t)
    assert got.total_tokens == total
    assert abs(got.max_share - max(t.values()) / total) < 1e-6
    assert abs(got.hhi - hhi) < 1e-6
    assert abs(got.effective_sources - 1 / hhi) < 1e-4
    # bounds: 1/n_sources <= HHI <= 1
    assert 1 / len(t) - 1e-9 <= got.hhi <= 1.0


def test_q210_cohort_ltv_matches_bruteforce(spark):
    from collections import defaultdict
    from decimal import Decimal

    from weatherapi_data_engineering_project_spark.plans import (
        behavior as B,
    )

    ev = load_table(spark, SF_DIR, "events").collect()
    first = {}
    for r in ev:
        d = r.ts.date()
        if r.user_id not in first or d < first[r.user_id]:
            first[r.user_id] = d
    sizes = defaultdict(int)
    for u, d in first.items():
        sizes[d] += 1
    rev = defaultdict(Decimal)
    for r in ev:
        off = (r.ts.date() - first[r.user_id]).days
        v = (Decimal(str(round(r.value, 2)))
             if r.event_type == "purchase" else Decimal(0))
        rev[(first[r.user_id], off)] += v
    rows = {(r.cohort_day, r.day_offset): r
            for r in B.q210_cohort_ltv(spark, SF_DIR).collect()}
    assert set(rows) == set(rev)
    cum = defaultdict(Decimal)
    for (cd, off) in sorted(rev):
        cum[cd] += rev[(cd, off)]
        r = rows[(cd, off)]
        assert r.n_users == sizes[cd]
        assert abs(r.cum_revenue - float(cum[cd])) < 1e-6
        assert abs(r.ltv - float(cum[cd]) / sizes[cd]) < 1e-5
    # LTV is non-decreasing within a cohort
    for cd in sizes:
        series = [rows[k].ltv for k in sorted(rows) if k[0] == cd]
        assert all(b >= a - 1e-9 for a, b in zip(series, series[1:]))


def test_q211_json_field_stats_matches_bruteforce(spark):
    import json
    from collections import defaultdict

    from weatherapi_data_engineering_project_spark.plans import (
        extensions as X,
    )

    ev = load_table(spark, SF_DIR, "events").collect()
    agg = defaultdict(list)
    n_all = defaultdict(int)
    for r in ev:
        n_all[r.event_type] += 1
        try:
            k = json.loads(r.props).get("k")
        except Exception:
            k = None
        if isinstance(k, int):
            agg[r.event_type].append(k)
    rows = {r.event_type: r for r in
            X.q211_json_field_stats(spark, SF_DIR).collect()}
    assert set(rows) == set(n_all)
    for et, ks in agg.items():
        r = rows[et]
        assert r.n_events == n_all[et]
        assert r.n_with_k == len(ks)
        assert (r.min_k, r.max_k, r.sum_k) == (min(ks), max(ks), sum(ks))
        assert abs(r.mean_k - sum(ks) / len(ks)) < 1e-6


def test_q212_quantile_normalization_matches_bruteforce(spark):
    from collections import defaultdict

    from weatherapi_data_engineering_project_spark.plans import (
        curation as C,
    )

    docs = _docs(spark)
    allv = sorted((r.n_chars, r.doc_id) for r in docs)
    nn = len(allv)
    by_src = defaultdict(list)
    for r in docs:
        by_src[r.source].append((r.n_chars, r.doc_id))
    rows = {r.source: r for r in
            C.q212_quantile_normalization(spark, SF_DIR).collect()}
    assert set(rows) == set(by_src)
    for src, vals in by_src.items():
        vals.sort()
        ns = len(vals)
        mapped = [allv[(r * nn + ns - 1) // ns - 1][0]
                  for r in range(1, ns + 1)]
        got = rows[src]
        assert got.n_docs == ns
        assert abs(got.mean_raw - sum(v for v, _ in vals) / ns) < 1e-6
        assert abs(got.mean_normalized - sum(mapped) / ns) < 1e-6
    # normalization pulls source means toward a common center: the
    # spread of normalized means is no larger than the raw spread
    raw = [r.mean_raw for r in rows.values()]
    norm = [r.mean_normalized for r in rows.values()]
    assert max(norm) - min(norm) <= max(raw) - min(raw) + 1e-6


def test_q213_next_event_accuracy_matches_bruteforce(spark):
    from collections import Counter, defaultdict

    from weatherapi_data_engineering_project_spark.plans import (
        behavior as B,
    )

    ev = sorted(
        load_table(spark, SF_DIR, "events").collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    pairs: Counter = Counter()
    for a, b in zip(ev, ev[1:]):
        if a.user_id == b.user_id:
            pairs[(a.event_type, b.event_type)] += 1
    by_from = defaultdict(dict)
    for (f, t), n in pairs.items():
        by_from[f][t] = n
    rows = {r.from_type: r for r in
            B.q213_next_event_accuracy(spark, SF_DIR).collect()}
    assert set(rows) == set(by_from)
    for f, tos in by_from.items():
        pred = sorted(tos.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        total = sum(tos.values())
        correct = tos[pred]
        r = rows[f]
        assert r.predicted_next == pred
        assert (r.n_transitions, r.n_correct) == (total, correct)
        assert abs(r.accuracy - correct / total) < 1e-6
        # the majority baseline can't do worse than uniform
        assert r.accuracy >= 1 / len(by_from) - 1e-9


def test_q214_eb_shrinkage_matches_bruteforce(spark):
    from collections import defaultdict

    from weatherapi_data_engineering_project_spark.plans import (
        behavior as B,
    )

    docs = _docs(spark)
    agg = defaultdict(lambda: [0, 0])
    for r in docs:
        a = agg[r.source]
        a[0] += 1
        a[1] += r.lang == "en"
    ps = {s: round(x / n, 9) for s, (n, x) in agg.items()}
    kk = len(ps)
    m = sum(ps.values()) / kk
    v = sum(round(p * p, 9) for p in ps.values()) / kk - m * m
    w = max(m * (1 - m) / v - 1, 0.0) if (v > 0 and 0 < m < 1) else 0.0
    rows = {r.source: r for r in
            B.q214_eb_shrinkage(spark, SF_DIR).collect()}
    assert set(rows) == set(agg)
    for src, (n, x) in agg.items():
        r = rows[src]
        assert (r.n_docs, r.n_en) == (n, x)
        assert abs(r.raw_rate - x / n) < 1e-6
        assert abs(r.prior_mean - m) < 1e-6
        assert abs(r.prior_strength - w) < 1e-4
        assert abs(r.shrunk_rate - (x + w * m) / (n + w)) < 1e-5
        # shrinkage moves every rate TOWARD the prior mean
        lo, hi = sorted((r.raw_rate, r.prior_mean))
        assert lo - 1e-9 <= r.shrunk_rate <= hi + 1e-9


def test_q215_nucleus_coverage_matches_bruteforce(spark):
    from collections import Counter, defaultdict

    from weatherapi_data_engineering_project_spark.plans import (
        curation as C,
    )

    docs = _docs(spark)
    by_src = defaultdict(Counter)
    for r in docs:
        toks = [t for t in re.split(r"\s+", r.text.lower().strip()) if t]
        by_src[r.source].update(toks)
    rows = {r.source: r for r in
            C.q215_nucleus_coverage(spark, SF_DIR).collect()}
    assert set(rows) == set(by_src)
    for src, cc in by_src.items():
        t = sum(cc.values())
        ranked = sorted(cc.items(), key=lambda kv: (-kv[1], kv[0]))
        cum = 0
        for i, (_term, c) in enumerate(ranked, start=1):
            cum += c
            if 5 * cum >= 4 * t:
                break
        r = rows[src]
        assert (r.n_tokens, r.vocab, r.n_top_p) == (t, len(cc), i)
        assert abs(r.top_p_share - cum / t) < 1e-6
        assert r.top_p_share >= 0.8 - 1e-9
        assert r.n_top_p <= r.vocab


def test_q216_simpson_audit_matches_bruteforce(spark):
    from collections import defaultdict
    from decimal import Decimal

    from weatherapi_data_engineering_project_spark.plans import (
        behavior as B,
    )

    ev = load_table(spark, SF_DIR, "events").collect()
    spend = defaultdict(Decimal)
    for r in ev:
        if r.event_type == "purchase":
            spend[r.user_id] += Decimal(str(round(r.value, 6)))
        else:
            spend[r.user_id] += 0
    users = sorted(spend)
    total = sum(spend.values())
    n = len(users)
    cells = defaultdict(lambda: [0, 0, 0, 0])  # na xa nb xb
    for u in users:
        conv = 1 if spend[u] * n > total else 0
        st = (u // 2) % 3
        c = cells[st]
        if u % 2 == 0:
            c[0] += 1
            c[1] += conv
        else:
            c[2] += 1
            c[3] += conv
    pna = sum(c[0] for c in cells.values())
    pxa = sum(c[1] for c in cells.values())
    pnb = sum(c[2] for c in cells.values())
    pxb = sum(c[3] for c in cells.values())

    def sign(v):
        return (v > 0) - (v < 0)

    pd = sign(pxa * pnb - pxb * pna)
    sdirs = [sign(c[1] * c[2] - c[3] * c[0]) for c in cells.values()]
    got = B.q216_simpson_audit(spark, SF_DIR).collect()[0]
    assert (got.n_a, got.x_a, got.n_b, got.x_b) == (pna, pxa, pnb, pxb)
    assert got.pooled_dir == pd
    assert got.n_strata == len(cells)
    assert got.n_same == sum(1 for s in sdirs if s == pd and s != 0)
    assert got.n_opposite == sum(1 for s in sdirs if s == -pd and s != 0)
    assert got.paradox == (pd != 0 and got.n_opposite == got.n_strata)


def test_q217_correlation_matrix_matches_numpy(spark):
    import numpy as np

    from weatherapi_data_engineering_project_spark.plans import (
        analytics as A,
    )

    li = load_table(spark, SF_DIR, "lineitem").collect()
    cols = {
        "qty": np.array([float(r.l_quantity) for r in li]),
        "price": np.array([float(r.l_extendedprice) for r in li]),
        "disc": np.array([float(r.l_discount) for r in li]),
        "tax": np.array([float(r.l_tax) for r in li]),
    }
    rows = {(r.col_x, r.col_y): r for r in
            A.q217_correlation_matrix(spark, SF_DIR).collect()}
    names = ["qty", "price", "disc", "tax"]
    want_pairs = {(a, b) for i, a in enumerate(names)
                  for b in names[i + 1:]}
    assert set(rows) == want_pairs
    for (a, b), r in rows.items():
        assert r.n == len(li)
        want = np.corrcoef(cols[a], cols[b])[0, 1]
        assert abs(r.r - want) < 1e-5, (a, b)
        assert -1.0 - 1e-9 <= r.r <= 1.0 + 1e-9


def test_q219_shipping_priority_matches_bruteforce(spark):
    import datetime
    from collections import defaultdict
    from decimal import Decimal

    from weatherapi_data_engineering_project_spark.plans import (
        extensions as X,
    )

    cust = {r.c_custkey for r in
            load_table(spark, SF_DIR, "customer").collect()
            if r.c_mktsegment == "BUILDING"}
    cutoff = datetime.datetime(1998, 1, 1)
    orders = {r.o_orderkey: r for r in
              load_table(spark, SF_DIR, "orders").collect()
              if r.o_orderdate < cutoff and r.o_custkey in cust}
    rev = defaultdict(Decimal)
    for r in load_table(spark, SF_DIR, "lineitem").collect():
        if r.l_shipdate > cutoff and r.l_orderkey in orders:
            p = Decimal(str(round(float(r.l_extendedprice), 2)))
            d = Decimal(str(round(float(r.l_discount), 2)))
            rev[r.l_orderkey] += p * (1 - d)
    want = sorted(
        ((-v, orders[k].o_orderdate, k) for k, v in rev.items())
    )[:10]
    got = X.q219_shipping_priority(spark, SF_DIR).collect()
    assert len(got) == min(10, len(rev))
    got_sorted = sorted(got, key=lambda r: (-r.revenue, r.o_orderdate,
                                            r.l_orderkey))
    for g, (nv, od, k) in zip(got_sorted, want):
        assert g.l_orderkey == k
        assert abs(g.revenue - float(-nv)) < 1e-6
        assert g.o_orderdate == od
        assert g.o_orderpriority == orders[k].o_orderpriority


def test_q220_nation_volume_matches_bruteforce(spark):
    from collections import defaultdict
    from decimal import Decimal

    from weatherapi_data_engineering_project_spark.plans import (
        extensions as X,
    )

    nat = {r.n_nationkey: r.n_name for r in
           load_table(spark, SF_DIR, "nation").collect()}
    supp = {r.s_suppkey: nat[r.s_nationkey] for r in
            load_table(spark, SF_DIR, "supplier").collect()}
    cust = {r.c_custkey: nat[r.c_nationkey] for r in
            load_table(spark, SF_DIR, "customer").collect()}
    ocust = {r.o_orderkey: r.o_custkey for r in
             load_table(spark, SF_DIR, "orders").collect()}
    pair = {"NATION_1", "NATION_2"}
    agg = defaultdict(lambda: [0, Decimal(0)])
    for r in load_table(spark, SF_DIR, "lineitem").collect():
        sn = supp.get(r.l_suppkey)
        cn = cust.get(ocust.get(r.l_orderkey))
        if sn in pair and cn in pair and sn != cn:
            p = Decimal(str(round(float(r.l_extendedprice), 2)))
            d = Decimal(str(round(float(r.l_discount), 2)))
            a = agg[(sn, cn, r.l_shipdate.year)]
            a[0] += 1
            a[1] += p * (1 - d)
    rows = {(r.supp_nation, r.cust_nation, r.l_year): r for r in
            X.q220_nation_volume(spark, SF_DIR).collect()}
    assert set(rows) == set(agg)
    for k, (n, v) in agg.items():
        assert rows[k].n_items == n
        assert abs(rows[k].revenue - float(v)) < 1e-6


def test_q221_bounce_rate_matches_bruteforce(spark):
    from collections import defaultdict

    from weatherapi_data_engineering_project_spark.plans import (
        behavior as B,
    )

    ev = sorted(load_table(spark, SF_DIR, "events").collect(),
                key=lambda r: (r.user_id, r.ts, r.event_id))
    gap = 4 * 3600
    sessions = []
    cur = None
    for r in ev:
        if (cur is None or r.user_id != cur[0]
                or (r.ts - cur[2]).total_seconds() > gap):
            if cur:
                sessions.append(cur)
            cur = [r.user_id, r.ts, r.ts, 0]
        cur[2] = r.ts
        cur[3] += 1
    if cur:
        sessions.append(cur)
    agg = defaultdict(lambda: [0, 0])
    for _u, start, _end, n in sessions:
        a = agg[start.date()]
        a[0] += 1
        a[1] += n == 1
    rows = {r.day: r for r in
            B.q221_bounce_rate(spark, SF_DIR).collect()}
    assert set(rows) == set(agg)
    for day, (ns, nb) in agg.items():
        r = rows[day]
        assert (r.n_sessions, r.n_bounces) == (ns, nb)
        assert abs(r.bounce_rate - nb / ns) < 1e-6


def test_q222_dimension_audit_matches_numpy(spark):
    import numpy as np

    from weatherapi_data_engineering_project_spark.plans import llm as L

    vecs = np.array(
        [r.embedding for r in
         load_table(spark, SF_DIR, "embeddings").collect()],
        dtype=np.float64,
    )
    rows = {r.pos: r for r in
            L.q222_dimension_audit(spark, SF_DIR).collect()}
    assert set(rows) == set(range(vecs.shape[1]))
    for pos in rows:
        col = vecs[:, pos]
        r = rows[pos]
        assert r.n_vecs == len(col)
        assert abs(r.mean - col.mean()) < 1e-5
        assert abs(r.variance - col.var(ddof=1)) < 1e-5
        assert r.collapsed == (r.variance < 1e-4)


def test_q223_dedup_bias_matches_bruteforce(spark):
    import hashlib
    import math
    from collections import defaultdict

    from weatherapi_data_engineering_project_spark.plans import llm as L

    docs = _docs(spark)
    keep = {}
    for r in docs:
        fp = hashlib.md5(r.text.encode()).hexdigest()
        if fp not in keep or r.doc_id < keep[fp]:
            keep[fp] = r.doc_id
    kept_ids = set(keep.values())
    pre = defaultdict(int)
    post = defaultdict(int)
    for r in docs:
        pre[r.lang] += 1
        if r.doc_id in kept_ids:
            post[r.lang] += 1
    t_pre, t_post = sum(pre.values()), sum(post.values())
    rows = {r.lang: r for r in
            L.q223_dedup_bias_audit(spark, SF_DIR).collect()}
    assert set(rows) == set(pre)
    psi_total = 0.0
    for lang, np_ in pre.items():
        r = rows[lang]
        assert (r.n_pre, r.n_post) == (np_, post[lang])
        assert abs(r.share_pre - np_ / t_pre) < 1e-6
        assert abs(r.share_post - post[lang] / t_post) < 1e-6
        assert r.vanished == (post[lang] == 0)
        if post[lang] > 0:
            pp, pq = post[lang] / t_post, np_ / t_pre
            want = (pp - pq) * math.log(pp / pq)
            assert abs(r.psi_contrib - want) < 1e-6
            psi_total += want
            # each PSI term is non-negative by construction
            assert r.psi_contrib >= -1e-12
    assert psi_total >= 0


def test_q224_small_cell_suppression_invariants(spark):
    from collections import defaultdict

    from weatherapi_data_engineering_project_spark.plans import (
        curation as C,
    )

    cust = load_table(spark, SF_DIR, "customer").collect()
    cells = defaultdict(int)
    for r in cust:
        cells[(r.c_nationkey, r.c_mktsegment)] += 1
    rows = C.q224_small_cell_suppression(spark, SF_DIR).collect()
    assert {(r.c_nationkey, r.c_mktsegment) for r in rows} == set(cells)
    margins = defaultdict(lambda: [0, 0])
    for (nk, seg), n in cells.items():
        m = margins[nk]
        if n >= 5:
            m[0] += n
        else:
            m[1] += 1
    for r in rows:
        n = cells[(r.c_nationkey, r.c_mktsegment)]
        assert r.suppressed == (n < 5)
        # the publication NEVER carries a sub-threshold count
        assert r.published_n is None if n < 5 else r.published_n == n
        assert r.nation_published_total == margins[r.c_nationkey][0]
        assert r.nation_suppressed_cells == margins[r.c_nationkey][1]


def test_quantile_bounds_empty_frame_falls_back_to_single_bucket(spark):
    """ADVICE r06: an empty frame must degrade to one bucket, not an
    opaque empty-literal-array error."""
    from pyspark.sql import functions as F

    from weatherapi_data_engineering_project_spark.plans._buckets import (
        bucket_of,
        quantile_bounds,
    )

    empty = spark.createDataFrame([], "v double")
    bnds = quantile_bounds(empty, "v")
    assert bnds == [0.0]
    some = spark.createDataFrame([(1.0,), (5.0,)], "v double")
    out = some.withColumn("_bkt", bucket_of("v", bnds)).collect()
    assert {r._bkt for r in out} == {1}  # both above the lone bound


def test_q225_weekly_growth_matches_bruteforce(spark):
    import datetime
    from collections import defaultdict
    from decimal import Decimal

    from weatherapi_data_engineering_project_spark.plans import (
        temporal as T,
    )

    ev = load_table(spark, SF_DIR, "events").collect()
    epoch = datetime.date(1970, 1, 1)
    wk = defaultdict(lambda: [0, Decimal(0)])
    for r in ev:
        w = (r.ts.date() - epoch).days // 7
        wk[w][0] += 1
        if r.event_type == "purchase":
            wk[w][1] += Decimal(str(round(r.value, 2)))
    weeks = sorted(wk)
    rows = {r.week: r for r in
            T.q225_weekly_growth(spark, SF_DIR).collect()}
    assert set(rows) == set(wk)
    for i, w in enumerate(weeks):
        r = rows[w]
        assert r.n_events == wk[w][0]
        assert abs(r.revenue - float(wk[w][1])) < 1e-6
        prev = float(wk[weeks[i - 1]][1]) if i else None
        if prev is None:
            assert r.prev_revenue is None and r.wow_change is None
        else:
            assert abs(r.prev_revenue - prev) < 1e-6
            if prev > 0:
                assert abs(r.wow_change
                           - (float(wk[w][1]) - prev) / prev) < 1e-6
        window = [float(wk[x][1]) for x in weeks[max(0, i - 3):i + 1]]
        assert abs(r.avg_4wk - sum(window) / len(window)) < 1e-6


def test_q226_burstiness_matches_bruteforce(spark):
    import math
    from collections import defaultdict

    from weatherapi_data_engineering_project_spark.plans import (
        behavior as B,
    )

    ev = sorted(load_table(spark, SF_DIR, "events").collect(),
                key=lambda r: (r.event_type, r.user_id, r.ts, r.event_id))
    gaps = defaultdict(list)
    for a, b in zip(ev, ev[1:]):
        if (a.event_type, a.user_id) == (b.event_type, b.user_id):
            us = int((b.ts - a.ts).total_seconds() * 1_000_000)
            gaps[a.event_type].append(us)
    rows = {r.event_type: r for r in
            B.q226_gap_burstiness(spark, SF_DIR).collect()}
    assert set(rows) == set(gaps)
    for et, gs in gaps.items():
        n = len(gs)
        mu = sum(gs) / n
        sd = math.sqrt(sum(g * g for g in gs) / n - mu * mu)
        r = rows[et]
        assert r.n_gaps == n
        assert abs(r.mean_gap_s - mu / 1e6) < 1e-4
        want = (sd - mu) / (sd + mu)
        assert abs(r.burstiness - want) < 1e-5
        assert -1.0 <= r.burstiness <= 1.0


def test_q227_supplier_concentration_matches_bruteforce(spark):
    from collections import defaultdict

    from weatherapi_data_engineering_project_spark.plans import (
        extensions as X,
    )

    li = load_table(spark, SF_DIR, "lineitem").collect()
    ps = defaultdict(int)
    for r in li:
        ps[(r.l_partkey, r.l_suppkey)] += 1
    parts = defaultdict(lambda: [0, 0, 0])  # tot, max, n_supp
    for (pk, _sk), c in ps.items():
        p = parts[pk]
        p[0] += c
        p[1] = max(p[1], c)
        p[2] += 1
    hist = defaultdict(lambda: [0, 0])
    for tot, maxc, n_supp in parts.values():
        b = min(10 * maxc // tot, 9)
        hist[b][0] += 1
        hist[b][1] += n_supp == 1
    t = len(parts)
    rows = {r.share_bucket: r for r in
            X.q227_supplier_concentration(spark, SF_DIR).collect()}
    assert set(rows) == set(hist)
    for b, (np_, ns) in hist.items():
        r = rows[b]
        assert (r.n_parts, r.n_sole_supplier) == (np_, ns)
        assert abs(r.part_share - np_ / t) < 1e-6
