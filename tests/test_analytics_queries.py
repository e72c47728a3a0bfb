"""Differential tests: analytics queries (sessionize / as-of / rollup /
set ops) vs their DuckDB oracles, plus semantic unit checks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from weatherapi_data_engineering_project_spark.plans import analytics as A
from tests.conftest import SF_DIR, compare_query_to_oracle


@pytest.mark.parametrize("name", sorted(A.QUERIES))
def test_analytics_query_matches_oracle(spark, name):
    compare_query_to_oracle(spark, name, A.QUERIES[name], A.ORACLE[name], SF_DIR)


def test_sessionize_invariants(spark):
    """Sessions are disjoint, ordered, and cover every event exactly once."""
    sess = A.q31_sessionize(spark, SF_DIR)
    from weatherapi_data_engineering_project_spark.schemas import load_table

    n_events = load_table(spark, SF_DIR, "events").count()
    agg = sess.agg(
        F.sum("n_events").alias("total"),
        F.min("session_idx").alias("min_idx"),
    ).collect()[0]
    assert agg.total == n_events
    assert agg.min_idx == 1
    # within a user, sessions don't overlap: end(i) < start(i+1)
    bad = (
        sess.alias("a")
        .join(
            sess.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.session_idx") + 1 == F.col("b.session_idx"))
            & (F.col("a.session_end") >= F.col("b.session_start")),
        )
        .count()
    )
    assert bad == 0


def test_asof_never_future(spark):
    """The matched purchase timestamp is never after the click."""
    res = A.q32_asof_join(spark, SF_DIR)
    assert res.filter(F.col("last_purchase_ts") > F.col("ts")).count() == 0


def test_rollup_totals_consistent(spark):
    """Grand total row equals the sum of the leaf rows."""
    r = A.q33_rollup(spark, SF_DIR).collect()
    leaves = [x for x in r if x.status != "ALL" and x.priority != "ALL"]
    grand = [x for x in r if x.status == "ALL" and x.priority == "ALL"]
    assert len(grand) == 1
    assert sum(x.n_orders for x in leaves) == grand[0].n_orders


def test_q43_approx_distinct_error_bound(spark):
    """HLL++ estimate within the configured 2% rsd (loose 3x bound) of
    the exact distinct count."""
    from weatherapi_data_engineering_project_spark.plans.streaming_queries import (
        q43_approx_distinct,
    )
    from weatherapi_data_engineering_project_spark.schemas import load_table

    approx = {r.event_type: r.n_users_approx
              for r in q43_approx_distinct(spark, SF_DIR).collect()}
    exact = {
        r.event_type: r.n
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for et, n in exact.items():
        assert abs(approx[et] - n) <= max(2, 0.06 * n), (et, approx[et], n)


def test_table_stats_matches_direct_aggregates(spark):
    """The melted stats equal per-column aggregates computed directly
    on the wide frame (no Expand) — same numbers, different plan."""
    from decimal import Decimal

    from pyspark.sql import functions as F

    from weatherapi_data_engineering_project_spark.plans.analytics import (
        _STATS_COLS,
    )
    from weatherapi_data_engineering_project_spark.schemas import load_table

    got = {r.col_name: r for r in A.q111_table_stats(spark, SF_DIR).collect()}
    li = load_table(spark, SF_DIR, "lineitem")
    n = li.count()
    for c in _STATS_COLS:
        direct = li.agg(
            F.countDistinct(c).alias("ndv"),
            F.min(c).alias("mn"),
            F.max(c).alias("mx"),
            F.sum(F.col(c).cast("decimal(18,2)")).cast("double").alias("s"),
        ).collect()[0]
        r = got[c]
        assert r.n_rows == n and r.n_null == 0
        assert r.ndv == direct.ndv
        assert r.min_val == direct.mn and r.max_val == direct.mx
        assert r.sum_val == direct.s


def test_quality_constraints_detects_planted_violation(spark):
    """The suite's temporal constraint flags the generator's real
    ship-before-order rows; the clean constraints all pass."""
    rows = {r.constraint_name: r
            for r in A.q115_quality_constraints(spark, SF_DIR).collect()}
    assert len(rows) == 6
    temporal = rows["lineitem.l_shipdate >= order date"]
    assert not temporal.passed and temporal.n_violations > 0
    for name, r in rows.items():
        if name != "lineitem.l_shipdate >= order date":
            assert r.passed and r.n_violations == 0
        assert r.n_checked > 0


def test_join_cardinality_estimate_is_sane(spark):
    r = A.q116_join_cardinality_estimate(spark, SF_DIR).collect()[0]
    assert r.exact_n > 0 and r.est_n >= 0
    # 1/8 pk-sample of a pk-fk join: estimate within 50% at tiny SF
    assert abs(r.est_n - r.exact_n) / r.exact_n < 0.5
    assert r.rel_err == round(abs(r.est_n - r.exact_n) / r.exact_n, 6)


def test_chisq_contingency_invariants(spark):
    """Cell contributions sum to the repeated table statistic, expected
    counts preserve the grand total, and dof matches the observed
    table dimensions."""
    rows = A.q124_chisq_independence(spark, SF_DIR).collect()
    assert rows
    chi2 = rows[0].chi2
    dof = rows[0].dof
    assert all(r.chi2 == chi2 and r.dof == dof for r in rows)
    assert abs(sum(r.contrib for r in rows) - chi2) < 1e-6
    n_src = len({r.source for r in rows})
    n_buck = len({r.bucket_cap for r in rows})
    assert dof == (n_src - 1) * (n_buck - 1)
    # expected under independence preserves the grand total
    assert abs(sum(r.expected for r in rows) - sum(r.o for r in rows)) < 0.01
    assert all(r.contrib >= 0 for r in rows)


def test_ols_fit_matches_numpy(spark):
    """Closed-form per-source OLS agrees with numpy's lstsq fit."""
    import numpy as np

    from weatherapi_data_engineering_project_spark.functions import text as TX
    from weatherapi_data_engineering_project_spark.schemas import load_table

    rows = {r.source: r for r in A.q126_ols_fit(spark, SF_DIR).collect()}
    assert rows
    d = (
        load_table(spark, SF_DIR, "documents")
        .select(
            "source",
            F.size(TX.tokens("text")).alias("x"),
            F.col("n_chars").alias("y"),
        )
        .collect()
    )
    src = next(iter(rows))
    xs = np.array([r.x for r in d if r.source == src], dtype=float)
    ys = np.array([r.y for r in d if r.source == src], dtype=float)
    slope, icept = np.polyfit(xs, ys, 1)
    got = rows[src]
    assert abs(got.slope - slope) < 1e-4
    assert abs(got.intercept - icept) < 1e-3
    assert got.n == len(xs)
    for r in rows.values():
        assert 0.0 <= r.r2 <= 1.0
        # chars grow with tokens: every source's slope is positive
        assert r.slope > 0


def test_ks_drift_matches_scipy_style_ecdf(spark):
    """KS statistic equals the brute-force max ECDF gap for one pair,
    every pair appears once, and the stat is a valid distance."""
    from weatherapi_data_engineering_project_spark.functions import text as TX
    from weatherapi_data_engineering_project_spark.schemas import load_table

    rows = A.q127_ks_drift(spark, SF_DIR).collect()
    langs = {r.lang1 for r in rows} | {r.lang2 for r in rows}
    assert len(rows) == len(langs) * (len(langs) - 1) // 2
    d = (
        load_table(spark, SF_DIR, "documents")
        .select("lang", F.size(TX.tokens("text")).alias("v"))
        .collect()
    )
    r0 = rows[0]
    s1 = sorted(x.v for x in d if x.lang == r0.lang1)
    s2 = sorted(x.v for x in d if x.lang == r0.lang2)
    grid = sorted(set(s1) | set(s2))
    ks = max(
        abs(
            sum(1 for x in s1 if x <= v) / len(s1)
            - sum(1 for x in s2 if x <= v) / len(s2)
        )
        for v in grid
    )
    assert abs(r0.ks - ks) < 1e-6
    assert r0.n1 == len(s1) and r0.n2 == len(s2)
    for r in rows:
        assert 0.0 <= r.ks <= 1.0
        assert r.peak_len in {x.v for x in d}


def test_mad_outliers_matches_numpy(spark):
    """Median and MAD agree with numpy's interpolated median per
    source, and the outlier count is the brute-force count."""
    import numpy as np

    from weatherapi_data_engineering_project_spark.functions import text as TX
    from weatherapi_data_engineering_project_spark.schemas import load_table

    rows = {r.source: r for r in A.q131_mad_outliers(spark, SF_DIR).collect()}
    d = (
        load_table(spark, SF_DIR, "documents")
        .select("source", F.size(TX.tokens("text")).alias("v"))
        .collect()
    )
    by_src = {}
    for r in d:
        by_src.setdefault(r.source, []).append(r.v)
    assert set(rows) == set(by_src)
    for src, vals in by_src.items():
        got = rows[src]
        med = float(np.median(vals))
        devs = [abs(v - med) for v in vals]
        mad = float(np.median(devs))
        assert got.median_tok == med
        assert got.mad == mad
        assert got.n_outliers == sum(1 for dv in devs if dv > 3 * mad)
        assert got.n_docs == len(vals)


def test_key_skew_audit_matches_numpy_moments(spark):
    """Closed-form moment profile equals numpy's population moments of
    the per-supplier count distribution."""
    import numpy as np

    from weatherapi_data_engineering_project_spark.schemas import load_table

    r = A.q135_key_skew_audit(spark, SF_DIR).collect()[0]
    counts = np.array(
        [
            x.k
            for x in load_table(spark, SF_DIR, "lineitem")
            .groupBy("l_suppkey")
            .agg(F.count(F.lit(1)).alias("k"))
            .collect()
        ],
        dtype=float,
    )
    mean = counts.mean()
    m2 = ((counts - mean) ** 2).mean()
    m3 = ((counts - mean) ** 3).mean()
    m4 = ((counts - mean) ** 4).mean()
    assert r.n_keys == len(counts)
    assert abs(r.mean_ct - mean) < 1e-6
    assert abs(r.variance - m2) < 1e-4
    assert abs(r.skewness - m3 / m2**1.5) < 1e-4
    assert abs(r.kurtosis_excess - (m4 / m2**2 - 3)) < 1e-4
    assert r.max_ct == counts.max()
    assert abs(r.max_over_mean - counts.max() / mean) < 1e-6


def test_global_ntile_matches_builtin_ntile(spark):
    """The two-phase bucketed ntile reproduces F.ntile over a single
    global window bit-for-bit, including the remainder rule and
    tiebreaks, on a frame with heavy ties."""
    from pyspark.sql.window import Window as Wnd

    from weatherapi_data_engineering_project_spark.plans.analytics import (
        _global_ntile,
    )

    rows = [(i, (i * 7) % 13) for i in range(257)]  # ties everywhere
    df = spark.createDataFrame(rows, "id long, v long")
    got = {
        r.id: r.s
        for r in _global_ntile(df, "v", "id", 4, "s").collect()
    }
    want = {
        r.id: r.s
        for r in df.select(
            "id", F.ntile(4).over(Wnd.orderBy("v", "id")).alias("s")
        ).collect()
    }
    assert got == want
    desc_got = {
        r.id: r.s
        for r in _global_ntile(
            df, "v", "id", 4, "s", ascending=False
        ).collect()
    }
    desc_want = {
        r.id: r.s
        for r in df.select(
            "id",
            F.ntile(4)
            .over(Wnd.orderBy(F.desc("v"), F.asc("id")))
            .alias("s"),
        ).collect()
    }
    assert desc_got == desc_want


def test_rfm_segments_cover_all_customers(spark):
    """Every ordering customer lands in exactly one cell; quartile
    scores are 1..4 and cell sizes are near-balanced per axis."""
    from weatherapi_data_engineering_project_spark.schemas import load_table

    rows = A.q137_rfm_segments(spark, SF_DIR).collect()
    n_cust = (
        load_table(spark, SF_DIR, "orders")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert sum(r.n_customers for r in rows) == n_cust
    for axis in ("r_score", "f_score", "m_score"):
        per = {}
        for r in rows:
            per[getattr(r, axis)] = per.get(getattr(r, axis), 0) + r.n_customers
        assert set(per) == {1, 2, 3, 4}
        assert max(per.values()) - min(per.values()) <= 1


def test_brand_affinity_lift_brute_force(spark):
    """Lift values match the brute-force basket computation."""
    from collections import Counter
    from itertools import combinations

    from weatherapi_data_engineering_project_spark.schemas import load_table

    got = {
        (r.brand1, r.brand2): (r.co_orders, r.lift)
        for r in A.q138_brand_affinity(spark, SF_DIR).collect()
    }
    li = load_table(spark, SF_DIR, "lineitem")
    p = load_table(spark, SF_DIR, "part")
    rows = (
        li.join(p, li.l_partkey == p.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
        .collect()
    )
    baskets = {}
    for r in rows:
        baskets.setdefault(r.l_orderkey, set()).add(r.p_brand)
    n = len(baskets)
    bc = Counter(b for s in baskets.values() for b in s)
    co = Counter(
        pair
        for s in baskets.values()
        for pair in combinations(sorted(s), 2)
    )
    want = {
        pair: (c, round(c * n / (bc[pair[0]] * bc[pair[1]]), 6))
        for pair, c in co.items()
        if c >= 5
    }
    assert got == want


def test_fd_audit_verdicts(spark):
    """The control PK dependency and the dimensional hierarchy hold;
    the two expected violations are detected with real counts."""
    rows = {r.fd: r for r in A.q140_fd_audit(spark, SF_DIR).collect()}
    assert len(rows) == 4
    assert rows["nation.n_nationkey -> n_regionkey"].holds
    assert rows["documents.doc_id -> lang"].holds
    src_lang = rows["documents.source -> lang"]
    assert not src_lang.holds and src_lang.n_violating_groups > 0
    assert src_lang.max_distinct_rhs > 1
    cust = rows["orders.o_custkey -> o_orderpriority"]
    assert not cust.holds and cust.n_violating_groups > 0


def test_pareto_abc_partitions_and_order(spark):
    """Classes partition all ordering customers; shares sum to 1; the
    A class really carries ~80% with the fewest-per-revenue customers
    (its avg spend exceeds C's)."""
    from weatherapi_data_engineering_project_spark.schemas import load_table

    rows = {r.abc_class: r for r in A.q150_pareto_abc(spark, SF_DIR).collect()}
    assert set(rows) == {"A", "B", "C"}
    n_cust = (
        load_table(spark, SF_DIR, "orders")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert sum(r.n_customers for r in rows.values()) == n_cust
    assert abs(sum(r.revenue_share for r in rows.values()) - 1.0) < 1e-4
    assert rows["A"].revenue_share <= 0.8 + 1e-9
    assert (
        rows["A"].revenue / rows["A"].n_customers
        > rows["C"].revenue / rows["C"].n_customers
    )


def test_amount_reconciliation_detects_generator_drift(spark):
    """The audit covers every order and correctly reports that this
    generator draws header totals independently of line items (100%
    mismatch beyond the 5-cent tolerance, zero orders without
    lines)."""
    from weatherapi_data_engineering_project_spark.schemas import load_table

    rows = A.q152_amount_reconciliation(spark, SF_DIR).collect()
    n_orders = load_table(spark, SF_DIR, "orders").count()
    assert sum(r.n_orders for r in rows) == n_orders
    for r in rows:
        # every order WITH lines mismatches; line-less orders are
        # excluded from the tolerance count (NULL comparison)
        assert r.n_mismatched == r.n_orders - r.n_no_lines
        assert r.max_abs_delta > 0
        assert r.sum_abs_delta >= r.max_abs_delta


def test_auc_equals_numpy_tie_averaged_rank_sum(spark):
    """The rank-sum AUC equals the textbook tie-averaged computation
    done in Python over the raw rows (what sklearn's roc_auc_score
    computes), and Gini is its affine twin."""
    import numpy as np

    from weatherapi_data_engineering_project_spark.schemas import load_table

    r = A.q155_score_auc(spark, SF_DIR).collect()[0]
    rows = (
        load_table(spark, SF_DIR, "documents")
        .select("n_chars", "lang")
        .collect()
    )
    sc = np.array([x.n_chars for x in rows], dtype=float)
    y = np.array([1 if x.lang == "en" else 0 for x in rows])
    order = np.argsort(sc, kind="stable")
    rk = np.empty(len(sc))
    s = sc[order]
    i, pos = 0, 1
    while i < len(s):
        j = i
        while j < len(s) and s[j] == s[i]:
            j += 1
        rk[order[i:j]] = (2 * pos + (j - i) - 1) / 2
        pos += j - i
        i = j
    n1, n0 = int(y.sum()), int(len(y) - y.sum())
    auc = (rk[y == 1].sum() - n1 * (n1 + 1) / 2) / (n1 * n0)
    assert (r.n_pos, r.n_neg) == (n1, n0)
    assert abs(r.auc - auc) < 1e-6
    assert abs(r.gini - (2 * r.auc - 1)) < 1e-9


def test_benford_audit_flags_uniform_generator(spark):
    """Chi-square/MAD recompute from raw counts in Python; the uniform
    price generator must fail Benford conformity decisively."""
    import math

    rows = sorted(
        A.q161_benford_audit(spark, SF_DIR).collect(),
        key=lambda r: r.digit,
    )
    n = sum(r.o for r in rows)
    chi2 = mad = 0.0
    for r in rows:
        p = round(math.log10(1 + 1 / r.digit), 9)
        assert abs(r.benford_share - p) < 1e-9
        e = n * p
        chi2 += (r.o - e) ** 2 / e
        mad += abs(round(r.o / n, 6) - p)
    mad /= len(rows)
    assert abs(rows[0].chi2 - chi2) < max(1e-6 * chi2, 1e-4)
    assert abs(rows[0].mad - mad) < 1e-5
    assert rows[0].chi2 > 100, "uniform prices must fail Benford hard"
    assert abs(sum(r.observed_share for r in rows) - 1.0) < 1e-4


def test_session_restatement_matches_python_resessionize(spark):
    """Classify sessions by re-sessionizing both snapshots in Python
    (4 h gap, ts+event_id order) and diffing on (user, start)."""
    import calendar

    from weatherapi_data_engineering_project_spark.plans.analytics import (
        _RESTATE_CUTOFF_US,
        SESSION_GAP_US,
    )
    from weatherapi_data_engineering_project_spark.schemas import load_table

    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_id", "ts"
    ).collect()

    def sessions(rows):
        out = {}  # (user, start) -> (end, count)
        by_user = {}
        for r in rows:
            by_user.setdefault(r[0], []).append((r[2], r[1]))
        for u, evs in by_user.items():
            evs.sort()
            st = en = evs[0][0]
            c = 0
            for us, _ in evs:
                if us - en > SESSION_GAP_US:
                    out[(u, st)] = (en, c)
                    st, c = us, 0
                en = us
                c += 1
            out[(u, st)] = (en, c)
        return out

    raw = []
    for e in ev:
        us = (
            calendar.timegm(e.ts.timetuple()) * 1_000_000
            + e.ts.microsecond
        )
        raw.append((e.user_id, e.event_id, us))
    s2 = sessions(raw)
    s1 = sessions([r for r in raw if r[2] <= _RESTATE_CUTOFF_US])
    want = {}
    for key, (en2, c2) in s2.items():
        if key not in s1:
            st = "new"
        elif s1[key] == (en2, c2):
            st = "unchanged"
        else:
            st = "extended"
        n, users = want.setdefault(st, [0, set()])
        want[st][0] += 1
        want[st][1].add(key[0])
    assert not (set(s1) - set(s2)), "a snapshot session vanished"

    rows = A.q164_session_restatement(spark, SF_DIR).collect()
    got = {r.status: (r.n_sessions, r.n_users) for r in rows}
    assert "vanished" not in got
    assert got == {
        st: (n, len(users)) for st, (n, users) in want.items()
    }
    # the audit is only interesting if the cutoff splits the log
    assert "new" in got and "unchanged" in got


def test_incremental_mv_audit_additivity_and_injected_breakage(spark):
    """The audit must certify additivity on the real log (all-zero
    mismatch counters), and a brute-force Python recompute confirms
    the group count; non-additivity would be caught because the
    comparison is exact decimal equality per group."""
    import calendar

    from weatherapi_data_engineering_project_spark.plans.analytics import (
        _RESTATE_CUTOFF_US,
    )
    from weatherapi_data_engineering_project_spark.schemas import load_table

    r = A.q176_incremental_mv_audit(spark, SF_DIR).collect()[0]
    assert r.groups_match
    assert r.n_missing == 0
    assert r.n_count_mismatch == 0
    assert r.n_sum_mismatch == 0

    ev = load_table(spark, SF_DIR, "events").select(
        "event_type", "ts"
    ).collect()
    groups = {
        (e.event_type, e.ts.date()) for e in ev
    }
    assert r.n_groups == len(groups)
    # the cutoff must actually split the log or the audit is vacuous
    split = [
        calendar.timegm(e.ts.timetuple()) * 1_000_000 + e.ts.microsecond
        <= _RESTATE_CUTOFF_US
        for e in ev
    ]
    assert any(split) and not all(split)


def test_bag_setops_match_python_counters(spark):
    """INTERSECT ALL / EXCEPT ALL multiplicities equal Counter
    min / difference — the bag semantics DISTINCT variants destroy."""
    from collections import Counter

    from weatherapi_data_engineering_project_spark.schemas import load_table

    o = load_table(spark, SF_DIR, "orders").select(
        "o_custkey", "o_orderpriority", "o_orderdate"
    ).collect()
    a = Counter(
        (r.o_custkey, r.o_orderpriority)
        for r in o
        if r.o_orderdate.year == 1996
    )
    b = Counter(
        (r.o_custkey, r.o_orderpriority)
        for r in o
        if r.o_orderdate.year == 1997
    )
    want_i = {k: min(v, b[k]) for k, v in a.items() if min(v, b[k]) > 0}
    want_x = {k: v - b[k] for k, v in a.items() if v - b[k] > 0}
    got_i, got_x = {}, {}
    for r in A.q180_bag_setops(spark, SF_DIR).collect():
        tgt = got_i if r.op == "intersect_all" else got_x
        tgt[(r.o_custkey, r.o_orderpriority)] = r.multiplicity
    assert got_i == want_i
    assert got_x == want_x
    # bag semantics must differ from set semantics somewhere
    assert any(v > 1 for v in want_i.values()) or any(
        v > 1 for v in want_x.values()
    )


def test_weighted_median_matches_python(spark):
    """Lower weighted median recomputed in Python under the same
    (price, orderkey) total order; also pins the defining property
    of the weighted median (cumweight crossing at the reported
    value)."""
    from weatherapi_data_engineering_project_spark.schemas import load_table

    wts = {}
    for r in load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey"
    ).collect():
        wts[r.l_orderkey] = wts.get(r.l_orderkey, 0) + 1
    groups: dict = {}
    for r in load_table(spark, SF_DIR, "orders").collect():
        if r.o_orderkey in wts:
            groups.setdefault(r.o_orderpriority, []).append(
                (round(r.o_totalprice, 2), r.o_orderkey, wts[r.o_orderkey])
            )
    rows = {
        r.o_orderpriority: r
        for r in A.q182_weighted_median(spark, SF_DIR).collect()
    }
    assert set(rows) == set(groups)
    for prio, items in groups.items():
        items.sort()
        tw = sum(w for _, _, w in items)
        c = 0
        for price, _, w in items:
            c += w
            if 2 * c >= tw:
                med = price
                break
        r = rows[prio]
        assert r.total_weight == tw
        assert abs(r.weighted_median - med) < 1e-9


def test_concurrent_sessions_matches_python_sweep(spark):
    """Per-day peak concurrency recomputed with a Python sweep over
    re-sessionized, midnight-clipped intervals (inclusive ends,
    starts-before-ends tie rule)."""
    import calendar
    from datetime import datetime, timedelta, timezone

    from weatherapi_data_engineering_project_spark.plans.analytics import (
        SESSION_GAP_US,
    )
    from weatherapi_data_engineering_project_spark.schemas import load_table

    by_user: dict = {}
    for e in load_table(spark, SF_DIR, "events").select(
        "user_id", "event_id", "ts"
    ).collect():
        us = (
            calendar.timegm(e.ts.timetuple()) * 1_000_000
            + e.ts.microsecond
        )
        by_user.setdefault(e.user_id, []).append((us, e.event_id))
    sessions = []
    for evs in by_user.values():
        evs.sort()
        st = en = evs[0][0]
        for us, _ in evs:
            if us - en > SESSION_GAP_US:
                sessions.append((st, en))
                st = us
            en = us
        sessions.append((st, en))

    def day_of(us):
        return datetime.fromtimestamp(
            us // 1_000_000, tz=timezone.utc
        ).date()

    per_day: dict = {}
    for st, en in sessions:
        d = day_of(st)
        while d <= day_of(en):
            d0 = int(
                datetime(
                    d.year, d.month, d.day, tzinfo=timezone.utc
                ).timestamp()
            ) * 1_000_000
            cst, cen = max(st, d0), min(en, d0 + 86_400_000_000 - 1)
            per_day.setdefault(d, []).append((cst, cen))
            d += timedelta(days=1)
    rows = {
        r.day: r
        for r in A.q184_concurrent_sessions(spark, SF_DIR).collect()
    }
    assert set(rows) == set(per_day)
    for d, ivs in per_day.items():
        bounds = sorted(
            [(s, -1) for s, _ in ivs] + [(e + 1, 1) for _, e in ivs]
        )  # delta encoded so starts (-1 key) sort before ends at ties
        peak = cur = 0
        for _, tag in bounds:
            cur += 1 if tag == -1 else -1
            peak = max(peak, cur)
        r = rows[d]
        assert r.n_sessions == len(ivs)
        assert r.peak_concurrency == peak
    assert any(r.peak_concurrency > 1 for r in rows.values())


def test_pareto_skyline_matches_brute_force(spark):
    """Skyline recomputed by the O(n²) dominance definition — the
    group-sweep rewrite must return exactly the non-dominated set."""
    import numpy as np

    from weatherapi_data_engineering_project_spark.schemas import load_table

    rows = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    ).collect()
    price = np.array([round(r.o_totalprice, 2) for r in rows])
    date = np.array(
        [r.o_orderdate.toordinal() if hasattr(r.o_orderdate, "toordinal")
         else r.o_orderdate.date().toordinal() for r in rows]
    )
    keys = np.array([r.o_orderkey for r in rows])
    dominated = np.zeros(len(rows), dtype=bool)
    for i in range(len(rows)):
        dom = (
            (price >= price[i])
            & (date <= date[i])
            & ((price > price[i]) | (date < date[i]))
        )
        dominated[i] = bool(dom.any())
    want = set(keys[~dominated].tolist())
    got = {
        r.o_orderkey
        for r in A.q189_pareto_skyline(spark, SF_DIR).collect()
    }
    assert got == want and got
    # frontier sanity: along the frontier price must STRICTLY increase
    # with date (an earlier point with >= price would dominate); equal
    # sort keys can only be exact (date, price) duplicates
    sky = sorted(
        (r.odate, r.price)
        for r in A.q189_pareto_skyline(spark, SF_DIR).collect()
    )
    for (d1, p1), (d2, p2) in zip(sky, sky[1:]):
        assert (d1 < d2 and p1 < p2) or (d1 == d2 and p1 == p2)


def test_q196_average_precision_matches_bruteforce(spark):
    """AP over the explicit (score DESC, doc_id ASC) order equals the
    textbook sum of precision-at-hit / R."""
    from weatherapi_data_engineering_project_spark.schemas import load_table

    d = load_table(spark, SF_DIR, "documents")
    rows = sorted(
        ((r.n_chars, r.doc_id, 1 if r.lang == "en" else 0)
         for r in d.collect()),
        key=lambda t: (-t[0], t[1]),
    )
    hits = cp = 0
    ap_sum = 0.0
    for k, (_s, _i, y) in enumerate(rows, start=1):
        if y:
            cp += 1
            hits += 1
            ap_sum += cp / k
    got = A.q196_average_precision(spark, SF_DIR).collect()[0]
    assert got.n_docs == len(rows)
    assert got.n_pos == hits
    assert abs(got.avg_precision - ap_sum / hits) < 1e-6
    assert 0.0 < got.avg_precision <= 1.0


def test_q197_gini_best_split_matches_bruteforce(spark):
    """Exhaustive scan over every candidate threshold agrees with the
    two-phase argmin, including the smallest-threshold tiebreak."""
    from collections import Counter

    from weatherapi_data_engineering_project_spark.schemas import load_table

    d = load_table(spark, SF_DIR, "documents")
    pts = [(r.n_chars, 1 if r.lang == "en" else 0) for r in d.collect()]
    n_total = len(pts)
    p_total = sum(y for _, y in pts)
    by_score = Counter()
    pos_by_score = Counter()
    for s, y in pts:
        by_score[s] += 1
        pos_by_score[s] += y
    best = None
    nl = pl = 0
    for s in sorted(by_score):
        nl += by_score[s]
        pl += pos_by_score[s]
        if nl == n_total:
            continue
        nr, pr = n_total - nl, p_total - pl
        g = (
            nl - (pl * pl + (nl - pl) * (nl - pl)) / nl
            + nr - (pr * pr + (nr - pr) * (nr - pr)) / nr
        ) / n_total
        key = (round(g, 9), s)
        if best is None or key < best[0]:
            best = (key, (s, nl, pl, nr, pr))
    got = A.q197_gini_best_split(spark, SF_DIR).collect()[0]
    s, nl, pl, nr, pr = best[1]
    assert (got.split_score, got.n_left, got.pos_left,
            got.n_right, got.pos_right) == (s, nl, pl, nr, pr)
    assert abs(got.gini - best[0][0]) < 1e-9
