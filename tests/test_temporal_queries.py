"""Temporal warehouse queries (q100-q102): differentials + semantics."""

from __future__ import annotations

from collections import defaultdict

import pytest

from tests.conftest import SF_DIR, SF_DIR_ORACLE, compare_query_to_oracle
from weatherapi_data_engineering_project_spark.plans import temporal as T


@pytest.mark.parametrize("name", sorted(T.ORACLE))
def test_temporal_oracle_differential(spark, name):
    compare_query_to_oracle(
        spark, name, T.QUERIES[name], T.ORACLE[name], SF_DIR_ORACLE
    )


def test_scd2_versions_chain(spark):
    """Versions are contiguous per user, valid_to chains into the next
    version's valid_from, and exactly one current row per user."""
    rows = T.q100_scd2_history(spark, SF_DIR).collect()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append(r)
    for user, vs in by_user.items():
        vs.sort(key=lambda r: r.version)
        assert [r.version for r in vs] == list(range(1, len(vs) + 1))
        assert sum(1 for r in vs if r.is_current) == 1
        for a, b in zip(vs, vs[1:]):
            assert a.valid_to == b.valid_from
            assert a.state != b.state  # runs collapse: no equal neighbors
        assert vs[-1].valid_to is None


def test_twap_bounded_by_value_range(spark):
    from pyspark.sql import functions as F

    from weatherapi_data_engineering_project_spark.schemas import load_table

    ev = load_table(spark, SF_DIR, "events")
    bounds = {
        r.user_id: (r.lo, r.hi)
        for r in ev.groupBy("user_id")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    for r in T.q101_twap(spark, SF_DIR).collect():
        lo, hi = bounds[r.user_id]
        assert lo - 1e-6 <= r.twap <= hi + 1e-6


def test_gapfill_carries_last_value_forward(spark):
    rows = T.q102_gapfill_locf(spark, SF_DIR).collect()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append(r)
    for user, days in by_user.items():
        days.sort(key=lambda r: r.day)
        # calendar is contiguous and starts/ends on observed days
        assert not days[0].filled and not days[-1].filled
        for a, b in zip(days, days[1:]):
            assert (b.day - a.day).days == 1
            if b.filled:
                assert b.value == a.value  # locf
        assert all(r.value is not None for r in days)


def test_daily_autocorr_matches_numpy_acf(spark):
    """ACF recomputed with numpy over the densified daily series —
    the n²-rescaled integer formula must equal the textbook
    estimator; lag-0 normalization sanity via the variance identity."""
    import calendar as _cal

    import numpy as np

    from weatherapi_data_engineering_project_spark.schemas import load_table

    days = defaultdict(int)
    for r in load_table(spark, SF_DIR, "events").select("ts").collect():
        days[r.ts.date()] += 1
    d0, d1 = min(days), max(days)
    n = (d1 - d0).days + 1
    x = np.zeros(n)
    for d, c in days.items():
        x[(d - d0).days] = c
    xc = x - x.mean()
    den = float((xc * xc).sum())
    rows = sorted(
        T.q169_daily_autocorr(spark, SF_DIR).collect(),
        key=lambda r: r.lag,
    )
    assert [r.lag for r in rows] == list(range(1, 8))
    for r in rows:
        k = r.lag
        assert r.n_pairs == max(n - k, 0)
        want = float((xc[:-k] * xc[k:]).sum()) / den
        assert abs(r.acf - want) < 1e-5
    assert any(abs(r.acf) > 1e-6 for r in rows) or n < 3


def test_cusum_changepoint_brute_force(spark):
    """q194: the D-scaled CUSUM curve recomputed with numpy over the
    densified calendar — exact integer equality, peak flag included,
    and the scaled curve must equal D*prefix - (t+1)*S."""
    import numpy as np

    from weatherapi_data_engineering_project_spark.schemas import load_table

    ev = load_table(spark, SF_DIR, "events").collect()
    cents: dict = {}
    for r in ev:
        if r.event_type == "purchase":
            d = r.ts.date()
            cents[d] = cents.get(d, 0) + round(r.value * 100)
    d0, d1 = min(cents), max(cents)
    ndays = (d1 - d0).days + 1
    x = np.zeros(ndays, dtype=np.int64)
    for d, c in cents.items():
        x[(d - d0).days] = c
    pref = np.cumsum(x)
    s = int(pref[-1])
    cus = ndays * pref - (np.arange(ndays) + 1) * s
    peak = np.abs(cus).max()
    got = sorted(
        T.q194_cusum_changepoint(spark, SF_DIR).collect(),
        key=lambda r: r.day,
    )
    assert len(got) == ndays
    for i, r in enumerate(got):
        assert r.rev_cents == int(x[i])
        assert r.cusum_scaled == int(cus[i])
        assert r.is_peak == (abs(int(cus[i])) == int(peak))
    assert sum(r.is_peak for r in got) >= 1
