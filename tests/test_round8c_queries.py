"""Round-8 batch-3 tests: nonparametric rank statistics (q251-q255).

Each test recomputes the statistic from first principles (pandas
midranks / numpy pair censuses) at sf0.001 and checks the engine's
value-level-rank rewrite reproduces it exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from weatherapi_data_engineering_project_spark.plans import analytics as AN

SF1 = "/root/testdata/sf0.001"


def _docs():
    return pd.read_parquet(f"{SF1}/documents.parquet")


def _li():
    return pd.read_parquet(f"{SF1}/lineitem.parquet")


def test_q251_mann_whitney_brute_force(spark):
    d = _docs()
    r2 = (2 * d.n_chars.rank(method="average")).round().astype(int)
    a = d.source.str.len() == 4
    n_a, n_b = int(a.sum()), int((~a).sum())
    r_a_x2 = int(r2[a].sum())
    u_a_x2 = r_a_x2 - n_a * (n_a + 1)
    t = d.n_chars.value_counts()
    tt = int((t**3 - t).sum())
    n = n_a + n_b
    z = (u_a_x2 / 2 - n_a * n_b / 2) / np.sqrt(
        n_a * n_b / 12 * ((n + 1) - tt / (n * (n - 1)))
    )
    row = AN.q251_mann_whitney(spark, SF1).collect()[0]
    assert (row.n_a, row.n_b, row.r_a_x2, row.u_a_x2) == (
        n_a, n_b, r_a_x2, u_a_x2,
    )
    assert abs(row.z_score - z) < 1e-6


def test_q252_spearman_matches_pandas(spark):
    li = _li()
    x = li.l_quantity.astype(int)
    y = (li.l_discount * 100).round().astype(int)
    rx = x.rank(method="average").to_numpy()
    ry = y.rank(method="average").to_numpy()
    expected = float(np.corrcoef(rx, ry)[0, 1])
    row = AN.q252_spearman_rank_corr(spark, SF1).collect()[0]
    assert row.n == len(li)
    assert abs(row.spearman_rho - expected) < 1e-6


def test_q253_kruskal_wallis_brute_force(spark):
    d = _docs()
    r = d.n_chars.rank(method="average")
    n = len(d)
    groups = d.assign(r=r).groupby("source").r
    h = 12 / (n * (n + 1)) * float(
        (groups.sum() ** 2 / groups.count()).sum()
    ) - 3 * (n + 1)
    t = d.n_chars.value_counts()
    hc = h / (1 - float((t**3 - t).sum()) / (n**3 - n))
    rows = AN.q253_kruskal_wallis(spark, SF1).collect()
    assert len(rows) == d.source.nunique()
    assert abs(rows[0].h_stat - h) < 1e-5
    assert abs(rows[0].h_corrected - hc) < 1e-5
    got_r = {r_.source: r_.r_x2 for r_ in rows}
    exp_r = (2 * groups.sum()).round().astype(int).to_dict()
    assert got_r == exp_r


def test_q254_kendall_tau_brute_force(spark):
    li = _li()
    x = li.l_quantity.astype(int).to_numpy()
    y = (li.l_discount * 100).round().astype(int).to_numpy()
    dx = np.sign(x[:, None] - x[None, :])
    dy = np.sign(y[:, None] - y[None, :])
    prod = dx * dy
    c = int((prod > 0).sum() // 2)
    d = int((prod < 0).sum() // 2)
    n = len(x)
    tx = pd.Series(x).value_counts()
    ty = pd.Series(y).value_counts()
    n0x2 = n * (n - 1)
    n1x2 = int((tx * (tx - 1)).sum())
    n2x2 = int((ty * (ty - 1)).sum())
    tau = (c - d) / (
        np.sqrt((n0x2 - n1x2) / 2) * np.sqrt((n0x2 - n2x2) / 2)
    )
    row = AN.q254_kendall_tau(spark, SF1).collect()[0]
    assert (row.concordant, row.discordant) == (c, d)
    assert (row.n0_x2, row.n1_x2, row.n2_x2) == (n0x2, n1x2, n2x2)
    assert abs(row.tau_b - tau) < 1e-6


def test_q255_theil_sen_brute_force(spark):
    li = _li()
    cents4 = (
        (li.l_extendedprice * 100).round().astype(np.int64)
        * (100 - (li.l_discount * 100).round().astype(np.int64))
    )
    m = li.assign(
        mon=li.l_shipdate.dt.to_period("M").dt.start_time, c4=cents4
    ).groupby("mon").c4.sum().sort_index()
    days = (m.index - pd.Timestamp("1995-01-01")).days.to_numpy()
    vals = m.to_numpy()
    slopes = []
    for i in range(len(m)):
        for j in range(i + 1, len(m)):
            slopes.append(
                (
                    float(vals[j] - vals[i]) / float(days[j] - days[i]),
                    m.index[i],
                    m.index[j],
                )
            )
    slopes.sort()
    n_pairs = len(slopes)
    med = slopes[(n_pairs + 1) // 2 - 1]
    row = AN.q255_theil_sen(spark, SF1).collect()[0]
    assert row.n_pairs == n_pairs
    assert abs(row.slope_per_day - med[0] / 10000) < 1e-6
    assert pd.Timestamp(row.median_m1) == med[1]
    assert pd.Timestamp(row.median_m2) == med[2]


def test_midrank_frame_is_value_level_and_bounded(spark):
    """The rank machinery never ranks rows: a 6-row frame with ties
    yields the textbook midranks via value-level counts only."""
    df = spark.createDataFrame(
        [(10, 2), (20, 3), (30, 1)], "v long, cnt long"
    )
    rows = {
        r.v: r.mr2 for r in AN._midrank2_frame(df, []).collect()
    }
    # values 10,10,20,20,20,30 -> midranks 1.5, 4, 6 -> doubled 3, 8, 12
    assert rows == {10: 3, 20: 8, 30: 12}