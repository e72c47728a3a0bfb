"""Round-8 wave-3 tests: Friedman (q280), Cochran Q (q281),
Brown-Forsythe (q282), table checksums (q283)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

SF1 = "/root/testdata/sf0.001"


def _pd(table):
    return pd.read_parquet(f"{SF1}/{table}.parquet")


def _cells():
    ev = _pd("events")
    cents = (ev.value * 100).round().astype(np.int64)
    return (
        pd.DataFrame({"u": ev.user_id, "t": ev.event_type, "c": cents})
        .groupby(["u", "t"])
        .c.sum()
    )


def test_q280_friedman_brute_force(spark):
    from weatherapi_data_engineering_project_spark.plans.analytics import (
        q280_friedman_test,
    )
    cells = _cells().unstack(fill_value=0)
    ranks = cells.rank(axis=1, method="average")
    n, k = ranks.shape
    r_j = ranks.sum(axis=0)
    s = float(((r_j - n * (k + 1) / 2) ** 2).sum())
    a = float((ranks**2).values.sum())
    c = n * k * (k + 1) ** 2 / 4
    chi2 = (k - 1) * s / (a - c)
    rows = q280_friedman_test(spark, SF1).collect()
    assert len(rows) == k
    got_r = {r.event_type: r.r_x2 for r in rows}
    exp_r = (2 * r_j).round().astype(int).to_dict()
    assert got_r == exp_r
    assert abs(rows[0].chi2_f - chi2) < 1e-5
    assert rows[0].n_blocks == n and rows[0].k_treatments == k


def test_q281_cochran_q_brute_force(spark):
    from weatherapi_data_engineering_project_spark.plans.analytics import (
        q281_cochran_q,
    )
    ev = _pd("events")
    counts = (
        pd.DataFrame({"u": ev.user_id, "t": ev.event_type})
        .groupby(["u", "t"])
        .size()
        .unstack(fill_value=0)
    )
    k = counts.shape[1]
    x = counts.mul(k).gt(counts.sum(axis=1), axis=0).astype(int)
    c_j = x.sum(axis=0)
    r_i = x.sum(axis=1)
    nn = int(x.values.sum())
    q = (
        (k - 1)
        * float(((k * c_j - nn) ** 2).sum())
        / (k * float((k * r_i - r_i**2).sum()))
    )
    rows = q281_cochran_q(spark, SF1).collect()
    got = {r.event_type: r.n_users_above for r in rows}
    exp = {t: int(v) for t, v in c_j.items() if v > 0}
    assert got == exp
    assert abs(rows[0].cochran_q - q) < 1e-5


def test_q282_brown_forsythe_brute_force(spark):
    from weatherapi_data_engineering_project_spark.plans.analytics import (
        q282_brown_forsythe,
    )
    ev = _pd("events")
    cents = (ev.value * 100).round().astype(np.int64)
    df = pd.DataFrame({"t": ev.event_type, "c": cents})
    zs = []
    for t, g in df.groupby("t"):
        c = np.sort(g.c.to_numpy())
        med = int(c[(len(c) - 1) // 2])
        zs.append(
            pd.DataFrame({"t": t, "z": np.abs(g.c.to_numpy() - med)})
        )
    z = pd.concat(zs)
    k = z.t.nunique()
    nn = len(z)
    grand = z.z.mean()
    num = sum(
        len(g) * (g.z.mean() - grand) ** 2 for _, g in z.groupby("t")
    ) / (k - 1)
    den = sum(
        ((g.z - g.z.mean()) ** 2).sum() for _, g in z.groupby("t")
    ) / (nn - k)
    f = num / den
    rows = q282_brown_forsythe(spark, SF1).collect()
    assert abs(rows[0].bf_f - f) < 1e-4
    got = {r.event_type: r.sum_absdev for r in rows}
    exp = z.groupby("t").z.sum().astype(int).to_dict()
    assert got == exp


def test_q283_checksums_match_hashlib_and_detect_changes(spark):
    from weatherapi_data_engineering_project_spark.plans.layout import (
        q283_table_checksum,
    )
    rows = {r.table_name: r for r in q283_table_checksum(spark, SF1).collect()}
    assert set(rows) == {"orders", "customer", "supplier"}

    su = _pd("supplier")
    hs = []
    for r in su.itertuples():
        canon = "|".join(
            [
                str(r.s_suppkey),
                r.s_name,
                str(r.s_nationkey),
                str(int(round(r.s_acctbal * 100))),
            ]
        )
        hs.append(int(hashlib.md5(canon.encode()).hexdigest()[:15], 16))
    xor = 0
    for h in hs:
        xor ^= h
    modsum = sum(h % 1000000007 for h in hs) % 1000000007
    got = rows["supplier"]
    assert got.n_rows == len(su)
    assert got.xor_sig == xor
    assert got.modsum_sig == modsum
    # a single-row perturbation changes both signatures
    h2 = list(hs)
    h2[0] ^= 1
    xor2 = 0
    for h in h2:
        xor2 ^= h
    assert xor2 != xor