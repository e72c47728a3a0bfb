"""Round-8 batch-2 tests: the eight TPC-H shapes that complete the 22
(Q4, Q6, Q9, Q10, Q12, Q14, Q15, Q16 adaptations, q243-q250).

Plan pins prove the Catalyst shapes the docstrings claim (semi-join
decorrelation with a non-equi conjunct, scan-only pushdown, broadcast
dims, TakeOrderedAndProject top-k, LeftAnti NOT-IN); brute-force tests
recompute the exact ledgers in pandas at sf0.001.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F

from weatherapi_data_engineering_project_spark.plans import extensions as EXT

SF1 = "/root/testdata/sf0.001"


def _phys(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _pd(table):
    return pd.read_parquet(f"{SF1}/{table}.parquet")


def _cents(x) -> int:
    return int(round(float(x) * 100))


def _rev_e4(price, disc) -> int:
    # exact 4-decimal revenue in 0.1-millicent units: cents * (100-d%)
    return _cents(price) * (100 - _cents(disc))


def test_q243_tpch_q4_semi_join_with_non_equi_conjunct(spark):
    """The correlated EXISTS must decorrelate into ONE LeftSemi join
    whose condition keeps the cross-table inequality (shipdate >
    orderdate + 60d) — no cartesian, no nested loop, no second scan of
    orders."""
    df = EXT.q243_priority_delay_audit(spark, SF1)
    p = _phys(df)
    assert "LeftSemi" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    # exactly five priority groups, each counting >= 0 orders
    rows = df.collect()
    assert 0 < len(rows) <= 5


def test_q243_brute_force(spark):
    o = _pd("orders")
    li = _pd("lineitem")[["l_orderkey", "l_shipdate"]]
    win = o[
        (o.o_orderdate >= "1996-01-01") & (o.o_orderdate < "1996-04-01")
    ][["o_orderkey", "o_orderdate", "o_orderpriority"]]
    j = win.merge(li, left_on="o_orderkey", right_on="l_orderkey")
    late = j[j.l_shipdate > j.o_orderdate + pd.Timedelta(days=60)]
    expect = (
        late.drop_duplicates("o_orderkey")
        .groupby("o_orderpriority")
        .size()
        .to_dict()
    )
    got = {
        r.o_orderpriority: r.order_count
        for r in EXT.q243_priority_delay_audit(spark, SF1).collect()
    }
    assert got == expect


def test_q244_tpch_q6_is_scan_only_with_pushdown(spark):
    """Q6 must compile to a joinless scan+aggregate with the shipdate
    range pushed into the parquet scan and only the needed columns
    read."""
    df = EXT.q244_discount_revenue_forecast(spark, SF1)
    p = _phys(df)
    assert "Join" not in p
    assert "PushedFilters:" in p and "l_shipdate" in p.split(
        "PushedFilters:"
    )[1].split("]")[0]
    rs = p.split("ReadSchema:")[1].splitlines()[0]
    assert "l_extendedprice" in rs and "l_returnflag" not in rs


def test_q244_brute_force(spark):
    li = _pd("lineitem")
    m = li[
        (li.l_shipdate >= "1996-01-01")
        & (li.l_shipdate < "1997-01-01")
        & (li.l_discount.map(_cents) >= 5)
        & (li.l_discount.map(_cents) <= 7)
        & (li.l_quantity < 24)
    ]
    # exact: cents * discount-cents = e4 units of ext*disc
    exp_e4 = int(
        sum(_cents(p) * _cents(d) for p, d in zip(m.l_extendedprice, m.l_discount))
    )
    row = EXT.q244_discount_revenue_forecast(spark, SF1).collect()[0]
    assert row.n_lines == len(m)
    assert round(row.revenue * 10000) == exp_e4


def test_q245_tpch_q9_broadcast_dims_and_exact_ledger(spark):
    """part/supplier/nation broadcast onto the lineitem scan; the part
    name filter reaches the part scan; profit matches the pandas e4
    ledger exactly."""
    df = EXT.q245_nation_profit(spark, SF1)
    p = _phys(df)
    assert p.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in p

    li, pa, su, na, od = (
        _pd("lineitem"), _pd("part"), _pd("supplier"), _pd("nation"),
        _pd("orders"),
    )
    pa = pa[pa.p_name.str.startswith("red ")]
    j = (
        li.merge(pa[["p_partkey", "p_retailprice"]],
                 left_on="l_partkey", right_on="p_partkey")
        .merge(su[["s_suppkey", "s_nationkey"]],
               left_on="l_suppkey", right_on="s_suppkey")
        .merge(na[["n_nationkey", "n_name"]],
               left_on="s_nationkey", right_on="n_nationkey")
        .merge(od[["o_orderkey", "o_orderdate"]],
               left_on="l_orderkey", right_on="o_orderkey")
    )
    j["profit_e4"] = [
        _rev_e4(p_, d) - _cents(r) * 10 * int(q)
        for p_, d, r, q in zip(
            j.l_extendedprice, j.l_discount, j.p_retailprice, j.l_quantity
        )
    ]
    j["o_year"] = j.o_orderdate.dt.year
    expect = j.groupby(["n_name", "o_year"]).profit_e4.sum().to_dict()
    got = {
        (r.nation, r.o_year): round(r.sum_profit * 10000)
        for r in df.collect()
    }
    assert got == {k: int(v) for k, v in expect.items()}


def test_q246_tpch_q10_takeordered_top20(spark):
    """The top-20 must compile to TakeOrderedAndProject (no global
    sort materializes) and the e4-ranked cut must match pandas."""
    df = EXT.q246_returned_item_revenue(spark, SF1)
    p = _phys(df)
    assert "TakeOrderedAndProject" in p
    assert "CartesianProduct" not in p

    li, od, cu, na = _pd("lineitem"), _pd("orders"), _pd("customer"), _pd("nation")
    od = od[(od.o_orderdate >= "1996-10-01") & (od.o_orderdate < "1997-01-01")]
    li = li[li.l_returnflag == "R"].copy()
    li["rev_e4"] = [
        _rev_e4(p_, d) for p_, d in zip(li.l_extendedprice, li.l_discount)
    ]
    j = li.merge(od, left_on="l_orderkey", right_on="o_orderkey").merge(
        cu, left_on="o_custkey", right_on="c_custkey"
    )
    g = j.groupby("c_custkey").rev_e4.sum().reset_index()
    g = g.sort_values(["rev_e4", "c_custkey"], ascending=[False, True]).head(20)
    expect = {int(r.c_custkey): int(r.rev_e4) for r in g.itertuples()}
    got = {r.c_custkey: round(r.revenue * 10000) for r in df.collect()}
    assert got == expect


def test_q247_brute_force(spark):
    li, od = _pd("lineitem"), _pd("orders")
    li = li[(li.l_shipdate >= "1996-01-01") & (li.l_shipdate < "1997-01-01")]
    j = li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
    j = j[j.l_shipdate > j.o_orderdate + pd.Timedelta(days=90)]
    hi = {"1-URGENT", "2-HIGH"}
    exp = {
        s: (
            int((grp.o_orderpriority.isin(hi)).sum()),
            int((~grp.o_orderpriority.isin(hi)).sum()),
        )
        for s, grp in j.groupby("l_linestatus")
    }
    got = {
        r.l_linestatus: (r.high_line_count, r.low_line_count)
        for r in EXT.q247_late_shipment_priority(spark, SF1).collect()
    }
    assert got == exp


def test_q248_brute_force_and_single_scan(spark):
    df = EXT.q248_promo_revenue_share(spark, SF1)
    # numerator and denominator come from ONE lineitem scan
    p = _phys(df)
    assert p.count("Scan parquet") == 2  # lineitem + part, once each

    li, pa = _pd("lineitem"), _pd("part")
    li = li[(li.l_shipdate >= "1996-09-01") & (li.l_shipdate < "1996-10-01")]
    j = li.merge(pa[["p_partkey", "p_type"]], left_on="l_partkey",
                 right_on="p_partkey")
    j["rev_e4"] = [
        _rev_e4(p_, d) for p_, d in zip(j.l_extendedprice, j.l_discount)
    ]
    promo = int(j[j.p_type == "PROMO"].rev_e4.sum())
    total = int(j.rev_e4.sum())
    row = df.collect()[0]
    assert round(row.promo_revenue * 10000) == promo
    assert round(row.total_revenue * 10000) == total
    assert row.promo_share == promo / total * 100 or abs(
        row.promo_share - float(promo) * 100 / float(total)
    ) == 0.0


def test_q249_tpch_q15_no_cartesian(spark):
    """The scalar MAX subquery must plan as a subquery result reused
    in a filter — never a nested-loop/cartesian — and the winners'
    revenue must equal the true decimal max."""
    df = EXT.q249_top_revenue_supplier(spark, SF1)
    p = _phys(df)
    assert "CartesianProduct" not in p
    rows = df.collect()
    assert len(rows) >= 1
    assert len({round(r.total_revenue, 4) for r in rows}) == 1


def test_q250_tpch_q16_anti_join_and_brute_force(spark):
    df = EXT.q250_supplier_part_counts(spark, SF1)
    p = _phys(df)
    assert "LeftAnti" in p
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p

    li, pa, su = _pd("lineitem"), _pd("part"), _pd("supplier")
    pairs = li[["l_partkey", "l_suppkey"]].drop_duplicates()
    pa = pa[
        (pa.p_brand != "Brand#1")
        & ~pa.p_type.str.startswith("PROMO")
        & pa.p_size.isin([1, 4, 7, 10, 13, 16, 19, 25])
    ]
    bad = set(su[su.s_acctbal < 0].s_suppkey)
    j = pairs.merge(pa, left_on="l_partkey", right_on="p_partkey")
    j = j[~j.l_suppkey.isin(bad)]
    exp = (
        j.groupby(["p_brand", "p_type", "p_size"])
        .l_suppkey.nunique()
        .to_dict()
    )
    got = {
        (r.p_brand, r.p_type, r.p_size): r.supplier_cnt
        for r in df.collect()
    }
    assert got == exp
