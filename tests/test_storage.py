"""Physical layout: bucketed joins eliminate shuffles; salted joins
preserve join semantics under skew."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from weatherapi_data_engineering_project_spark import storage as S
from weatherapi_data_engineering_project_spark.schemas import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def warehouse(tmp_path_factory):
    return str(tmp_path_factory.mktemp("wh"))


def test_bucketed_join_has_no_exchange(spark, warehouse):
    """Both sides bucketed by the join key → SortMergeJoin with zero
    Exchange; same join unbucketed shuffles both sides."""
    orders = load_table(spark, SF_DIR, "orders")
    lineitem = load_table(spark, SF_DIR, "lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    S.write_bucketed(
        orders, "b_orders", ["o_orderkey"], 8, sort_cols=["o_orderkey"],
        path=f"{warehouse}/b_orders",
    )
    S.write_bucketed(
        lineitem, "b_lineitem", ["l_orderkey"], 8, sort_cols=["l_orderkey"],
        path=f"{warehouse}/b_lineitem",
    )
    bo = S.read_table(spark, "b_orders")
    bl = S.read_table(spark, "b_lineitem")
    joined = bo.join(bl, bo.o_orderkey == bl.l_orderkey).select(
        "o_orderkey", "l_quantity", "o_totalprice"
    )
    # force the sort-merge path: at test scale the planner would rather
    # broadcast (which also has no shuffle, trivially); the bucketing
    # claim is about the large-large case
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        S.assert_no_shuffle(joined)
        expected = (
            orders.join(
                lineitem, orders.o_orderkey == lineitem.l_orderkey
            ).count()
        )
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_salted_join_matches_plain_join(spark):
    """salted_join == plain join on a skewed key distribution."""
    left = spark.range(0, 2000).select(
        (F.when(F.col("id") % 10 == 0, F.lit(0)).otherwise(F.col("id")))
        .alias("k"),
        F.col("id").alias("payload"),
    )  # 10% of rows pile on key 0
    right = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("rv")
    )
    plain = left.join(right, on="k").select("k", "payload", "rv")
    salted = S.salted_join(left, right, "k").select("k", "payload", "rv")
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )
    assert salted.filter(F.col("k") == 0).count() == plain.filter(
        F.col("k") == 0
    ).count()


@pytest.mark.parametrize("how", ["inner", "left", "semi", "anti"])
def test_salted_join_parity_all_supported_modes(spark, how):
    """salted_join == plain join for every supported join type."""
    left = spark.range(0, 500).select(
        (F.when(F.col("id") % 5 == 0, F.lit(0)).otherwise(F.col("id"))).alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.range(0, 30).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("rv")
    )
    plain = left.join(right, on="k", how=how)
    salted = S.salted_join(left, right, "k", how=how)
    if how in ("semi", "anti"):
        cols = ["k", "payload"]
    else:
        cols = ["k", "payload", "rv"]
    # semi/anti results keep only left columns; salted inner/left carry rv
    a = sorted(map(tuple, plain.select(*[c for c in cols if c in plain.columns]).collect()))
    b = sorted(map(tuple, salted.select(*[c for c in cols if c in salted.columns]).collect()))
    assert a == b


def test_salted_join_rejects_outer(spark):
    left = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        S.salted_join(left, left, "k", how="full")
