"""Semantics tests for the deeper TPC-H-shaped suite and the
deterministic sampling family, on synthetic micro-fixtures where the
expected values are computable by hand."""

from __future__ import annotations

from datetime import datetime

import pytest

from automotive_big_data_analysis_spark.operators import relational_tpch as rt
from automotive_big_data_analysis_spark.operators import sampling as sp

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tiny_orders_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tiny_orders"))
    rows = [
        # three consecutive days: revenue 100, 300, 200
        (1, 1, "O", 100.0, datetime(1995, 1, 1), "1-URGENT"),
        (2, 1, "O", 300.0, datetime(1995, 1, 2), "1-URGENT"),
        (3, 2, "F", 200.0, datetime(1995, 1, 3), "2-HIGH"),
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/orders.parquet")
    return path


def test_moving_avg_and_lag(spark, tiny_orders_dir):
    rows = {
        r.day: r for r in rt.daily_revenue_moving_avg(spark, tiny_orders_dir).collect()
    }
    assert rows["1995-01-01"].ma7 == 100.0
    assert rows["1995-01-01"].dod_delta is None
    assert rows["1995-01-02"].ma7 == 200.0  # avg(100, 300)
    assert rows["1995-01-02"].dod_delta == 200.0
    assert rows["1995-01-03"].ma7 == 200.0  # avg(100, 300, 200)
    assert rows["1995-01-03"].dod_delta == -100.0


def test_deciles_cover_all_orders(spark):
    rows = rt.order_value_deciles(spark, SF_SMOKE).collect()
    assert [r.decile for r in rows] == list(range(1, 11))
    assert sum(r.n_orders for r in rows) == 1500
    # deciles are value-ordered: max of decile d <= min of decile d+1
    for lo, hi in zip(rows, rows[1:]):
        assert lo.max_price <= hi.min_price


def test_large_volume_customers_having(spark, tiny_orders_dir, tmp_path_factory):
    li_rows = [
        # order 1: total qty 160 (over threshold); order 2: 10 (under)
        (1, 1, 1, 1, 80.0, 10.0, 0.0, 0.0, "N", "O", datetime(1995, 1, 5)),
        (1, 2, 1, 2, 80.0, 10.0, 0.0, 0.0, "N", "O", datetime(1995, 1, 6)),
        (2, 1, 1, 1, 10.0, 10.0, 0.0, 0.0, "N", "O", datetime(1995, 1, 7)),
    ]
    spark.createDataFrame(
        li_rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tiny_orders_dir}/lineitem.parquet"
    )
    spark.createDataFrame(
        [(1, "Customer#1", 0, 0.0, "BUILDING"), (2, "Customer#2", 1, 0.0, "AUTO")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tiny_orders_dir}/customer.parquet"
    )
    rows = rt.large_volume_customers(spark, tiny_orders_dir).collect()
    assert [(r.o_orderkey, r.c_custkey, r.total_qty) for r in rows] == [(1, 1, 160.0)]


def test_sample_split_is_deterministic_partition_invariant(spark):
    a = sp.orders_sample_split(spark, SF_SMOKE).collect()
    b = sp.orders_sample_split(spark, SF_SMOKE).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    by_split = {r.split: r.n_orders for r in a}
    assert set(by_split) == {"train", "val", "test"}
    assert sum(by_split.values()) == 1500
    # 80/10/10 within loose tolerance on 1500 keys
    assert 0.7 < by_split["train"] / 1500 < 0.9


def test_stratified_rates_ordering(spark):
    rows = {r.lang: r.n_sampled for r in
            sp.stratified_document_sample(spark, SF_SMOKE).collect()}
    # en is sampled at 6x the default rate; with 500 docs the strata with
    # configured rates must out-sample the default-rate strata per capita
    assert rows.get("en", 0) > 0
