"""Semantics tests for the third TPC-H-shaped suite (Q7/Q10/Q21/Q22
adaptations): invariants at sf0.001 plus a hand-computable sole-supplier
fixture."""

from __future__ import annotations

from datetime import datetime

import pytest

from automotive_big_data_analysis_spark.operators import relational_tpch3 as rt3

SF_SMOKE = "/root/testdata/sf0.001"


def test_cross_nation_volume_is_symmetric_pairs_only(spark):
    rows = rt3.cross_nation_volume(spark, SF_SMOKE).collect()
    pairs = {(r.supp_nation, r.cust_nation) for r in rows}
    allowed = {
        (rt3.TRADE_NATION_A, rt3.TRADE_NATION_B),
        (rt3.TRADE_NATION_B, rt3.TRADE_NATION_A),
    }
    assert pairs <= allowed
    for r in rows:
        assert r.volume > 0


def test_returned_item_revenue_ranked_and_bounded(spark):
    rows = rt3.returned_item_revenue(spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= rt3.TOP_RETURNED_CUSTOMERS
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_sole_supplier_fixture(spark, tmp_path_factory):
    """Order 1: two lines, one supplier → sole. Order 2: two lines, two
    suppliers → not sole. Order 3: single line → excluded (n_lines > 1)."""
    path = str(tmp_path_factory.mktemp("sole"))
    li_rows = [
        (1, 1, 7, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", datetime(1995, 1, 1)),
        (1, 2, 7, 2, 1.0, 10.0, 0.0, 0.0, "N", "O", datetime(1995, 1, 2)),
        (2, 1, 7, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", datetime(1995, 1, 3)),
        (2, 2, 8, 2, 1.0, 10.0, 0.0, 0.0, "N", "O", datetime(1995, 1, 4)),
        (3, 1, 7, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", datetime(1995, 1, 5)),
    ]
    spark.createDataFrame(
        li_rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/lineitem.parquet")
    spark.createDataFrame(
        [(7, "Supplier#7", 0, 0.0), (8, "Supplier#8", 0, 0.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/supplier.parquet")
    rows = rt3.sole_supplier_orders(spark, path).collect()
    assert [(r.s_suppkey, r.n_sole_orders) for r in rows] == [(7, 1)]


def test_idle_rich_customers_nonempty_and_above_avg(spark):
    rows = rt3.idle_rich_customers(spark, SF_SMOKE).collect()
    assert rows, "expected idle rich customers at sf0.001"
    assert sum(r.n_customers for r in rows) == 5
    for r in rows:
        assert r.total_balance > 0
