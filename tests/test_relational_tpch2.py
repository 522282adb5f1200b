"""Semantics tests for the second TPC-H-shaped suite (Q5/Q11/Q13/Q14/Q15/
Q19 adaptations) on hand-computable micro-fixtures plus invariants at
sf0.001."""

from __future__ import annotations

from datetime import datetime

import pytest

from automotive_big_data_analysis_spark.operators import relational_tpch2 as rt2

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def star_dir(spark, tmp_path_factory):
    """Two nations in ASIA; one customer+supplier pair sharing nation 0,
    one order in the target year with two lines, one line from a
    different-nation supplier (must be excluded from Q5)."""
    path = str(tmp_path_factory.mktemp("star"))
    spark.createDataFrame(
        [(0, "ASIA")], "r_regionkey int, r_name string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/region.parquet")
    spark.createDataFrame(
        [(0, "N0", 0), (1, "N1", 0)],
        "n_nationkey int, n_name string, n_regionkey int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/nation.parquet")
    spark.createDataFrame(
        [(1, "Customer#1", 0, 10.0, "BUILDING")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/customer.parquet")
    spark.createDataFrame(
        [(1, "Supplier#1", 0, 5.0), (2, "Supplier#2", 1, 5.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/supplier.parquet")
    spark.createDataFrame(
        [(1, 1, "O", 300.0, datetime(rt2.VOLUME_YEAR, 6, 1), "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/orders.parquet")
    li_rows = [
        # same-nation supplier: revenue 100 * (1 - 0.1) = 90 → counted
        (1, 1, 1, 1, 1.0, 100.0, 0.1, 0.0, "N", "O", datetime(rt2.VOLUME_YEAR, 6, 2)),
        # supplier in nation 1 != customer nation 0 → excluded
        (1, 1, 2, 2, 1.0, 100.0, 0.0, 0.0, "N", "O", datetime(rt2.VOLUME_YEAR, 6, 2)),
    ]
    spark.createDataFrame(
        li_rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/lineitem.parquet")
    return path


def test_local_supplier_volume_requires_shared_nation(spark, star_dir):
    rows = rt2.local_supplier_volume(spark, star_dir).collect()
    assert [(r.n_name, r.revenue) for r in rows] == [("N0", 90.0)]


def test_customer_order_distribution_counts_zero(spark):
    rows = rt2.customer_order_distribution(spark, SF_SMOKE).collect()
    # every customer appears exactly once across the histogram
    assert sum(r.custdist for r in rows) == 150
    counts = {r.c_count: r.custdist for r in rows}
    # orders total must reconcile: sum(c_count * custdist) == |orders|
    assert sum(c * n for c, n in counts.items()) == 1500


def test_promo_ratio_bounds(spark):
    rows = rt2.promo_revenue_ratio(spark, SF_SMOKE).collect()
    assert rows, "expected at least one month"
    for r in rows:
        assert 0.0 <= r.promo_pct <= 100.0
    assert [r.order_month for r in rows] == sorted(r.order_month for r in rows)


def test_top_revenue_suppliers_is_argmax(spark):
    rows = rt2.top_revenue_suppliers(spark, SF_SMOKE).collect()
    assert rows, "expected at least one top supplier"
    revs = {r.total_revenue for r in rows}
    assert len(revs) == 1  # all returned suppliers tie at the max


def test_important_parts_share_threshold(spark):
    rows = rt2.important_parts_share(spark, SF_SMOKE).collect()
    for r in rows:
        assert r.revenue_share > rt2.SHARE_THRESHOLD
    shares = [r.part_revenue for r in rows]
    assert shares == sorted(shares, reverse=True)


def test_disjunctive_part_revenue_branches(spark):
    rows = rt2.disjunctive_part_revenue(spark, SF_SMOKE).collect()
    assert {r.p_brand for r in rows} <= {"Brand#1", "Brand#2", "Brand#3"}
    for r in rows:
        assert r.n_lines > 0 and r.revenue > 0


def test_broadcast_in_q5_plan(spark):
    plan = rt2.local_supplier_volume(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
