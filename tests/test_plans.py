"""Plan-shape assertions: the scale properties SURVEY §4 promises must be
visible in the physical plan, not just hoped for."""

from __future__ import annotations

import pytest

from automotive_big_data_analysis_spark.operators import relational, similarity
from automotive_big_data_analysis_spark.plans import explain as px

SF = "/root/testdata/sf0.001"


def test_filtered_scan_pushes_predicates_and_prunes(spark):
    df = relational.filtered_scan(spark, SF)
    pushed = " ".join(px.pushed_filters(df))
    assert "l_returnflag" in pushed and "l_quantity" in pushed
    schemas = " ".join(px.read_schemas(df))
    # only the 5 projected + filter columns are read, never the full table
    assert "l_shipdate" not in schemas
    assert "l_extendedprice" in schemas


def test_pricing_summary_prunes_and_partial_aggregates(spark):
    df = relational.pricing_summary(spark, SF)
    schemas = " ".join(px.read_schemas(df))
    assert "l_orderkey" not in schemas  # 7 needed columns only
    assert px.has_partial_aggregation(df)
    assert px.shuffle_count(df) == 1  # single agg shuffle


def test_revenue_by_nation_broadcasts_dims(spark):
    df = relational.revenue_by_nation(spark, SF)
    # nation + region explicitly broadcast; customer small enough that AQE
    # or the planner may broadcast it too — at least 2 broadcasts required
    assert px.broadcast_join_count(df) >= 2
    pushed = " ".join(px.pushed_filters(df))
    # the region-name filter reaches the region scan
    assert "r_name" in pushed


def test_point_lookup_pushes_key(spark):
    df = relational.point_lookup(spark, SF)
    pushed = " ".join(px.pushed_filters(df))
    assert "o_orderkey" in pushed


def test_top_orders_no_global_sort_shuffle(spark):
    df = relational.top_orders(spark, SF)
    plan = px.physical_plan(df)
    assert "TakeOrderedAndProject" in plan  # top-k, not full sort


def test_knn_broadcasts_queries(spark):
    df = similarity.knn_bruteforce(spark, SF)
    assert px.broadcast_join_count(df) >= 1


def test_segment_share_single_fact_shuffle(spark):
    df = relational.segment_share(spark, SF)
    # customer is broadcast → orders never shuffles before aggregation;
    # remaining exchanges: agg by segment + the scalar-total window
    assert px.broadcast_join_count(df) >= 1
    assert px.shuffle_count(df) <= 3
