"""Semantics tests for advanced relational ops (incl. the cross-bucket
range-join regression) and the driver contract."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from automotive_big_data_analysis_spark.operators import relational_ext as rx

T0 = datetime(2024, 1, 1, 0, 0, 30)


@pytest.fixture(scope="module")
def burst_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("bursts"))
    rows = [
        # pair split across two 60s buckets, 40s apart (the regression case)
        (1, T0 + timedelta(seconds=0), 1, "error", 1.0, "{}"),
        (2, T0 + timedelta(seconds=40), 1, "error", 1.0, "{}"),
        # same-bucket pair 5s apart
        (3, T0 + timedelta(seconds=2), 2, "error", 1.0, "{}"),
        (4, T0 + timedelta(seconds=7), 2, "error", 1.0, "{}"),
        # same user, 2h apart — no pair
        (5, T0, 3, "error", 1.0, "{}"),
        (6, T0 + timedelta(hours=2), 3, "error", 1.0, "{}"),
        # different users close in time — no pair
        (7, T0, 4, "error", 1.0, "{}"),
        (8, T0 + timedelta(seconds=1), 5, "error", 1.0, "{}"),
        # non-error events never pair
        (9, T0, 1, "click", 1.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")
    return path


def test_error_bursts_cross_and_same_bucket(spark, burst_dir):
    got = {
        (r.event_a, r.event_b): r.gap_seconds
        for r in rx.error_bursts(spark, burst_dir).collect()
    }
    assert got == {(1, 2): 40.0, (3, 4): 5.0}


def test_entry_contract(spark):
    import __spark_entry__ as entry

    queries = entry.queries()
    oracles = entry.oracle_sql()
    # every oracle key has a query; queries without oracle are the
    # explicitly weak (rows-only) ones
    assert set(oracles) <= set(queries)
    assert len(queries) >= 40
    df = entry.entry(spark)
    assert df.count() > 0
    assert {"l_returnflag", "sum_qty", "count_order"} <= set(df.columns)


def test_bloom_prune_has_no_false_negatives_and_counts_add_up(spark):
    from pyspark.sql import functions as F

    from automotive_big_data_analysis_spark.catalog import load_table
    from tests.conftest import SF_SMOKE

    row = rx.bloom_prune_join_stats(spark, SF_SMOKE).first()
    # Bloom filters can only over-approximate the build-key set.
    assert row.n_pass_bloom >= row.n_true_match
    assert row.n_false_positives == row.n_pass_bloom - row.n_true_match
    assert 0.0 <= row.prune_ratio <= 1.0
    # n_true_match is the exact semi-join cardinality.
    cust = load_table(spark, SF_SMOKE, "customer").where(
        F.col("c_mktsegment") == "AUTOMOBILE"
    )
    orders = load_table(spark, SF_SMOKE, "orders")
    exact = orders.join(
        cust.select(F.col("c_custkey").alias("o_custkey")), "o_custkey", "semi"
    ).count()
    assert row.n_true_match == exact
    assert row.n_orders == orders.count()
