"""Order-independence of the exact float-aggregation helpers.

Plain double summation is non-associative: with addends engineered to sit
on a ``.xx5`` rounding boundary, ``ROUND(SUM(value), 2)`` flips between
partition layouts — exactly the class of flake that failed the round-3
`events_sessionize` oracle hash. ``functions/exact.py`` must make the
result identical under ANY repartitioning, and identical to DuckDB's
mirror expression.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from automotive_big_data_analysis_spark.functions import exact as ex

# 1005 copies of 0.005: true sum 5.025 — double partials land on either
# side of the .025 boundary depending on association order, so ROUND(…, 2)
# under plain double summation is layout-dependent. Plus noise values with
# >6 decimal digits to exercise the per-addend decimal cast.
BOUNDARY = [0.005] * 1005
NOISY = [0.1234567891, 2.718281828459045, 3.141592653589793, 1e-7, 123456.789]
VALUES = BOUNDARY + NOISY * 20


@pytest.fixture(scope="module")
def vals_df(spark):
    return spark.createDataFrame([(v,) for v in VALUES], "value double")


def test_dsum_identical_under_any_partitioning(spark, vals_df):
    results = {
        vals_df.repartition(n).agg(ex.dsum("value").alias("s")).first().s
        for n in (1, 2, 7, 32)
    }
    assert len(results) == 1


def test_davg_identical_under_any_partitioning(spark, vals_df):
    results = {
        vals_df.repartition(n).agg(ex.davg("value").alias("a")).first().a
        for n in (1, 3, 32)
    }
    assert len(results) == 1


def test_dsum_matches_duckdb_mirror(spark, vals_df):
    got = vals_df.repartition(13).agg(ex.dsum("value").alias("s")).first().s
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT UNNEST(?) AS value", [VALUES])
    want = con.execute(f"SELECT {ex.dsum_sql('value')} FROM t").fetchone()[0]
    assert got == want


def test_davg_matches_duckdb_mirror(spark, vals_df):
    got = vals_df.repartition(5).agg(ex.davg("value").alias("a")).first().a
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT UNNEST(?) AS value", [VALUES])
    want = con.execute(f"SELECT {ex.davg_sql('value')} FROM t").fetchone()[0]
    assert got == want


def test_plain_double_sum_is_actually_layout_dependent(spark, vals_df):
    """Meta-check: the boundary corpus genuinely exercises the failure
    mode — unrounded plain double sums differ across layouts (if this
    ever starts passing as a single value, the corpus lost its teeth and
    the three tests above prove nothing)."""
    sums = {
        vals_df.repartition(n).agg(F.sum("value").alias("s")).first().s
        for n in (1, 2, 7, 32)
    }
    assert len(sums) > 1


def test_nulls_ignored_like_plain_aggregates(spark):
    df = spark.createDataFrame(
        [(1.5,), (None,), (2.25,), (None,)], "value double"
    )
    row = df.agg(
        ex.dsum("value").alias("s"), ex.davg("value").alias("a")
    ).first()
    assert row.s == 3.75
    assert row.a == 1.875
