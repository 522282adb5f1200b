"""Generic as-of join semantics: nearest-preceding match, exact-tie
visibility, left-join NULLs, and the tolerance cutoff — pinned on a
crafted frame (the oracle gate covers corpus parity via DuckDB's native
ASOF JOIN; these cover the knobs the gate query doesn't exercise)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from automotive_big_data_analysis_spark.operators.asof import asof_join

T = lambda s: datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, T("2024-01-01 10:00:00"), "L-a"),   # matches R at 09:30
            (1, T("2024-01-01 09:00:00"), "L-b"),   # matches R at 09:00 (tie)
            (1, T("2024-01-01 08:00:00"), "L-c"),   # nothing at or before
            (2, T("2024-01-01 12:00:00"), "L-d"),   # key with no right rows
        ],
        "k int, ts timestamp, lname string",
    )
    right = spark.createDataFrame(
        [
            (1, T("2024-01-01 09:00:00"), 100),
            (1, T("2024-01-01 09:30:00"), 200),
            (1, T("2024-01-01 10:30:00"), 300),  # after every left row
        ],
        "k int, ts timestamp, rv int",
    )
    return left, right


def test_nearest_preceding_with_ties_and_nulls(spark):
    left, right = _frames(spark)
    got = {
        r.lname: (r.asof_rv, r.asof_ts)
        for r in asof_join(left, right, on="k", right_value_cols=["rv"]).collect()
    }
    assert got["L-a"] == (200, T("2024-01-01 09:30:00"))  # latest ≤ 10:00
    assert got["L-b"] == (100, T("2024-01-01 09:00:00"))  # exact tie visible
    assert got["L-c"] == (None, None)                     # nothing preceding
    assert got["L-d"] == (None, None)                     # key absent on right


def test_tolerance_discards_stale_matches(spark):
    left, right = _frames(spark)
    got = {
        r.lname: r.asof_rv
        for r in asof_join(
            left, right, on="k", right_value_cols=["rv"], tolerance_seconds=1200
        ).collect()
    }
    # L-a's match is 30 min old → within 20 min tolerance? No: discarded
    assert got["L-a"] is None
    assert got["L-b"] == 100  # 0 s old → kept
    assert got["L-c"] is None and got["L-d"] is None
