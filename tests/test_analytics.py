"""Semantics tests for the cohort/anomaly/segmentation analytics on
crafted data plus corpus-level invariants."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from automotive_big_data_analysis_spark.operators import analytics as an
from tests.conftest import SF_SMOKE

T0 = datetime(2024, 1, 1, 0, 0, 0)  # a Monday, mid-week-bucket irrelevant

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def _write_events(spark, path, rows):
    spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/events.parquet")


def test_retention_cohorts_and_offsets(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ret"))
    wk = timedelta(days=7)
    rows = [
        # user 1: active in week 0, 1, 3 relative to their first event
        (1, T0, 1, "view", 0.0, "{}"),
        (2, T0 + wk, 1, "view", 0.0, "{}"),
        (3, T0 + 3 * wk, 1, "view", 0.0, "{}"),
        # user 2: same cohort week, only ever active once
        (4, T0 + timedelta(days=1), 2, "view", 0.0, "{}"),
        # user 3: one week later cohort, active two consecutive weeks
        (5, T0 + wk, 3, "view", 0.0, "{}"),
        (6, T0 + 2 * wk, 3, "view", 0.0, "{}"),
    ]
    _write_events(spark, path, rows)
    got = {
        (r.cohort_week, r.week_offset): r
        for r in an.user_retention(spark, path).collect()
    }
    cohorts = sorted({cw for cw, _ in got})
    first, second = cohorts
    assert second == first + 1
    # cohort 1 (users 1+2): offset 0 has both, offset 1 and 3 only user 1
    assert got[(first, 0)].n_active == 2
    assert got[(first, 0)].cohort_size == 2
    assert got[(first, 0)].retention == 1.0
    assert got[(first, 1)].n_active == 1
    assert got[(first, 1)].retention == 0.5
    assert got[(first, 3)].n_active == 1
    assert (first, 2) not in got  # nobody active in offset week 2
    # cohort 2 (user 3): offsets 0 and 1
    assert got[(second, 0)].n_active == 1
    assert got[(second, 1)].retention == 1.0


def test_hourly_anomalies_flags_planted_spike(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("anom"))
    rows = []
    eid = 0
    # 23 quiet hours with 2 events each, one spike hour with 40
    for h in range(24):
        n = 40 if h == 7 else 2
        for i in range(n):
            eid += 1
            rows.append(
                (eid, T0 + timedelta(hours=h, seconds=i), 1, "view", 0.0, "{}")
            )
    _write_events(spark, path, rows)
    got = an.hourly_anomalies(spark, path).collect()
    assert [r.hour.hour for r in got] == [7]
    assert got[0].n == 40
    assert got[0].z > an.ANOMALY_Z


def test_rfm_segments_partition_customers_exactly_once(spark):
    rows = an.rfm_segments(spark, SF_SMOKE).collect()
    from automotive_big_data_analysis_spark.catalog import load_table

    n_cust = (
        load_table(spark, SF_SMOKE, "orders")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert sum(r.n_customers for r in rows) == n_cust
    for r in rows:
        assert 1 <= r.r_quartile <= 4
        assert 1 <= r.f_quartile <= 4
        assert 1 <= r.m_quartile <= 4
        assert r.avg_monetary > 0


def test_rfm_quartiles_are_balanced(spark):
    """Each single dimension's quartiles must split customers as evenly
    as NTILE guarantees (sizes differ by at most 1)."""
    rows = an.rfm_segments(spark, SF_SMOKE).collect()
    for dim in ("r_quartile", "f_quartile", "m_quartile"):
        sizes = {}
        for r in rows:
            sizes[getattr(r, dim)] = sizes.get(getattr(r, dim), 0) + r.n_customers
        assert set(sizes) == {1, 2, 3, 4}
        assert max(sizes.values()) - min(sizes.values()) <= 1


def test_doc_length_gate_bounds_and_counts(spark):
    rows = an.doc_length_gate(spark, SF_SMOKE).collect()
    assert rows, "gate must emit one row per language"
    from automotive_big_data_analysis_spark.catalog import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    total = docs.count()
    assert sum(r.n_docs for r in rows) == total
    for r in rows:
        assert r.p05_chars <= r.p95_chars
        # the gate keeps the bulk: at least 80% of docs fall inside P5-P95
        assert r.n_kept >= 0.8 * r.n_docs
        assert r.n_kept <= r.n_docs


def test_embedding_quality_corr_planted(spark, tmp_path_factory):
    """Two docs per label with norm proportional to quality -> corr = 1;
    a constant-quality label -> NULL (zero variance)."""
    path = str(tmp_path_factory.mktemp("corr"))
    rich = "the data row " * 10  # 30 tokens, mean_len ~4, stopwords -> q=1.0
    poor = "x"  # q = 0.0
    docs = [(0, rich, "en", "s", len(rich)), (1, poor, "en", "s", 1),
            (2, rich, "en", "s", len(rich)), (3, rich, "en", "s", len(rich))]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")
    embs = [
        (0, [2.0] * 64, 0),  # label 0: big norm with q=1.0 ...
        (1, [0.5] * 64, 0),  # ... small norm with q=0.0 -> corr +1
        (2, [1.0] * 64, 1),  # label 1: both q=1.0 -> zero variance -> NULL
        (3, [3.0] * 64, 1),
    ]
    spark.createDataFrame(
        embs, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/embeddings.parquet")
    got = {r.label: r for r in an.embedding_quality_corr(spark, path).collect()}
    assert got[0].corr_quality_norm == 1.0
    assert got[1].corr_quality_norm is None
    assert got[0].n_docs == 2 and got[1].n_docs == 2


def test_markov_transitions_counts_and_rows_normalize(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("markov"))
    rows = [
        (1, T0 + timedelta(seconds=0), 1, "view", 0.0, "{}"),
        (2, T0 + timedelta(seconds=1), 1, "click", 0.0, "{}"),
        (3, T0 + timedelta(seconds=2), 1, "view", 0.0, "{}"),
        (4, T0 + timedelta(seconds=3), 1, "purchase", 0.0, "{}"),
        # user 2's single event produces no transition
        (5, T0, 2, "view", 0.0, "{}"),
    ]
    _write_events(spark, path, rows)
    got = {
        (r.prev_type, r.next_type): r
        for r in an.markov_transitions(spark, path).collect()
    }
    assert set(got) == {("view", "click"), ("click", "view"), ("view", "purchase")}
    assert got[("view", "click")].n == 1
    assert got[("view", "click")].p == 0.5  # view row: click + purchase
    assert got[("click", "view")].p == 1.0


def test_embedding_outliers_flag_planted_vector(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("outl"))
    embs = [(i, [1.0] * 64, 0) for i in range(9)] + [(9, [9.0] * 64, 0)]
    spark.createDataFrame(
        embs, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/embeddings.parquet")
    got = an.embedding_outliers(spark, path).collect()
    assert got[0].rank == 1 and got[0].vec_id == 9  # the planted outlier
    assert len(got) == min(an.OUTLIER_TOP_K, 10)
    # everyone else is equidistant from the centroid; ties break by id
    assert [r.vec_id for r in got[1:]] == [0, 1, 2, 3]


DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def test_quality_regression_constant_x_yields_null_slope(spark, tmp_path):
    # Same token count everywhere → zero x-variance → slope/intercept/r2
    # are NULL through the shared NULLIF guard, never a division error.
    texts = ["aa bb cc dd", "ee ff gg hh", "iii jjj kkk lll"]
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/documents.parquet")
    row = an.quality_regression(spark, str(tmp_path)).first()
    assert row.n_docs == 3
    assert row.slope is None and row.intercept is None and row.r2 is None


def test_quality_regression_matches_closed_form(spark, tmp_path):
    # Hand-checkable least squares: token counts and 2-decimal quality
    # scores recomputed here give the same normal-equation fit.
    texts = [
        "one two",  # 2 tokens
        "a b c d e f",  # 6 tokens
        " ".join(["tok"] * 25),  # 25 tokens
        " ".join(["the"] * 40),  # 40 tokens, stopword-heavy
    ]
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/documents.parquet")
    from automotive_big_data_analysis_spark.functions import text as tx

    scored = (
        spark.createDataFrame(rows, DOC_SCHEMA)
        .select(
            tx.token_count("text").alias("x"),
            tx.quality_score("text").alias("y"),
        )
        .collect()
    )
    xs = [r.x for r in scored]
    ys = [r.y for r in scored]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(v * v for v in xs)
    syy = sum(v * v for v in ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    row = an.quality_regression(spark, str(tmp_path)).first()
    assert row.n_docs == n
    assert row.slope == pytest.approx(slope, abs=2e-9)
    assert row.intercept == pytest.approx((sy - slope * sx) / n, abs=2e-6)
    assert row.r2 == pytest.approx(
        (n * sxy - sx * sy) ** 2 / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
        abs=2e-6,
    )
    assert 0.0 <= row.r2 <= 1.0


def test_cms_never_underestimates_and_finds_the_hot_user(spark, tmp_path):
    # user 7 is the planted heavy hitter; CMS must rank it and can only
    # ever OVER-estimate (collisions add counts, never remove them).
    rows = []
    eid = 0
    for _ in range(50):
        rows.append((eid, T0 + timedelta(minutes=eid), 7, "click", 1.0, "{}"))
        eid += 1
    for u in range(20):
        rows.append((eid, T0 + timedelta(minutes=eid), 100 + u, "view", 1.0, "{}"))
        eid += 1
    _write_events(spark, str(tmp_path), rows)
    out = an.heavy_hitters_cms(spark, str(tmp_path)).collect()
    assert len(out) == an.TOP_USERS_K
    by_user = {r.user_id: r for r in out}
    assert by_user[7].true_n == 50
    assert all(r.est_n >= r.true_n for r in out)
    assert all(r.overestimate == r.est_n - r.true_n for r in out)


def test_cms_exact_when_no_collisions(spark, tmp_path):
    # 3 distinct users among 256 counters per row: the probability-washed
    # case — with these fixed md5 buckets there are no collisions, so the
    # sketch is exact (asserts the cell arithmetic, not just the bound).
    rows = [
        (i, T0 + timedelta(minutes=i), 1 + (i % 3), "click", 1.0, "{}")
        for i in range(12)
    ]
    _write_events(spark, str(tmp_path), rows)
    out = an.heavy_hitters_cms(spark, str(tmp_path)).collect()
    assert {r.user_id: r.true_n for r in out} == {1: 4, 2: 4, 3: 4}
    assert all(r.overestimate == 0 for r in out)
