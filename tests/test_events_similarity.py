"""Semantics tests for event-time and similarity operators on crafted data."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from automotive_big_data_analysis_spark.functions import vectors as V
from automotive_big_data_analysis_spark.operators import events as ev
from automotive_big_data_analysis_spark.operators import similarity as sim

T0 = datetime(2024, 1, 1, 0, 0, 0)


@pytest.fixture(scope="module")
def event_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("events"))
    rows = [
        # user 1: two sessions separated by a 45-minute gap
        (1, T0, 1, "click", 1.0, '{"k": 5}'),
        (2, T0 + timedelta(minutes=10), 1, "click", 2.0, '{"k": 7}'),
        (3, T0 + timedelta(minutes=55), 1, "view", 3.0, '{"k": 1}'),
        # user 2: one event exactly on an hour boundary
        (4, T0 + timedelta(hours=1), 2, "view", 4.0, '{"k": 2}'),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")
    return path


def test_hourly_rollup(spark, event_dir):
    got = {
        (r.window_start, r.event_type): r.n_events
        for r in ev.hourly_rollup(spark, event_dir).collect()
    }
    assert got[(T0, "click")] == 2
    assert got[(T0, "view")] == 1
    assert got[(T0 + timedelta(hours=1), "view")] == 1


def test_sliding_counts_two_windows_each(spark, event_dir):
    rows = ev.sliding_window_counts(spark, event_dir).collect()
    # 4 events × 2 windows each = 8 total window memberships
    assert sum(r.n_events for r in rows) == 8
    # the event at 00:10 is in windows starting 23:40? no — 00:00 and 23:30
    starts = {r.window_start for r in rows}
    assert T0 in starts and T0 - timedelta(minutes=30) in starts


def test_sessionize_gap(spark, event_dir):
    sessions = sorted(
        ev.sessionize(spark, event_dir).collect(),
        key=lambda r: (r.user_id, r.session_start),
    )
    u1 = [s for s in sessions if s.user_id == 1]
    assert len(u1) == 2  # 45-min gap splits
    assert u1[0].n_events == 2 and u1[1].n_events == 1
    assert u1[0].session_start == T0
    assert u1[0].session_end == T0 + timedelta(minutes=10)


def test_session_window_agrees_with_manual(spark, event_dir):
    manual = {
        (r.user_id, r.session_start): r.n_events
        for r in ev.sessionize(spark, event_dir).collect()
    }
    native = {
        (r.user_id, r.session_start): r.n_events
        for r in ev.session_window_stats(spark, event_dir).collect()
    }
    assert manual == native


@pytest.fixture(scope="module")
def emb_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("emb"))
    import numpy as np

    rng = np.random.RandomState(0)
    base = rng.standard_normal(64)
    rows = []
    # vec 0 = query; vec 1 = nearly identical; vec 2 = opposite; others random
    rows.append((0, [float(x) for x in base], 0))
    rows.append((1, [float(x) for x in base + 0.01 * rng.standard_normal(64)], 0))
    rows.append((2, [float(-x) for x in base], 1))
    for i in range(3, 20):
        rows.append((i, [float(x) for x in rng.standard_normal(64)], i % 3))
    spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{path}/embeddings.parquet")
    return path


def test_knn_bruteforce_finds_planted_neighbor(spark, emb_dir):
    rows = sim.knn_bruteforce(spark, emb_dir).collect()
    top_for_0 = [r for r in rows if r.query_id == 0 and r.rank == 1][0]
    assert top_for_0.vec_id == 1
    assert top_for_0.cosine > 0.99


def test_knn_lsh_subset_of_bruteforce(spark, emb_dir):
    brute = {(r.query_id, r.vec_id) for r in sim.knn_bruteforce(spark, emb_dir).collect()}
    lsh_rows = sim.knn_lsh(spark, emb_dir).collect()
    # every LSH hit must be a true candidate with identical cosine ranking rules
    for r in lsh_rows:
        assert r.cosine <= 1.0
    # the planted near-identical pair shares every hyperplane sign
    assert (0, 1) in {(r.query_id, r.vec_id) for r in lsh_rows}


def test_knn_lsh_multiprobe_reaches_beyond_the_exact_bucket(spark):
    """The shipped multi-probe operating point must (a) only ever score
    candidates within Hamming distance LSH_RADIUS of the query signature
    and (b) actually surface neighbors OUTSIDE the radius-0 bucket — the
    whole point of the r7→r8 move off recall@5 = 0.04."""
    sf = "/root/testdata/sf0.001"
    sigs = {
        r.vec_id: r.sig
        for r in sim._lsh_postings(spark, sf).select("vec_id", "sig").collect()
    }
    got = sim.knn_lsh(spark, sf).collect()
    assert got  # the probed buckets are non-empty on the real corpus
    dists = [
        bin(sigs[r.vec_id] ^ sigs[r.query_id]).count("1") for r in got
    ]
    assert all(d <= sim.LSH_RADIUS for d in dists)
    # at least one returned neighbor lives outside the exact bucket
    # (radius-0 search would never have found it)
    assert any(d > 0 for d in dists)


def test_knn_ivf_structure_and_planted_pair(spark, emb_dir):
    rows = sim.knn_ivf(spark, emb_dir).collect()
    # fixture: vec 0 is the only id % 97 == 0 → one cell holds everything,
    # so IVF degenerates to brute force minus nothing — the planted
    # near-identical pair must surface at rank 1
    top_for_0 = [r for r in rows if r.query_id == 0 and r.rank == 1][0]
    assert top_for_0.vec_id == 1
    assert top_for_0.cosine > 0.99
    # per-query ranks are 1..k with strictly non-increasing cosine
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        cosines = [r.cosine for r in rs]
        assert cosines == sorted(cosines, reverse=True)


def test_knn_sq8_codes_bounded_and_planted_pair(spark, emb_dir):
    """Codes must be signed bytes in [-127, 127]; the planted
    near-identical pair must survive quantization as rank-1."""
    codes = sim._sq8_codes(spark, emb_dir).collect()
    assert codes
    for r in codes:
        assert all(-sim.SQ8_LEVELS <= q <= sim.SQ8_LEVELS for q in r.qv)
    top_for_0 = [
        r
        for r in sim.knn_sq8(spark, emb_dir).collect()
        if r.query_id == 0 and r.rank == 1
    ][0]
    assert top_for_0.vec_id == 1
    sim.release(emb_dir)


def test_knn_sq8_recall_on_corpus(spark):
    """SQ8 is compression, not pruning — recall loss comes only from
    8-bit resolution, so it must sit far above the pruning methods
    (measured 1.0 at sf0.001, 0.96 at sf0.01/sf0.1)."""
    sf = "/root/testdata/sf0.001"
    brute = {(r.query_id, r.vec_id) for r in sim.knn_bruteforce(spark, sf).collect()}
    sq8 = {(r.query_id, r.vec_id) for r in sim.knn_sq8(spark, sf).collect()}
    recall = len(brute & sq8) / len(brute)
    assert recall >= 0.9, f"SQ8 recall {recall:.2f} below floor"
    # integer scores: rerunning must reproduce the exact row set
    again = {(r.query_id, r.vec_id) for r in sim.knn_sq8(spark, sf).collect()}
    assert sq8 == again


def test_knn_ivf_recall_on_corpus(spark):
    """On the real sf0.001 corpus, IVF@nprobe=2 must recover a sane
    fraction of brute-force top-5 (ANN trades recall for candidates)."""
    sf = "/root/testdata/sf0.001"
    brute = {(r.query_id, r.vec_id) for r in sim.knn_bruteforce(spark, sf).collect()}
    ivf = {(r.query_id, r.vec_id) for r in sim.knn_ivf(spark, sf).collect()}
    assert len(ivf) > 0
    recall = len(brute & ivf) / len(brute)
    assert recall >= 0.3, f"IVF recall {recall:.2f} below floor"


def test_cosine_math(spark):
    df = spark.createDataFrame([([1.0, 0.0], [0.0, 1.0])], "a array<double>, b array<double>")
    got = df.select(
        V.dot(F.col("a"), F.col("b")).alias("d"),
        V.cosine(F.col("a"), F.col("a")).alias("self"),
    ).first()
    assert got.d == 0.0
    assert got.self == pytest.approx(1.0)


def test_knn_pq_structure_and_planted_pair(spark, emb_dir):
    """PQ/ADC: vec 0 is the only seed, so every subspace has one centroid
    and every vector gets the same code — ADC distance degenerates to the
    query's own distance-to-centroid sum, identical for all candidates,
    so ranking falls to the vec_id tie-break. Structure still holds: ranks
    1..k per query, distances non-decreasing, and the planted
    near-identical pair (0,1) scores rank 1 for query 0 by tie-break."""
    rows = sim.knn_pq(spark, emb_dir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        d = [r.approx_d2 for r in rs]
        assert d == sorted(d)
        assert all(x >= 0 for x in d)
    top_for_0 = [r for r in rows if r.query_id == 0 and r.rank == 1][0]
    assert top_for_0.vec_id == 1


def test_knn_pq_codes_discriminate_on_corpus(spark):
    """On the real corpus (multiple seeds → multiple cells) ADC distances
    must actually discriminate: per query, the top-5 approx distances are
    not all identical."""
    from tests.conftest import SF_SMOKE

    rows = sim.knn_pq(spark, SF_SMOKE).collect()
    assert len(rows) == 50
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r.approx_d2)
    assert any(len(set(v)) > 1 for v in by_q.values())


def test_knn_ivfpq_agrees_with_pq_on_shared_pairs(spark):
    """IVF-PQ = PQ scoring over cell-pruned candidates: any (query, vec)
    pair surfaced by BOTH variants must carry the identical ADC distance
    (same codes, same lookup table — only the candidate set differs)."""
    from tests.conftest import SF_SMOKE

    pq = {(r.query_id, r.vec_id): r.approx_d2
          for r in sim.knn_pq(spark, SF_SMOKE).collect()}
    ivfpq_rows = sim.knn_ivfpq(spark, SF_SMOKE).collect()
    assert len(ivfpq_rows) > 0
    shared = 0
    for r in ivfpq_rows:
        if (r.query_id, r.vec_id) in pq:
            assert r.approx_d2 == pq[(r.query_id, r.vec_id)]
            shared += 1
    assert shared > 0  # the probed cells contain some of the global top-5
    by_q = {}
    for r in ivfpq_rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        d = [r.approx_d2 for r in rs]
        assert d == sorted(d)


def test_kmeans_derived_seed_count_partitions_corpus(spark, emb_dir):
    # the crafted 20-vector corpus derives K = ceil(2*sqrt(20)) = 9 seeds;
    # every vector lands in exactly one surviving cluster
    p = sim.ivf_params(spark, emb_dir)
    assert p.k == 9
    rows = sim.embedding_kmeans(spark, emb_dir).collect()
    assert 0 < len(rows) <= p.k
    assert sum(r.n_vectors for r in rows) == 20
    assert sum(r.inertia for r in rows) > 0


def test_kmeans_lloyd_iterations_never_increase_inertia(spark):
    from tests.conftest import SF_SMOKE

    def total_inertia(iters):
        rows = sim.embedding_kmeans(spark, SF_SMOKE, iters=iters).collect()
        return sum(r.inertia for r in rows), rows

    i0, _ = total_inertia(0)
    i2, rows = total_inertia(2)
    assert i2 <= i0  # Lloyd monotonicity
    # every vector is assigned exactly once
    from automotive_big_data_analysis_spark.catalog import load_table

    n = load_table(spark, SF_SMOKE, "embeddings").count()
    assert sum(r.n_vectors for r in rows) == n
    # cluster count is bounded by the derived seed count and never zero
    assert 0 < len(rows) <= sim.ivf_params(spark, SF_SMOKE).k


def test_similarity_stored_index_lifecycle(spark):
    """The ANN index structures are STORED tables: after the first build
    the search plan reads index FILES (no training subtree), results are
    identical across re-reads, release() has nothing session-resident to
    drop, and a fresh catalog re-attaches the existing files by DDL."""
    from automotive_big_data_analysis_spark.plans import explain as px
    from tests.conftest import SF_SMOKE

    before = sim.knn_ivfpq(spark, SF_SMOKE).collect()
    assert sim.release(SF_SMOKE) == 0  # nothing memoized in-session
    after_df = sim.knn_ivfpq(spark, SF_SMOKE)
    plan = px.physical_plan(after_df)
    assert "pq_codes" in plan and "cells" in plan  # file-backed index
    assert sorted(map(tuple, before)) == sorted(map(tuple, after_df.collect()))
    # fresh-session simulation: catalog forgets, files remain → the
    # store-through re-attaches via DDL and serves identical rows
    import os

    from automotive_big_data_analysis_spark.sources.stored import (
        source_fingerprint,
    )

    tag = (
        f"{sim._index_tag(sim.ivf_params(spark, SF_SMOKE))}"
        f"nb{sim.ANN_INDEX_BUCKETS}"
        f"_{source_fingerprint(SF_SMOKE, 'embeddings')}"
    )
    base = f"{os.path.basename(SF_SMOKE.rstrip('/')).replace('.', '_')}_{tag}"
    dropped = 0
    for t in ("codebook", "cells", "pq_codes"):
        spark.sql(f"DROP TABLE IF EXISTS ann_idx_{base}.{t}")
        dropped += 1
    # the db must actually exist (guards against a silent name mismatch
    # that would no-op the drops and leave the re-attach path untested)
    assert any(d.name == f"ann_idx_{base}" for d in spark.catalog.listDatabases())
    again = sim.knn_ivfpq(spark, SF_SMOKE).collect()
    assert sorted(map(tuple, before)) == sorted(map(tuple, again))


def test_funnel_requires_ordered_stages(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("funnel"))
    rows = [
        # user 1 completes view(t0) -> click(+60s) -> purchase(+180s)
        (1, T0, 1, "view", 0.0, "{}"),
        (2, T0 + timedelta(seconds=60), 1, "click", 0.0, "{}"),
        (3, T0 + timedelta(seconds=180), 1, "purchase", 0.0, "{}"),
        # user 2 views then purchases WITHOUT clicking -> stops at view
        (4, T0, 2, "view", 0.0, "{}"),
        (5, T0 + timedelta(seconds=30), 2, "purchase", 0.0, "{}"),
        # user 3 clicks BEFORE viewing -> the early click must not count
        (6, T0, 3, "click", 0.0, "{}"),
        (7, T0 + timedelta(seconds=10), 3, "view", 0.0, "{}"),
        # user 4 never views -> not in the funnel at all
        (8, T0, 4, "click", 0.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")
    got = {r.stage: r for r in ev.funnel(spark, path).collect()}
    assert got["view"].n_users == 3 and got["view"].avg_lag_s is None
    assert got["click"].n_users == 1  # only user 1 clicked after viewing
    assert got["click"].avg_lag_s == 60.0
    assert got["purchase"].n_users == 1
    assert got["purchase"].avg_lag_s == 120.0


def test_knn_lsh_multitable_dedups_pairs_and_finds_planted(spark, emb_dir):
    """Multi-table LSH: a pair probed by several tables ranks exactly
    once (contiguous ranks, unique (query, candidate) pairs), and the
    planted near-identical neighbor — same half-space in every table
    with overwhelming probability — is query 0's top hit."""
    rows = sim.knn_lsh_multitable(spark, emb_dir).collect()
    pairs = [(r.query_id, r.vec_id) for r in rows]
    assert len(pairs) == len(set(pairs))
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for rs in by_q.values():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        cosines = [r.cosine for r in rs]
        assert cosines == sorted(cosines, reverse=True)
    top0 = [r for r in rows if r.query_id == 0 and r.rank == 1][0]
    assert top0.vec_id == 1 and top0.cosine > 0.99


def test_knn_recall_report_bounds_and_ground_truth(spark):
    """Recall is a valid ratio per method; the ground-truth denominator
    is exactly |queries| x TOP_K; IVF (data-adaptive cells) must beat
    random-hyperplane LSH on this corpus."""
    sim.release()
    rows = {
        r.method: r
        for r in sim.knn_recall_report(spark, "/root/testdata/sf0.001").collect()
    }
    assert set(rows) == set(sim.RECALL_METHODS)
    for r in rows.values():
        assert r.n_true == r.n_queries * sim.TOP_K
        assert 0 <= r.n_hits <= r.n_true
        assert 0.0 <= r.recall_at_k <= 1.0
    assert rows["ivf"].n_hits > rows["lsh"].n_hits
    # OR-amplification: the multi-table family must beat its own
    # single-table baseline (round 9: 0.76 vs 0.20 at this SF)
    assert rows["lsh_mt"].n_hits > rows["lsh"].n_hits
    # exact re-ranking buys back the sq8 quantization loss: the rerank
    # must match-or-beat the raw composition AND reach the IVF candidate
    # ceiling (round 11 — the lifecycle completion the PQ rerank pins)
    assert rows["sq8_rr"].n_hits >= rows["ivf_sq8"].n_hits
    assert rows["sq8_rr"].n_hits >= rows["ivf"].n_hits
    sim.release()


def test_recall_report_families_partition_the_full_report(spark):
    """The four registered per-family reports are an exact partition of
    the all-methods report: same rows, one family per method, nothing
    double-counted (the round-11 split must not change any value)."""
    sf = "/root/testdata/sf0.001"
    full = {
        r.method: (r.n_queries, r.n_hits, r.n_true, r.recall_at_k)
        for r in sim.knn_recall_report(spark, sf).collect()
    }
    fam_methods = [m for ms in sim.RECALL_FAMILIES.values() for m in ms]
    assert sorted(fam_methods) == sorted(sim.RECALL_METHODS)
    union = {}
    for fam, methods in sim.RECALL_FAMILIES.items():
        for r in sim.knn_recall_report(spark, sf, methods).collect():
            assert r.method not in union
            assert r.method in methods
            union[r.method] = (r.n_queries, r.n_hits, r.n_true, r.recall_at_k)
    assert union == full


def test_sq8_rerank_recovers_ivf_exactly_at_saturating_r(spark):
    """Cross-check of the sq8 rerank pipeline: the IVF×SQ8 candidate set
    is the SAME cell-pruned set knn_ivf scores, so when SQ8_RERANK_R
    covers every per-query candidate the exact-cosine re-ranking must
    equal knn_ivf row-for-row — any divergence means the integer
    shortlist or the exact pass is wrong. At the shipped R the rerank
    must still match-or-beat the raw integer composition on
    ground-truth hits."""
    sf = "/root/testdata/sf0.001"
    bf = {(r.query_id, r.vec_id) for r in sim.knn_bruteforce(spark, sf).collect()}
    orig = sim.SQ8_RERANK_R
    try:
        sim.SQ8_RERANK_R = 10_000  # saturate: shortlist = all candidates
        rr_sat = [
            (r.query_id, r.rank, r.vec_id, r.cosine)
            for r in sim.knn_sq8_rerank(spark, sf).collect()
        ]
    finally:
        sim.SQ8_RERANK_R = orig
    ivf = [
        (r.query_id, r.rank, r.vec_id, r.cosine)
        for r in sim.knn_ivf(spark, sf).collect()
    ]
    assert sorted(rr_sat) == sorted(ivf)
    rr = {(r.query_id, r.vec_id) for r in sim.knn_sq8_rerank(spark, sf).collect()}
    raw = {(r.query_id, r.vec_id) for r in sim.knn_ivf_sq8(spark, sf).collect()}
    assert len(rr & bf) >= len(raw & bf)


def test_projection_preserves_norms_approximately(spark):
    """JL property on real data: per-label mean norm ratio within 20% of
    1.0 for a 64->16 projection, and ratios strictly positive."""
    rows = sim.projection_quality(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert 0.8 <= r.avg_norm_ratio <= 1.2
        assert 0 < r.min_norm_ratio <= r.max_norm_ratio


def test_knn_recall_tradeoff_frontier_consistent(spark):
    """The frontier must be internally consistent and agree with the
    point evaluations: recall and scanned rows are non-decreasing in
    the probe depth (a deeper probe only ADDS candidates, and top-k over
    a superset can only gain ground-truth hits... recall monotonicity
    actually isn't guaranteed for PQ-distorted scores, so assert it only
    for the exact-scored methods), every configured level is present,
    and the IVF/IVF-PQ rows at probe=NPROBE reproduce the
    knn_recall_report numbers (same index, same operating point)."""
    from automotive_big_data_analysis_spark.operators import similarity as sim

    sf = "/root/testdata/sf0.001"
    params = sim.ivf_params(spark, sf)
    rows = {
        (r.method, r.probe): r
        for r in sim.knn_recall_tradeoff(spark, sf).collect()
    }
    from automotive_big_data_analysis_spark.functions import vectors as V

    mt_tables = tuple(range(1, V.LSH_TABLES + 1))
    assert {m for m, _ in rows} == {
        "lsh", "ivf", "ivfpq", "lsh_mt", "lsh_mt_tables", "sq8_rr"
    }
    for m, levels in (
        ("ivf", params.levels),
        ("ivfpq", params.levels),
        ("lsh", sim.TRADEOFF_RADII),
        ("lsh_mt", sim.TRADEOFF_RADII),
        ("lsh_mt_tables", mt_tables),
        ("sq8_rr", sim.SQ8_RERANK_LEVELS),
    ):
        assert [p for mm, p in sorted(rows) if mm == m] == sorted(levels)
        cand = [rows[(m, p)].cand_rows for p in sorted(levels)]
        assert cand == sorted(cand)  # deeper probe scans at least as much
    # exact-scored methods: recall non-decreasing in depth
    for m, levels in (
        ("ivf", params.levels),
        ("lsh", sim.TRADEOFF_RADII),
        ("lsh_mt", sim.TRADEOFF_RADII),
        ("lsh_mt_tables", mt_tables),
        ("sq8_rr", sim.SQ8_RERANK_LEVELS),
    ):
        rec = [rows[(m, p)].recall_at_k for p in sorted(levels)]
        assert rec == sorted(rec)
    # the two axes meet at the shipped point: radius LSH_MT_RADIUS at
    # full L is the same candidate set as table-count L at that radius
    assert (
        rows[("lsh_mt", sim.LSH_MT_RADIUS)].cand_rows
        == rows[("lsh_mt_tables", V.LSH_TABLES)].cand_rows
    )
    assert (
        rows[("lsh_mt", sim.LSH_MT_RADIUS)].recall_at_k
        == rows[("lsh_mt_tables", V.LSH_TABLES)].recall_at_k
    )
    # the shipped operating point and the stored depth are both levels
    assert params.nprobe in params.levels
    assert max(params.levels) == params.maxprobe
    report = {
        r.method: r.recall_at_k
        for r in sim.knn_recall_report(spark, sf).collect()
    }
    assert rows[("ivf", params.nprobe)].recall_at_k == report["ivf"]
    assert rows[("ivfpq", params.nprobe)].recall_at_k == report["ivfpq"]
    # knn_lsh ships the multi-probe operating point (round-7 frontier:
    # radius 0 = 0.04 recall@5 at sf0.01 was too low to ship)
    assert rows[("lsh", sim.LSH_RADIUS)].recall_at_k == report["lsh"]


def test_ivfpq_rerank_recovers_ivf_exactly_at_saturating_r(spark):
    """Cross-check of the three-stage pipeline: rerank scores the ADC
    shortlist with EXACT cosine over the same IVF candidate set, so
    when RERANK_R covers every per-query candidate the result must
    equal knn_ivf row-for-row — any divergence means the shortlist
    ranking or the exact pass is wrong. At the shipped R (a real
    truncation at this SF: ~330 candidates vs R=150) rerank must still
    beat-or-match raw ADC on ground-truth hits."""
    sf = "/root/testdata/sf0.001"
    bf = {(r.query_id, r.vec_id) for r in sim.knn_bruteforce(spark, sf).collect()}
    orig = sim.RERANK_R
    try:
        sim.RERANK_R = 10_000  # saturate: shortlist = all candidates
        rr_sat = [
            (r.query_id, r.rank, r.vec_id, r.cosine)
            for r in sim.knn_ivfpq_rerank(spark, sf).collect()
        ]
    finally:
        sim.RERANK_R = orig
    ivf = [
        (r.query_id, r.rank, r.vec_id, r.cosine)
        for r in sim.knn_ivf(spark, sf).collect()
    ]
    assert sorted(rr_sat) == sorted(ivf)
    rr = {
        (r.query_id, r.vec_id)
        for r in sim.knn_ivfpq_rerank(spark, sf).collect()
    }
    adc = {(r.query_id, r.vec_id) for r in sim.knn_ivfpq(spark, sf).collect()}
    assert len(bf & rr) >= len(bf & adc)


def test_index_update_stats_semantics(spark):
    """The incremental-maintenance report: every vector lands in exactly
    one cell (splits partition the corpus), the split sizes match the
    deterministic vec_id rule, and the shares are exact ratios."""
    sf = "/root/testdata/sf0.001"
    rows = sim.index_update_stats(spark, sf).collect()
    emb = sim._emb(spark, sf)
    n_inc = emb.where(F.col("vec_id") % sim.SPLIT_MOD == 0).count()
    n_hist = emb.count() - n_inc
    assert sum(r.n_incoming for r in rows) == n_inc
    assert sum(r.n_history for r in rows) == n_hist
    for r in rows:
        tot = r.n_history + r.n_incoming
        assert abs(r.incoming_share - r.n_incoming / tot) < 1e-6
        if r.n_history:
            assert -1.0 <= r.avg_cos_history <= 1.0
        if r.n_incoming:
            assert -1.0 <= r.avg_cos_incoming <= 1.0


def test_knn_operating_point_selects_frontier_knee(spark):
    """Autotune consistency: one row per method; the chosen row exists
    in the frontier with identical recall/cost; when any level clears
    the target, the choice is the CHEAPEST clearing probe; otherwise
    the best-recall point with meets_target=false; and IVF's
    recommendation equals the shipped closed-form ceil(K/3) default."""
    sf = "/root/testdata/sf0.001"
    fr = {
        (r.method, r.probe): r
        for r in sim.knn_recall_tradeoff(spark, sf).collect()
    }
    ops = {r.method: r for r in sim.knn_operating_point(spark, sf).collect()}
    assert set(ops) == {
        "lsh", "ivf", "ivfpq", "lsh_mt", "lsh_mt_tables", "sq8_rr"
    }
    for m, op in ops.items():
        src = fr[(m, op.probe)]
        assert (op.recall_at_k, op.cand_rows) == (
            src.recall_at_k,
            src.cand_rows,
        )
        clearing = [
            p for (mm, p), r in fr.items()
            if mm == m and r.recall_at_k >= sim.RECALL_TARGET
        ]
        if clearing:
            assert op.meets_target and op.probe == min(clearing)
        else:
            assert not op.meets_target
            assert op.recall_at_k == max(
                r.recall_at_k for (mm, _), r in fr.items() if mm == m
            )
    # the SHIPPED multi-table constants are governed by this frontier:
    # the recommendation on each axis equals the shipped operating
    # point (round 10 — measured at sf0.001/0.01/0.1: best-recall or
    # cheapest-clearing is (radius 2, tables 4) at every SF; a corpus
    # whose frontier drifts away from the constants fails here)
    from automotive_big_data_analysis_spark.functions import vectors as V

    assert ops["lsh_mt"].probe == sim.LSH_MT_RADIUS
    assert ops["lsh_mt_tables"].probe == V.LSH_TABLES
    # sq8 rerank-depth governance (round 11): the shipped SQ8_RERANK_R
    # is a swept level at least as deep as the recommendation (measured:
    # the recommendation is 10 at every test SF — quantization is mild
    # enough that a 2×k shortlist already recovers the ceiling; the
    # shipped 50 = 10×k is the conservative default) and leaves no
    # recall on the table relative to it
    assert sim.SQ8_RERANK_R in sim.SQ8_RERANK_LEVELS
    assert sim.SQ8_RERANK_R >= ops["sq8_rr"].probe
    assert (
        fr[("sq8_rr", sim.SQ8_RERANK_R)].recall_at_k
        == ops["sq8_rr"].recall_at_k
    )


def test_ivf_params_match_duckdb_derivation(spark):
    """The Spark-side integer derivation (IvfParams) and the oracle's
    scalar-subquery derivation (_PARAMS_CTE) must agree on every
    component for a spread of corpus sizes — a drifted formula would
    silently desync the two engines' index structures."""
    import duckdb

    for n in (1, 7, 20, 100, 499, 500, 2000, 10_000, 1_000_000):
        p = sim.IvfParams(n)
        sql = sim._PARAMS_CTE.replace(
            "FROM (SELECT COUNT(*) AS n FROM e)", f"FROM (SELECT {n} AS n)"
        )
        row = duckdb.sql(f"WITH x AS (SELECT 1){sql} SELECT * FROM pk").fetchone()
        assert row == (n, p.k, p.nprobe, p.maxprobe), (n, row)
        assert p.maxprobe >= p.nprobe >= 1
        assert max(p.levels) == p.maxprobe and p.nprobe in p.levels


def test_seed_rows_survive_sparse_id_sets(spark):
    """Regression (round 9): the history split excludes every 5th id, so
    an id-stride seed rule can pick ZERO seeds (stride 10 ∩ ids≠0 mod 5
    = ∅ — it zeroed knn_index_update_stats during development). The md5
    top-K rule must yield exactly K seeds from any id subset."""
    emb = sim._emb(spark, "/root/testdata/sf0.001")
    hist = emb.where(F.col("vec_id") % sim.SPLIT_MOD != 0)
    k = sim.IvfParams(hist.count()).k
    seeds = sim._seed_rows(hist, k).collect()
    assert len(seeds) == k
    assert all(r.vec_id % sim.SPLIT_MOD != 0 for r in seeds)


def test_index_retrain_decision_accounts(spark):
    """The decision rollup partitions the drift report exactly: verdict
    classes are from the fixed vocabulary, cell/row counts reconcile
    with knn_index_update_stats, and every 'retrain' class carries
    enough incoming evidence by construction."""
    sf = "/root/testdata/sf0.001"
    per_cell = sim.index_update_stats(spark, sf).collect()
    rows = sim.index_retrain_decision(spark, sf).collect()
    assert {r.verdict for r in rows} <= {"retrain", "hot", "keep"}
    assert sum(r.n_cells for r in rows) == len(per_cell)
    assert sum(r.n_history for r in rows) == sum(c.n_history for c in per_cell)
    assert sum(r.n_incoming for r in rows) == sum(
        c.n_incoming for c in per_cell
    )
    for r in rows:
        if r.verdict == "retrain":
            # a retrain verdict requires drift evidence at the threshold
            assert r.max_drift >= sim.DRIFT_RETRAIN
            assert r.n_incoming >= sim.MIN_INCOMING


def test_knn_ivf_filtered_honors_predicate_and_probes_deeper(spark):
    """Filtered search: every result satisfies the metadata predicate,
    per-query ranks are contiguous with non-increasing cosine, and the
    result set equals brute-force-over-the-filtered-subset restricted to
    the query's probed cells (the IVF candidate ceiling)."""
    sf = "/root/testdata/sf0.001"
    rows = sim.knn_ivf_filtered(spark, sf).collect()
    emb = sim._emb(spark, sf)
    even = {
        r.vec_id
        for r in emb.where(
            F.col("label") % sim.FILTER_LABEL_MOD == 0
        ).collect()
    }
    by_q = {}
    for r in rows:
        assert r.vec_id in even
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        cosines = [r.cosine for r in rs]
        assert cosines == sorted(cosines, reverse=True)
    # deeper probing under filters: the filtered search uses the full
    # stored postings depth, not the unfiltered default
    p = sim.ivf_params(spark, sf)
    assert p.maxprobe > p.nprobe


def test_semantic_keep_accounts_exactly(spark):
    """Keep/drop partition the corpus; the drop set is exactly the
    distinct higher-id members of the near-dup pair list."""
    sf = "/root/testdata/sf0.001"
    rows = sim.semantic_keep_stats(spark, sf).collect()
    emb = sim._emb(spark, sf)
    assert sum(r.n_vectors for r in rows) == emb.count()
    for r in rows:
        assert r.n_kept + r.n_dropped == r.n_vectors
    pairs = sim.cosine_dup_pairs(spark, sf).collect()
    dropped_ids = {p.vec_b for p in pairs}
    assert sum(r.n_dropped for r in rows) == len(dropped_ids)


def test_rollup_hierarchy_equals_direct_day_aggregation(spark, event_dir):
    # The three-tier re-aggregation must be indistinguishable from
    # aggregating raw events at day grain (partial-agg composition).
    from automotive_big_data_analysis_spark.catalog import load_table
    from automotive_big_data_analysis_spark.functions import exact as ex

    got = {r.day: r for r in ev.rollup_hierarchy(spark, event_dir).collect()}
    direct = {
        r.day: r
        for r in load_table(spark, event_dir, "events")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.count("*").alias("n_events"),
            ex.dsum("value", 6).alias("total_value"),
            F.countDistinct(F.date_trunc("minute", "ts")).alias("n_minutes"),
            F.countDistinct(F.date_trunc("hour", "ts")).alias("n_hours"),
        )
        .collect()
    }
    assert got.keys() == direct.keys()
    for day, g in got.items():
        d = direct[day]
        assert (g.n_events, g.total_value, g.n_minutes, g.n_hours) == (
            d.n_events,
            d.total_value,
            d.n_minutes,
            d.n_hours,
        )
    # the fixture's 4 events land in one day, 2 hours, 4 minutes
    (only,) = got.values()
    assert (only.n_events, only.n_hours, only.n_minutes) == (4, 2, 4)


def test_hll_user_rollup_merge_is_lossless_and_in_tolerance(spark):
    """Mergeability invariant: the union of hour sketches must estimate
    EXACTLY what one direct day-grain sketch estimates (register max is
    associative — re-aggregation loses nothing); the registered query's
    tolerance boolean must hold and its additive tiers must carry."""
    from automotive_big_data_analysis_spark.catalog import load_table

    sf = "/root/testdata/sf0.001"
    events = load_table(spark, sf, "events")
    merged = (
        events.groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .groupBy(F.date_trunc("day", "hour").alias("day"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
    )
    direct = events.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est")
    )
    assert {(r.day, r.est) for r in merged.collect()} == {
        (r.day, r.est) for r in direct.collect()
    }
    rows = ev.hll_user_rollup(spark, sf).collect()
    assert rows and all(r.est_within_tol for r in rows)
    per_day = {
        r.day: r.n_events
        for r in events.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count("*").alias("n_events"))
        .collect()
    }
    assert {r.day: r.n_events for r in rows} == per_day


def test_index_footprint_matches_definitions_and_live_counts(spark):
    """The footprint audit's stored-file counts must equal the counts
    the definitions imply: linear structures scale exactly with the
    corpus (lsh 1x, multi-table Lx, pq M sub-ids, sq8 1x), the postings
    skeleton stores min(|cells|, maxprobe) ranked cells per vector, the
    evaluation artifacts are corpus-size-independent, and every row
    count equals a live count of the same stored table."""
    sf = "/root/testdata/sf0.001"
    from automotive_big_data_analysis_spark.functions import vectors as V

    n = sim._corpus_n(spark, sf)
    p = sim.ivf_params(spark, sf)
    rows = {r.artifact: r for r in sim.knn_index_footprint(spark, sf).collect()}
    assert rows["lsh_postings"].n_rows == n
    assert rows["lsh_mt_postings"].n_rows == n * V.LSH_TABLES
    assert rows["pq_codes"].n_rows == n * sim.PQ_M
    assert rows["sq8_codes"].n_rows == n
    assert rows["ground_truth"].n_rows == sim.N_QUERIES * sim.TOP_K
    n_cells = rows["ivf_codebook"].n_rows
    assert 0 < n_cells <= p.k
    assert rows["ivf_postings"].n_rows == n * min(n_cells, p.maxprobe)
    assert rows["recall_frontier"].n_rows == (
        2 * len(sim.TRADEOFF_RADII)
        + V.LSH_TABLES
        + len(sim.SQ8_RERANK_LEVELS)
        + 2 * len(set(p.levels))
    )
    assert rows["lsh_mt_postings"].rows_per_vector == float(V.LSH_TABLES)
    # integrity: the reported counts ARE the stored tables' live counts
    assert rows["recall_frontier"].n_rows == sim._frontier_table(spark, sf).count()
    assert rows["ivf_postings"].n_rows == sim._ranked_cells(spark, sf).count()


def test_knn_ivf_sq8_candidates_respect_cell_pruning(spark):
    """Every composition hit must lie in one of its query's probed
    cells (the IVF pruning contract survives the sq8 scoring swap),
    and the composition must agree with standalone sq8 wherever sq8's
    top-5 happens to fall entirely inside probed cells."""
    sf = "/root/testdata/sf0.001"
    p = sim.ivf_params(spark, sf)
    cells = sim._ranked_cells(spark, sf).collect()
    assign = {r.vec_id: r.cell_id for r in cells if r.r == 1}
    probed = {}
    for r in cells:
        if r.vec_id < sim.N_QUERIES and r.r <= p.nprobe:
            probed.setdefault(r.vec_id, set()).add(r.cell_id)
    hits = sim.knn_ivf_sq8(spark, sf).collect()
    assert hits
    for h in hits:
        assert assign[h.vec_id] in probed[h.query_id]
    # integer scores agree with the standalone sq8 scorer on shared pairs
    sq8 = {(r.query_id, r.vec_id): r.qdot for r in sim.knn_sq8(spark, sf).collect()}
    shared = [(h.query_id, h.vec_id, h.qdot) for h in hits if (h.query_id, h.vec_id) in sq8]
    assert shared, "expected overlap between sq8 and ivf_sq8 top-5"
    for q, v, d in shared:
        assert sq8[(q, v)] == d


def test_gc_stale_generations_removes_only_stale(tmp_path):
    """The nightly warehouse sweep must reclaim exactly the non-live
    generations of the requested corpus prefix: other corpora are
    invisible to the walk, the live base is never touched, and the
    returned inventory (pre-removal bytes/tables) carries the
    live/removed classification."""
    import os

    from automotive_big_data_analysis_spark.sources.stored import (
        gc_stale_generations,
        scan_generations,
    )

    loc = str(tmp_path / "wh")
    for d in ("corp_a_live", "corp_a_old", "other_b_keep"):
        os.makedirs(os.path.join(loc, d, "t1"))
        with open(os.path.join(loc, d, "t1", "f.parquet"), "wb") as f:
            f.write(b"x" * 10)
    gens = gc_stale_generations(loc, "corp_a_", {"corp_a_live"}, remove=True)
    by = {g["base"]: g for g in gens}
    assert set(by) == {"corp_a_live", "corp_a_old"}
    assert by["corp_a_live"]["live"] and not by["corp_a_live"]["removed"]
    assert by["corp_a_old"]["removed"] and not by["corp_a_old"]["live"]
    assert by["corp_a_old"]["bytes"] == 10
    assert by["corp_a_old"]["tables"] == ["t1"]
    assert os.path.isdir(os.path.join(loc, "corp_a_live"))
    assert not os.path.isdir(os.path.join(loc, "corp_a_old"))
    assert os.path.isdir(os.path.join(loc, "other_b_keep"))
    # remove=False is a pure plan: nothing reclaimed
    plan = gc_stale_generations(loc, "other_b_", set(), remove=False)
    assert plan[0]["removed"] is False
    assert os.path.isdir(os.path.join(loc, "other_b_keep"))
    assert scan_generations(loc, "corp_a_")[0]["base"] == "corp_a_live"


def test_gc_audit_matches_definitions_and_sweeps_lineage(spark):
    """The planted-lifecycle GC audit must report exactly the three
    generations with counts the sizing definitions imply (live and
    stale_corpus under the current k, stale_params under the superseded
    factor-1.0 rule), classify only the live base as live, reclaim any
    lineage outside the three current bases on its opening sweep, and
    be idempotent run-to-run."""
    import os

    sf = "/root/testdata/sf0.001"
    stray = os.path.join(sim.GC_AUDIT_LOCATION, "sf0_001_superseded_lineage")
    os.makedirs(os.path.join(stray, "codebook"), exist_ok=True)
    rows = {
        r.generation: r for r in sim.knn_index_gc_audit(spark, sf).collect()
    }
    p = sim.ivf_params(spark, sf)
    k_old = sim._gc_k_old(p.n)
    assert set(rows) == {"live", "stale_corpus", "stale_params"}
    assert all(r.n_tables == 2 for r in rows.values())
    assert rows["live"].n_rows == p.k + (p.k + 1) // 2
    assert rows["stale_corpus"].n_rows == p.k + (p.k + 1) // 2
    assert rows["stale_params"].n_rows == k_old + (k_old + 1) // 2
    assert k_old < p.k  # the superseded sizing is a DIFFERENT point here
    assert rows["live"].is_live and not rows["live"].reclaim
    assert not rows["stale_corpus"].is_live and rows["stale_corpus"].reclaim
    assert not rows["stale_params"].is_live and rows["stale_params"].reclaim
    # the opening sweep reclaimed the planted superseded lineage
    assert not os.path.isdir(stray)
    # idempotent: a second run reports the identical classification
    again = {
        r.generation: r for r in sim.knn_index_gc_audit(spark, sf).collect()
    }
    assert again == rows
