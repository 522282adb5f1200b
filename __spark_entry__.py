"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` maps every
implemented operator (SURVEY.md §2 + extensions) to a
``(spark, sf_dir) -> DataFrame`` callable; ``oracle_sql()`` carries the
DuckDB-equivalent SQL for the driver's hash-comparison gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from automotive_big_data_analysis_spark.operators import analytics, asof, dedup, events, multimodal, pipeline, relational, relational_ext, relational_tpch, relational_tpch2, relational_tpch3, sampling, similarity, text_analysis, training_prep
from automotive_big_data_analysis_spark.sources import bucketed

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    return relational.pricing_summary(spark, SMOKE_SF_DIR)


# The driver's correctness sweep checks the FIRST 50 registered queries
# (dict order) per round, so ordering is a verification-coverage decision.
# Round-5 policy (per round-4 VERDICT item 2): the window holds (a) the
# 12 queries that have NEVER had a driver hash-green row (registered late
# in r4, or — events_sessionize — failing until this round's oracle cast
# fix), (b) every query whose Spark code or oracle changed THIS round
# (the sessionize/session-window EPOCH_US precision move, the
# approx_part_stats tolerance oracle, and the IVF/PQ trained fixed-K
# codebook rework), and (c) the 28 queries whose newest driver-green row
# is r1-r3 — they rotated out of the r4 window. Everything left past
# position 50 is r4-green and untouched this round.
_SWEEP_PRIORITY = [
    # (a) never driver-hash-green — the hard gaps
    "events_sessionize",             # FIXED: oracle BIGINT cast (r1-r4 fail)
    "approx_part_stats",             # NEW tolerance oracle (was rows-only)
    "events_funnel",                 # ordered-stage semantics (VERDICT #7)
    "text_repetition_stats",
    "knn_pq",                        # also: trained-codebook rework
    "knn_ivfpq",                     # also: trained-codebook rework
    "embedding_kmeans",              # also: shared-trainer refactor
    "pipeline_curation_sampled",
    "contamination_stats",
    "pack_token_shards",
    "temperature_rebalance",
    "text_bpe_pairs",
    # (b) code or oracle changed this round
    "events_session_window",         # shared session CTE moved to EPOCH_US
    "knn_ivf",                       # trained fixed-K codebook
    # (c) newest driver-green row is r1-r3 — rotate back in
    "customer_supplier_nations",
    "events_sliding_counts",
    "sample_stratified_documents",
    "sample_lineitem_stats",
    "sample_orders_split",
    "top_parts_per_brand",
    "order_price_delta",
    "events_hourly_rollup",
    "embedding_norm_stats",
    "filtered_scan",
    "distinct_priorities",
    "point_lookup",
    "top_orders",
    "customers_without_orders",
    "top_customer_per_nation",
    "priority_union",
    "idle_customers_except",
    "events_error_bursts",
    "text_token_stats",
    "text_quality_scores",
    "text_lang_confusion",
    "text_fingerprint_stats",
    "dedup_exact_stats",
    "knn_bruteforce",
    "knn_lsh",
    "embedding_cosine_dups",
    "asof_purchase_attribution",     # at-or-before tie semantics (VERDICT #7)
    "multimodal_frame_plan",
    # (d) NEW this round — cohort/anomaly/segmentation analytics +
    # incremental ingestion dedup
    "events_user_retention",
    "events_hourly_anomalies",
    "orders_rfm_segments",
    "docs_length_gate",
    "dedup_incremental_stats",
    "text_tfidf_topterms",
    "sample_weighted_documents",
    "docs_embedding_quality_corr",
]
# The window is exactly full (50 entries). Everything displaced past
# position 50 is r4 driver-hash-green AND untouched this round (see
# CORRECTNESS_r04.json); local oracle evidence for the full registry is
# refreshed in ORACLE_FULL_r05.txt / ORACLE_ALT_r05.txt (both layouts,
# 0 failures). Three queries registered after the window filled
# (`forecast_revenue_change`, `events_markov_transitions`,
# `embedding_outlier_scores`) carry local evidence only — rotate them
# into the r6 window first, along with anything r6 changes.


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    merged.update(relational.QUERIES)
    merged.update(relational_ext.QUERIES)
    merged.update(relational_tpch.QUERIES)
    merged.update(relational_tpch2.QUERIES)
    merged.update(relational_tpch3.QUERIES)
    merged.update(sampling.QUERIES)
    merged.update(events.QUERIES)
    merged.update(text_analysis.QUERIES)
    merged.update(dedup.QUERIES)
    merged.update(similarity.QUERIES)
    merged.update(asof.QUERIES)
    merged.update(multimodal.QUERIES)
    merged.update(bucketed.QUERIES)
    merged.update(pipeline.QUERIES)
    merged.update(training_prep.QUERIES)
    merged.update(analytics.QUERIES)
    out = {name: merged.pop(name) for name in _SWEEP_PRIORITY}
    out.update(merged)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(relational.ORACLE)
    out.update(relational_ext.ORACLE)
    out.update(relational_tpch.ORACLE)
    out.update(relational_tpch2.ORACLE)
    out.update(relational_tpch3.ORACLE)
    out.update(sampling.ORACLE)
    out.update(events.ORACLE)
    out.update(text_analysis.ORACLE)
    out.update(dedup.ORACLE)
    out.update(similarity.ORACLE)
    out.update(asof.ORACLE)
    out.update(multimodal.ORACLE)
    out.update(bucketed.ORACLE)
    out.update(pipeline.ORACLE)
    out.update(training_prep.ORACLE)
    out.update(analytics.ORACLE)
    return out
