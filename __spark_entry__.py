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
from automotive_big_data_analysis_spark.sources import bucketed, text_formats
from automotive_big_data_analysis_spark.streaming import events_stream

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    return relational.pricing_summary(spark, SMOKE_SF_DIR)


# The driver's correctness sweep checks the FIRST 50 registered queries
# (dict order) per round, so ordering is a verification-coverage decision.
# Round-6 policy (per round-5 VERDICT items 1-2): the window holds (a)
# the 3 queries that have NEVER had a driver hash-green row (registered
# in r5 after that round's window had filled), (b) the queries NEW this
# round (ANN recall evaluation, salted hot-key join, collocation lift),
# (c) every query whose Spark code changed this round (the two
# global-NTILE queries reworked onto the distributed two-pass rank;
# incremental dedup moved onto the stored pair index; the two
# shared-rounding-tree tie fixes — hash-identical at sf0.01 for all),
# and
# (d) the r4-green queries rotating back in (their newest driver row is
# r4; all were re-verified locally on two layouts in r5 and r6). Five
# [r1,r2,r3,r4]-green untouched queries (customer_running_balance,
# price_histogram, pricing_summary, revenue_by_nation, segment_share,
# year_trend) plus two [r1,r2,r4]-green ones (rollup_order_counts,
# customer_order_distribution) are displaced past position 50 — deepest evidence, lowest
# re-check value. multimodal_media_features (the sf0.1 tie fix) and
# embedding_cosine_dups (same fix class, defensive) are both in-window.
_SWEEP_PRIORITY = [
    # (a) never driver-hash-green — the last verification gaps
    "forecast_revenue_change",
    "events_markov_transitions",
    "embedding_outlier_scores",
    # (b) new this round
    "knn_recall_report",
    "events_salted_severity_join",
    "text_collocation_lift",
    "source_jsonl_events",
    "source_csv_events",
    "embedding_projection_quality",
    # (c) code changed this round (hash-identical rework, re-gate anyway)
    "orders_rfm_segments",
    "order_value_deciles",
    "dedup_incremental_stats",
    "embedding_cosine_dups",      # shared-rounding-tree fix (tie class)
    "pipeline_curation_sampled",  # pair list now read from stored index
    "knn_pq",                     # struct-min code assignment (argmin swap)
    "knn_ivfpq",                  # struct-min code assignment (argmin swap)
    "top_customer_per_nation",    # struct-min argmax swap
    "knn_ivf",                    # ANN index structures now stored tables
    "embedding_kmeans",           # codebook trainer store-through
    # (d) newest driver-green row is r4 — rotate back in
    "important_parts_share",
    "nation_market_share",
    "order_priority_check",
    "parts_supplier_counts",
    "priority_status_pivot",
    "promo_revenue_ratio",
    "quantity_percentiles",
    "returned_item_revenue",
    "salted_type_totals",
    "shipping_priority",
    "small_quantity_revenue",
    "sole_supplier_orders",
    "supplier_customer_balance",
    "top_revenue_suppliers",
    "bucketed_join_revenue",
    "dedup_components",
    "dedup_keep_stats",
    "dedup_minhash_lsh_pairs",
    "dedup_ngram_pairs",
    "dedup_simhash_groups",
    "embedding_label_centroids",
    "events_props_key_rollup",
    "events_props_value_per_type",
    "events_top_users",
    "events_type_share",
    "text_word_topk",
    "text_wordpiece_stats",
    "dedup_cdc_chunks",
    "multimodal_media_features",
    "pipeline_curation_report",
    "text_lang_trigram_confusion",
]
# The window is exactly full (50 entries). Everything displaced past
# position 50 is r5-green (or [r1..r4]-green for the six noted above)
# AND untouched this round; local oracle evidence for the full registry
# is refreshed in ORACLE_FULL_r06.txt / ORACLE_ALT_r06.txt (both
# layouts) plus the new scale-invariance sweep ORACLE_SF01_r06.txt at
# sf0.1. With this rotation every registered query has at least one
# driver-green row across r1-r6 once the r6 gate runs.


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
    merged.update(text_formats.QUERIES)
    merged.update(events_stream.QUERIES)
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
    out.update(text_formats.ORACLE)
    out.update(events_stream.ORACLE)
    out.update(pipeline.ORACLE)
    out.update(training_prep.ORACLE)
    out.update(analytics.ORACLE)
    return out
