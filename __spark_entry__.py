"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` maps every
implemented operator (SURVEY.md §2 + extensions) to a
``(spark, sf_dir) -> DataFrame`` callable; ``oracle_sql()`` carries the
DuckDB-equivalent SQL for the driver's hash-comparison gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from automotive_big_data_analysis_spark.operators import asof, dedup, events, multimodal, pipeline, relational, relational_ext, relational_tpch, relational_tpch2, relational_tpch3, sampling, similarity, text_analysis, training_prep
from automotive_big_data_analysis_spark.sources import bucketed

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    return relational.pricing_summary(spark, SMOKE_SF_DIR)


# The driver's correctness sweep checks the FIRST 50 registered queries
# (dict order) per round, so ordering is a verification-coverage decision.
# Round-4 policy (per round-3 ADVICE): the window holds (a) the 26 queries
# whose only driver-side rows are r1+r2 — they rotated out of the round-3
# window — and (b) every query whose Spark code or oracle changed THIS
# round (the DECIMAL(25,10) exact-sum migration in functions/exact.py, the
# events projections/from_json rewrite, the top_revenue_suppliers bounded
# broadcast, and the newly registered pipeline_curation_report). Queries
# left past position 50 are all (i) green in CORRECTNESS_r03 and
# (ii) untouched this round; see COVERAGE.md §sweep-rotation.
_SWEEP_PRIORITY = [
    # (a) rotated out of the r3 window — need a current-round row
    "order_priority_check",
    "supplier_customer_balance",     # also: exact-sum migration
    "small_quantity_revenue",        # also: exact-sum migration
    "cube_order_stats",              # also: exact-sum migration
    "approx_part_stats",             # rows-only by design (sketches)
    "priority_status_pivot",
    "quantity_percentiles",
    "shipping_priority",             # also: exact-sum migration
    "nation_market_share",           # also: exact ratio migration
    "parts_supplier_counts",
    "large_volume_customers",
    "daily_revenue_moving_avg",      # also: exact frame-avg migration
    "order_value_deciles",           # also: exact-avg migration
    "local_supplier_volume",         # also: exact-sum migration
    "important_parts_share",         # also: exact-sum threshold migration
    "customer_order_distribution",
    "promo_revenue_ratio",           # also: exact ratio migration
    "top_revenue_suppliers",         # also: bounded-broadcast rework
    "disjunctive_part_revenue",      # also: exact-sum migration
    "cross_nation_volume",           # also: exact-sum migration
    "returned_item_revenue",         # also: exact-sum migration
    "sole_supplier_orders",
    "idle_rich_customers",           # also: exact-avg threshold migration
    # (b) modified this round, green in r3 — keep in-window anyway
    "pipeline_curation_report",      # NEW: end-to-end curation pipeline
    "pricing_summary",               # flagship; exact sums/avgs
    "year_trend",
    "price_histogram",
    "segment_share",
    "rollup_order_counts",
    "revenue_by_nation",
    "customer_running_balance",      # exact windowed running sum
    "events_sessionize",             # r3's one hash-FAIL (flaky) — fixed
    "events_session_window",         # minimal-projection rework
    "events_type_share",
    "events_top_users",
    "events_props_value_per_type",   # from_json rewrite
    "bucketed_join_revenue",
    "embedding_label_centroids",     # exact-avg migration
    "text_wordpiece_stats",          # exact fanout-avg migration
    # (c) modified or new late in round 4 — must carry a current-round row
    "salted_type_totals",            # from_json rewrite
    "dedup_components",              # graph-sized loop shuffle width
    "dedup_minhash_lsh_pairs",       # candidate checkpoint + semi-join prune
    "dedup_simhash_groups",          # flat 64-expression aggregation
    "dedup_ngram_pairs",             # pipeline_curation_report reuses it
    "dedup_cdc_chunks",              # NEW: content-defined chunking
    "multimodal_media_features",     # first-ever oracle (exact stat defs)
    # (d) generate-path rework late in round 4 (explode_outer + staged
    # token arrays) — the queries whose SEMANTIC code path changed last
    "events_props_key_rollup",       # explode_outer over from_json map
    "dedup_keep_stats",              # consumes the reworked shingle table
    "text_word_topk",                # explode_outer over tokens
    "text_lang_trigram_confusion",   # explode_outer over trigram array
]
# Displaced to make room for late-round-4 modifications (all green in r3
# or r1+r2, unchanged by the late-round generate rework, and their
# exact-sum migration pattern is represented by in-window peers; all
# covered by ORACLE_FULL_r04.txt / ORACLE_ALT_r04.txt and tests/):
# customer_supplier_nations (INTERSECT), events_sliding_counts,
# sample_stratified_documents, top_parts_per_brand, order_price_delta,
# events_hourly_rollup, sample_lineitem_stats, sample_orders_split,
# embedding_norm_stats. Queries first registered late in round 4
# (knn_pq, knn_ivfpq, dedup_cdc_chunks — now in-window —
# text_bpe_pairs, contamination_stats, pack_token_shards, text_repetition_stats,
# events_funnel,
# temperature_rebalance, embedding_kmeans, pipeline_curation_sampled)
# carry local oracle evidence; rotate them in next round.


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
    return out
