"""Change-data-capture merge: applying an upsert/delete changelog to a
base snapshot with latest-wins semantics.

A 100 TB lake's mutable tables are maintained by periodic MERGE jobs: a
CDC batch of inserts/updates/deletes lands, and the engine folds it
into the snapshot keyed on the natural key, latest version winning,
deletes tombstoning. This module derives a deterministic changelog from
the canonical ``events`` table (content-keyed rules, so any engine
replays it), applies the merge the scalable way — ONE hash aggregation
keyed on the merge key with a ``max_by`` latest-wins combine, no window
— and summarizes the post-merge table.

The oracle computes the post-merge state in CLOSED FORM (CASE
expressions over the canonical table, no merge machinery at all):
equality proves the union + per-key latest-wins + tombstone pipeline
implements exactly the semantics the closed form specifies.

Scale shape: the changelog union is map-side; the per-key fold is a
partial-aggregated hash aggregation on the merge key (the same shuffle
a keyed MERGE pays — compare ``text_formats.idempotent_reingest``);
the summary is a |types|-row rollup. No windows, no joins, nothing
pairwise. At a real lake the base side would be the bucketed snapshot
(``sources/bucketed.py``) so the merge shuffle only moves the CDC batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from automotive_big_data_analysis_spark.catalog import load_table
from automotive_big_data_analysis_spark.functions import exact as ex

# Content-keyed changelog rules (deterministic on every engine).
UPDATE_MOD = 5  # event_id % 5 == 0  → value bumped by +1.5, version 2
DELETE_MOD = 13  # event_id % 13 == 0 → tombstone, version 3 (beats update)
VALUE_BUMP = 1.5


def _changelog(ev: DataFrame) -> DataFrame:
    """Tonight's CDC batch, derived from the snapshot: updates for the
    %5 keys, tombstones for the %13 keys (an id matching both receives
    both rows — the delete's higher version wins the fold)."""
    updates = ev.where(F.col("event_id") % UPDATE_MOD == 0).select(
        "event_id",
        "event_type",
        (F.col("value") + VALUE_BUMP).alias("value"),
        F.lit(2).alias("version"),
        F.lit("U").alias("op"),
    )
    deletes = ev.where(F.col("event_id") % DELETE_MOD == 0).select(
        "event_id",
        "event_type",
        F.lit(None).cast("double").alias("value"),
        F.lit(3).alias("version"),
        F.lit("D").alias("op"),
    )
    return updates.unionByName(deletes)


def merged_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The post-merge table: base ∪ changelog folded per key by highest
    version, tombstoned keys removed."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_id",
        "event_type",
        "value",
        F.lit(1).alias("version"),
        F.lit("I").alias("op"),
    )
    all_rows = base.unionByName(_changelog(ev))
    # latest-wins fold: one partial-aggregated hash agg on the merge
    # key; versions are distinct per (key, op) so max_by has no ties
    folded = all_rows.groupBy("event_id").agg(
        F.max_by("event_type", "version").alias("event_type"),
        F.max_by("value", "version").alias("value"),
        F.max_by("op", "version").alias("op"),
        F.max("version").alias("version"),
    )
    return folded.where(F.col("op") != "D")


def cdc_merge_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gate query: per-type accounting of the post-merge state —
    live rows, how many of them carry the update, and the exact value
    total (which must reflect every +1.5 bump on surviving keys and no
    value from tombstoned keys)."""
    snap = merged_snapshot(spark, sf_dir)
    return snap.groupBy("event_type").agg(
        F.count("*").alias("n_live"),
        F.sum((F.col("op") == "U").cast("long")).alias("n_updated"),
        ex.dsum("value", 6).alias("total_value"),
    )


def ivm_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance of the hourly rollup under the CDC
    changelog: the materialized aggregate is brought current by merging
    a DELTA computed from the changelog alone — the fact table is never
    rescanned, which is the entire point at 100 TB (the nightly job
    touches |changelog| rows + |view| groups, not petabytes).

    Delta rules per changed key (before-images come from the keyed
    changelog↔base join, here fused because the changelog derives from
    the snapshot): a tombstone contributes (-1, -old_value); a
    surviving update contributes (0, new_value - old_value). All value
    arithmetic accumulates in DECIMAL(25,10) UNROUNDED through the
    merge and rounds once at the end — decimal addition is exact and
    associative, so view + delta is BIT-EQUAL to the full recompute the
    oracle runs (a double-typed view would drift by an ulp and fail the
    hash gate; that is the real IVM lesson this operator encodes).

    Scale shape: the old view is a |hours × types| aggregate; the delta
    is one partial-combined aggregation over changelog-affected rows
    only; the merge is a full-outer join on the (hour, type) dimension
    key. Groups whose count reaches zero are dropped, matching the
    recompute."""
    ev = load_table(spark, sf_dir, "events")
    hour = F.date_trunc("hour", "ts").alias("window_start")
    old_view = ev.groupBy(hour, "event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(ex.dec("value")).alias("tot"),  # UNROUNDED decimal state
    )
    changed = ev.where(
        (F.col("event_id") % UPDATE_MOD == 0)
        | (F.col("event_id") % DELETE_MOD == 0)
    )
    is_del = F.col("event_id") % DELETE_MOD == 0
    delta = changed.groupBy(hour, "event_type").agg(
        F.sum(F.when(is_del, -1).otherwise(0)).alias("d_n"),
        F.sum(
            F.when(is_del, -ex.dec("value")).otherwise(
                ex.dec(F.col("value") + VALUE_BUMP) - ex.dec("value")
            )
        ).alias("d_tot"),
    )
    merged = (
        old_view.join(delta, ["window_start", "event_type"], "full_outer")
        .select(
            "window_start",
            "event_type",
            (
                F.coalesce(F.col("n_events"), F.lit(0))
                + F.coalesce(F.col("d_n"), F.lit(0))
            ).alias("n_events"),
            (
                F.coalesce(F.col("tot"), F.lit(0).cast(ex.DEC))
                + F.coalesce(F.col("d_tot"), F.lit(0).cast(ex.DEC))
            ).alias("tot"),
        )
        .where(F.col("n_events") > 0)
    )
    return merged.select(
        "window_start",
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        F.round(F.col("tot").cast("double"), 6).alias("total_value"),
    )


ORACLE: dict[str, str] = {
    # full recompute over the closed-form post-merge state — the IVM
    # result must be bit-equal to it
    "cdc_ivm_hourly_rollup": f"""
        SELECT date_trunc('hour', ts) AS window_start, event_type,
               COUNT(*) AS n_events,
               ROUND(CAST(SUM(CAST(
                   CASE WHEN event_id % {UPDATE_MOD} = 0
                        THEN value + {VALUE_BUMP} ELSE value END
                   AS {ex.SQL_DEC})) AS DOUBLE), 6) AS total_value
        FROM events
        WHERE event_id % {DELETE_MOD} != 0
        GROUP BY 1, 2
    """,
    # closed-form post-merge state: deleted keys gone, updated keys
    # carry the bump — no merge machinery, so equality verifies the fold
    "source_cdc_merge_events": f"""
        SELECT event_type, COUNT(*) AS n_live,
               CAST(SUM(CASE WHEN event_id % {UPDATE_MOD} = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_updated,
               ROUND(CAST(SUM(CAST(
                   CASE WHEN event_id % {UPDATE_MOD} = 0
                        THEN value + {VALUE_BUMP} ELSE value END
                   AS {ex.SQL_DEC})) AS DOUBLE), 6) AS total_value
        FROM events
        WHERE event_id % {DELETE_MOD} != 0
        GROUP BY event_type
    """,
}

QUERIES = {
    "source_cdc_merge_events": cdc_merge_summary,
    "cdc_ivm_hourly_rollup": ivm_hourly_rollup,
}
