"""As-of (nearest-preceding-event) join.

Spark has no native ASOF JOIN (DuckDB does — it serves as the oracle).
The scalable composition: union both sides tagged, hash-partition by the
join key, one ordered window per key carrying the right side's latest
timestamp forward (``last(..., ignoreNulls)`` over unbounded preceding),
then keep left-side rows. One shuffle on the key, no range explosion, no
per-group Python — this beats ``merge_asof``-in-``applyInPandas`` at
scale because state never leaves the JVM and skewed keys still stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from automotive_big_data_analysis_spark.catalog import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_value_cols: list[str] | None = None,
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts`` ≤ ``left_ts`` within the same ``on`` key (left join
    semantics — unmatched left rows keep NULLs). ``tolerance_seconds``
    optionally discards matches older than the tolerance."""
    right_value_cols = right_value_cols or []
    lt = left.select(
        F.lit(1).alias("_is_left"),
        F.col(on),
        F.col(left_ts).alias("_ts"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_rv_{c}") for c in right_value_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_rts"),
    )
    rt = right.select(
        F.lit(0).alias("_is_left"),
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(None).cast(lt.schema["_l"].dataType).alias("_l"),
        *[F.col(c).alias(f"_rv_{c}") for c in right_value_cols],
        F.col(right_ts).alias("_rts"),
    )
    # right rows sort before left rows at equal timestamps so an exact-tie
    # right row is visible to the left row (at-or-before semantics)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_ts"), F.col("_is_left"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = (
        lt.unionByName(rt)
        .withColumn("_last_rts", F.last("_rts", ignorenulls=True).over(w))
        .withColumns(
            {
                f"_last_rv_{c}": F.last(f"_rv_{c}", ignorenulls=True).over(w)
                for c in right_value_cols
            }
        )
    )
    out = carried.where(F.col("_is_left") == 1)
    if tolerance_seconds is not None:
        in_range = (
            F.col("_last_rts").isNotNull()
            & (
                F.col("_ts").cast("double") - F.col("_last_rts").cast("double")
                <= F.lit(float(tolerance_seconds))
            )
        )
        out = out.withColumn("_last_rts", F.when(in_range, F.col("_last_rts"))).withColumns(
            {
                f"_last_rv_{c}": F.when(in_range, F.col(f"_last_rv_{c}"))
                for c in right_value_cols
            }
        )
    return out.select(
        F.col("_l.*"),
        F.col("_last_rts").alias("asof_ts"),
        *[F.col(f"_last_rv_{c}").alias(f"asof_{c}") for c in right_value_cols],
    )


def purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase event: the same user's most recent click at or
    before it, and the click→purchase gap in seconds. The classic
    attribution as-of join, one shuffle on user_id."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_event_id")
    )
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        right_value_cols=["click_event_id"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("asof_click_event_id").alias("click_event_id"),
        F.round(
            F.col("ts").cast("double") - F.col("asof_ts").cast("double"), 6
        ).alias("gap_seconds"),
    )


ORACLE: dict[str, str] = {
    # DuckDB's native ASOF JOIN is the oracle for the composed operator
    "asof_purchase_attribution": """
        WITH purchases AS (
            SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
        ), clicks AS (
            SELECT user_id, ts, event_id AS click_event_id
            FROM events WHERE event_type = 'click'
        )
        SELECT p.event_id, p.user_id, c.click_event_id,
               ROUND(EPOCH(p.ts) - EPOCH(c.ts), 6) AS gap_seconds
        FROM purchases p
        ASOF LEFT JOIN clicks c
          ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
}

QUERIES = {
    "asof_purchase_attribution": purchase_attribution,
}
