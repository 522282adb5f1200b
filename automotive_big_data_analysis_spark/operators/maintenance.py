"""Lakehouse table maintenance: small-file compaction planning.

Training-data-pipeline extension (no reference analog): a 100 TB table
that ingests continuously degrades into thousands of small files —
every scan then pays per-file open/footer costs and loses split-level
parallelism. The standard fix is a periodic compaction job that bins
small files into target-sized outputs. This module materializes a
deliberately FRAGMENTED copy of ``events`` (one file per content-keyed
fragment — the shape a streaming ingest leaves behind), then plans the
compaction over the REAL file inventory (``input_file_name()``), binning
files into fixed-row-budget output groups.

The plan itself is deterministic because fragment membership is
content-keyed (md5 bucket of ``event_id``): the DuckDB oracle replays
per-fragment row counts and the identical greedy number-line binning
from the canonical parquet table, so hash-equality proves both that the
fragmented mirror lost no rows and that the planner arithmetic is
engine-reproducible.

Scale shape: the file inventory aggregation is one map-side-combined
count keyed on (file, fragment) — |files| result rows; the binning
window runs over that |files|-row AGGREGATE (the allowed unpartitioned
class — a real lake's file inventory is metadata-sized, and past ~10⁶
files the same two-pass bucket-prefix-sum used by
``training_prep.pack_token_shards`` applies verbatim). Nothing re-reads
row data after the one inventory scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from automotive_big_data_analysis_spark.catalog import load_table
from automotive_big_data_analysis_spark.operators.sampling import (
    _bucket_sql,
    hash_bucket,
)

MAINT_LOCATION = "/tmp/abda_maintenance"
N_FRAGMENTS = 64  # small files the simulated ingest leaves behind
TARGET_ROWS = 2500  # compaction output budget (rows per output file)
FRAG_VERSION = 2  # bump when the fragment layout changes (v2: + ts_us)
DATE_VERSION = 1  # bump when the time-partitioned layout changes
US_PER_DAY = 86_400_000_000


def _frag_col():
    """Content-keyed fragment id — stable across engines and layouts."""
    return hash_bucket(F.col("event_id").cast("string"), N_FRAGMENTS)


def ensure_fragmented(spark: SparkSession, sf_dir: str) -> str:
    """Write the fragmented events mirror once per corpus snapshot.

    Layout: ``frag=K`` directory partitions, ONE file each — the
    repartition keys every fragment to a single task, and a task writes
    one file per directory partition it holds. Idempotent per (corpus,
    version, source-content fingerprint), superseded generations pruned
    (the ``sources/text_formats._ensure_written`` discipline)."""
    from automotive_big_data_analysis_spark.sources.stored import (
        source_fingerprint,
    )

    base = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    fp = source_fingerprint(sf_dir, "events")
    path = f"{MAINT_LOCATION}/{base}/events_frag_v{FRAG_VERSION}_{fp}"
    if not os.path.exists(f"{path}/_SUCCESS"):
        import shutil

        parent = os.path.dirname(path)
        if os.path.isdir(parent):
            for d in os.listdir(parent):
                if d.startswith("events_frag_v") and d != os.path.basename(
                    path
                ):
                    shutil.rmtree(os.path.join(parent, d), ignore_errors=True)
        ev = load_table(spark, sf_dir, "events")
        (
            ev.select(
                "event_id",
                F.unix_micros("ts").alias("ts_us"),
                "user_id",
                "event_type",
                "value",
            )
            .withColumn("frag", _frag_col())
            .repartition(N_FRAGMENTS, "frag")
            .write.mode("overwrite")
            .partitionBy("frag")
            .parquet(path)
        )
    return path


def ensure_bydate(spark: SparkSession, sf_dir: str) -> str:
    """Write the TIME-partitioned layout of the same rows once per
    corpus snapshot: ``day=K`` directories (epoch-day of the event),
    one file each — the layout a compaction/clustering job would
    produce for a time-series table. Same idempotence discipline as
    :func:`ensure_fragmented`."""
    from automotive_big_data_analysis_spark.sources.stored import (
        source_fingerprint,
    )

    base = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    fp = source_fingerprint(sf_dir, "events")
    path = f"{MAINT_LOCATION}/{base}/events_bydate_v{DATE_VERSION}_{fp}"
    if not os.path.exists(f"{path}/_SUCCESS"):
        import shutil

        parent = os.path.dirname(path)
        if os.path.isdir(parent):
            for d in os.listdir(parent):
                if d.startswith("events_bydate_v") and d != os.path.basename(
                    path
                ):
                    shutil.rmtree(os.path.join(parent, d), ignore_errors=True)
        ev = load_table(spark, sf_dir, "events")
        (
            ev.select(
                "event_id",
                F.unix_micros("ts").alias("ts_us"),
                "user_id",
                "event_type",
                "value",
            )
            .withColumn("day", F.expr(f"ts_us div {US_PER_DAY}"))
            .repartition("day")
            .write.mode("overwrite")
            .partitionBy("day")
            .parquet(path)
        )
    return path


def ensure_layout_mirrors(spark: SparkSession, sf_dir: str) -> None:
    """Materialize both maintenance layouts (bench pre-build hook)."""
    ensure_fragmented(spark, sf_dir)
    ensure_bydate(spark, sf_dir)


def file_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(file, frag, n_rows) over the fragmented mirror — the metadata a
    real compaction job reads from the table format's manifest; here it
    comes from one ``input_file_name()`` scan of the data files."""
    path = ensure_fragmented(spark, sf_dir)
    frags = spark.read.parquet(path)
    return frags.groupBy(
        F.input_file_name().alias("file"), F.col("frag").cast("int").alias("frag")
    ).agg(F.count("*").alias("n_rows"))


def compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy fixed-budget compaction plan: files ordered smallest-first
    (then by fragment id for total order) are laid on a row-count number
    line cut every TARGET_ROWS — files sharing a cut belong to one
    compaction output group. Reports per-group file counts and row
    totals; ``n_files`` per group is the open-cost the compaction run
    amortizes away."""
    inv = file_inventory(spark, sf_dir)
    # |files|-row aggregate → the unpartitioned window is metadata-sized
    w = (
        Window.orderBy("n_rows", "frag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    planned = inv.withColumn(
        "group_id",
        F.floor(
            (F.sum("n_rows").over(w) - F.col("n_rows")) / TARGET_ROWS
        ),
    )
    return planned.groupBy("group_id").agg(
        F.count("*").alias("n_files"),
        F.sum("n_rows").cast("long").alias("group_rows"),
    )


def _file_day_spans(frames: DataFrame) -> DataFrame:
    """Per-file epoch-day zone map (min/max day) from a real file scan —
    what a table format's manifest stores as column min/max stats."""
    day = F.expr(f"ts_us div {US_PER_DAY}")
    return frames.groupBy(F.input_file_name().alias("file")).agg(
        F.min(day).alias("dmin"), F.max(day).alias("dmax")
    )


def layout_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map data-skipping effectiveness of two physical layouts of
    the SAME rows: the hash-fragmented ingest layout vs the
    time-partitioned (clustered) rewrite. For every distinct event day,
    a day-equality probe must open each file whose [min_day, max_day]
    zone map overlaps the day; the report shows the average files
    scanned per probe and the scan fraction for each layout.

    This is the number that justifies a clustering rewrite at 100 TB: a
    content-hash layout scatters every day across every file (scan
    fraction ~1.0 — zone maps prune nothing), while the time-clustered
    layout opens exactly the probed day's file. Min/max stats come from
    a REAL scan of each layout's files (``input_file_name``), so the
    report also proves both mirrors hold the same day span.

    Scale shape: the zone maps and the probe-day dimension are both
    metadata-sized aggregates; the overlap join is |files| × |days| on
    broadcast days — at a million files a real system indexes the zone
    maps instead, but the arithmetic here is the same. The only
    fact-scale work is the two min/max scans, both map-side combined."""
    frag = spark.read.parquet(ensure_fragmented(spark, sf_dir))
    bydate = spark.read.parquet(ensure_bydate(spark, sf_dir))
    days = (
        load_table(spark, sf_dir, "events")
        .select(F.expr(f"unix_micros(ts) div {US_PER_DAY}").alias("day"))
        .distinct()
    )
    out = []
    for layout, frames in (("hash_fragments", frag), ("time_partitioned", bydate)):
        spans = _file_day_spans(frames)
        overlaps = spans.join(
            F.broadcast(days),
            (F.col("day") >= F.col("dmin")) & (F.col("day") <= F.col("dmax")),
        ).agg(F.count("*").alias("n_overlaps"))
        stats = (
            spans.agg(F.count("*").alias("n_files"))
            .join(F.broadcast(days.agg(F.count("*").alias("n_probe_days"))))
            .join(F.broadcast(overlaps))
        )
        out.append(
            stats.select(
                F.lit(layout).alias("layout"),
                "n_files",
                "n_probe_days",
                F.round(
                    F.col("n_overlaps").cast("double") / F.col("n_probe_days"),
                    6,
                ).alias("avg_files_scanned"),
                F.round(
                    F.col("n_overlaps").cast("double")
                    / (F.col("n_probe_days") * F.col("n_files")),
                    6,
                ).alias("avg_scan_fraction"),
            )
        )
    return out[0].unionByName(out[1])


_DAY = f"(EPOCH_US(ts) // {US_PER_DAY})"

_SKIP_SQL = f"""
    WITH ev AS (
        SELECT {_bucket_sql("CAST(event_id AS VARCHAR)", N_FRAGMENTS)}
                   AS frag,
               {_DAY} AS day
        FROM events
    ), days AS (
        SELECT DISTINCT day FROM ev
    ), h AS (
        SELECT frag, MIN(day) AS dmin, MAX(day) AS dmax
        FROM ev GROUP BY frag
    ), t AS (
        SELECT day AS f, MIN(day) AS dmin, MAX(day) AS dmax
        FROM ev GROUP BY day
    ), hs AS (
        SELECT 'hash_fragments' AS layout,
               (SELECT COUNT(*) FROM h) AS n_files,
               (SELECT COUNT(*) FROM days) AS n_probe_days,
               (SELECT COUNT(*) FROM h JOIN days d
                   ON d.day BETWEEN h.dmin AND h.dmax) AS n_overlaps
    ), ts2 AS (
        SELECT 'time_partitioned' AS layout,
               (SELECT COUNT(*) FROM t) AS n_files,
               (SELECT COUNT(*) FROM days) AS n_probe_days,
               (SELECT COUNT(*) FROM t JOIN days d
                   ON d.day BETWEEN t.dmin AND t.dmax) AS n_overlaps
    ), u AS (
        SELECT * FROM hs UNION ALL SELECT * FROM ts2
    )
    SELECT layout, n_files, n_probe_days,
           ROUND(CAST(n_overlaps AS DOUBLE) / n_probe_days, 6)
               AS avg_files_scanned,
           ROUND(CAST(n_overlaps AS DOUBLE) / (n_probe_days * n_files), 6)
               AS avg_scan_fraction
    FROM u
"""


ORACLE: dict[str, str] = {
    "maintenance_layout_skipping": _SKIP_SQL,
    "maintenance_compaction_plan": f"""
        WITH inv AS (
            SELECT {_bucket_sql("CAST(event_id AS VARCHAR)", N_FRAGMENTS)}
                       AS frag,
                   COUNT(*) AS n_rows
            FROM events GROUP BY 1
        ), planned AS (
            SELECT n_rows,
                   CAST(FLOOR(CAST(
                       SUM(n_rows) OVER (ORDER BY n_rows, frag
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) - n_rows
                       AS DOUBLE) / {TARGET_ROWS}) AS BIGINT) AS group_id
            FROM inv
        )
        SELECT group_id, COUNT(*) AS n_files,
               CAST(SUM(n_rows) AS BIGINT) AS group_rows
        FROM planned GROUP BY group_id
    """,
}

QUERIES = {
    "maintenance_compaction_plan": compaction_plan,
    "maintenance_layout_skipping": layout_skipping,
}
