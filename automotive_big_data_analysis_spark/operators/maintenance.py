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
FRAG_VERSION = 1  # bump when the fragment layout changes


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
            ev.select("event_id", "user_id", "event_type", "value")
            .withColumn("frag", _frag_col())
            .repartition(N_FRAGMENTS, "frag")
            .write.mode("overwrite")
            .partitionBy("frag")
            .parquet(path)
        )
    return path


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


ORACLE: dict[str, str] = {
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
}
