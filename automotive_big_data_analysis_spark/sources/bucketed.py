"""Bucketed-table layout: shuffle-free fact-fact joins.

At 100 TB the single most expensive operation is the orders⋈lineitem
shuffle — both sides hash-exchange on the order key for every query that
joins them. Bucketing pays that shuffle ONCE at write time: both tables
are written with ``bucketBy(N, orderkey).sortBy(orderkey)``, and every
subsequent sort-merge join reads bucket i of one table against bucket i
of the other with NO Exchange and (with matching sortBy) no re-sort.
This is Spark's answer to the co-located join; the reference has no
analogous capability (its one table lives unpartitioned in a TEXTFILE,
reference ``backend/utils.py:40-48``).

Bucket metadata lives in the session catalog, so writes go through
``saveAsTable`` into an explicitly-located database, never into a bare
path. Bucket count is a layout constant — at real scale pick
``total_size / target_partition_size`` (e.g. 100 TB / 512 MB ≈ 200k
buckets is too many files; bucket on the cluster's parallelism instead
and let each bucket hold many row groups).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from automotive_big_data_analysis_spark.catalog import load_table
from automotive_big_data_analysis_spark.functions import exact as ex

N_BUCKETS = 8
DEFAULT_DB = "bucketed"
DEFAULT_LOCATION = "/tmp/abda_bucketed_warehouse"


def _register_existing(
    spark: SparkSession,
    database: str,
    table: str,
    path: str,
    df,
    key: str,
    n_buckets: int = N_BUCKETS,
) -> None:
    """Attach already-written bucket files as an external bucketed table.

    The session catalog is in-memory, so a new session forgets the table
    even though the files (and their bucket-id filenames) persist. The
    CLUSTERED BY DDL re-declares the layout over the existing LOCATION —
    no data movement, and scans regain the no-shuffle bucket guarantee.

    ``n_buckets`` MUST match the count the files were written with: the
    DDL is a declaration Spark trusts (co-location guarantees for
    sort-merge joins ride on it), so a mismatch would silently mis-route
    bucket pruning. The filename check below makes a wrong declaration a
    loud error instead."""
    import os as _os
    import re as _re

    # bucketed part files are named part-...._00007.c000... — the
    # trailing _NNNNN group is the bucket id. Assert the declared count
    # strictly exceeds every observed id (ids are 0-based).
    if _os.path.isdir(path):
        ids = [
            int(m.group(1))
            for fn in _os.listdir(path)
            if (m := _re.search(r"_(\d{5})(?:\.|$)", fn)) and fn.startswith("part-")
        ]
        if ids and max(ids) >= n_buckets:
            raise ValueError(
                f"bucket files at {path} carry bucket id {max(ids)} but the "
                f"re-attach DDL declares only {n_buckets} buckets"
            )
    cols = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema)
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {database}.{table} ({cols}) USING PARQUET"
        f" CLUSTERED BY ({key}) SORTED BY ({key}) INTO {n_buckets} BUCKETS"
        f" LOCATION '{path}'"
    )


_LAYOUT_READY: set[tuple[str, str, str]] = set()


def write_bucketed_tables(
    spark: SparkSession,
    sf_dir: str,
    database: str = DEFAULT_DB,
    location: str = DEFAULT_LOCATION,
    overwrite: bool = False,
) -> None:
    """Write orders and lineitem bucketed+sorted by order key.

    Idempotent per (database, sf_dir): the one-time shuffle is the point,
    so an existing layout is reused unless ``overwrite`` — mirroring a
    production table that is bucketed once at ingest, not per query. If
    the files exist but the (in-memory) catalog doesn't know them, they
    are re-registered via DDL instead of rewritten."""
    # bucket count in the path: a changed N_BUCKETS lays out fresh files
    # instead of re-attaching the old layout under a wrong declaration
    loc = f"{location}/{os.path.basename(sf_dir.rstrip('/'))}_nb{N_BUCKETS}"
    specs = [
        ("orders_b", "orders", "o_orderkey"),
        ("lineitem_b", "lineitem", "l_orderkey"),
    ]
    # registration memo (round-13, same discipline as sources/stored.py):
    # once this application has verified the layout, later calls skip the
    # CREATE DATABASE + listTables catalog round-trips; external wipes
    # are caught by the per-table _SUCCESS stat.
    memo_key = (spark.sparkContext.applicationId, database, loc)
    if (
        not overwrite
        and memo_key in _LAYOUT_READY
        and all(
            os.path.exists(f"{loc}/{table}/_SUCCESS") for table, _, _ in specs
        )
        # the catalog can forget the entries while the memo stays warm
        # (a test/new-session drops the TABLE, files intact) — tableExists
        # is a driver-local lookup, far cheaper than the CREATE DATABASE +
        # listTables round-trips the memo exists to skip
        and all(
            spark.catalog.tableExists(f"{database}.{table}")
            for table, _, _ in specs
        )
    ):
        return
    _LAYOUT_READY.discard(memo_key)
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database} LOCATION '{loc}'")
    existing = {t.name for t in spark.catalog.listTables(database)}
    def _ensure_one(table: str, source: str, key: str) -> None:
        if not overwrite and table in existing:
            return
        df = load_table(spark, sf_dir, source)
        path = f"{loc}/{table}"
        if not overwrite and os.path.exists(f"{path}/_SUCCESS"):
            _register_existing(spark, database, table, path, df, key)
            return
        spark.sql(f"DROP TABLE IF EXISTS {database}.{table}")
        df.write.bucketBy(N_BUCKETS, key).sortBy(key).option(
            "path", path
        ).mode("overwrite").saveAsTable(f"{database}.{table}")

    # the two ingest shuffles are independent writes to disjoint paths;
    # overlap them so the smaller table's write hides inside the larger
    # one's tail (guide §2.6)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        for fut in [pool.submit(_ensure_one, *spec) for spec in specs]:
            fut.result()
    _LAYOUT_READY.add(memo_key)


def bucketed_join_revenue(
    spark: SparkSession, database: str = DEFAULT_DB
) -> DataFrame:
    """Revenue per order priority over the bucketed join.

    The ``merge`` hint pins sort-merge (a broadcast would hide the point
    at test scale); with both sides bucketed on the join key the plan has
    NO Exchange under the join — asserted in ``tests/test_plans.py``."""
    o = spark.table(f"{database}.orders_b")
    li = spark.table(f"{database}.lineitem_b")
    return (
        li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            ex.dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count("*").alias("n_lines"),
        )
        .orderBy("o_orderpriority")
    )


def ensure_layout(spark: SparkSession, sf_dir: str) -> str:
    """Ensure the per-corpus bucketed layout exists (idempotent) and
    return its database name — the one-time ingest shuffle the bench
    harness times as ``index_build_s``."""
    db = f"{DEFAULT_DB}_{os.path.basename(sf_dir.rstrip('/')).replace('.', '_')}"
    write_bucketed_tables(spark, sf_dir, database=db)
    return db


def bucketed_revenue_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gate wrapper: ensure the bucketed layout exists for this
    sf_dir, then run the co-located join. Results are layout-independent
    (same rows as joining the raw parquet), which is exactly what the
    DuckDB oracle checks."""
    return bucketed_join_revenue(spark, database=ensure_layout(spark, sf_dir))


ORACLE: dict[str, str] = {
    "bucketed_join_revenue": f"""
        SELECT o_orderpriority,
               {ex.dsum_sql("l_extendedprice * (1 - l_discount)")}
                   AS revenue,
               COUNT(*) AS n_lines
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
}

QUERIES = {
    "bucketed_join_revenue": bucketed_revenue_query,
}
