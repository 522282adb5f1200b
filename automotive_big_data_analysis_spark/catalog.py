"""Schemas and table loaders.

Two data models live here:

1. ``CAR_DATA_SCHEMA`` — the reference's single denormalized table
   (authoritative Hive schema at reference ``backend/config.py:8-23``;
   column comments in ``backend/table.ipynb:7-30``). DECIMAL columns are
   declared DoubleType in the working schema because the reference's own
   generator produces Python floats (reference ``backend/func.py:100-112``)
   and the DuckDB oracle compares doubles; DecimalType belongs only at a
   storage edge if a consumer requires exact decimals.

2. The driver's TPC-H-ish corpus (``region nation customer supplier part
   orders lineitem events documents embeddings``) — one parquet per table
   under a scale-factor directory.

Loaders return plain DataFrames; nothing is collected. ``load_tables`` also
registers temp views so operators can be written in either the DataFrame or
the SQL API — Catalyst produces the same plan for both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Reference table: backend/config.py:8-23.
CAR_DATA_SCHEMA = T.StructType(
    [
        T.StructField("car_brand", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("car_model", T.StringType()),
        T.StructField("manufacturer_suggested_price", T.DoubleType()),
        T.StructField("engine_horsepower", T.IntegerType()),
        T.StructField("num_doors", T.IntegerType()),
        T.StructField("min_reference_price", T.DoubleType()),
        T.StructField("car_type", T.StringType()),
        T.StructField("manufacture_year", T.IntegerType()),
        T.StructField("fuel_capacity", T.DoubleType()),
        T.StructField("popularity", T.IntegerType()),
        T.StructField("discount_percentage", T.DoubleType()),
        T.StructField(
            "historical_price", T.MapType(T.StringType(), T.IntegerType())
        ),
        T.StructField(
            "city_license_plates", T.MapType(T.StringType(), T.IntegerType())
        ),
    ]
)

# API car view column mapping (reference backend/app.py:15-26): db name →
# frontend name. `city` and `fuel_capacity` are dropped from the view.
CAR_FIELD_MAPPING = {
    "car_brand": "brand",
    "car_model": "model",
    "manufacturer_suggested_price": "guide_price",
    "engine_horsepower": "horsepower",
    "num_doors": "doors",
    "min_reference_price": "min_price",
    "popularity": "attention",
    "discount_percentage": "discount",
    "car_type": "car_type",
}

# Upload path pass-through whitelist (reference backend/app.py:218-222).
UPLOAD_PASSTHROUGH_COLUMNS = [
    "city",
    "manufacture_year",
    "fuel_capacity",
    "historical_price",
    "city_license_plates",
]

TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


# Columns stored as INT64 TIMESTAMP(NANOS) in parquet. How Spark reads them
# differs by version: 3.x rejects them unless
# ``spark.sql.legacy.parquet.nanosAsLong`` is on (then: LongType epoch-ns);
# 4.1+ reads them natively as TimestampNTZType and the legacy conf is a
# no-op. Both shapes are normalized to TimestampType (µs precision — the
# same truncation DuckDB applies) so downstream epoch casts
# (``cast('long')`` / ``cast('double')``) work uniformly.
_NANOS_TS_COLUMNS = {"events": ["ts"]}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one corpus table. Parquet scan → column pruning and predicate
    pushdown are free once downstream operators project/filter.

    Works on ANY session, not just ones built by :func:`get_spark`: every
    conf touched here is runtime-settable, so no build-time configuration
    is required. For nanos timestamp columns (see ``_NANOS_TS_COLUMNS``)
    the session time zone is pinned to UTC before the NTZ→timestamp
    normalization so absolute-epoch arithmetic (``cast(ts as long)``)
    agrees with DuckDB's ``EPOCH()`` regardless of host time zone.

    The ANALYZED DataFrame is memoized per (session, sf_dir, table):
    ``spark.read.parquet`` pays a driver-side footer/schema read plus
    file listing on EVERY call (measured 70-290 ms per table, ~2 calls
    per registered query → tens of seconds across the suite), while the
    table's schema and file set are immutable for the life of a corpus
    directory. This is metadata/plan reuse only — the DataFrame is an
    unexecuted plan, every action still scans the parquet files — and is
    exactly what reading from a catalog table (saved metadata, no
    per-query inference) gives a production deployment. The memo lives
    on the session object, so a stopped/replaced session drops it.

    The key embeds ``source_fingerprint`` (file names/sizes/mtimes —
    an ``os.stat`` walk, no data read), so an in-session rewrite of the
    table directory self-invalidates: the rewritten files produce a new
    fingerprint and the stale plan (with its frozen file listing) is
    dropped rather than served. This keeps the documented
    ``release()``/corpus-refresh contract without the release hooks
    having to know about this memo."""
    from automotive_big_data_analysis_spark.sources.stored import (
        source_fingerprint,
    )

    memo = getattr(spark, "_abda_table_memo", None)
    if memo is None:
        memo = {}
        spark._abda_table_memo = memo
    key = (sf_dir, name)
    fp = source_fingerprint(sf_dir, name)
    cached = memo.get(key)
    if cached is not None and cached[0] == fp:
        return cached[1]
    df = _load_table_fresh(spark, sf_dir, name)
    memo[key] = (fp, df)
    return df


def _load_table_fresh(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    if name in _NANOS_TS_COLUMNS:
        try:
            # Spark 3.x needs this to read INT64 TIMESTAMP(NANOS) at all;
            # harmless no-op on 4.1+ (kept for version portability).
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass
    try:
        df = spark.read.parquet(path)
    except Exception as exc:  # AnalysisException: PARQUET_TYPE_ILLEGAL
        if "PARQUET_TYPE_ILLEGAL" not in str(exc):
            raise
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
    for col in _NANOS_TS_COLUMNS.get(name, []):
        dt = df.schema[col].dataType
        if isinstance(dt, T.LongType):
            # Spark 3.x + nanosAsLong: epoch-ns longs. `div` = integer
            # division; float division would lose precision (ns-epoch
            # values exceed double's 2^53 exact-integer range).
            df = df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
        elif isinstance(dt, T.TimestampNTZType):
            # Spark 4.1+: native NTZ read. NTZ→timestamp interprets the
            # wall-clock in the session zone — pin UTC around the cast so
            # the resulting epoch values are zone-independent and match
            # the oracle's naive-as-UTC reading. The zone is captured at
            # ANALYSIS time (withColumn resolves eagerly; verified by
            # executing under a different session zone), so restoring the
            # prior value keeps unrelated queries' timestamp semantics —
            # year()/date extraction over instant columns — untouched.
            prior_tz = spark.conf.get("spark.sql.session.timeZone")
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            try:
                df = df.withColumn(col, F.col(col).cast("timestamp"))
            finally:
                spark.conf.set("spark.sql.session.timeZone", prior_tz)
    return df


def spread(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Round-robin repartition a small scan before CPU-heavy per-row work.

    A small parquet file arrives as ONE input split, so an expensive
    per-row pipeline (tokenize / md5 / regexp over every row) runs on a
    single core no matter how many the cluster has. Spreading the rows
    first costs a narrow shuffle of the base rows and buys full
    parallelism for everything downstream. At 100 TB the scan itself
    yields thousands of splits and the guard below makes this a no-op —
    the repartition only fires when scan parallelism is under the
    session default.
    """
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    # Two-stage guard. inputFiles() probes the file index without
    # compiling a physical plan (cheap) — fewer files than cores always
    # means under-parallelism, so repartition straight away. When the
    # file count LOOKS sufficient, confirm with the scan's actual
    # partition count (df.rdd compiles a plan — paid only on this rare
    # branch): maxPartitionBytes packing can coalesce many small files
    # into few splits, which is exactly the small-file CPU-heavy case
    # this helper exists for.
    try:
        if len(df.inputFiles()) >= n and df.rdd.getNumPartitions() >= n:
            return df
    except Exception:
        pass
    return df.repartition(n)


def load_tables(
    spark: SparkSession, sf_dir: str, register_views: bool = True
) -> dict[str, DataFrame]:
    """Load the full corpus; optionally register each as a temp view."""
    tables = {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}
    if register_views:
        for name, df in tables.items():
            df.createOrReplaceTempView(name)
    return tables


def car_data_from_rows(spark: SparkSession, rows: list[dict]) -> DataFrame:
    """Build a car_data DataFrame from row dicts (test fixtures, small
    ingests). Missing columns become nulls, matching the reference's
    defaultdict/``.get(k, 0)`` tolerance for absent fields."""
    filled = [
        {field.name: row.get(field.name) for field in CAR_DATA_SCHEMA.fields}
        for row in rows
    ]
    return spark.createDataFrame(filled, schema=CAR_DATA_SCHEMA)
