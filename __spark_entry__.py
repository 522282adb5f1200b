"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` maps every
implemented operator (SURVEY.md §2 + extensions) to a
``(spark, sf_dir) -> DataFrame`` callable; ``oracle_sql()`` carries the
DuckDB-equivalent SQL for the driver's hash-comparison gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from automotive_big_data_analysis_spark.operators import asof, dedup, events, multimodal, relational, relational_ext, relational_tpch, relational_tpch2, relational_tpch3, sampling, similarity, text_analysis
from automotive_big_data_analysis_spark.sources import bucketed

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    return relational.pricing_summary(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(relational.QUERIES)
    out.update(relational_ext.QUERIES)
    out.update(relational_tpch.QUERIES)
    out.update(relational_tpch2.QUERIES)
    out.update(relational_tpch3.QUERIES)
    out.update(sampling.QUERIES)
    out.update(events.QUERIES)
    out.update(text_analysis.QUERIES)
    out.update(dedup.QUERIES)
    out.update(similarity.QUERIES)
    out.update(asof.QUERIES)
    out.update(multimodal.QUERIES)
    out.update(bucketed.QUERIES)
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
    return out
