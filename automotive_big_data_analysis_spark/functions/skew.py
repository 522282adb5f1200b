"""Skew-resilient aggregation helpers.

A single hot key turns a groupBy shuffle into one straggler task. The
standard fix is two-phase salted aggregation: append a random salt to the
key, partially aggregate (key, salt) — spreading the hot key over N
reducers — then aggregate the partials by key alone. Results are identical
to the direct groupBy for any algebraic aggregate; only the plan differs.

AQE's skew-join splitting covers *joins*; this covers *aggregations* whose
partial/final split Catalyst can't widen by itself when one key dominates
a partition. The salt is deterministic (hash of a tie-break column) so
runs are reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    key: str,
    value: Column | str,
    n_salts: int = 16,
    salt_on: str | None = None,
) -> DataFrame:
    """groupBy(key).agg(sum(value), count(*)) computed via two-phase
    salted aggregation. Output columns: key, total, n."""
    value_col = F.col(value) if isinstance(value, str) else value
    salt_src = F.col(salt_on) if salt_on else F.spark_partition_id()
    salt = F.pmod(F.xxhash64(salt_src), F.lit(n_salts))
    partial = (
        df.select(F.col(key), value_col.alias("_v"), salt.alias("_salt"))
        .groupBy(key, "_salt")
        .agg(F.sum("_v").alias("_ps"), F.count("*").alias("_pc"))
    )
    return partial.groupBy(key).agg(
        F.sum("_ps").alias("total"), F.sum("_pc").cast("long").alias("n")
    )
