"""Skew-resilient aggregation helpers.

A single hot key turns a groupBy shuffle into one straggler task. The
standard fix is two-phase salted aggregation: append a random salt to the
key, partially aggregate (key, salt) — spreading the hot key over N
reducers — then aggregate the partials by key alone. Results are identical
to the direct groupBy for any algebraic aggregate; only the plan differs.

AQE's skew-join splitting covers *joins*; this covers *aggregations* whose
partial/final split Catalyst can't widen by itself when one key dominates
a partition. Salt choice: with ``salt_on`` set to a content column the
per-row salt is deterministic across retries/repartitionings; the default
(``spark_partition_id()``) is NOT — partition ids change under retries —
but the *results* are identical either way, because the salt only routes
rows between reducers and algebraic aggregates reassociate freely.
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


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
    hint: str | None = None,
) -> DataFrame:
    """Equi-join resilient to hot keys on the big side.

    The big side gets a salt in [0, n_salts); the small side is replicated
    once per salt value (an explode over a literal range — n_salts×|small|
    rows, still dimension-sized); the join runs on (key, salt), spreading
    every hot key over n_salts reducers. The result set is identical to
    ``big.join(small, key, how)`` — salting changes only the partition
    layout, never the matches.

    Use when AQE's skew-join split can't help: e.g. the skew is in a
    downstream aggregation keyed by the join key, or the join is
    sort-merge over a pre-bucketed layout AQE won't re-plan. The salt is
    derived from partition id — per-row arbitrary but match-irrelevant.

    ``hint`` (e.g. ``"shuffle_hash"``/``"merge"``) pins the join
    strategy on the replicated side: a salted join only matters when the
    planner would otherwise SHUFFLE the big side on the hot key, so
    callers demonstrating/forcing that regime hint away the broadcast a
    tiny test-scale dimension would get."""
    salted_big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(F.spark_partition_id()), F.lit(n_salts))
    )
    salted_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))
    if hint:
        salted_small = salted_small.hint(hint)
    return salted_big.join(salted_small, [key, "_salt"], how).drop("_salt")
