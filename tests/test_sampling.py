"""Deterministic-sampling invariants: membership is content-keyed, so it
cannot depend on partitioning, row order, or engine — the property that
makes hash sampling usable for reproducible eval splits at 100 TB."""

from __future__ import annotations

from pyspark.sql import functions as F

from automotive_big_data_analysis_spark.operators.sampling import (
    SAMPLE_BUCKETS,
    hash_bucket,
)


def test_membership_invariant_under_partitioning(spark):
    ids = spark.range(0, 5000).select(F.col("id").cast("string").alias("k"))
    picks = [
        set(
            r.k
            for r in ids.repartition(n)
            .where(hash_bucket(F.col("k")) < 100)
            .collect()
        )
        for n in (1, 3, 32)
    ]
    assert picks[0] == picks[1] == picks[2]
    # ~10% rate, content-keyed → stable and plausibly sized
    assert 350 <= len(picks[0]) <= 650


def test_buckets_cover_range_uniformly(spark):
    ids = spark.range(0, 20_000).select(F.col("id").cast("string").alias("k"))
    stats = (
        ids.select(hash_bucket(F.col("k")).alias("b"))
        .agg(
            F.min("b").alias("lo"),
            F.max("b").alias("hi"),
            F.countDistinct("b").alias("nb"),
        )
        .first()
    )
    assert stats.lo >= 0 and stats.hi < SAMPLE_BUCKETS
    assert stats.nb > SAMPLE_BUCKETS * 0.95  # all buckets populated


def test_split_partitions_are_disjoint_and_exhaustive(spark):
    ids = spark.range(0, 3000).select(F.col("id").cast("string").alias("k"))
    b = hash_bucket(F.col("k"))
    split = F.when(b < 800, "train").when(b < 900, "val").otherwise("test")
    got = {
        r.split: r.n
        for r in ids.select(split.alias("split"))
        .groupBy("split")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(got) == {"train", "val", "test"}
    assert sum(got.values()) == 3000
    assert got["train"] > got["val"] and got["train"] > got["test"]
