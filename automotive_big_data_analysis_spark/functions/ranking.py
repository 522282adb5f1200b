"""Distributed global ranking: NTILE without a single-partition window.

``NTILE(n) OVER (ORDER BY metric)`` needs a global total order, and the
naive plan funnels every row through ONE task — the textbook 100 TB
bottleneck (a window with an empty partition spec over fact-scale input).
The scale-safe equivalent is the classic two-pass range-partitioned rank
(what ``repartitionByRange`` + TeraSort do, and what
``training_prep.pack_token_shards`` already uses with a hash-prefix key):

1. pick ``n_buckets`` range boundaries for the sort metric (sampled
   quantiles — any *monotone* coarsening of the sort key yields the same
   global ranks, so the boundary estimator does not need to be exact or
   even deterministic);
2. bucket every row by boundary count — bucket order IS global order;
3. per-bucket counts → cumulative offsets via a window over the
   |buckets|-row aggregate (tiny, broadcast back);
4. within-bucket ``row_number`` PARTITIONED by bucket (parallel across
   buckets) + offset = exact global rank;
5. the SQL NTILE bucket formula (first ``N % n`` tiles get the extra
   row) maps rank → tile.

Parallelism is ``n_buckets`` — widen it at scale (boundaries stay a
sub-kilobyte broadcast). Results are bit-identical to the global-window
NTILE for any boundary choice, which is what the DuckDB oracles (which
keep the naive single-window formulation) verify.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

N_RANGE_BUCKETS = 32  # range-partition fan-out; widen at scale


def with_global_ntiles(
    df: DataFrame,
    n: int,
    metrics: dict[str, Column],
    tiebreak: Column,
    n_buckets: int = N_RANGE_BUCKETS,
) -> DataFrame:
    """Append one NTILE(n) column per ``metrics`` entry (out-col →
    ascending sort metric), sharing a SINGLE boundary-sampling pass and
    a single frame across all metrics — for multi-metric segmentations
    (RFM-style) this replaces M independent rank passes (each re-scanning
    and re-joining the input) with one boundary aggregate, M tiny
    bucket-count aggregates, and M bucket-partitioned rank windows over
    the same frame. Same exact-NTILE guarantee as
    :func:`with_global_ntile` per metric."""
    base = df.withColumn("_tb", tiebreak)
    for out, sv in metrics.items():
        base = base.withColumn(f"_sv_{out}", sv)
    qs = [i / n_buckets for i in range(1, n_buckets)]
    agg_exprs = [F.count("*").alias("_N")]
    if qs:
        agg_exprs += [
            F.percentile_approx(
                F.col(f"_sv_{out}").cast("double"), qs, 10_000
            ).alias(f"_bnds_{out}")
            for out in metrics
        ]
    bounds = base.agg(*agg_exprs)
    withb = base.join(F.broadcast(bounds))
    for out in metrics:
        bnds = (
            F.col(f"_bnds_{out}")
            if qs
            else F.array().cast("array<double>")
        )
        withb = withb.withColumn(
            f"_bk_{out}",
            F.size(
                F.filter(bnds, lambda b: b <= F.col(f"_sv_{out}").cast("double"))
            ),
        )
    out_df = withb
    base_sz = F.floor(F.col("_N") / n)
    rem = F.col("_N") % n
    big = rem * (base_sz + 1)
    for out in metrics:
        counts = withb.groupBy(f"_bk_{out}").agg(F.count("*").alias("_c"))
        w_off = Window.orderBy(f"_bk_{out}").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        offs = counts.select(
            f"_bk_{out}",
            (F.sum("_c").over(w_off) - F.col("_c")).alias(f"_off_{out}"),
        )
        w_in = Window.partitionBy(f"_bk_{out}").orderBy(f"_sv_{out}", "_tb")
        out_df = out_df.join(F.broadcast(offs), f"_bk_{out}").withColumn(
            f"_rank_{out}",
            F.col(f"_off_{out}") + F.row_number().over(w_in),
        )
        rank = F.col(f"_rank_{out}")
        tile = F.when(
            rank <= big, F.floor((rank - 1) / (base_sz + 1)) + 1
        ).otherwise(
            rem + F.floor((rank - big - 1) / F.greatest(base_sz, F.lit(1))) + 1
        )
        out_df = out_df.withColumn(out, tile.cast("int"))
    drops = ["_tb", "_N"]
    for out in metrics:
        drops += [f"_sv_{out}", f"_bk_{out}", f"_off_{out}", f"_rank_{out}"]
        if qs:
            drops.append(f"_bnds_{out}")
    return out_df.drop(*drops)


def with_global_ntile(
    df: DataFrame,
    n: int,
    sortval: Column,
    tiebreak: Column,
    out: str,
    n_buckets: int = N_RANGE_BUCKETS,
) -> DataFrame:
    """Append ``out`` = NTILE(n) OVER (ORDER BY sortval, tiebreak) ASC,
    computed with the two-pass range-bucket rank (no unpartitioned window
    over ``df``-scale input). For a DESC metric pass the negated column.

    ``(sortval, tiebreak)`` must be unique per row (the usual NTILE
    determinism requirement); both must be non-null."""
    base = df.withColumn("_sv", sortval).withColumn("_tb", tiebreak)
    # Sampled range boundaries on the double image of the metric. The
    # double cast is monotone (ties may widen, never reorder), so
    # "boundaries <= value" is a monotone coarsening of the sort key and
    # the final ranks are EXACTLY those of the global sort regardless of
    # where the sampled boundaries fall.
    qs = [i / n_buckets for i in range(1, n_buckets)]
    if qs:
        bounds = base.agg(
            F.percentile_approx(
                F.col("_sv").cast("double"), qs, 10_000
            ).alias("_bnds")
        )
    else:
        # degenerate single-bucket fan-out: no boundaries at all (the
        # rank degrades to one partitioned-window bucket)
        bounds = df.sparkSession.range(1).select(
            F.array().cast("array<double>").alias("_bnds")
        )
    withb = base.join(F.broadcast(bounds)).withColumn(
        "_bk",
        F.size(
            F.filter(F.col("_bnds"), lambda b: b <= F.col("_sv").cast("double"))
        ),
    )
    counts = withb.groupBy("_bk").agg(F.count("*").alias("_c"))
    w_off = Window.orderBy("_bk").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # the ONLY unpartitioned window runs over the <= n_buckets-row count
    # aggregate — plan tests key on the _bk ordering to allow it
    offs = counts.select(
        "_bk", (F.sum("_c").over(w_off) - F.col("_c")).alias("_off")
    )
    total = counts.agg(F.sum("_c").alias("_N"))
    w_in = Window.partitionBy("_bk").orderBy("_sv", "_tb")
    ranked = (
        withb.join(F.broadcast(offs), "_bk")
        .join(F.broadcast(total))
        .withColumn("_rank", F.col("_off") + F.row_number().over(w_in))
    )
    # SQL NTILE: base = N div n rows per tile, the first N mod n tiles
    # take one extra. All operands stay integral (< 2^53), so the double
    # divisions inside floor() are exact.
    base_sz = F.floor(F.col("_N") / n)
    rem = F.col("_N") % n
    big = rem * (base_sz + 1)
    tile = F.when(
        F.col("_rank") <= big,
        F.floor((F.col("_rank") - 1) / (base_sz + 1)) + 1,
    ).otherwise(
        rem
        + F.floor(
            (F.col("_rank") - big - 1) / F.greatest(base_sz, F.lit(1))
        )
        + 1
    )
    return ranked.withColumn(out, tile.cast("int")).drop(
        "_sv", "_tb", "_bnds", "_bk", "_c", "_off", "_N", "_rank"
    )
