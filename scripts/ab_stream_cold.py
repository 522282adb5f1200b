"""Cold-process measurement of the seven streaming gates.

One invocation = one fresh JVM (driver-style cold run): bench-identical
session + warmups, text mirror ensured (so the gates read a warm landing
dir, exactly like the bench where ensure_mirrors runs before the suite),
then every stream gate timed in bench (sorted) order, with optional
extra in-process reps to expose accumulation effects (state-store
providers pile up across gates — an isolated per-query pin can't see
that). Prints one JSON line.

Config under test comes from the environment, same knobs production
uses:
  SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS  (module default otherwise)
  SPARK_GRAFT_STREAM_SCRATCH             (/dev/shm default)

Usage:
  PYTHONPATH=/root/repo python scripts/ab_stream_cold.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from bench import _calibrate, _calibrate_io  # noqa: E402
from automotive_big_data_analysis_spark import get_spark  # noqa: E402

GATES = [
    "stream_conversions",
    "stream_curated_documents",
    "stream_enriched_events",
    "stream_hourly_rollup",
    "stream_user_sessions",
    "stream_user_totals",
    "stream_user_totals_evict",
]


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args.pop(0) if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    reps = int(args.pop(0)) if args else 2
    spark = get_spark(app_name="ab_stream_cold")
    spark.range(1).count()
    spark.range(64).repartition(32).mapInPandas(lambda it: it, "id long").count()
    spark.read.parquet("/root/testdata/sf0.001/region.parquet").count()
    from automotive_big_data_analysis_spark.sources import text_formats as tf

    tf.ensure_mirrors(spark, sf_dir)
    queries = entrymod.queries()
    out: dict[str, list[float]] = {g: [] for g in GATES}
    probes: list[list[float]] = []
    for _ in range(reps):
        for g in GATES:
            t0 = time.time()
            queries[g](spark, sf_dir).collect()
            out[g].append(round(time.time() - t0, 3))
        probes.append([_calibrate(), _calibrate_io()])
    totals = [round(sum(out[g][i] for g in GATES), 3) for i in range(reps)]
    print(
        json.dumps(
            {
                "partitions": os.environ.get(
                    "SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS", "default(16)"
                ),
                "scratch": os.environ.get(
                    "SPARK_GRAFT_STREAM_SCRATCH", "default(/dev/shm)"
                ),
                "per_gate": out,
                "totals_per_rep": totals,
                "probes": probes,
            }
        )
    )


if __name__ == "__main__":
    main()
