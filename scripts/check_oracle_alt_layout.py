"""Oracle sweep under a deliberately DIFFERENT partition layout.

The standard harness (check_oracle.py) runs local[N]/shuffle=32. This
variant forces local[5] with 7 shuffle partitions: any aggregate whose
result depends on partition-merge order — the exact class of flake that
hit `events_sessionize` in round 3 before the DECIMAL(25,10) migration
(functions/exact.py) — hash-diverges from DuckDB here even when the
standard layout happens to pass.

Usage: PYTHONPATH=/root/repo python scripts/check_oracle_alt_layout.py [sf_dir] [name ...]
Round-4 result: 0 failures across the full query inventory.
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession

import scripts.check_oracle as co

ALT_MASTER = "local[5]"
ALT_SHUFFLE_PARTITIONS = "7"


def main() -> int:
    real_get = SparkSession.Builder.getOrCreate

    def patched(self):
        self.master(ALT_MASTER).config(
            "spark.sql.shuffle.partitions", ALT_SHUFFLE_PARTITIONS
        )
        return real_get(self)

    SparkSession.Builder.getOrCreate = patched
    try:
        return co.main()
    finally:
        SparkSession.Builder.getOrCreate = real_get


if __name__ == "__main__":
    raise SystemExit(main())
