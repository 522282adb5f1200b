"""Alternating A/B of a runtime SQL conf over named registry queries.

Runs each query 2N times in ONE warmed session, alternating conf value
A and B per rep (A B A B ...), so ambient host noise hits both sides
equally. Prints per-query medians for each side.

Usage:
  PYTHONPATH=/root/repo python scripts/ab_conf.py \
      --conf KEY --a VAL_A --b VAL_B [--reps N] [sf_dir] name...
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from automotive_big_data_analysis_spark import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--conf", action="append", required=True,
                    help="KEY=VAL_A:VAL_B (repeatable)")
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("names", nargs="+")
    ns = ap.parse_args()
    args = ns.names
    sf_dir = args.pop(0) if os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    names = args

    pairs = []
    for spec in ns.conf:
        key, _, vals = spec.partition("=")
        va, _, vb = vals.partition(":")
        pairs.append((key, va, vb))

    spark = get_spark(app_name="ab_conf")
    spark.range(1).count()
    spark.read.parquet("/root/testdata/sf0.001/region.parquet").count()
    queries = entrymod.queries()
    out = {}
    for name in names:
        fn = queries[name]
        fn(spark, sf_dir).collect()  # warm (plan/codegen/scan caches)
        sides: dict[str, list[float]] = {"A": [], "B": []}
        for rep in range(2 * ns.reps):
            side = "A" if rep % 2 == 0 else "B"
            for key, va, vb in pairs:
                spark.conf.set(key, va if side == "A" else vb)
            t0 = time.time()
            fn(spark, sf_dir).collect()
            sides[side].append(round(time.time() - t0, 3))
        for key, va, vb in pairs:
            spark.conf.unset(key)
        rec = {
            "A": sides["A"],
            "B": sides["B"],
            "medA": round(statistics.median(sides["A"]), 3),
            "medB": round(statistics.median(sides["B"]), 3),
        }
        out[name] = rec
        print(name, json.dumps(rec))
    sum_a = sum(r["medA"] for r in out.values())
    sum_b = sum(r["medB"] for r in out.values())
    print(f"TOTAL medians: A={sum_a:.3f}s B={sum_b:.3f}s")


if __name__ == "__main__":
    main()
