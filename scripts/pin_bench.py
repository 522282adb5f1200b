"""Isolated re-pin harness for individually flagged bench queries.

Runs each named query N times back-to-back in a warmed session with the
all-cores calibration probe recorded before/after every repetition, so a
perf regression can be separated from ambient host noise (this VM's
recorded full-suite totals vary 74.7-135.9 s on identical code; see
COVERAGE.md). Prints one JSON line per query: per-rep seconds, median,
and the probe readings.

Usage: PYTHONPATH=/root/repo python scripts/pin_bench.py [--out FILE] [sf_dir] name...

With ``--out FILE`` the per-query records are additionally assembled
into ONE committed JSON artifact (round-10 verdict item 2: the driver's
bench window has landed degraded two rounds running, so each round pins
the slowest queries in probe-bracketed isolation and commits the table
— a noisy driver artifact can then be reconciled query-by-query against
the pins without re-running anything).
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
from bench import _calibrate, _calibrate_io  # noqa: E402
from automotive_big_data_analysis_spark import get_spark  # noqa: E402

REPS = 5


def main() -> None:
    # argparse so --out is recognized anywhere on the line (round-11
    # ADVICE: the positional scan only honored it first, crashed on a
    # trailing --out, and happily wrote an empty pins artifact).
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", dest="out_path", default=None)
    ap.add_argument("names", nargs="+", help="[sf_dir] query names")
    ns = ap.parse_args()
    out_path = ns.out_path
    args = ns.names
    sf_dir = args.pop(0) if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    names = args
    if not names:
        ap.error("no query names given")
    spark = get_spark(app_name="pin_bench")
    spark.range(1).count()
    spark.read.parquet("/root/testdata/sf0.001/region.parquet").count()
    queries = entrymod.queries()
    pins: dict[str, dict] = {}
    for name in names:
        fn = queries[name]
        fn(spark, sf_dir).collect()  # warm the query's scans + JIT
        reps, probes, io_probes = [], [], []
        for _ in range(REPS):
            probes.append(_calibrate())
            io_probes.append(_calibrate_io())
            t0 = time.time()
            fn(spark, sf_dir).collect()
            reps.append(round(time.time() - t0, 3))
        probes.append(_calibrate())
        io_probes.append(_calibrate_io())
        rec = {
            "query": name,
            "sf_dir": sf_dir,
            "reps": reps,
            "median": round(statistics.median(reps), 3),
            "calib_probes": probes,
            "calib_io_probes": io_probes,
        }
        pins[name] = rec
        print(json.dumps(rec))
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "reps_per_query": REPS,
                    "note": (
                        "probe-bracketed isolated pins (warm indexes, warm "
                        "scans); a pin is trustworthy when its calib probes "
                        "are quiet (CPU <= 0.2 s, IO <= 0.1 s)"
                    ),
                    "pins": pins,
                },
                fh,
                indent=1,
            )
            fh.write("\n")


if __name__ == "__main__":
    main()
