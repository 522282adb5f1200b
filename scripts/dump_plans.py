"""Dump ``.explain("formatted")`` for named registry queries to files.

Optimization-round deliverable helper: writes
``plans/<round>/<query>_<suffix>.txt`` for each named query so plan
claims in OPTIMIZATION_*.md are checkable without running Spark.

Usage:
  PYTHONPATH=/root/repo python scripts/dump_plans.py \
      --round r13 --suffix before [--sf-dir DIR] name...
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from automotive_big_data_analysis_spark import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--round", dest="rnd", default="r13")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("names", nargs="+")
    ns = ap.parse_args()

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        ns.rnd,
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="dump_plans")
    queries = entrymod.queries()
    for name in ns.names:
        df = queries[name](spark, ns.sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{ns.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
