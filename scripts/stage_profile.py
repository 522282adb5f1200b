"""Per-stage wall/CPU attribution for named registry queries.

Runs each named query in a UI-enabled session (warm run first, then a
measured run), then reads the Spark REST API for the measured run's
stages: submission→completion wall, executor run/CPU time, shuffle
bytes, task count. Prints a compact per-stage table so a slow query's
cost can be attributed to a specific exchange/scan/aggregate instead of
guessed at.

Usage:
  PYTHONPATH=/root/repo python scripts/stage_profile.py [sf_dir] name...
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from automotive_big_data_analysis_spark import get_spark  # noqa: E402


def _rest(base: str, path: str):
    with urllib.request.urlopen(base + path) as resp:
        return json.load(resp)


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args.pop(0) if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    names = args
    spark = get_spark(
        app_name="stage_profile",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4049"},
    )
    spark.range(1).count()
    spark.read.parquet("/root/testdata/sf0.001/region.parquet").count()
    base = f"http://localhost:{spark.sparkContext.uiWebUrl.rsplit(':', 1)[1]}"
    app_id = spark.sparkContext.applicationId
    queries = entrymod.queries()
    for name in names:
        fn = queries[name]
        fn(spark, sf_dir).collect()  # warm
        jobs_before = {j["jobId"] for j in _rest(base, f"/api/v1/applications/{app_id}/jobs")}
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.time()
        fn(spark, sf_dir).collect()
        wall = time.time() - t0
        spark.sparkContext.setJobDescription(None)
        jobs = [
            j
            for j in _rest(base, f"/api/v1/applications/{app_id}/jobs")
            if j["jobId"] not in jobs_before
        ]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        rows = []
        for sid in stage_ids:
            try:
                sts = _rest(base, f"/api/v1/applications/{app_id}/stages/{sid}")
            except Exception:
                continue
            for st in sts:
                if st["status"] not in ("COMPLETE", "FAILED"):
                    continue
                sub = st.get("submissionTime")
                comp = st.get("completionTime")
                wall_ms = None
                if sub and comp:
                    from datetime import datetime

                    fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                    wall_ms = (
                        datetime.strptime(comp.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
                        - datetime.strptime(sub.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
                    ).total_seconds() * 1000
                rows.append(
                    {
                        "stage": sid,
                        "wall_ms": round(wall_ms or -1),
                        "tasks": st["numCompleteTasks"],
                        "run_ms": st["executorRunTime"],
                        "cpu_ms": round(st["executorCpuTime"] / 1e6),
                        "sh_read_mb": round(st["shuffleReadBytes"] / 1e6, 2),
                        "sh_write_mb": round(st["shuffleWriteBytes"] / 1e6, 2),
                        "input_mb": round(st["inputBytes"] / 1e6, 2),
                        "name": st["name"].split("\n")[0][:80],
                    }
                )
        rows.sort(key=lambda r: -r["wall_ms"])
        print(f"\n=== {name}: wall {wall:.3f}s, {len(jobs)} jobs, {len(rows)} stages ===")
        print(
            f"{'stage':>5} {'wall_ms':>8} {'tasks':>5} {'run_ms':>8} {'cpu_ms':>8}"
            f" {'shR_mb':>7} {'shW_mb':>7} {'in_mb':>7}  name"
        )
        for r in rows:
            print(
                f"{r['stage']:>5} {r['wall_ms']:>8} {r['tasks']:>5} {r['run_ms']:>8}"
                f" {r['cpu_ms']:>8} {r['sh_read_mb']:>7} {r['sh_write_mb']:>7}"
                f" {r['input_mb']:>7}  {r['name']}"
            )
        total_stage_wall = sum(r["wall_ms"] for r in rows if r["wall_ms"] > 0)
        print(
            f"  stage-wall sum {total_stage_wall/1000:.3f}s vs query wall {wall:.3f}s"
            f" (gap = driver/planning/AQE latency)"
        )


if __name__ == "__main__":
    main()
