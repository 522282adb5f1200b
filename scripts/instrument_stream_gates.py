"""Round-13 instrumentation for the two applyInPandasWithState gates
(r12 VERDICT item 3: stream_user_totals 1.65->2.98 s and
stream_user_totals_evict 5.77->8.14 s in-suite, two rounds of
same-direction movement; the quiet A/Bs measured them normal, so decide
with worker-level data instead of a third pin).

For each gate this script:
  * runs the REGISTERED query end-to-end (wall clock), then
  * replays the same stream with a StreamingQuery handle kept open and
    records every micro-batch's `recentProgress` durations (addBatch /
    getBatch / triggerExecution), input rows, and state-store metrics
    (rows total / updated, commit time), and
  * samples `ps` at 25 ms during the replay to count DISTINCT
    pyspark.daemon / pyspark.worker PIDs — worker CHURN: with
    spark.python.worker.reuse=true (the default) the distinct worker
    count should be ~constant across micro-batches; a per-batch respawn
    shows up as distinct-PID count >> partition count.

Usage: PYTHONPATH=/root/repo python scripts/instrument_stream_gates.py
Writes one JSON document to stdout (redirect to STREAM_INSTRUMENT_r13.txt).
"""

from __future__ import annotations

import json
import os
import subprocess
import threading
import time
import uuid

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


class WorkerSampler(threading.Thread):
    """Poll `ps` for live pyspark daemon/worker processes; collect the
    set of distinct PIDs seen and the max concurrent count."""

    def __init__(self) -> None:
        super().__init__(daemon=True)
        self.pids: set[str] = set()
        self.max_live = 0
        self.samples = 0
        self._halt = threading.Event()

    def run(self) -> None:
        while not self._halt.is_set():
            try:
                out = subprocess.run(
                    ["ps", "-eo", "pid,args"],
                    capture_output=True,
                    text=True,
                    timeout=5,
                ).stdout
            except Exception:
                break
            live = [
                ln.split(None, 1)[0]
                for ln in out.splitlines()
                if "pyspark.daemon" in ln or "pyspark.worker" in ln
            ]
            self.pids.update(live)
            self.max_live = max(self.max_live, len(live))
            self.samples += 1
            time.sleep(0.025)

    def stop(self) -> dict:
        self._halt.set()
        self.join(timeout=2)
        return {
            "distinct_worker_pids": len(self.pids),
            "max_live_workers": self.max_live,
            "samples": self.samples,
        }


def progress_rows(q) -> list[dict]:
    rows = []
    for p in q.recentProgress:
        d = p["durationMs"] if isinstance(p, dict) else json.loads(p.json)["durationMs"]
        pj = p if isinstance(p, dict) else json.loads(p.json)
        st = pj.get("stateOperators") or []
        rows.append(
            {
                "batchId": pj.get("batchId"),
                "numInputRows": pj.get("numInputRows"),
                "durationMs": d,
                "state": [
                    {
                        k: s.get(k)
                        for k in (
                            "numRowsTotal",
                            "numRowsUpdated",
                            "numRowsRemoved",
                            "commitTimeMs",
                        )
                    }
                    for s in st
                ],
            }
        )
    return rows


def main() -> None:
    from pyspark.sql import functions as F  # noqa: F401

    from automotive_big_data_analysis_spark.session import get_spark
    from automotive_big_data_analysis_spark.sources.text_formats import (
        _ensure_written,
    )
    from automotive_big_data_analysis_spark.streaming import events_stream as es

    spark = get_spark()
    report: dict = {
        "sf_dir": SF,
        "python_worker_reuse": spark.conf.get(
            "spark.python.worker.reuse", "true(default)"
        ),
        "gates": {},
    }
    # warm the JSONL mirror once so neither measurement pays the write
    path = _ensure_written(spark, SF, "jsonl")

    for gate in ("stream_user_totals", "stream_user_totals_evict"):
        fn = es.QUERIES[gate]
        # 1) registered query, end-to-end wall (warm mirror)
        t0 = time.monotonic()
        fn(spark, SF).collect()
        registered_wall = time.monotonic() - t0

        # 2) instrumented replay of the stateful stream itself
        sampler = WorkerSampler()
        sampler.start()
        t0 = time.monotonic()
        if gate == "stream_user_totals":
            totals = es.user_totals_stream(es.read_event_stream_jsonl(spark, path))
            mode = "update"
        else:
            totals = es.user_totals_evict_stream(
                es.read_event_stream_jsonl(spark, path)
            )
            mode = "append"
        name = f"instr_{uuid.uuid4().hex[:8]}"
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(es.STREAM_SHUFFLE_PARTITIONS)
        )
        try:
            q = (
                totals.writeStream.outputMode(mode)
                .format("memory")
                .queryName(name)
                .start()
            )
            try:
                q.processAllAvailable()
                batches = progress_rows(q)
            finally:
                q.stop()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        stream_wall = time.monotonic() - t0
        workers = sampler.stop()
        spark.catalog.dropTempView(name)
        report["gates"][gate] = {
            "registered_query_wall_s": round(registered_wall, 3),
            "instrumented_stream_wall_s": round(stream_wall, 3),
            "micro_batches": batches,
            "workers": workers,
        }

    print(json.dumps(report, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
