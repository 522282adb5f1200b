"""Compaction-planner invariants: the fragmented mirror is 1:1 with
fragments and lossless, the plan partitions the file set exactly under
the greedy budget, and the mirror write is idempotent."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from automotive_big_data_analysis_spark.catalog import load_table
from automotive_big_data_analysis_spark.operators import maintenance as mt

SF = "/root/testdata/sf0.001"


def test_inventory_is_one_file_per_fragment_and_lossless(spark):
    inv = mt.file_inventory(spark, SF).collect()
    n_events = load_table(spark, SF, "events").count()
    files = [r.file for r in inv]
    frags = [r.frag for r in inv]
    assert len(set(files)) == len(files) == len(set(frags))
    assert all(r.n_rows > 0 for r in inv)
    assert sum(r.n_rows for r in inv) == n_events


def test_plan_partitions_files_exactly_under_the_budget(spark):
    inv = mt.file_inventory(spark, SF).collect()
    rows = mt.compaction_plan(spark, SF).collect()
    assert sum(r.n_files for r in rows) == len(inv)
    assert sum(r.group_rows for r in rows) == sum(r.n_rows for r in inv)
    ids = sorted(r.group_id for r in rows)
    assert ids == list(range(len(ids)))
    # a group holds files STARTING inside its budget span: bounded by
    # budget + the largest single file
    max_file = max(r.n_rows for r in inv)
    for r in rows:
        assert r.group_rows < mt.TARGET_ROWS + max_file


def test_fragmented_mirror_write_is_idempotent(spark):
    path = mt.ensure_fragmented(spark, SF)
    mtime = os.path.getmtime(f"{path}/_SUCCESS")
    assert mt.ensure_fragmented(spark, SF) == path
    assert os.path.getmtime(f"{path}/_SUCCESS") == mtime


def test_layout_skipping_time_layout_prunes_exactly(spark):
    rows = {r.layout: r for r in mt.layout_skipping(spark, SF).collect()}
    t, h = rows["time_partitioned"], rows["hash_fragments"]
    # one file per day, and a day probe opens exactly that file
    assert t.n_files == t.n_probe_days
    assert t.avg_files_scanned == 1.0
    # report values are rounded to 6 decimals
    assert abs(t.avg_scan_fraction - 1.0 / t.n_files) < 1e-6
    # the content-hash layout scatters days across (nearly) every file
    assert h.n_files == mt.N_FRAGMENTS
    assert h.n_probe_days == t.n_probe_days
    assert h.avg_files_scanned > 5 * t.avg_files_scanned
    assert h.avg_scan_fraction > 0.5
