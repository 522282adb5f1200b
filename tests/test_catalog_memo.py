"""catalog.load_table memoization: plan reuse must never outlive the
table's files (round-14 fix for the round-13 stale-listing defect)."""

from __future__ import annotations

import os
import shutil

from automotive_big_data_analysis_spark.catalog import load_table


def test_load_table_memo_hits_and_self_invalidates(spark, tmp_path):
    work = str(tmp_path / "corpus")
    os.makedirs(work)
    spark.range(10).selectExpr("id AS doc_id").write.parquet(
        f"{work}/documents.parquet"
    )
    first = load_table(spark, work, "documents")
    assert first.count() == 10
    # memo hit: identical plan object back while the files are unchanged
    assert load_table(spark, work, "documents") is first
    # in-session rewrite: the fingerprint changes, so the stale plan
    # (frozen file listing) must be dropped, not served
    tmp = f"{work}/documents.parquet.new"
    spark.range(25).selectExpr("id AS doc_id").write.parquet(tmp)
    shutil.rmtree(f"{work}/documents.parquet")
    os.rename(tmp, f"{work}/documents.parquet")
    fresh = load_table(spark, work, "documents")
    assert fresh is not first
    assert fresh.count() == 25
