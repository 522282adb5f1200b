"""End-to-end curation pipeline semantics on a crafted corpus.

The oracle harness (``pipeline_curation_report``) checks corpus parity
against DuckDB; these tests pin the *semantics*: first-match stage
assignment, exact accounting (stage counts sum to the corpus), cleaning
behavior (tag strip + PII redaction), sampling gate, and the partitioned
write of the surviving corpus.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from automotive_big_data_analysis_spark.operators import dedup, pipeline

BASE = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lambda mu nu xi omicron pi rho sigma tau upsilon"
)
HTML_DUP = f"<p>{BASE}</p>"  # cleans to exactly BASE → exact_dup of doc 0
NEAR = BASE.replace("theta", "THETA-X")  # raw-text near-dup of doc 0
LOWQ = "spam spam"  # 2 tokens < the 20-token quality band → lowq
PII = (
    "contact me at alice@example.com about "
    + " ".join(f"token{i:02d}" for i in range(25))
)

ROWS = [
    (0, BASE, "en", "srcA"),
    (1, HTML_DUP, "en", "srcA"),
    (2, NEAR, "en", "srcB"),
    (3, LOWQ, "en", "srcB"),
    (4, PII, "de", "srcC"),
]


@pytest.fixture(scope="module")
def doc_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pipe_docs"))
    df = spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, t, lang, src in ROWS],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")
    yield path
    dedup.release(path)


def _stages(spark, doc_dir, **kw) -> dict[int, str]:
    rows = pipeline.mark_documents(spark, doc_dir, **kw).select(
        "doc_id", "stage"
    ).collect()
    return {r.doc_id: r.stage for r in rows}


def test_first_match_stage_assignment(spark, doc_dir):
    stages = _stages(spark, doc_dir)
    assert stages == {
        0: "kept",       # survives every gate
        1: "exact_dup",  # cleans to BASE; also a raw near-dup, but
                         # exact-dup wins (first-match pipeline order)
        2: "near_dup",   # unique clean text, raw 3-gram Jaccard ≥ 0.6
        3: "lowq",       # 2 tokens — below the quality band
        4: "kept",       # unique, long enough, PII redacted not dropped
    }


def test_stage_counts_sum_to_corpus(spark, doc_dir):
    report = pipeline.curation_report(spark, doc_dir)
    stage_cols = ["kept", "lowq", "exact_dup", "near_dup", "sampled_out"]
    totals = report.select(
        "lang", sum(F.col(c) for c in stage_cols).alias("total")
    ).collect()
    corpus = {
        r.lang: r.n
        for r in spark.read.parquet(f"{doc_dir}/documents.parquet")
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert {r.lang: r.total for r in totals} == corpus


def test_near_dup_matches_dedup_keep_semantics(spark, doc_dir):
    """The pipeline's near-dup drop set is exactly doc_b of the shared
    verified pair list (keep-first by id, as in dedup.keep_list_stats)."""
    removed = {
        r.doc_b
        for r in dedup.ngram_jaccard_pairs(spark, doc_dir).collect()
    }
    stages = _stages(spark, doc_dir)
    near_dropped = {d for d, s in stages.items() if s == "near_dup"}
    # docs removed as exact_dup/lowq first can also appear in `removed`
    assert near_dropped <= removed
    assert near_dropped == {
        d for d in removed if stages[d] not in ("lowq", "exact_dup")
    }


def test_cleaning_strips_tags_and_redacts_pii(spark, doc_dir):
    cleaned = {
        r.doc_id: r.clean_text
        for r in pipeline.mark_documents(spark, doc_dir)
        .select("doc_id", "clean_text")
        .collect()
    }
    assert cleaned[1] == BASE  # tags stripped, whitespace collapsed
    assert "<EMAIL>" in cleaned[4] and "alice@example.com" not in cleaned[4]


def test_sampling_gate(spark, doc_dir):
    """permille=0 turns every would-be-kept doc into sampled_out; drop
    stages decided earlier in the pipeline are untouched."""
    stages = _stages(spark, doc_dir, sample_permille=0)
    assert stages[0] == "sampled_out" and stages[4] == "sampled_out"
    assert stages[1] == "exact_dup"
    assert stages[2] == "near_dup"
    assert stages[3] == "lowq"


def test_curate_documents_partitioned_write(spark, doc_dir, tmp_path):
    out = str(tmp_path / "curated")
    result = pipeline.curate_documents(spark, doc_dir, out_dir=out)
    rows = result.collect()
    assert {r.doc_id for r in rows} == {0, 4}
    # lang is the partition column of the written layout
    assert {r.lang for r in rows} == {"en", "de"}
    import os

    assert any(d.startswith("lang=") for d in os.listdir(out))


def test_sampled_report_conserves_and_moves_only_kept(spark, doc_dir):
    """permille=500 relocates documents ONLY between kept and sampled_out;
    every drop stage decided earlier in the pipeline is unchanged."""
    full = {r.lang: r for r in pipeline.curation_report(spark, doc_dir).collect()}
    samp = {
        r.lang: r
        for r in pipeline.curation_report(
            spark, doc_dir, sample_permille=pipeline.SAMPLED_PERMILLE
        ).collect()
    }
    for lang, f in full.items():
        s = samp[lang]
        assert (s.lowq, s.exact_dup, s.near_dup) == (f.lowq, f.exact_dup, f.near_dup)
        assert s.kept + s.sampled_out == f.kept + f.sampled_out
