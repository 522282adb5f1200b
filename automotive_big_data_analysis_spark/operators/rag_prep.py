"""Retrieval-serving preparation: overlapping token-window chunking.

Training-data-pipeline extension (no reference analog — the reference's
surface stops at single-table SQL, SURVEY §2): before documents can feed
a retrieval index (RAG) or a fixed-context encoder, they are cut into
overlapping token windows — the chunking pass every retrieval pipeline
runs. The operator reports, per language, the chunk volume the corpus
would produce and how much of it is REDUNDANT across documents (chunks
whose token content hashes identically — boilerplate that would bloat
the index and skew retrieval), plus the average chunk fill.

Chunking rule (deterministic, engine-reproducible): chunk starts are
token offsets 1, 1+STRIDE, 1+2·STRIDE, … ≤ n_tokens; each chunk takes
CHUNK_TOKENS tokens from its start (the tail chunk is shorter). A
zero-token document produces zero chunks. Chunk identity is the md5 of
the space-joined token slice, so identity is content-defined —
independent of doc ids, ordering, or partition layout.

Scale shape: tokenization is staged behind a narrow exchange once (the
``_gram_hashes`` staging discipline — an inlined tokenizer would be
re-evaluated per chunk by projection collapse); chunk generation is a
map-side higher-order array expression; the explode feeds ONE hash
aggregation keyed on (lang, chunk hash) with map-side partial combine,
so the shuffle is bounded by the distinct-chunk vocabulary, not the
chunk stream. Nothing is pairwise, nothing leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from automotive_big_data_analysis_spark.catalog import load_table
from automotive_big_data_analysis_spark.functions import text as tx

CHUNK_TOKENS = 32  # retrieval window, in whitespace tokens
CHUNK_STRIDE = 24  # 25% overlap between consecutive chunks


def _chunk_hashes(toks_col):
    """Array of md5 chunk fingerprints for a staged token-array COLUMN.

    The argument must be a bound attribute (see
    ``training_prep._gram_hashes`` — the lambda references it per chunk
    and an inlined tokenizer regexp would re-run per chunk)."""
    starts = F.sequence(F.lit(1), F.size(toks_col), F.lit(CHUNK_STRIDE))
    return F.when(
        F.size(toks_col) > 0,
        F.transform(
            starts,
            lambda s: F.md5(
                F.concat_ws(" ", F.slice(toks_col, s, CHUNK_TOKENS))
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _chunk_sizes(toks_col):
    """Token count of each chunk: CHUNK_TOKENS, except the tail."""
    starts = F.sequence(F.lit(1), F.size(toks_col), F.lit(CHUNK_STRIDE))
    return F.when(
        F.size(toks_col) > 0,
        F.transform(
            starts,
            lambda s: F.least(
                F.lit(CHUNK_TOKENS), F.size(toks_col) - s + F.lit(1)
            ),
        ),
    ).otherwise(F.array().cast("array<int>"))


def docs_chunk_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language chunking report: documents, chunks produced, distinct
    chunk contents (cross-document — identical boilerplate windows
    collapse), and total/average chunk tokens.

    ``n_chunks - n_distinct_chunks`` is the index bloat exact chunk-level
    dedup would remove before embedding — the number a RAG ingest run
    budgets against."""
    docs = load_table(spark, sf_dir, "documents")
    staged = docs.select(
        "lang", tx.tokens("text").alias("toks")
    ).repartition(spark.sparkContext.defaultParallelism)
    # explode_outer + post-filter, NOT plain explode: explode infers a
    # non-empty-array filter that pushes below the staging exchange and
    # re-inlines the tokenizer per row (the contamination_stats lesson);
    # the null-filter below references the GENERATED column, so it stays
    # above the generate.
    chunks = staged.select(
        "lang",
        F.explode_outer(
            F.arrays_zip(
                _chunk_hashes(F.col("toks")).alias("h"),
                _chunk_sizes(F.col("toks")).alias("sz"),
            )
        ).alias("c"),
    ).where(F.col("c.h").isNotNull())
    per_lang = chunks.groupBy("lang").agg(
        F.count_distinct(F.col("c.h")).alias("n_distinct_chunks"),
        F.count("*").alias("n_chunks"),
        F.sum(F.col("c.sz").cast("long")).alias("chunk_tokens"),
    )
    docs_per_lang = docs.groupBy("lang").agg(F.count("*").alias("n_docs"))
    # chunk_tokens / n_chunks: exact integer operands → identical IEEE
    # division on both engines
    avg_fill = F.round(
        F.col("chunk_tokens").cast("double") / F.col("n_chunks"), 6
    )
    return docs_per_lang.join(per_lang, "lang").select(
        "lang",
        "n_docs",
        "n_chunks",
        "n_distinct_chunks",
        "chunk_tokens",
        avg_fill.alias("avg_chunk_tokens"),
    )


_TOKENS = r"regexp_extract_all(text, '\S+')"

ORACLE: dict[str, str] = {
    "docs_chunk_stats": f"""
        WITH toks AS (
            SELECT lang, {_TOKENS} AS t FROM documents
        ), chunks AS (
            SELECT lang,
                   md5(list_aggregate(
                       list_slice(t, s.s, s.s + {CHUNK_TOKENS} - 1),
                       'string_agg', ' ')) AS h,
                   LEAST({CHUNK_TOKENS}, len(t) - s.s + 1) AS sz
            FROM toks, UNNEST(range(1, len(t) + 1, {CHUNK_STRIDE})) AS s(s)
        ), per_lang AS (
            SELECT lang,
                   COUNT(DISTINCT h) AS n_distinct_chunks,
                   COUNT(*) AS n_chunks,
                   CAST(SUM(sz) AS BIGINT) AS chunk_tokens
            FROM chunks GROUP BY lang
        )
        SELECT d.lang, COUNT(*) AS n_docs,
               ANY_VALUE(p.n_chunks) AS n_chunks,
               ANY_VALUE(p.n_distinct_chunks) AS n_distinct_chunks,
               ANY_VALUE(p.chunk_tokens) AS chunk_tokens,
               ROUND(CAST(ANY_VALUE(p.chunk_tokens) AS DOUBLE)
                     / ANY_VALUE(p.n_chunks), 6) AS avg_chunk_tokens
        FROM documents d JOIN per_lang p ON d.lang = p.lang
        GROUP BY d.lang
    """,
}

QUERIES = {
    "docs_chunk_stats": docs_chunk_stats,
}
