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


BM25_K1 = 1.2
BM25_B = 0.75
BM25_K1P1 = 2.2  # k1 + 1, as ONE literal so both engines parse identical bits
BM25_TOP_DOCS = 5
N_QUERY_TERMS = 3
TERM_RE = "^[a-z]{4,}$"  # alpha terms only; drops punctuation + short stopwords


def docs_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse lexical retrieval over an inverted index: BM25 top-k —
    the other half of a RAG ingest next to the dense ANN family
    (``similarity.*``); production retrieval is almost always the
    hybrid of both. Builds the classic postings structure — (doc, term,
    tf), per-doc lengths, per-term document frequencies — and scores a
    deterministic 3-term query (the corpus's top-3 alphabetic terms by
    global frequency, so any engine derives the same query from the
    same data) with a LOG-FREE BM25 variant: rational idf
    (N − df + 0.5)/(df + 0.5) instead of its logarithm (the repo's
    no-transcendentals parity rule — libm log differs between engines;
    monotonicity, hence ranking, is preserved for df < N/2, which holds
    for any discriminative term).

    Scale shape: the postings table is THE web-scale text-retrieval
    structure — one staged-tokenizer scan builds it with a single
    (doc, term) hash aggregation; query scoring touches only the 3
    query terms' postings rows (broadcast term stats), sums per-doc
    contributions in DECIMAL (order-free), and takes top-k via
    TakeOrdered — no global sort materialization, no window."""
    docs = load_table(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id",
        F.transform(tx.tokens("text"), lambda t: F.lower(t)).alias("toks"),
    ).repartition(spark.sparkContext.defaultParallelism)
    posting = staged.select(
        "doc_id", F.explode_outer("toks").alias("term")
    ).where(F.col("term").rlike(TERM_RE))
    # The (doc, term, tf) postings table feeds FOUR consumers (query
    # terms, df, doc lengths, scoring); without materialization Catalyst
    # re-plans the scan+tokenize+explode subtree into each one — five
    # fact scans instead of one (verified via plan regexp count).
    # localCheckpoint pins it once; in production this table IS the
    # stored inverted index (the sources/stored.py discipline).
    tf = (
        posting.groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint()
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    totals = dl.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_len"),
    ).withColumn("k", F.lit(1))
    qterms = (
        tf.groupBy("term")
        .agg(F.sum("tf").alias("gtf"))
        .orderBy(F.col("gtf").desc(), "term")
        .limit(N_QUERY_TERMS)
        .select("term")
    )
    df_t = (
        tf.join(F.broadcast(qterms), "term")
        .groupBy("term")
        .agg(F.count_distinct("doc_id").alias("df"))
    )
    scored = (
        tf.join(F.broadcast(df_t), "term")
        .join(dl, "doc_id")
        .withColumn("k", F.lit(1))
        .join(F.broadcast(totals), "k")
    )
    idf = (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    dlnorm = (F.col("dl") * F.col("n_docs")) / F.col("total_len").cast(
        "double"
    )
    den = F.col("tf") + BM25_K1 * (
        F.lit(1.0 - BM25_B) + BM25_B * dlnorm
    )
    contrib = idf * ((F.col("tf") * BM25_K1P1) / den)
    from automotive_big_data_analysis_spark.functions import exact as ex

    return (
        scored.withColumn("c", contrib)
        .groupBy("doc_id")
        .agg(ex.dsum("c", 6).alias("bm25"), F.first("dl").alias("dl"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(BM25_TOP_DOCS)
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

ORACLE["docs_bm25_topk"] = rf"""
    WITH toks AS (
        SELECT doc_id,
               list_transform({_TOKENS}, t -> lower(t)) AS t
        FROM documents
    ), posting AS (
        SELECT doc_id, u.term
        FROM toks, UNNEST(t) AS u(term)
        WHERE regexp_full_match(u.term, '[a-z]{{4,}}')
    ), tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM posting GROUP BY 1, 2
    ), dl AS (
        SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id
    ), totals AS (
        SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS total_len
        FROM dl
    ), qterms AS (
        SELECT term FROM (
            SELECT term, SUM(tf) AS gtf FROM tf GROUP BY term
        ) ORDER BY gtf DESC, term LIMIT {N_QUERY_TERMS}
    ), dft AS (
        SELECT term, COUNT(DISTINCT doc_id) AS df
        FROM tf JOIN qterms USING (term) GROUP BY term
    ), contrib AS (
        SELECT t.doc_id, l.dl,
               ((tt.n_docs - d.df + 0.5) / (d.df + 0.5))
               * ((t.tf * {BM25_K1P1})
                  / (t.tf + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B}
                       * ((l.dl * tt.n_docs)
                          / CAST(tt.total_len AS DOUBLE))))) AS c
        FROM tf t
        JOIN dft d USING (term)
        JOIN dl l ON l.doc_id = t.doc_id
        CROSS JOIN totals tt
    )
    SELECT doc_id,
           ROUND(CAST(SUM(CAST(c AS DECIMAL(25,10))) AS DOUBLE), 6) AS bm25,
           ANY_VALUE(dl) AS dl
    FROM contrib GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id LIMIT {BM25_TOP_DOCS}
"""

QUERIES = {
    "docs_chunk_stats": docs_chunk_stats,
    "docs_bm25_topk": docs_bm25_topk,
}
