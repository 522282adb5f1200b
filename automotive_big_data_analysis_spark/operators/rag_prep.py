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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from automotive_big_data_analysis_spark.functions import vectors as V

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


# checkpointed postings per (session, corpus) — the inverted index is
# built once and shared by every retrieval consumer in the session
_POSTINGS_MEMO: dict = {}


def release(sf_dir: str | None = None) -> int:
    """Drop the session's checkpointed postings memo (all corpora, or
    one) and unpersist the pinned checkpoint blocks.

    Mirrors ``dedup.release``: without it, a ``documents.parquet``
    rewritten under the same sf_dir within one Spark application would
    silently serve STALE checkpointed postings to every BM25/hybrid
    consumer, and the localCheckpoint blocks would stay pinned for the
    application lifetime across corpora. Fixtures that rewrite a corpus
    in-session call this; the bench harness may call it between
    families. Returns the number of memo entries dropped."""
    dropped = 0
    for key in [k for k in _POSTINGS_MEMO if sf_dir is None or k[1] == sf_dir]:
        df = _POSTINGS_MEMO.pop(key)
        try:
            df.unpersist()
        except Exception:
            pass
        dropped += 1
    return dropped

BM25_K1 = 1.2
BM25_B = 0.75
BM25_K1P1 = 2.2  # k1 + 1, as ONE literal so both engines parse identical bits
BM25_TOP_DOCS = 5
N_QUERY_TERMS = 3
TERM_RE = "^[a-z]{4,}$"  # alpha terms only; drops punctuation + short stopwords


def _bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    query terms' postings rows (broadcast term stats) and sums per-doc
    contributions in DECIMAL (order-free); consumers take top-k via
    TakeOrdered — no global sort materialization, no fact-scale
    window."""
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
    # localCheckpoint pins it once, memoized per (session, corpus) so
    # the top-k gate and the hybrid fusion share one build; in
    # production this table IS the stored inverted index (the
    # sources/stored.py discipline).
    memo_key = (spark.sparkContext.applicationId, sf_dir)
    tf = _POSTINGS_MEMO.get(memo_key)
    if tf is None:
        tf = (
            posting.groupBy("doc_id", "term")
            .agg(F.count("*").alias("tf"))
            .localCheckpoint()
        )
        _POSTINGS_MEMO[memo_key] = tf
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
    )


def docs_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gate face of :func:`_bm25_scores` (full design notes
    there): the BM25 top-k answer via TakeOrdered over the per-doc
    scores."""
    return (
        _bm25_scores(spark, sf_dir)
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(BM25_TOP_DOCS)
    )

RRF_K = 60  # the standard reciprocal-rank-fusion damping constant
RRF_DEPTH = 100  # fuse the top-100 lists from each retriever
HYBRID_TOP = 10


def docs_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HYBRID retrieval: the sparse (BM25) and dense (cosine kNN)
    rankings fused with Reciprocal Rank Fusion — the production
    composition behind most RAG retrieval stacks, where lexical and
    semantic retrievers each catch matches the other misses and
    ``rrf = Σ 1/(K + rank)`` combines them without any score
    calibration (ranks, not raw scores, so the two retrievers'
    incomparable scales never touch).

    Query derivation is deterministic and data-derived end to end: the
    sparse side runs the corpus-derived 3-term BM25 query; its TOP-1
    document's embedding becomes the dense query (pseudo-relevance
    feedback — "more like my best lexical hit"), scored by exact
    cosine over the embeddings table. Rank lists fuse at RRF_DEPTH via
    a FULL OUTER join on doc_id; a doc absent from one list simply
    contributes 0 from that side. All arithmetic is rational + one
    fixed-shape double expression → both engines agree bitwise.

    Scale shape: the BM25 side reads the checkpointed postings index;
    the dense side is one broadcast-query scan of the embeddings table
    (at 100 TB this is where the stored IVF index substitutes —
    ``knn_ivf`` — without changing the fusion); both rank windows run
    over ≤ RRF_DEPTH rows AFTER TakeOrdered pre-selection, never over
    fact-scale input."""
    scores = _bm25_scores(spark, sf_dir)
    btop = scores.select("doc_id", "bm25").orderBy(
        F.col("bm25").desc(), "doc_id"
    ).limit(RRF_DEPTH)
    wb = Window.orderBy(F.col("bm25").desc(), "doc_id")
    branked = btop.select(
        "doc_id", F.row_number().over(wb).alias("bm25_rank")
    )
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", V.as_double("embedding").alias("v")
    )
    exemplar = branked.where(F.col("bm25_rank") == 1).select(
        F.col("doc_id").alias("vec_id")
    )
    qv = emb.join(F.broadcast(exemplar), "vec_id").select(
        F.col("v").alias("qv")
    )
    dscore = emb.join(F.broadcast(qv)).select(
        F.col("vec_id").alias("doc_id"),
        F.round(V.cosine(F.col("qv"), F.col("v")), 6).alias("cos"),
    )
    dtop = dscore.orderBy(F.col("cos").desc(), "doc_id").limit(RRF_DEPTH)
    wd = Window.orderBy(F.col("cos").desc(), "doc_id")
    dranked = dtop.select(
        "doc_id", F.row_number().over(wd).alias("cos_rank")
    )
    fused = branked.join(dranked, "doc_id", "full_outer")
    rrf = F.coalesce(
        F.lit(1.0) / (RRF_K + F.col("bm25_rank")), F.lit(0.0)
    ) + F.coalesce(F.lit(1.0) / (RRF_K + F.col("cos_rank")), F.lit(0.0))
    return (
        fused.select(
            "doc_id",
            F.round(rrf, 6).alias("rrf_score"),
            "bm25_rank",
            "cos_rank",
        )
        .orderBy(F.col("rrf_score").desc(), "doc_id")
        .limit(HYBRID_TOP)
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

_BM25_CTE = rf"""
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
"""

ORACLE["docs_bm25_topk"] = (
    _BM25_CTE
    + f"""
    SELECT doc_id,
           ROUND(CAST(SUM(CAST(c AS DECIMAL(25,10))) AS DOUBLE), 6) AS bm25,
           ANY_VALUE(dl) AS dl
    FROM contrib GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id LIMIT {BM25_TOP_DOCS}
"""
)

_EMB_V = "list_transform(embedding, x -> CAST(x AS DOUBLE))"

ORACLE["docs_hybrid_rrf"] = (
    _BM25_CTE
    + f"""
    , bscore AS (
        SELECT doc_id,
               ROUND(CAST(SUM(CAST(c AS DECIMAL(25,10))) AS DOUBLE), 6)
                   AS bm25
        FROM contrib GROUP BY doc_id
    ), branked AS (
        SELECT doc_id,
               CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id)
                   AS INTEGER) AS bm25_rank
        FROM bscore QUALIFY bm25_rank <= {RRF_DEPTH}
    ), exq AS (
        SELECT {_EMB_V} AS qv
        FROM embeddings e JOIN branked b
          ON e.vec_id = b.doc_id AND b.bm25_rank = 1
    ), dscore AS (
        SELECT vec_id AS doc_id,
               ROUND(list_dot_product(qv, v)
                     / (sqrt(list_dot_product(qv, qv))
                        * sqrt(list_dot_product(v, v))), 6) AS cos
        FROM (SELECT vec_id, {_EMB_V} AS v FROM embeddings)
        CROSS JOIN exq
    ), dranked AS (
        SELECT doc_id,
               CAST(ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id)
                   AS INTEGER) AS cos_rank
        FROM dscore QUALIFY cos_rank <= {RRF_DEPTH}
    ), fused AS (
        SELECT COALESCE(b.doc_id, d.doc_id) AS doc_id,
               ROUND(COALESCE(1.0 / ({RRF_K} + b.bm25_rank), 0.0)
                     + COALESCE(1.0 / ({RRF_K} + d.cos_rank), 0.0), 6)
                   AS rrf_score,
               b.bm25_rank, d.cos_rank
        FROM branked b FULL OUTER JOIN dranked d ON b.doc_id = d.doc_id
    )
    SELECT doc_id, rrf_score, bm25_rank, cos_rank FROM fused
    ORDER BY rrf_score DESC, doc_id LIMIT {HYBRID_TOP}
"""
)

QUERIES = {
    "docs_chunk_stats": docs_chunk_stats,
    "docs_bm25_topk": docs_bm25_topk,
    "docs_hybrid_rrf": docs_hybrid_rrf,
}
