"""Unit tests for text expressions on crafted multilingual inputs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from automotive_big_data_analysis_spark.functions import text as tx


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "el coche rojo es de la ciudad y es un coche"),
        (3, "这是一辆红色的汽车 非常快"),
        (4, ""),
        (5, "  spaced    out   tokens  "),
        (6, "The Quick  Brown FOX!"),
        (7, "the quick brown fox!"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_token_count(docs):
    got = {r.doc_id: r.n for r in docs.select("doc_id", tx.token_count("text").alias("n")).collect()}
    assert got[1] == 9
    assert got[4] == 0
    assert got[5] == 3


def test_lang_id(docs):
    got = {r.doc_id: r.lang for r in docs.select("doc_id", tx.lang_id("text").alias("lang")).collect()}
    assert got[1] == "en"
    assert got[2] == "es"
    assert got[3] == "zh"
    assert got[4] == "unknown"


def test_fingerprint_collapses_formatting(docs):
    got = {
        r.doc_id: r.fp
        for r in docs.select(
            "doc_id", tx.normalized_fingerprint("text").alias("fp")
        ).collect()
    }
    # case/punct/extra-space variants collapse to the same fingerprint
    assert got[6] == got[7]
    assert got[1] != got[7]


def test_wordpieces(spark):
    df = spark.createDataFrame([("ab12 cd,ef",)], "text string")
    got = df.select(tx.wordpieces("text").alias("w")).first().w
    assert got == ["ab", "12", "cd", ",", "ef"]


def test_quality_score_bands(spark):
    long_good = " ".join(["the word list goes on and on"] * 5)  # 35 tokens
    short = "tiny doc"
    df = spark.createDataFrame([(1, long_good), (2, short)], "id int, text string")
    got = {r.id: r.q for r in df.select("id", tx.quality_score("text").alias("q")).collect()}
    assert got[1] == 1.0  # length ok, mean token len ok, stopwords present
    assert got[2] < 0.5


def test_stopword_count_case_insensitive(spark):
    df = spark.createDataFrame([("The THE the",)], "text string")
    got = df.select(
        tx.stopword_count(tx.tokens("text"), tx.STOPWORDS_EN).alias("n")
    ).first().n
    assert got == 3


def test_wordpieces_bpe_ish(docs):
    out = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id", F.size(tx.wordpieces("text")).alias("n")
        ).collect()
    }
    # "The Quick  Brown FOX!" -> The/Quick/Brown/FOX/! = 5 pieces
    assert out[6] == 5
    # CJK: one piece per ideograph (byte-level-BPE-style fanout)
    assert out[3] > len("这是一辆红色的汽车".replace(" ", "")) - 1
    assert out[4] == 0


def test_salted_join_equals_plain_join(spark):
    from automotive_big_data_analysis_spark.functions.skew import salted_join

    # hot key: 90% of big rows share key "a"
    big = spark.createDataFrame(
        [("a", i) for i in range(90)] + [("b", i) for i in range(10)],
        "k string, v int",
    )
    small = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0), ("c", 3.0)], "k string, w double"
    )
    plain = {(r.k, r.v, r.w) for r in big.join(small, "k").collect()}
    salted = [ (r.k, r.v, r.w) for r in salted_join(big, small, "k", n_salts=4).collect() ]
    assert set(salted) == plain
    assert len(salted) == len(plain)  # no duplicate matches from replication


def test_trigram_lang_id_separates_distinct_vocabularies(spark, tmp_path_factory):
    """On corpora with genuinely distinct character distributions the
    trigram profiles classify perfectly; the synthetic driver corpus
    (one shared vocabulary) only exercises machinery + oracle parity."""
    from automotive_big_data_analysis_spark.operators import text_analysis as ta

    path = str(tmp_path_factory.mktemp("tri_docs"))
    aa = "the quick brown fox jumps over the lazy dog again and again "
    bb = "zzyzx qoph vex jumbled glyphs waltz quiz nymph fjord vibex "
    rows = []
    for i in range(6):
        rows.append((i, aa * 3, "aa", "s", 0))
        rows.append((100 + i, bb * 3, "bb", "s", 0))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")
    rows = ta.lang_trigram_confusion(spark, path).collect()
    got = {(r.lang, r.predicted): r.n_docs for r in rows}
    assert got == {("aa", "aa"): 6, ("bb", "bb"): 6}


def test_trigram_lang_id_beats_chance_on_corpus(spark):
    from tests.conftest import SF_SMALL
    from automotive_big_data_analysis_spark.operators import text_analysis as ta

    rows = ta.lang_trigram_confusion(spark, SF_SMALL).collect()
    total = sum(r.n_docs for r in rows)
    diag = sum(r.n_docs for r in rows if r.lang == r.predicted)
    n_langs = len({r.lang for r in rows})
    assert total == 500 and n_langs == 5
    assert diag / total > 1.5 / n_langs  # > 1.5x chance despite shared vocab


def test_salted_sum_count_equals_plain_groupby(spark):
    """Two-phase salted aggregation must be result-identical to the plain
    groupBy for any salt source (the salt only routes partials)."""
    from automotive_big_data_analysis_spark.functions.skew import salted_sum_count

    df = spark.createDataFrame(
        [("hot", i) for i in range(500)] + [("cold", i) for i in range(20)],
        "k string, v int",
    )
    plain = {
        (r.k, r.total, r.n)
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("total"), F.count("*").alias("n"))
        .collect()
    }
    for salt_on in (None, "v"):
        salted = {
            (r.k, r.total, r.n)
            for r in salted_sum_count(df, "k", "v", salt_on=salt_on).collect()
        }
        assert salted == plain


def test_repetition_stats_exact_ratio(spark, tmp_path_factory):
    from automotive_big_data_analysis_spark.operators import text_analysis as ta

    path = str(tmp_path_factory.mktemp("repdocs"))
    # cycled doc: 15 tokens -> 11 5-grams, 5 distinct -> ratio 6/11
    cyc = " ".join(["a b c d e"] * 3)
    rows = [
        (0, cyc, "en", "s", len(cyc)),
        (1, "too short", "en", "s", 9),  # <5 tokens -> ratio 0
        (2, "v w x y z q r s t u", "fr", "s", 19),  # all distinct -> 0
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")
    got = {r.lang: r for r in ta.repetition_stats(spark, path).collect()}
    assert got["en"].n_docs == 2
    assert got["en"].n_repetitive == 1  # only the cycled doc crosses 0.2
    assert got["en"].avg_repetition == round((6 / 11 + 0.0) / 2, 6)
    assert got["fr"].n_repetitive == 0 and got["fr"].avg_repetition == 0.0


def test_tfidf_flags_distinctive_term(spark, tmp_path_factory):
    """A term unique to one document must be its top-ranked TF-IDF term;
    corpus-wide terms rank below it."""
    from automotive_big_data_analysis_spark.operators import text_analysis as ta

    path = str(tmp_path_factory.mktemp("tfidf"))
    common = "the data table row value"
    rows = [
        (0, common + " zebra zebra", "en", "s", 30),
        (1, common, "en", "s", 25),
        (2, common, "en", "s", 25),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")
    got = {
        (r.doc_id, r.rank): r.word
        for r in ta.tfidf_topterms(spark, path).collect()
    }
    assert got[(0, 1)] == "zebra"  # unique + tf=2 beats shared words
    # shared words tie on score in docs 1/2; word asc breaks the tie
    assert got[(1, 1)] == got[(2, 1)]


def test_weighted_sample_never_keeps_zero_quality(spark, tmp_path_factory):
    """quality = 0 → keep threshold 0 → document can never be sampled."""
    from automotive_big_data_analysis_spark.operators import sampling as sp

    path = str(tmp_path_factory.mktemp("wsample"))
    rows = [(i, "x", "en", "s", 1) for i in range(50)]  # 1 token, mean_len 1 -> q=0.0
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")
    row = sp.weighted_document_sample(spark, path).first()
    assert row.n_docs == 50
    assert row.n_sampled == 0
    assert row.avg_quality_sampled is None
    assert row.keep_rate == 0.0


def test_collocation_lift_ranks_fixed_phrase_first(spark, tmp_path_factory):
    """A bigram that always co-occurs ("data lake") must outrank pairs of
    independent common words; lift of a deterministic phrase equals
    N_bi / (c_a * c_b) exactly."""
    from automotive_big_data_analysis_spark.operators import text_analysis as ta

    path = str(tmp_path_factory.mktemp("colloc"))
    # 20 docs: "data lake" always adjacent; "the" everywhere
    rows = [
        (i, "the scan runs data lake the scan", "en", "s", 30)
        for i in range(20)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")
    old = ta.COLLOC_MIN_PAIRS
    try:
        ta.COLLOC_MIN_PAIRS = 2
        out = ta.collocation_lift(spark, path).collect()
    finally:
        ta.COLLOC_MIN_PAIRS = old
    assert out, "no pairs above support floor"
    top = out[0]
    assert (top.w1, top.w2) == ("data", "lake")
    # N_bi = 20*6 = 120; c_data = c_lake = 20; c_ab = 20
    assert top.c_ab == 20
    assert abs(top.lift - (20 * 120) / (20 * 20)) < 1e-9
    lifts = [r.lift for r in out]
    assert lifts == sorted(lifts, reverse=True)


def test_pii_scrub_counts_and_redacts_planted_pii(spark, tmp_path_factory):
    """The planted-fixture proof for docs_pii_scrub (the real corpus
    measures zero matches — this test carries the machinery's weight):
    exact per-class match counts, exact redacted-char accounting, and a
    structurally zero residual after the redaction chain."""
    from automotive_big_data_analysis_spark.operators import text_analysis as ta

    path = str(tmp_path_factory.mktemp("pii_docs"))
    rows = [
        # 2 emails (16 chars total: a@b.com=7 + c.d@e.org=9)
        (0, "mail a@b.com and c.d@e.org thanks", "en", "s", 0),
        # 1 phone (12 chars), 1 ipv4 (9 chars)
        (1, "call 555-123-4567 from 10.0.0.12 now", "en", "s", 0),
        # 1 url (14 chars) in the other language bucket
        (2, "ver https://x.io/a ahora", "es", "s", 0),
        # clean doc: contributes only to n_docs
        (3, "nothing sensitive here at all", "en", "s", 0),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")
    got = {r.lang: r for r in ta.pii_scrub(spark, path).collect()}
    en, es = got["en"], got["es"]
    assert (en.n_docs, en.n_email, en.n_phone, en.n_ipv4, en.n_url) == (3, 2, 1, 1, 0)
    assert en.chars_redacted == 16 + 12 + 9
    assert (es.n_docs, es.n_email, es.n_phone, es.n_ipv4, es.n_url) == (1, 0, 0, 0, 1)
    assert es.chars_redacted == len("https://x.io/a")  # the URL, 14 chars
    assert all(r.residual_matches == 0 for r in got.values())


def test_pii_scrub_planted_mirror_is_nonvacuous_and_reused(spark):
    """The round-9 planted mirror: every PII class lands NON-ZERO
    counts (the oracle finally certifies real sums), residuals stay
    zero after redaction, the per-class counts equal the plant rule's
    residue-class sizes, and a second call reuses the fingerprinted
    mirror files instead of rewriting."""
    import os

    from tests.conftest import SF_SMOKE
    from automotive_big_data_analysis_spark.operators import text_analysis as ta
    from automotive_big_data_analysis_spark.catalog import load_table

    rows = ta.pii_scrub_planted(spark, SF_SMOKE).collect()
    assert rows
    n = load_table(spark, SF_SMOKE, "documents").count()
    tot = {
        c: sum(getattr(r, c) for r in rows)
        for c in ("n_email", "n_phone", "n_ipv4", "n_url")
    }
    # plants are one string per residue class: counts = class sizes
    assert tot["n_email"] == (n + ta.PLANT_EMAIL_MOD - 1) // ta.PLANT_EMAIL_MOD
    assert tot["n_phone"] == (n + ta.PLANT_PHONE_MOD - 1) // ta.PLANT_PHONE_MOD
    assert tot["n_ipv4"] == (n + ta.PLANT_IP_MOD - 1) // ta.PLANT_IP_MOD
    assert tot["n_url"] == (n + ta.PLANT_URL_MOD - 1) // ta.PLANT_URL_MOD
    assert all(v > 0 for v in tot.values())
    assert sum(r.chars_redacted for r in rows) > 0
    assert all(r.residual_matches == 0 for r in rows)
    # mirror reuse: same fingerprint -> same path, no rewrite
    path = ta._planted_mirror_path(spark, SF_SMOKE)
    mtime = os.path.getmtime(f"{path}/_SUCCESS")
    assert ta._planted_mirror_path(spark, SF_SMOKE) == path
    assert os.path.getmtime(f"{path}/_SUCCESS") == mtime


def test_pii_scrub_measures_empty_on_the_synthetic_corpus(spark):
    """The registered measurement on the driver corpus: zero matches in
    every class (probed round 8 — documents.text holds no PII-shaped
    strings), with the doc accounting still exact and residuals zero.
    The dedup_containment_pairs measured-empty precedent."""
    from tests.conftest import SF_SMALL
    from automotive_big_data_analysis_spark.operators import text_analysis as ta

    rows = ta.pii_scrub(spark, SF_SMALL).collect()
    assert rows and sum(r.n_docs for r in rows) > 0
    for r in rows:
        assert (r.n_email, r.n_phone, r.n_ipv4, r.n_url) == (0, 0, 0, 0)
        assert r.chars_redacted == 0 and r.residual_matches == 0


def test_unigram_surprisal_ranks_rare_token_doc_first(spark, tmp_path_factory):
    """A document full of corpus-unique tokens must outrank documents of
    common tokens; the two-level (per-partition prefilter) top-k must
    equal the naive single-window formulation."""
    from pyspark.sql import Window

    from automotive_big_data_analysis_spark.operators import text_analysis as ta

    path = str(tmp_path_factory.mktemp("surpr"))
    rows = [(i, "the cat sat on the mat", "en", "s", 22) for i in range(8)]
    rows.append((8, "zyx qwv jkl zyx qwv", "en", "s", 19))  # rare tokens
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(2).write.mode("overwrite").parquet(f"{path}/documents.parquet")
    out = ta.unigram_surprisal(spark, path).collect()
    top_en = [r for r in out if r.lang == "en" and r.rank == 1][0]
    assert top_en.doc_id == 8
    assert top_en.mean_surprisal > max(
        r.mean_surprisal for r in out if r.doc_id != 8
    )
    # two-level == naive on the real sf0.001 corpus
    sf = "/root/testdata/sf0.001"
    got = [
        (r.lang, r.rank, r.doc_id)
        for r in ta.unigram_surprisal(spark, sf).collect()
    ]
    assert len(got) == len(set(got)) and len(got) > 0
