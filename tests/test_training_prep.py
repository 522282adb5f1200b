"""Training-prep invariants: contamination accounting, shard packing
(distributed prefix sum vs the naive global window), temperature rates,
and BPE pair extraction — plus plan-shape checks for the scale claims."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from automotive_big_data_analysis_spark.catalog import load_table
from automotive_big_data_analysis_spark.functions import text as tx
from automotive_big_data_analysis_spark.operators import training_prep as tp
from automotive_big_data_analysis_spark.plans import explain as px

SF = "/root/testdata/sf0.001"


def test_contamination_covers_all_candidates_and_bounds(spark):
    docs = load_table(spark, SF, "documents")
    n_cand = docs.where(F.col("source") != tp.BENCH_SOURCE).count()
    rows = tp.contamination_stats(spark, SF).collect()
    assert sum(r.n_docs for r in rows) == n_cand
    for r in rows:
        assert 0.0 <= r.avg_contamination <= 1.0
        assert 0 <= r.n_flagged <= r.n_docs


def test_contamination_broadcasts_benchmark_grams(spark):
    df = tp.contamination_stats(spark, SF)
    # the benchmark gram set must join as a broadcast, never a shuffle join
    assert px.broadcast_join_count(df) >= 1


def test_shard_packing_matches_naive_global_window(spark):
    # the two-pass prefix sum must equal the one-window formulation the
    # oracle uses — same shard ids, same totals
    docs = load_table(spark, SF, "documents")
    base = docs.select(
        "doc_id",
        F.md5("text").alias("h"),
        tx.token_count("text").cast("long").alias("tok"),
    )
    w = Window.orderBy("h", "doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    naive = (
        base.withColumn(
            "shard_id",
            F.floor((F.sum("tok").over(w) - F.col("tok")) / tp.SHARD_BUDGET),
        )
        .groupBy("shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("tok").cast("long").alias("shard_tokens"),
        )
    )
    got = {
        r.shard_id: (r.n_docs, r.shard_tokens)
        for r in tp.pack_token_shards(spark, SF).collect()
    }
    want = {r.shard_id: (r.n_docs, r.shard_tokens) for r in naive.collect()}
    assert got == want


def test_shard_packing_partitions_the_corpus_exactly(spark):
    docs = load_table(spark, SF, "documents")
    total_docs = docs.count()
    total_tok = docs.select(
        F.sum(tx.token_count("text").cast("long")).alias("t")
    ).first().t
    rows = tp.pack_token_shards(spark, SF).collect()
    assert sum(r.n_docs for r in rows) == total_docs
    assert sum(r.shard_tokens for r in rows) == total_tok
    # shard ids are contiguous from 0 (the number line has no gaps)
    ids = sorted(r.shard_id for r in rows)
    assert ids == list(range(len(ids)))
    # a shard holds docs STARTING inside its budget span, so its total is
    # bounded by budget + the largest single document
    max_doc = docs.select(
        F.max(tx.token_count("text").cast("long")).alias("m")
    ).first().m
    for r in rows:
        assert r.shard_tokens < tp.SHARD_BUDGET + max_doc


def test_shard_packing_avoids_single_partition_corpus_window(spark):
    # the corpus-sized window must be partitioned by bucket; only the
    # |buckets|-row offset window may be unpartitioned
    plan = px.physical_plan(tp.pack_token_shards(spark, SF))
    import re

    corpus_windows = re.findall(r"Window .*partitionBy=\[\]", plan)
    # any unpartitioned window must sit above the 16-row bucket aggregate,
    # which appears as a SinglePartition exchange fed by a HashAggregate
    assert plan.count("Window") >= 2
    assert len(corpus_windows) <= 1


def test_temperature_rates_follow_the_flattening_rule(spark):
    rows = tp.temperature_rebalance(spark, SF).collect()
    by_lang = {r.lang: r for r in rows}
    min_docs = min(r.n_docs for r in rows)
    import math

    for r in rows:
        # rarest language keeps everything; others keep sqrt-scaled shares
        # (sqrt, matching the operator — libm pow is not correctly rounded)
        expected = int(1000.0 * math.sqrt(min_docs / r.n_docs))
        assert r.rate_permille == expected
        assert 0 < r.rate_permille <= 1000
        assert 0 <= r.n_kept <= r.n_docs
    assert by_lang[min(by_lang, key=lambda k: by_lang[k].n_docs)].rate_permille == 1000


def test_bpe_pairs_are_adjacent_piece_bigrams(spark):
    rows = tp.bpe_pair_stats(spark, SF).collect()
    assert 0 < len(rows) <= tp.BPE_TOP_K
    # ranked by count desc then pair asc
    counts = [r.n for r in rows]
    assert counts == sorted(counts, reverse=True)
    # every pair is two wordpieces joined by one space
    import re

    piece = r"([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])"
    for r in rows:
        assert re.fullmatch(piece + " " + piece, r.pair), r.pair


def _naive_epoch_ranks(spark, epoch: int):
    docs = load_table(spark, SF, "documents")
    w = Window.orderBy("h", "doc_id")
    return (
        docs.select(
            "doc_id",
            F.md5(F.concat_ws(":", F.lit(epoch), F.col("doc_id"))).alias("h"),
        )
        .withColumn("rank", F.row_number().over(w))
        .select("doc_id", "rank")
    )


def test_epoch_order_matches_naive_global_window(spark):
    # the distributed bucket-prefix rank must equal the one-window
    # formulation the oracle uses, epoch by epoch
    r0 = {r.doc_id: r.rank for r in _naive_epoch_ranks(spark, 0).collect()}
    r1 = {r.doc_id: r.rank for r in _naive_epoch_ranks(spark, 1).collect()}
    docs = load_table(spark, SF, "documents")
    lang = {r.doc_id: r.lang for r in docs.select("doc_id", "lang").collect()}
    want: dict[str, list[int]] = {}
    for d, l in lang.items():
        want.setdefault(l, []).append(abs(r0[d] - r1[d]))
    rows = tp.training_epoch_order(spark, SF).collect()
    assert {r.lang for r in rows} == set(want)
    for r in rows:
        disps = want[r.lang]
        assert r.n_docs == len(disps)
        assert r.max_displacement == max(disps)
        assert r.avg_displacement == round(sum(disps) / len(disps), 6)


def test_epoch_order_is_a_permutation_that_rescatters(spark):
    # each epoch's ranks are exactly 1..N; between epochs the mean
    # displacement is far from 0 (a broken epoch key would be ~0; a
    # uniform random permutation gives ~N/3)
    n = load_table(spark, SF, "documents").count()
    ranks0 = sorted(r.rank for r in _naive_epoch_ranks(spark, 0).collect())
    assert ranks0 == list(range(1, n + 1))
    rows = tp.training_epoch_order(spark, SF).collect()
    total = sum(r.n_docs for r in rows)
    mean = sum(r.avg_displacement * r.n_docs for r in rows) / total
    assert total == n
    assert mean > n / 10  # decisively re-scattered
    assert max(r.max_displacement for r in rows) <= n - 1


def test_epoch_order_avoids_single_partition_corpus_window(spark):
    plan = px.physical_plan(tp.training_epoch_order(spark, SF))
    import re

    corpus_windows = re.findall(r"Window .*partitionBy=\[\]", plan)
    # only the |epochs|x16-row offset aggregate may be unpartitioned —
    # and it is partitioned by epoch here, so there must be NONE
    assert len(corpus_windows) == 0


def _py_canonical_merge(s: str, pair: str, merged: str) -> str:
    """The Python twin of ``tp._bpe_merge_expr`` (space-doubling trick)."""
    return (
        s.replace(" ", "  ")
        .replace(" " + pair.replace(" ", "  ") + " ", f" {merged} ")
        .replace("  ", " ")
    )


def _token_scan_merge(syms: list[str], a: str, b: str, merged: str) -> list[str]:
    """Canonical BPE merge application by direct left-to-right token scan
    — the tokenizer-standard definition the replace trick must match."""
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(merged)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def test_bpe_merges_reference_replay(spark):
    """The 3-round merge loop equals a direct Python replay of the shared
    definition (weighted adjacent-pair counts over the letter-run
    vocabulary, (count desc, pair asc) top-1, CANONICAL non-overlapping
    merge application) — and the space-doubling replace trick equals the
    token-scan definition on every vocabulary piece it touches."""
    import re
    from collections import Counter

    docs = load_table(spark, SF, "documents").select("text").collect()
    vocab = Counter()
    for r in docs:
        vocab.update(re.findall(r"[A-Za-z]+", r.text))
    state = {w: " " + " ".join(w) + " " for w in vocab}
    expect = []
    for rnd in range(1, tp.BPE_MERGE_ROUNDS + 1):
        pc = Counter()
        for w, s in state.items():
            syms = s.split()
            for a, b in zip(syms, syms[1:]):
                pc[f"{a} {b}"] += vocab[w]
        top = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        pair, c = top
        a, b = pair.split(" ")
        merged = pair.replace(" ", "")
        affected = 0
        for w, s in state.items():
            ns = _py_canonical_merge(s, pair, merged)
            # the replace trick IS the token-scan canonical definition
            assert ns == " " + " ".join(
                _token_scan_merge(s.split(), a, b, merged)
            ) + " "
            if ns != s:
                affected += 1
            state[w] = ns
        expect.append((rnd, pair, merged, c, affected))
    got = [
        (r.round, r.pair, r.merged, r.pair_count, r.pieces_affected)
        for r in tp.bpe_merge_table(spark, SF).collect()
    ]
    assert got == expect
    # merges are genuinely applied: round counts never increase
    counts = [r[3] for r in expect]
    assert all(c > 0 for c in counts)


def test_canonical_merge_semantics_shared(spark):
    """Pin the CANONICAL merge the space-doubling trick implements:
    ' a b a b ' merges BOTH occurrences (adjacent matches no longer
    share a boundary space after doubling) — identically in Spark,
    DuckDB, and Python, and equal to the token-scan definition."""
    import duckdb

    cases = [
        (" a b a b ", "a b", "ab", " ab ab "),  # immediate re-occurrence
        (" a a a ", "a a", "aa", " aa a "),  # self-overlap stays non-overlapping
        (" x y ", "a b", "ab", " x y "),  # no occurrence round-trips exactly
        (" a b c a b ", "a b", "ab", " ab c ab "),
    ]
    for s, pair, merged, want in cases:
        a, b = pair.split(" ")
        scan = " " + " ".join(_token_scan_merge(s.split(), a, b, merged)) + " "
        py = _py_canonical_merge(s, pair, merged)
        spark_val = (
            spark.createDataFrame([(s,)], "s string")
            .select(tp._bpe_merge_expr(F.col("s"), pair, merged).alias("r"))
            .collect()[0]
            .r
        )
        duck_val = duckdb.sql(
            "SELECT "
            + tp._bpe_merge_sql_expr(f"'{s}'", f"'{pair}'", f"'{merged}'")
            + " AS r"
        ).fetchone()[0]
        assert py == spark_val == duck_val == scan == want


def test_bpe_apply_reference_replay(spark):
    """bpe_apply_stats equals a Python replay: train the merges, apply
    them canonically to the per-lang letter-run vocabulary, aggregate
    weighted token/char totals."""
    import re
    from collections import Counter

    merges = [(r[1], r[2]) for r in tp._train_bpe(spark, SF)]
    assert len(merges) == tp.BPE_MERGE_ROUNDS
    docs = load_table(spark, SF, "documents").select("lang", "text").collect()
    lv = Counter()
    for r in docs:
        for piece in re.findall(r"[A-Za-z]+", r.text):
            lv[(r.lang, piece)] += 1
    agg = {}
    for (lang, piece), cnt in lv.items():
        s = " " + " ".join(piece) + " "
        for pair, merged in merges:
            s = _py_canonical_merge(s, pair, merged)
        tok = len(s.split())
        a = agg.setdefault(lang, [0, 0, 0, 0])
        a[0] += 1
        a[1] += cnt
        a[2] += cnt * len(piece)
        a[3] += cnt * tok
    got = {
        r.lang: (
            r.n_pieces,
            r.piece_occurrences,
            r.total_chars,
            r.total_tokens,
            r.chars_per_token,
        )
        for r in tp.bpe_apply_stats(spark, SF).collect()
    }
    assert set(got) == set(agg)
    for lang, (np_, occ, chars, toks) in agg.items():
        assert got[lang] == (np_, occ, chars, toks, chars / toks)
        # merges genuinely compress: tokens after < chars (= tokens before)
        assert toks < chars
