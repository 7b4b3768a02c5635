"""q188/q189 BPE kernels: hand-checked toy example (the oracle pins
cross-engine equality; this pins the SEMANTICS — weighted pair
counting and greedy leftmost non-overlapping merge)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _toy(spark):
    return spark.createDataFrame(
        [(0, "aa ab aa"), (1, "ab aa aaa"), (2, None)],
        "doc_id long, text string")


def test_pair_counts_weighted_by_word_freq(spark):
    from hearthstats_spark.queries.tokenizer import (
        pair_counts, word_freqs,
    )

    vocab = {r["word"]: r["freq"]
             for r in word_freqs(_toy(spark)).collect()}
    assert vocab == {"aa": 3, "ab": 2, "aaa": 1}
    pairs = {r["pair"]: r["pair_count"]
             for r in pair_counts(word_freqs(_toy(spark))).collect()}
    # 'aa' word contributes 1 pair x3; 'aaa' contributes 2 'aa' pairs
    assert pairs == {"aa": 3 + 2, "ab": 2}


def test_merge_apply_is_greedy_leftmost(spark):
    """With merge #1 = 'aa': 'aa' -> [aa] (no pairs left),
    'aaa' -> [aa, a] (leftmost wins, no overlap), 'ab' -> [a, b]
    (untouched). Round-2 pairs: 'a b' x2 and 'aa a' x1."""
    from hearthstats_spark.queries.tokenizer import (
        apply_merge, pair_counts, word_freqs,
    )

    vocab = word_freqs(_toy(spark))
    best = pair_counts(vocab).agg(
        F.min_by("pair", F.struct((-F.col("pair_count")).alias("n"),
                                  F.col("pair"))).alias("bp"))
    assert best.collect()[0]["bp"] == "aa"
    syms = {tuple(r["s"]): r["freq"]
            for r in apply_merge(vocab, best).collect()}
    assert syms == {("aa",): 3, ("a", "b"): 2, ("aa", "a"): 1}


def test_q188_q189_registered_shapes(spark, registry):
    r188 = registry["q188_bpe_pair_stats"].fn(spark, SF_SMALL).collect()
    assert [r["rk"] for r in r188] == list(range(1, len(r188) + 1))
    counts = [r["pair_count"] for r in r188]
    assert counts == sorted(counts, reverse=True)
    assert all(len(r["pair"]) == 2 for r in r188)
    r189 = registry["q189_bpe_merge_apply"].fn(spark, SF_SMALL).collect()
    assert [r["rk"] for r in r189] == list(range(1, len(r189) + 1))
    # round-2 pairs are spaced two-symbol strings
    assert all(" " in r["pair"] for r in r189)
