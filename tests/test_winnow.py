"""Winnowing fingerprint guarantees (Schleimer et al.): identical
docs fingerprint identically; any shared substring of length
≥ w+k-1 shares ≥1 fingerprint; disjoint-alphabet docs share none."""

from __future__ import annotations

from pyspark.sql import Row

from hearthstats_spark.operators.dedup import winnow_fingerprints

K, W = 8, 4
GUARANTEE = W + K - 1  # 11 chars


def _fps(spark, docs):
    df = spark.createDataFrame([Row(doc_id=i, text=t)
                                for i, t in enumerate(docs)])
    out = winnow_fingerprints(df, "doc_id", "text", k=K, w=W)
    got: dict[int, set] = {i: set() for i in range(len(docs))}
    for r in out.collect():
        got[r["doc_id"]].add(r["fingerprint"])
    return got

def test_identical_docs_identical_fingerprints(spark):
    got = _fps(spark, ["the quick brown fox jumps over the lazy dog",
                       "the quick brown fox jumps over the lazy dog"])
    assert got[0] and got[0] == got[1]


def test_shared_substring_shares_a_fingerprint(spark):
    shared = "X" * 0 + "a shared common phrase of real length"
    assert len(shared) >= GUARANTEE
    got = _fps(spark, [f"prefix one {shared} suffix alpha",
                       f"totally different start {shared} and end"])
    assert got[0] & got[1], "winnowing guarantee violated"


def test_disjoint_docs_share_nothing(spark):
    got = _fps(spark, ["aaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
                       "zzzzzzzzzzzzzzzzzzzzzzzzzzzzzz"])
    assert got[0] and got[1]
    assert not (got[0] & got[1])


def test_short_doc_yields_nothing(spark):
    got = _fps(spark, ["tiny"])  # shorter than k
    assert got[0] == set()
