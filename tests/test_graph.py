"""connected_components / dedup_clusters correctness: known graphs
(incl. a chain, where transitivity matters: a~b, b~c but never a~c
as a pair) and integration with q49's near-dup pairs."""

from __future__ import annotations

from pyspark.sql import Row

from hearthstats_spark.operators.graph import connected_components, dedup_clusters
from tests.conftest import SF_SMALL


def _edges(spark, pairs):
    return spark.createDataFrame(
        [Row(id_a=a, id_b=b) for a, b in pairs], "id_a long, id_b long")


def test_chain_collapses_transitively(spark):
    # 1-2-3-4 chain + isolated pair (10,11): 2 components
    cc = connected_components(
        _edges(spark, [(1, 2), (2, 3), (3, 4), (10, 11)]), "id_a", "id_b")
    got = {r["vertex"]: r["component"] for r in cc.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_star_and_cycle(spark):
    cc = connected_components(
        _edges(spark, [(5, 1), (5, 2), (5, 3),      # star centered off-min
                       (7, 8), (8, 9), (9, 7)]),    # cycle
        "id_a", "id_b")
    got = {r["vertex"]: r["component"] for r in cc.collect()}
    assert {got[5], got[1], got[2], got[3]} == {1}
    assert {got[7], got[8], got[9]} == {7}


def test_dedup_clusters_from_minhash_pairs(spark):
    """End-to-end: q49 pairs at sf0.001 → clusters; every member's
    canonical must be the min doc_id of its pair-connected set."""
    from hearthstats_spark.io import load_table
    from hearthstats_spark.operators.dedup import minhash_near_dup_pairs

    d = load_table(spark, SF_SMALL, "documents")
    pairs = minhash_near_dup_pairs(d, "doc_id", "text")
    clusters = dedup_clusters(pairs)
    rows = clusters.collect()
    edges = [(r["id_a"], r["id_b"]) for r in pairs.collect()]
    # python union-find reference
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {m: find(m) for m in parent}
    got = {r["member"]: r["canonical"] for r in rows}
    assert got == want
