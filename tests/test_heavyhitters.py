"""Exact heavy hitters (operators/heavyhitters.py).

Soundness claim under test: the local-prune candidate pass never
drops a true heavy hitter REGARDLESS of row partitioning — so we
deliberately partition adversarially (hot key spread thin across
partitions, decoys concentrated) and compare against a brute-force
frequency count.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hearthstats_spark.operators.heavyhitters import heavy_hitters


def _brute(rows: list[int], support: float) -> dict[int, int]:
    n = len(rows)
    counts: dict[int, int] = {}
    for r in rows:
        counts[r] = counts.get(r, 0) + 1
    return {k: c for k, c in counts.items() if c >= support * n}


@pytest.mark.parametrize("n_parts", [1, 3, 16])
def test_matches_brute_force(spark, n_parts):
    # 10% key 7, 5% key 13, rest spread over 100 decoys
    rows = [7] * 100 + [13] * 50 + [i % 100 + 1000 for i in range(850)]
    df = spark.createDataFrame(
        [(r,) for r in rows], "item long"
    ).repartition(n_parts)
    got = {
        r["item"]: r["cnt"]
        for r in heavy_hitters(df, ["item"], support=0.04).collect()
    }
    assert got == _brute(rows, 0.04)


def test_hot_key_spread_across_partitions(spark):
    # hot key diluted into every partition: locally it is exactly at
    # the threshold in each, so pigeonhole (>=, not >) must keep it
    rows = [1] * 64 + list(range(100, 100 + 64 * 15))
    df = spark.createDataFrame([(r,) for r in rows], "item long").repartition(16)
    got = heavy_hitters(df, ["item"], support=0.0625).collect()
    assert {r["item"] for r in got} == {1}
    assert got[0]["cnt"] == 64


def test_empty_result_when_uniform(spark):
    df = spark.range(1000).select((F.col("id") % 500).alias("item"))
    assert heavy_hitters(df, ["item"], support=0.01).count() == 0


def test_null_group_key_is_a_heavy_hitter(spark):
    """A NULL item above support is a group like any other (GROUP BY
    semantics, and what the DuckDB oracle computes): the candidate
    prune's semi-join must be null-safe or the NULL group vanishes."""
    rows = [None] * 100 + [int(i % 200 + 1000) for i in range(900)]
    df = spark.createDataFrame(
        [(r,) for r in rows], "item long").repartition(8)
    got = {r["item"]: r["cnt"]
           for r in heavy_hitters(df, ["item"], support=0.05).collect()}
    assert got == {None: 100}
