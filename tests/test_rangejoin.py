"""range_join boundary semantics: inclusive start, exclusive end,
intervals spanning bucket boundaries, and equivalence with the naive
theta join on randomized-ish data. The bucket arithmetic
(floor((end-1)/width) for the last covered bucket) is exactly the
kind of off-by-one that survives an integration test and bites on
boundary-aligned data."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from hearthstats_spark.operators.rangejoin import range_join

W = 10


def _frames(spark, intervals, points):
    iv = spark.createDataFrame(
        [Row(k=k, iv_id=i, st=s, en=e)
         for i, (k, s, e) in enumerate(intervals)],
        "k long, iv_id long, st long, en long")
    pt = spark.createDataFrame(
        [Row(k=k, pt=p) for k, p in points], "k long, pt long")
    return iv, pt


def _pairs(df):
    return {(r["iv_id"], r["pt"]) for r in df.collect()}


def test_inclusive_start_exclusive_end(spark):
    iv, pt = _frames(spark, [(1, 10, 20)],
                     [(1, 9), (1, 10), (1, 19), (1, 20)])
    got = _pairs(range_join(iv, pt, ["k"], "st", "en", "pt", W))
    assert got == {(0, 10), (0, 19)}  # 9 before, 20 is exclusive


def test_interval_spanning_buckets(spark):
    # [15, 35) covers buckets 1, 2, 3 with width 10; points in each
    iv, pt = _frames(spark, [(1, 15, 35)],
                     [(1, 15), (1, 22), (1, 34), (1, 35), (1, 14)])
    got = _pairs(range_join(iv, pt, ["k"], "st", "en", "pt", W))
    assert got == {(0, 15), (0, 22), (0, 34)}


def test_bucket_aligned_interval(spark):
    # [10, 20): end-1 = 19 keeps it to ONE bucket — a floor(end/width)
    # formulation would wrongly also probe bucket 2
    iv, pt = _frames(spark, [(1, 10, 20)], [(1, 25)])
    assert _pairs(range_join(iv, pt, ["k"], "st", "en", "pt", W)) == set()


def test_matches_naive_theta_join(spark):
    intervals = [(k, s, s + l) for k in (1, 2)
                 for s, l in ((3, 7), (12, 25), (40, 1))]
    points = [(k, p) for k in (1, 2, 3) for p in range(0, 70, 3)]
    iv, pt = _frames(spark, intervals, points)
    got = _pairs(range_join(iv, pt, ["k"], "st", "en", "pt", W))
    naive = iv.join(pt, "k").filter(
        (F.col("pt") >= F.col("st")) & (F.col("pt") < F.col("en")))
    assert got == _pairs(naive)
