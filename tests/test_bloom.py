"""Bloom runtime-filter operator (operators/bloom.py).

The load-bearing property is NO FALSE NEGATIVES: every build-side key
must survive the probe, or the join that follows silently loses rows.
False positives are allowed (the exact join removes them) but the
rate should be near the analytic expectation, or the filter isn't
filtering.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hearthstats_spark.operators.bloom import build_bloom, probe_bloom


def test_no_false_negatives(spark):
    build = spark.range(0, 2000).select((F.col("id") * 7 + 3).alias("k"))
    bloom = build_bloom(build, "k")
    survivors = probe_bloom(build, "k", bloom)
    # every build key must pass its own filter
    assert survivors.count() == 2000


def test_false_positive_rate_sane(spark):
    build = spark.range(0, 1500).select(F.col("id").alias("k"))
    bloom = build_bloom(build, "k")
    # probe keys disjoint from the build side: any survivor is a FP
    probe = spark.range(1_000_000, 1_020_000).select(F.col("id").alias("k"))
    fp = probe_bloom(probe, "k", bloom).count()
    # m=2^17, k=5, n=1500 -> FPR ~ (1 - e^{-5*1500/131072})^5 ~ 6e-7;
    # allow two orders of magnitude headroom over 20k probes
    assert fp <= 5


def test_duplicate_probe_rows_preserved(spark):
    # the probe is a filter, not a distinct: multiplicity must survive
    build = spark.range(0, 10).select(F.col("id").alias("k"))
    bloom = build_bloom(build, "k")
    probe = spark.range(0, 10).select((F.col("id") % 2).alias("k"))
    assert probe_bloom(probe, "k", bloom).count() == 10


def test_small_m_still_exact_join_after(spark):
    # undersized bitmap -> high FPR, but join-after-probe stays exact
    build = spark.range(0, 500).select((F.col("id") * 2).alias("k"))
    bloom = build_bloom(build, "k", m_bits=256, k=2)
    probe = spark.range(0, 1000).select(F.col("id").alias("k"))
    pruned = probe_bloom(probe, "k", bloom, m_bits=256, k=2)
    joined = pruned.join(build.distinct(), "k").count()
    assert joined == 500  # evens 0..998 ∩ build = 500 keys
