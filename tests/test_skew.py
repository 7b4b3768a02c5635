"""salted_join correctness: identical answer to the plain join, with
the hot key scattered across salt sub-keys (the pre-shuffle skew
lever AQE can't provide)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from hearthstats_spark.operators.skew import salted_join


def _skewed(spark):
    # 9000 of 10000 probe rows share key 7 — one reducer's worth of
    # skew at test scale
    probe = spark.range(10000).select(
        F.when(F.col("id") < 9000, 7).otherwise(F.col("id") % 100)
        .cast("long").alias("k"),
        F.col("id").alias("payload"),
    )
    build = spark.createDataFrame(
        [Row(k=i, name=f"dim{i}") for i in range(100)],
        "k long, name string")
    return probe, build


def test_salted_inner_equals_plain(spark):
    probe, build = _skewed(spark)
    got = salted_join(probe, build, ["k"], n_salts=8)
    want = probe.join(build, ["k"], "inner")
    assert got.count() == want.count() == 10000
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_salted_left_keeps_unmatched(spark):
    probe, build = _skewed(spark)
    filtered = build.filter(F.col("k") != 7)  # hot key now unmatched
    got = salted_join(probe, filtered, ["k"], n_salts=8, how="left")
    want = probe.join(filtered, ["k"], "left")
    assert got.count() == want.count() == 10000
    assert (got.filter(F.col("name").isNull()).count()
            == want.filter(F.col("name").isNull()).count()
            == 9010)  # 9000 hot rows + 10 of the id%100==7 tail


def test_salt_scatters_hot_key(spark):
    from hearthstats_spark.operators.skew import salt_expr

    probe, _ = _skewed(spark)
    salted = probe.withColumn("s", salt_expr(8))
    n_buckets = (salted.filter(F.col("k") == 7)
                 .select("s").distinct().count())
    assert n_buckets == 8  # hot key spread across every salt bucket


def test_salt_scatters_byte_identical_duplicate_rows(spark):
    """Regression (ADVICE r01): the old whole-row-hash salt sent all
    byte-identical duplicates of a hot key to ONE salt bucket — the
    likely shape in dedup workloads. The nonce salt must spread
    them."""
    from hearthstats_spark.operators.skew import salt_expr, salted_join

    dup = spark.range(8000).select(
        F.lit(7).alias("k"), F.lit("same payload").alias("payload"))
    n_buckets = (dup.withColumn("s", salt_expr(8))
                 .select("s").distinct().count())
    assert n_buckets == 8
    build = spark.createDataFrame([(7, "dim7")], "k long, name string")
    assert salted_join(dup, build, ["k"], n_salts=8).count() == 8000
