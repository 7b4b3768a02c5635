"""Expectations operator: the audit must actually FIRE on bad data
(the real corpus is fully clean, so q68's all-zeros result alone
proves nothing — here we corrupt a copy and count the catches)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from hearthstats_spark.operators.expectations import audit, fk_violations


def test_audit_counts_violations(spark):
    df = spark.createDataFrame([
        Row(price=10.0, disc=0.1),
        Row(price=-5.0, disc=0.2),   # negative price
        Row(price=7.0, disc=1.5),    # discount out of range
        Row(price=-1.0, disc=2.0),   # both
    ])
    got = {r["check"]: r["n_violations"] for r in audit(df, {
        "neg_price": F.col("price") < 0,
        "disc_range": (F.col("disc") < 0) | (F.col("disc") > 1),
    }).collect()}
    assert got == {"neg_price": 2, "disc_range": 2}


def test_audit_clean_data_is_zero(spark):
    df = spark.createDataFrame([Row(x=1), Row(x=2)])
    got = audit(df, {"neg": F.col("x") < 0}).collect()
    assert got[0]["n_violations"] == 0


def test_fk_violations_finds_orphans(spark):
    child = spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=2, v="b"), Row(k=99, v="orphan")])
    parent = spark.createDataFrame([Row(pk=1), Row(pk=2), Row(pk=3)])
    orphans = fk_violations(child, "k", parent, "pk")
    assert [r["k"] for r in orphans.collect()] == [99]
