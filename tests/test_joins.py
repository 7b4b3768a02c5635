"""Join NULL-handling (SURVEY.md §1.3 note 4: generated data has no
NULLs and full referential integrity, so outer-join NULL paths must
be exercised with constructed gaps)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F


def _sides(spark):
    left = spark.createDataFrame(
        [Row(k=1, lv="a"), Row(k=2, lv="b"), Row(k=3, lv="c")])
    right = spark.createDataFrame(
        [Row(k=2, rv="x"), Row(k=4, rv="y")])
    return left, right


def test_left_join_null_fill(spark):
    left, right = _sides(spark)
    out = (left.join(right, "k", "left")
           .select("k", F.coalesce("rv", F.lit("∅")).alias(filled := "rv")))
    got = dict((r["k"], r[filled]) for r in out.collect())
    assert got == {1: "∅", 2: "x", 3: "∅"}


def test_full_outer_both_sides_null(spark):
    left, right = _sides(spark)
    out = left.join(right, "k", "full")
    rows = {r["k"]: (r["lv"], r["rv"]) for r in out.collect()}
    assert rows == {1: ("a", None), 2: ("b", "x"),
                    3: ("c", None), 4: (None, "y")}


def test_semi_anti_partition_of_left(spark):
    left, right = _sides(spark)
    semi = {r["k"] for r in left.join(right, "k", "left_semi").collect()}
    anti = {r["k"] for r in left.join(right, "k", "left_anti").collect()}
    assert semi == {2}
    assert anti == {1, 3}
    assert semi | anti == {1, 2, 3} and not semi & anti


def test_null_keys_never_match(spark):
    left = spark.createDataFrame([Row(k=None, lv="n"), Row(k=1, lv="a")],
                                 "k int, lv string")
    right = spark.createDataFrame([Row(k=None, rv="m"), Row(k=1, rv="x")],
                                  "k int, rv string")
    inner = left.join(right, left["k"] == right["k"], "inner")
    assert inner.count() == 1  # SQL semantics: NULL = NULL is not true
