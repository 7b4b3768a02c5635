"""Hash-stability helpers (SURVEY.md §1.3 note 2): decimal-cast sums
must be summation-order independent — that property is what makes
float aggregates comparable across Spark partitions and DuckDB."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from hearthstats_spark.functions.numeric import davg, dsum, favg_sql, fsum_sql


def test_dsum_partition_order_independent(spark):
    vals = [(i, 0.1 + i * 1e5) for i in range(1000)]
    df1 = spark.createDataFrame(vals, "id long, x double").repartition(1)
    df32 = spark.createDataFrame(vals, "id long, x double").repartition(32, "id")
    s1 = df1.agg(dsum("x", "s")).collect()[0]["s"]
    s32 = df32.agg(dsum("x", "s")).collect()[0]["s"]
    assert s1 == s32  # bit-exact, not approx


def test_dsum_davg_match_duckdb(spark):
    vals = [(i, (i * 7919 % 1000) / 3.0) for i in range(5000)]
    df = spark.createDataFrame(vals, "id long, x double")
    got = df.agg(dsum("x", "s"), davg("x", "a")).collect()[0]

    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", vals)
    want = con.execute(
        f"SELECT {fsum_sql('x', 's')}, {favg_sql('x', 'a')} FROM t"
    ).fetchone()
    assert got["s"] == want[0]
    assert got["a"] == want[1]


def test_round4_column(spark):
    from hearthstats_spark.functions.numeric import round4

    df = spark.createDataFrame([(1.23456,), (2.00004,)], "x double")
    got = [r[0] for r in df.select(round4("x", "r")).collect()]
    assert got == [1.2346, 2.0]
