"""ASOF join edge cases (SURVEY.md §5.2 item 3): no prior match →
NULL; equal timestamps inclusive/strict; per-key isolation; column
collision suffixing."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from hearthstats_spark.operators.asof import asof_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _fixture(spark):
    probe = spark.createDataFrame([
        Row(user_id=1, ts=_ts("2024-01-01T10:00:00"), ev="p1"),
        Row(user_id=1, ts=_ts("2024-01-01T12:00:00"), ev="p2"),
        Row(user_id=2, ts=_ts("2024-01-01T09:00:00"), ev="p3"),  # no prior ref
        Row(user_id=3, ts=_ts("2024-01-01T11:00:00"), ev="p4"),  # key w/o refs
    ])
    ref = spark.createDataFrame([
        Row(user_id=1, ts=_ts("2024-01-01T09:30:00"), tag="r1"),
        Row(user_id=1, ts=_ts("2024-01-01T12:00:00"), tag="r2"),  # ties p2
        Row(user_id=2, ts=_ts("2024-01-01T09:30:00"), tag="r3"),  # after p3
    ])
    return probe, ref


def test_inclusive_asof(spark):
    probe, ref = _fixture(spark)
    out = asof_join(probe, ref, on=["user_id"])
    got = {r["ev"]: (r["tag"], r["ts_asof"]) for r in out.collect()}
    assert got["p1"] == ("r1", _ts("2024-01-01T09:30:00"))
    assert got["p2"] == ("r2", _ts("2024-01-01T12:00:00"))  # ts == : matches
    assert got["p3"] == (None, None)  # ref exists but only later
    assert got["p4"] == (None, None)  # key has no refs at all
    assert out.count() == 4  # left semantics: every probe row survives


def test_strict_asof_excludes_equal_ts(spark):
    probe, ref = _fixture(spark)
    out = asof_join(probe, ref, on=["user_id"], inclusive=False)
    got = {r["ev"]: r["tag"] for r in out.collect()}
    assert got["p2"] == "r1"  # equal-ts r2 no longer eligible


def test_latest_of_many_wins(spark):
    probe = spark.createDataFrame([Row(k=1, ts=10, ev="p")])
    ref = spark.createDataFrame(
        [Row(k=1, ts=t, tag=f"r{t}") for t in (1, 5, 9, 11)]
    )
    out = asof_join(probe, ref, on=["k"]).collect()
    assert out[0]["tag"] == "r9"  # latest ≤ 10, not r11


def test_null_keys_route_around_window(spark):
    """NULL-keyed rows (ADVICE r8): a NULL-keyed reference matches
    nothing; a NULL-keyed probe survives exactly once with NULL
    payload — served from the union-back branch, not the window's
    single NULL partition (skew guard), which a SECOND Union node in
    the optimized plan evidences (the first is the probe∪reference
    union the formulation always has)."""
    probe = spark.createDataFrame([
        Row(k=1, ts=10, ev="p1"),
        Row(k=None, ts=10, ev="pnull"),
    ])
    ref = spark.createDataFrame([
        Row(k=1, ts=5, tag="r1"),
        Row(k=None, ts=5, tag="rnull"),  # must match NOTHING
    ])
    out = asof_join(probe, ref, on=["k"])
    got = {r["ev"]: r["tag"] for r in out.collect()}
    assert got == {"p1": "r1", "pnull": None}
    assert out.count() == 2
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Union") == 2


def test_nonnullable_keys_skip_split(spark):
    """When the schema proves the probe keys non-nullable the split
    branch is dead and must not be planned (only the formulation's
    single probe∪reference Union remains)."""
    import pyspark.sql.types as T

    schema = T.StructType([
        T.StructField("k", T.LongType(), False),
        T.StructField("ts", T.LongType(), False),
    ])
    probe = spark.createDataFrame([(1, 10)], schema)
    ref = spark.createDataFrame([Row(k=1, ts=5, tag="r1")])
    out = asof_join(probe, ref, on=["k"])
    assert out.collect()[0]["tag"] == "r1"
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Union") == 1


def test_collision_suffix(spark):
    probe = spark.createDataFrame([Row(k=1, ts=10, v="left")])
    ref = spark.createDataFrame([Row(k=1, ts=5, v="right")])
    out = asof_join(probe, ref, on=["k"])
    assert "v" in out.columns and "v_asof" in out.columns
    row = out.collect()[0]
    assert row["v"] == "left" and row["v_asof"] == "right"
