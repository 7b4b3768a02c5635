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


def test_collision_suffix(spark):
    probe = spark.createDataFrame([Row(k=1, ts=10, v="left")])
    ref = spark.createDataFrame([Row(k=1, ts=5, v="right")])
    out = asof_join(probe, ref, on=["k"])
    assert "v" in out.columns and "v_asof" in out.columns
    row = out.collect()[0]
    assert row["v"] == "left" and row["v_asof"] == "right"
