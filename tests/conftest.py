"""Shared pytest fixtures: one local SparkSession for the whole run
(JVM startup is ~15 s; per-test sessions would dominate runtime)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from hearthstats_spark.session import get_spark

    s = get_spark("hearthstats-tests", master="local[4]",
                  extra_conf={"spark.sql.shuffle.partitions": "4"})
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def registry():
    from hearthstats_spark.queries.registry import LOAD_FAILURES, load_all

    reg = load_all()
    assert not LOAD_FAILURES, f"query modules failed to load: {LOAD_FAILURES}"
    return reg
