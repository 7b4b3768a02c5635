"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``hearthstats_spark``; this module just
re-exports the declared-query registry (SURVEY.md §2).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (q15 pricing summary, TPC-H Q1 shape) on
    /root/testdata/sf0.001; driver checks rows>0."""
    from hearthstats_spark.queries.registry import load_all
    from hearthstats_spark.session import ensure_conf

    ensure_conf(spark)
    reg = load_all()
    return reg["q15_agg_pricing"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from hearthstats_spark.queries.registry import load_all

    return {name: q.fn for name, q in sorted(load_all().items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every oracle-checked query; rows-only
    ops (streaming, sketches, side-effect sinks) are omitted."""
    from hearthstats_spark.queries.registry import load_all

    return {
        name: q.oracle
        for name, q in sorted(load_all().items())
        if q.oracle is not None
    }
