"""Plan-shape assertions (SURVEY.md §4.2): the optimizations that
keep this engine viable at 100 TB must be VISIBLE in the physical
plan at any scale. Losing one of these is invisible in a correctness
diff at sf0.01 and a cluster-killer at 100 TB — so they are pinned
here as regressions.
"""

from __future__ import annotations

import re

import pytest

from hearthstats_spark.plans import explain_str
from tests.conftest import SF_MED


@pytest.fixture(scope="module")
def plan(spark, registry):
    def get(name: str, mode: str = "formatted") -> str:
        return explain_str(registry[name].fn(spark, SF_MED), mode)
    return get


def test_q01_scan_prunes_columns(plan):
    p = plan("q01_scan_project")
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    assert m, p
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert cols == {"l_orderkey", "l_partkey", "l_suppkey", "l_returnflag"}
    assert len(cols) == 4  # 4 of lineitem's 11 columns reach the scan


def test_q02_filter_reaches_parquet(plan):
    p = plan("q02_scan_pushdown")
    m = re.search(r"PushedFilters: \[([^\]]*)\]", p)
    assert m, p
    assert "GreaterThanOrEqual(o_orderdate" in m.group(1)


def test_q06_star_join_broadcasts_dims(plan):
    p = plan("q06_join_multiway")
    assert p.count("BroadcastHashJoin") >= 3  # region/nation/supplier+
    assert "CartesianProduct" not in p


def test_q15_partial_final_aggregation(plan):
    p = plan("q15_agg_pricing")
    # partial (merge pre-shuffle) + final HashAggregate around one
    # exchange: map-side combine is what caps shuffle volume at scale
    assert p.count("HashAggregate") >= 2
    assert "partial_sum" in p  # map-side combine feeds the exchange
    assert "hashpartitioning" in p


def test_q30_topk_fuses_sort_and_limit(plan):
    p = plan("q30_sort_limit")
    assert "TakeOrderedAndProject" in p
    # a global Sort before the limit would be a full-shuffle sort
    assert "Exchange rangepartitioning" not in p


def test_q45_pandas_udf_uses_arrow(plan):
    p = plan("q45_udf_pandas")
    assert "ArrowEvalPython" in p


def test_q44_plain_udf_is_the_slow_path(plan):
    # documents WHY q44 exists: the row-at-a-time lane, kept
    # deliberately tiny (SURVEY §2 keeps UDF logic SQL-replicable)
    p = plan("q44_udf_python")
    assert "BatchEvalPython" in p


def test_q25_topk_prunes_before_shuffle(plan):
    p = plan("q25_win_topk")
    assert re.search(r"hashpartitioning\(o_custkey", p)
    # Spark 3.5+ WindowGroupLimit: each map task keeps only its local
    # top-3 per customer BEFORE the shuffle — the property that makes
    # rank-filter top-k viable at 100 TB (vs shuffling every row)
    assert "WindowGroupLimit" in p and "Partial" in p
