"""Pins for the plan-shape regression gate (scripts/diff_plans.py):
the node counter must disambiguate Exchange from BroadcastExchange,
normalize the Python-eval variants, and the differ must gate exactly
the declared node kinds — on canned text, so the gate itself cannot
rot silently."""

from __future__ import annotations

import importlib.util
import os

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_spec = importlib.util.spec_from_file_location(
    "diff_plans", os.path.join(_HERE, "scripts", "diff_plans.py"))
diff_plans = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(diff_plans)

_CANNED = """== Physical Plan ==
AdaptiveSparkPlan (9)
+- HashAggregate (8)
   +- Exchange (7)
      +- HashAggregate (6)
         +- BroadcastHashJoin Inner BuildRight (5)
            :- Scan parquet  (1)
            +- BroadcastExchange (4)
               +- Filter (3)
                  +- Scan parquet  (2)


(1) Scan parquet
Output [2]: [a#1L, b#2L]

(2) Scan parquet
Output [1]: [k#3L]

(3) Filter
Condition : isnotnull(k#3L)

(4) BroadcastExchange
Arguments: HashedRelationBroadcastMode(...)

(5) BroadcastHashJoin
Join condition: None

(6) HashAggregate
Keys: [a#1L]

(7) Exchange
Arguments: hashpartitioning(a#1L, 32)

(8) HashAggregate
Keys: [a#1L]

(9) AdaptiveSparkPlan
arguments: isFinalPlan=false

(10) BatchEvalPythonUDTF
Arguments: demo
"""


def test_node_counts_disambiguates_exchange_kinds():
    counts = diff_plans.node_counts(_CANNED)
    # the tree rendering would double-count: only the detail lines do
    assert counts["Exchange"] == 1
    assert counts["BroadcastExchange"] == 1
    assert counts["HashAggregate"] == 2
    assert counts["BatchEvalPython"] == 1  # UDTF variant normalized
    assert "CartesianProduct" not in counts


def test_parse_plans_md_sections():
    md = (f"# PLANS\n\n## q01_scan\n\n```\n{_CANNED}\n```\n"
          f"\n## q02_other\n\n```\n(1) Exchange\n```\n")
    parsed = diff_plans.parse_plans_md(md)
    assert set(parsed) == {"q01_scan", "q02_other"}
    assert parsed["q01_scan"]["Exchange"] == 1
    assert parsed["q02_other"] == {"Exchange": 1}


def test_diff_gates_only_declared_kinds():
    old = {"Exchange": 1, "BroadcastExchange": 1, "Sort": 2}
    new_shuffle = {"Exchange": 2, "BroadcastExchange": 1, "Sort": 2}
    assert diff_plans.diff_one(old, new_shuffle, diff_plans.GATED) == {
        "Exchange": (1, 2)}
    # a Sort-only change is informational, not gated
    new_sort = {"Exchange": 1, "BroadcastExchange": 1, "Sort": 3}
    assert diff_plans.diff_one(old, new_sort, diff_plans.GATED) == {}
    assert diff_plans.diff_one(
        old, new_sort, diff_plans.INFORMATIONAL) == {"Sort": (2, 3)}
    # a vanished broadcast gates too (AQE demotion / lost hint)
    new_lost = {"Exchange": 1, "Sort": 2}
    assert diff_plans.diff_one(old, new_lost, diff_plans.GATED) == {
        "BroadcastExchange": (1, 0)}
