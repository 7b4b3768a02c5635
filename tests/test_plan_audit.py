"""Registry-wide plan audit: no query may regress into a plan shape
that dies at scale. Catches the silent killers — a join predicate
typo that turns a hash join into a nested-loop product still returns
correct-looking rows at sf0.01 and runs forever at 100 TB.

Current audited state (pinned): only q14 (the explicit cross join)
and q56 (doc × 5-language broadcast scoring grid) contain a
nested-loop join; only q44 (the deliberate row-at-a-time UDF demo)
touches BatchEvalPython; nothing contains CartesianProduct.
"""

from __future__ import annotations

from hearthstats_spark.plans import explain_str
from tests.conftest import SF_MED

NESTED_LOOP_OK = {"q14_join_cross", "q56_text_langid"}
PYTHON_ROW_OK = {"q44_udf_python"}


def test_no_scale_hostile_plans(spark, registry):
    offenders: dict[str, str] = {}
    for name, q in sorted(registry.items()):
        if name.startswith("s0"):
            continue  # side-effect ops execute eagerly; covered elsewhere
        p = explain_str(q.fn(spark, SF_MED))
        if "CartesianProduct" in p:
            offenders[name] = "CartesianProduct"
        elif "BroadcastNestedLoopJoin" in p and name not in NESTED_LOOP_OK:
            offenders[name] = "BroadcastNestedLoopJoin"
        elif "BatchEvalPython" in p and name not in PYTHON_ROW_OK:
            offenders[name] = "row-at-a-time Python in the hot path"
    assert not offenders, offenders
