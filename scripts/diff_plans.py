#!/usr/bin/env python
"""Plan-shape regression gate (VERDICT r6 item 8).

PLANS.md is regenerated every round but nothing diffed it — a
Catalyst upgrade or an innocent refactor could quietly add a shuffle
to a query and the only symptom would be a slower bench three rounds
later. This script re-plans every registered batch query at sf0.01
and compares its PHYSICAL PLAN SHAPE against the committed PLANS.md
snapshot, failing (exit 1) on any change to the gated node counts:

    Exchange                 — a new shuffle is the classic regression
    BroadcastExchange        — a lost/gained broadcast changes the
                               join strategy (AQE demotion, threshold
                               drift, a dropped hint)
    CartesianProduct         — must stay at zero everywhere
    BroadcastNestedLoopJoin  — the bounded-k fan-out shape; a NEW one
                               usually means a folded join key
    BatchEvalPython(UDTF)?   — row-at-a-time Python escaping the two
                               declared demo lanes

Other node kinds (Sort, HashAggregate, WindowGroupLimit, …) are
reported as informational diffs but do not gate — they move with
column tweaks too often to pin.

Usage:
    python scripts/diff_plans.py                  # gate vs PLANS.md
    python scripts/diff_plans.py --only q98,q144  # subset
    python scripts/diff_plans.py --accept q98     # acknowledge a
        deliberate change for this run (prints it, doesn't fail)

A deliberate plan change lands as: fix the query, run this script,
eyeball the printed diff, regenerate PLANS.md (dump_plans.py), and
commit both — the diff in the PLANS.md hunk is then the reviewable
evidence. tests/test_plan_diff.py pins the parser/counter on a
canned plan so the gate itself cannot rot silently.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.01"

#: node kinds whose count change fails the gate
GATED = (
    "Exchange",
    "BroadcastExchange",
    "CartesianProduct",
    "BroadcastNestedLoopJoin",
    "BatchEvalPython",
)

#: reported when changed, but non-fatal
INFORMATIONAL = (
    "SortMergeJoin",
    "BroadcastHashJoin",
    "ShuffledHashJoin",
    "HashAggregate",
    "ObjectHashAggregate",
    "SortAggregate",
    "Sort",
    "Window",
    "WindowGroupLimit",
    "TakeOrderedAndProject",
    "ArrowEvalPython",
)

_NODE = re.compile(r"^\((\d+)\) ([A-Za-z][A-Za-z0-9_() ]*?)\s*$", re.M)
_SECTION = re.compile(r"^## (q\w+)\n\n```\n(.*?)\n```", re.M | re.S)


def node_counts(plan: str) -> dict[str, int]:
    """Count operator nodes from a formatted plan's detail section —
    `(N) NodeName` lines are unambiguous (the tree rendering reuses
    names as substrings: `Exchange` inside `BroadcastExchange`)."""
    counts: dict[str, int] = {}
    for _n, name in _NODE.findall(plan):
        # normalize codegen/reuse decorations and python eval variants
        name = name.split(" [codegen")[0].strip()
        if name.startswith("BatchEvalPython"):
            name = "BatchEvalPython"
        counts[name] = counts.get(name, 0) + 1
    return counts


def parse_plans_md(text: str) -> dict[str, dict[str, int]]:
    return {name: node_counts(plan)
            for name, plan in _SECTION.findall(text)}


def diff_one(old: dict[str, int], new: dict[str, int],
             kinds) -> dict[str, tuple[int, int]]:
    out = {}
    for k in kinds:
        a, b = old.get(k, 0), new.get(k, 0)
        if a != b:
            out[k] = (a, b)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="",
                    help="comma-separated query-name prefixes")
    ap.add_argument("--accept", default="",
                    help="prefixes whose gated changes are deliberate")
    ap.add_argument("--plans", default="PLANS.md")
    args = ap.parse_args()

    from hearthstats_spark.plans import explain_str
    from hearthstats_spark.queries.registry import load_all
    from hearthstats_spark.session import get_spark

    with open(args.plans) as fh:
        baseline = parse_plans_md(fh.read())
    only = [p for p in args.only.split(",") if p]
    accept = [p for p in args.accept.split(",") if p]

    spark = get_spark("plan-diff", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")

    failures, accepted, info_only, missing = [], [], [], []
    for name, q in sorted(load_all().items()):
        if not name.startswith("q"):
            continue
        if only and not any(name.startswith(p) for p in only):
            continue
        if name not in baseline:
            missing.append(name)
            continue
        new = node_counts(explain_str(q.fn(spark, SF)))
        gated = diff_one(baseline[name], new, GATED)
        info = diff_one(baseline[name], new, INFORMATIONAL)
        if gated:
            line = f"{name}: " + ", ".join(
                f"{k} {a}->{b}" for k, (a, b) in sorted(gated.items()))
            if any(name.startswith(p) for p in accept):
                accepted.append(line)
            else:
                failures.append(line)
        elif info:
            info_only.append(f"{name}: " + ", ".join(
                f"{k} {a}->{b}" for k, (a, b) in sorted(info.items())))

    for line in info_only:
        print(f"[info] {line}")
    for line in accepted:
        print(f"[accepted] {line}")
    for line in failures:
        print(f"[FAIL] {line}")
    if missing:
        print(f"[new, not in {args.plans}] {' '.join(missing)} — "
              f"regenerate with scripts/dump_plans.py")
    print(f"plan-diff: {len(failures)} gated change(s), "
          f"{len(accepted)} accepted, {len(info_only)} informational")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
