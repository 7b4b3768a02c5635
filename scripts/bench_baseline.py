#!/usr/bin/env python
"""Re-measure the BASELINE.md DuckDB headline-6 anchor on the
CURRENT host, so the Spark-vs-DuckDB ratio can be computed same-host
instead of through the canary factor (ROUND9 work-log: the r7
reference host and later VMs differ ~1.3-1.4×).

Protocol matches the 2026-08-13 anchor: DuckDB on the sf0.1 parquet,
single process, warm OS cache — one untimed warm-up run per query,
then median of --n timed runs.

    python scripts/bench_baseline.py [--sf /root/testdata/sf0.1] [--n 5]

Prints one JSON line {"q15_agg_pricing": sec, ..., "total": sec}.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# the SAME anchor set bench.py reports — imported, not re-declared,
# so the two sides of the ratio can never drift (code-review find)
from bench import HEADLINE  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--n", type=int, default=5)
    args = ap.parse_args()

    from hearthstats_spark.oracle import duck_connect
    from hearthstats_spark.queries.registry import load_all

    reg = load_all()
    con = duck_connect(args.sf)
    out: dict[str, float] = {}
    for name in HEADLINE:
        sql = reg[name].oracle
        con.execute(sql).fetchall()  # warm-up (OS cache + plan)
        times = []
        for _ in range(args.n):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            times.append(time.perf_counter() - t0)
        out[name] = round(statistics.median(times), 4)
        print(f"{name}: {out[name]}s "
              f"(runs: {[round(t, 3) for t in times]})", file=sys.stderr)
    out["total"] = round(sum(v for k, v in out.items() if k != "total"), 4)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
