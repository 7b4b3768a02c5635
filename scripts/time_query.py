"""Time one or more registered queries cold at an sf dir (default
sf0.1) — the bench.py timing discipline (noop write, blocking cache
drop between runs) without the 150-query sweep.

    python scripts/time_query.py q98 q144 [--sf /root/testdata/sf0.1] [--n 2]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--n", type=int, default=2, help="repeats per query")
    args = ap.parse_args()

    from bench import _drop_blocks
    from hearthstats_spark.queries.registry import load_all
    from hearthstats_spark.session import get_spark

    spark = get_spark("hearthstats-timeq")
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup

    for prefix in args.queries:
        names = [n for n in sorted(reg) if n.startswith(prefix)]
        for name in names:
            for i in range(args.n):
                t0 = time.perf_counter()
                reg[name].fn(spark, args.sf).write.mode(
                    "overwrite").format("noop").save()
                dt = time.perf_counter() - t0
                print(f"[time] {name} run{i}: {dt:.3f}s", flush=True)
                _drop_blocks(spark)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
