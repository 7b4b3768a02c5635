"""Fresh-JVM steady timings for bench heavyweights.

Run from bench.py's second phase (and usable standalone): in THIS
fresh JVM, execute each named query once untimed (codegen JIT,
parquet footers) then time ``--n`` repeats and report the MEDIAN —
the reproducible steady-state number scripts/time_query.py's
discipline produces, free of the 170-queries-of-JVM-history
interference that inflated in-bench cold numbers for late-alphabet
heavyweights (q98 15.4 s in-bench vs ~7.0 s isolated on identical
code, VERDICT r4 item 4).

Prints ONE JSON line on stdout: {"q98_triangle_count": 6.91, ...}
(everything else goes to stderr).

    python scripts/steady_bench.py q98 q108 [--sf DIR] [--n 3]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--n", type=int, default=3, help="timed repeats")
    args = ap.parse_args()

    from bench import _drop_blocks
    from hearthstats_spark.queries.registry import load_all
    from hearthstats_spark.session import get_spark

    spark = get_spark("hearthstats-steady")
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup

    out: dict[str, float] = {}
    for prefix in args.queries:
        # exact registry name first — `q17` must not also time
        # q170-q179 (ADVICE r5); prefix expansion only as a fallback
        # convenience for standalone use like `steady_bench.py q144_`
        if prefix in reg:
            matches = [prefix]
        else:
            matches = [n for n in sorted(reg) if n.startswith(prefix)]
        for name in matches:
            runs: list[float] = []
            try:
                for i in range(args.n + 1):  # run 0 = untimed warmup
                    t0 = time.perf_counter()
                    reg[name].fn(spark, args.sf).write.mode(
                        "overwrite").format("noop").save()
                    dt = time.perf_counter() - t0
                    _drop_blocks(spark)
                    print(f"[steady] {name} run{i}: {dt:.3f}s",
                          file=sys.stderr, flush=True)
                    if i > 0:
                        runs.append(dt)
                out[name] = round(statistics.median(runs), 3)
            except Exception as e:  # one bad query must not hide the rest
                print(f"[steady] FAIL {name}: {type(e).__name__}: {e}",
                      file=sys.stderr)
                out[name] = -1.0
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
