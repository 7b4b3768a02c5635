#!/usr/bin/env python
"""The q83/q88 persisted-shingle-index staged experiment (VERDICT r8
item 4): time the in-plan kernel vs the artifact-served tier on a
scaled documents corpus (scripts/make_bench_corpus.py), one lane per
fresh JVM, steady discipline (one untimed warm-up run, then
median-of-n). --check first proves the two lanes hash-identical on
the target corpus.

    python scripts/exp_shingle_index.py --lane inplan  --sf .bench_corpus/docs10x
    python scripts/exp_shingle_index.py --lane indexed --sf .bench_corpus/docs10x
    python scripts/exp_shingle_index.py --check        --sf .bench_corpus/docs10x

Prints one JSON line: {"lane": ..., "q83": sec, "q88": sec}.
The indexed lane trains its artifacts OUTSIDE the timed region (the
train-once/serve-many contract being measured is the WARM read).
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


def _pairs(spark, sf_dir: str, lane: str):
    from hearthstats_spark.io import load_table
    from hearthstats_spark.operators.dedup import (
        prefix_filtered_jaccard_pairs,
        prefix_filtered_jaccard_pairs_indexed,
    )

    if lane == "indexed":
        return prefix_filtered_jaccard_pairs_indexed(
            spark, sf_dir, "doc_id", "text", k=3, t_num=3, t_den=5)
    d = load_table(spark, sf_dir, "documents")
    return prefix_filtered_jaccard_pairs(
        d, "doc_id", "text", k=3, t_num=3, t_den=5)


def _clusters(spark, sf_dir: str, lane: str):
    from hearthstats_spark.operators.graph import dedup_clusters

    return dedup_clusters(_pairs(spark, sf_dir, lane).select("id_a", "id_b"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lane", choices=["inplan", "indexed"],
                    default="inplan")
    ap.add_argument("--sf", default=os.path.join(
        REPO, ".bench_corpus", "docs10x"))
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--check", action="store_true",
                    help="assert the two lanes produce identical "
                         "pair sets on --sf, then exit")
    args = ap.parse_args()

    from bench import _drop_blocks
    from hearthstats_spark.session import get_spark

    spark = get_spark("shingle-exp")
    spark.sparkContext.setLogLevel("ERROR")

    if args.check:
        from hearthstats_spark.oracle import compare

        a = _pairs(spark, args.sf, "inplan").toPandas()
        _drop_blocks(spark)
        b = _pairs(spark, args.sf, "indexed").toPandas()
        res = compare("inplan-vs-indexed", a, b)
        print(res)
        return 0 if res.ok else 1

    if args.lane == "indexed":
        # train outside the timed region: the contract is warm serve
        _pairs(spark, args.sf, "indexed").write.mode(
            "overwrite").format("noop").save()
        _drop_blocks(spark)

    out = {"lane": args.lane, "sf": args.sf}
    for name, fn in (("q83", _pairs), ("q88", _clusters)):
        fn(spark, args.sf, args.lane).write.mode(
            "overwrite").format("noop").save()  # untimed warm-up
        _drop_blocks(spark)
        times = []
        for _ in range(args.n):
            t0 = time.perf_counter()
            fn(spark, args.sf, args.lane).write.mode(
                "overwrite").format("noop").save()
            times.append(time.perf_counter() - t0)
            _drop_blocks(spark)
        out[name] = round(statistics.median(times), 3)
        print(f"[{args.lane}] {name}: {out[name]}s "
              f"(runs: {[round(t, 2) for t in times]})", file=sys.stderr)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
