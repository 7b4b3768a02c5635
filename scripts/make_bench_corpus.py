#!/usr/bin/env python
"""Bench-only scaled documents corpus (VERDICT r8 item 4): replicate
sf0.1 documents N× with (a) distinct doc_ids (replica offset) and
(b) DISJOINT vocabulary per replica (every word suffixed `_rI`), so
the intra-replica duplicate/near-dup structure is preserved exactly
— same pair graph per replica, N× the corpus — while replicas never
pair with each other (suffixing keeps word-k-gram shingle structure
bijective per replica). Without (b), N replicas of every doc would
form Jaccard-1.0 cliques and the PAIR OUTPUT would grow
quadratically in N, changing the workload instead of scaling it.

Writes .bench_corpus/docs{N}x/documents.parquet (gitignored; never
touches /root/testdata). Deterministic: pure function of the source
parquet and N.

    python scripts/make_bench_corpus.py [--n 10] [--src /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from hearthstats_spark.io import load_table
    from hearthstats_spark.session import get_spark

    spark = get_spark("bench-corpus")
    spark.sparkContext.setLogLevel("ERROR")
    d = load_table(spark, args.src, "documents")
    n_docs = d.count()
    # offset from the MAX id, not the row count: a sparse id space
    # (ids >> count) would otherwise collide across replicas and
    # silently corrupt the pair graph (code-review find, round 9)
    max_id = d.agg(F.max("doc_id")).collect()[0][0]
    offset = 10 ** len(str(max_id))  # clean id namespace per replica

    rep = d.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(args.n - 1))).alias("__r"))
    out = rep.select(
        (F.col("doc_id") + F.col("__r") * offset).alias("doc_id"),
        F.when(
            F.col("text").isNull(), F.lit(None).cast("string")
        ).otherwise(
            F.array_join(
                F.transform(
                    F.split("text", " "),
                    lambda w: F.concat(w, F.lit("_r"),
                                       F.col("__r").cast("string"))),
                " ")
        ).alias("text"),
        "lang", "source",
    )
    # keep the n_chars == len(text) metadata contract true on the
    # suffixed text
    out = out.withColumn("n_chars", F.length("text").cast("long"))

    dst = os.path.join(REPO, ".bench_corpus", f"docs{args.n}x")
    os.makedirs(dst, exist_ok=True)
    path = os.path.join(dst, "documents.parquet")
    out.repartition(32).write.mode("overwrite").parquet(path)
    got = spark.read.parquet(path).count()
    print(f"{path}: {got} docs ({args.n}x {n_docs})")
    assert got == args.n * n_docs
    return 0


if __name__ == "__main__":
    sys.exit(main())
