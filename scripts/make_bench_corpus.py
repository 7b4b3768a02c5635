#!/usr/bin/env python
"""Bench-only scaled corpora (VERDICT r8 item 4, generalized to the
three heavyweight families in round 10 — VERDICT r9 item 3). Each
table replicates sf0.1 N× under a LINEAR-scaling construction:

- documents → .bench_corpus/docs{N}x/: distinct doc_ids (replica
  offset) and DISJOINT vocabulary per replica (every word suffixed
  `_rI`), so the intra-replica duplicate/near-dup structure is
  preserved exactly — same pair graph per replica, N× the corpus —
  while replicas never pair with each other. Without the suffix, N
  replicas of every doc would form Jaccard-1.0 cliques and the PAIR
  OUTPUT would grow quadratically in N, changing the workload
  instead of scaling it.
- embeddings → .bench_corpus/emb{N}x/: distinct vec_ids (replica
  offset), labels preserved, components perturbed by a deterministic
  per-(vec_id, dim) sub-1e-2 dither — breaks exact-duplicate score
  ties (recall@k stays well-defined) without moving neighborhoods.
  Probe sets keyed `vec_id < k` stay replica-0-only by construction:
  the SAME queries search an N× index — the scaling a serving
  deployment sees.
- lineitem → .bench_corpus/graph{N}x/: (l_orderkey, l_partkey) with
  BOTH keys replica-offset, so the co-purchase graph becomes N
  disjoint copies — triangles/PageRank/BFS workload scales linearly
  (shared part keys would DENSIFY the graph superlinearly). Offsets
  keep partkeys < 2^31 (the packed-pair kernel's precondition) for
  N ≤ ~20000.

Gitignored; never touches /root/testdata. Deterministic: a pure
function of the source parquet and N — the persisted-artifact store
content-keys on the written files, so repeat runs serve warm.

    python scripts/make_bench_corpus.py [--n 10]
        [--src /root/testdata/sf0.1] [--tables documents,embeddings,lineitem]
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_documents(spark, src: str, n: int) -> str:
    from pyspark.sql import functions as F

    from hearthstats_spark.io import load_table

    d = load_table(spark, src, "documents")
    n_docs = d.count()
    # offset from the MAX id, not the row count: a sparse id space
    # (ids >> count) would otherwise collide across replicas and
    # silently corrupt the pair graph (code-review find, round 9)
    max_id = d.agg(F.max("doc_id")).collect()[0][0]
    offset = 10 ** len(str(max_id))  # clean id namespace per replica

    rep = d.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("__r"))
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

    dst = os.path.join(REPO, ".bench_corpus", f"docs{n}x")
    os.makedirs(dst, exist_ok=True)
    path = os.path.join(dst, "documents.parquet")
    out.repartition(32).write.mode("overwrite").parquet(path)
    got = spark.read.parquet(path).count()
    print(f"{path}: {got} docs ({n}x {n_docs})")
    assert got == n * n_docs
    return dst


def build_embeddings(spark, src: str, n: int) -> str:
    from pyspark.sql import functions as F

    from hearthstats_spark.io import load_table

    e = load_table(spark, src, "embeddings")
    n_vecs = e.count()
    max_id = e.agg(F.max("vec_id")).collect()[0][0]
    offset = 10 ** len(str(max_id))

    rep = e.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("__r"))
    # deterministic per-(vec_id, dim) dither in [0, 1e-2): breaks the
    # exact score ties identical replicas would create (module
    # docstring) while leaving neighborhoods intact
    dither = (F.pmod(F.col("vec_id") * 7919
                     + F.col("__r") * 104729, F.lit(100003))
              .cast("double") / 1e7)
    out = rep.select(
        (F.col("vec_id") + F.col("__r") * offset).alias("vec_id"),
        F.when(F.col("embedding").isNull(),
               F.lit(None).cast("array<float>"))
        .otherwise(F.transform(
            "embedding",
            lambda x, i: (x.cast("double") + dither
                          + i.cast("double") / 1e9).cast("float")))
        .alias("embedding"),
        "label",
    )
    dst = os.path.join(REPO, ".bench_corpus", f"emb{n}x")
    os.makedirs(dst, exist_ok=True)
    path = os.path.join(dst, "embeddings.parquet")
    out.repartition(32).write.mode("overwrite").parquet(path)
    got = spark.read.parquet(path).count()
    print(f"{path}: {got} vectors ({n}x {n_vecs})")
    assert got == n * n_vecs
    return dst


def build_lineitem(spark, src: str, n: int) -> str:
    from pyspark.sql import functions as F

    from hearthstats_spark.io import load_table

    li = load_table(spark, src, "lineitem").select(
        "l_orderkey", "l_partkey")
    n_rows = li.count()
    mx = li.agg(F.max("l_orderkey").alias("o"),
                F.max("l_partkey").alias("p")).collect()[0]
    o_off = 10 ** len(str(mx["o"]))
    p_off = 10 ** len(str(mx["p"]))
    assert (n - 1) * p_off + mx["p"] < 2**31, "packed-pair precondition"

    rep = li.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("__r"))
    out = rep.select(
        (F.col("l_orderkey") + F.col("__r") * o_off).alias("l_orderkey"),
        (F.col("l_partkey") + F.col("__r") * p_off).alias("l_partkey"),
    )
    dst = os.path.join(REPO, ".bench_corpus", f"graph{n}x")
    os.makedirs(dst, exist_ok=True)
    path = os.path.join(dst, "lineitem.parquet")
    out.repartition(32).write.mode("overwrite").parquet(path)
    got = spark.read.parquet(path).count()
    print(f"{path}: {got} lineitems ({n}x {n_rows})")
    assert got == n * n_rows
    return dst


BUILDERS = {"documents": build_documents,
            "embeddings": build_embeddings,
            "lineitem": build_lineitem}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--tables", default="documents")
    args = ap.parse_args()

    from hearthstats_spark.session import get_spark

    spark = get_spark("bench-corpus")
    spark.sparkContext.setLogLevel("ERROR")
    for t in args.tables.split(","):
        BUILDERS[t.strip()](spark, args.src, args.n)
    return 0


if __name__ == "__main__":
    sys.exit(main())
