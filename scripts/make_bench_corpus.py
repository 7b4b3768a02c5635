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
  per-(vec_id, replica) sub-1e-2 dither constant (plus a shared
  per-dim ramp) — breaks exact-duplicate score ties (recall@k stays
  well-defined) without moving neighborhoods.
  Probe sets keyed `vec_id < k` stay replica-0-only by construction:
  the SAME queries search an N× index — the scaling a serving
  deployment sees.
- planted → .bench_corpus/embplanted/: the RECALL corpus (VERDICT
  r10 item 5) — k Gaussian clusters with known membership, the
  middle regime between sf0.1 (near-random: data-independent
  quantizers at chance) and emb{N}x (dithered replicas: every index
  trivially at 1.0). Centroids ~ N(0, I_64), members = centroid +
  N(0, σ²=0.15²) per dim → intra-cluster cosine ≈ 0.978 vs
  inter ≈ 0±0.125, so a probe's true top-5 are cluster siblings and
  index quality = does the quantizer bucket the cluster together +
  rank inside it. Probes vec_id 0-9 land in ten DIFFERENT clusters.
  Deterministic: numpy PCG64 with a fixed seed, standalone (not
  derived from sf0.1).
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
    # deterministic dither in [0, 1e-2): a per-(vec_id, replica)
    # CONSTANT from the pmod hash plus a shared per-dim i/1e9 ramp
    # (the ramp is identical across vectors — tie-breaking comes from
    # the per-replica constant; ADVICE r10 corrected the old claim of
    # a per-dim hash). Breaks the exact score ties identical replicas
    # would create while leaving neighborhoods intact.
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


def build_planted(spark, src: str, n: int) -> str:
    """Planted-cluster recall corpus (module docstring). ``src``/``n``
    are ignored — the corpus is standalone and fixed-size (40
    clusters × 200 members, d=64, same schema as sf0.1 embeddings:
    vec_id BIGINT, embedding FLOAT[], label INTEGER=cluster id)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    K, PER, D, SIGMA = 40, 200, 64, 0.15
    rng = np.random.default_rng(20260816)
    centroids = rng.normal(0.0, 1.0, (K, D))
    members = np.repeat(centroids, PER, axis=0) + rng.normal(
        0.0, SIGMA, (K * PER, D))
    labels = np.repeat(np.arange(K), PER)
    # probes 0-9 must sit in ten DIFFERENT clusters: give the first
    # member of clusters 0-9 ids 0-9, then number the rest 10..N-1
    vec_ids = np.empty(K * PER, dtype=np.int64)
    probe_rows = [c * PER for c in range(10)]
    vec_ids[probe_rows] = np.arange(10)
    rest = np.setdiff1d(np.arange(K * PER), probe_rows)
    vec_ids[rest] = np.arange(10, K * PER)

    tbl = pa.table({
        "vec_id": pa.array(vec_ids, pa.int64()),
        "embedding": pa.array(
            [row.astype(np.float32) for row in members],
            pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    })
    dst = os.path.join(REPO, ".bench_corpus", "embplanted")
    os.makedirs(dst, exist_ok=True)
    path = os.path.join(dst, "embeddings.parquet")
    pq.write_table(tbl, path)
    print(f"{path}: {K * PER} vectors ({K} clusters x {PER}, d={D}, "
          f"sigma={SIGMA})")
    return dst


BUILDERS = {"documents": build_documents,
            "embeddings": build_embeddings,
            "lineitem": build_lineitem,
            "planted": build_planted}


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
