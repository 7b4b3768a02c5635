"""Group K — approximate-nearest-neighbor search: q61 IVF-style
bucketed probe, q85 random-hyperplane LSH (multi-table) over the
embedding column.

Plan shape (the point of the exercise): a coarse quantizer assigns
every vector to a bucket — here the sign bits of the first 8
dimensions (256 cells), at production scale k-means centroid ids —
and a probe only joins queries against their OWN bucket's vectors.
The join is a plain equi join on bucket id, so Catalyst gives hash
partitioning, AQE skew handling, and (with bucketed/partitioned
storage) partition pruning for free; candidate cosine math runs on
|bucket| vectors instead of n. Brute force (q50) is the recall
oracle: an IVF probe with nprobe=1 only recalls neighbors sharing
the query's cell — the recall/latency trade every ANN index makes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hearthstats_spark.io import load_table
from hearthstats_spark.queries.registry import register

_N_QUERIES = 10  # probe set: vec_id < 10
_TOP_K = 5

_BUCKET_SQL = " + ".join(
    f"(CASE WHEN embedding[{i + 1}] >= 0 THEN (1 << {i}) ELSE 0 END)"
    for i in range(8)
)


@register(
    "q61_ann_ivf",
    oracle=f"""
    WITH e AS (
        SELECT vec_id,
               {_BUCKET_SQL} AS bucket,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
               SQRT(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        FROM embeddings
    ),
    pairs AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROUND(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 4) AS sim
        FROM e q JOIN e c
          ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
        WHERE q.vec_id < {_N_QUERIES}
    )
    SELECT query_id, neighbor_id, sim, CAST(rk AS INT) AS rk
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY sim DESC, neighbor_id) AS rk FROM pairs)
    WHERE rk <= {_TOP_K}
    """,
)
def q61_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed top-5 neighbor probe for queries vec_id < 10
    (see module docstring for the plan-shape rationale)."""
    e = load_table(spark, sf_dir, "embeddings")
    bucket = sum(
        (
            F.when(F.element_at("embedding", i + 1) >= 0, F.lit(1 << i))
            .otherwise(F.lit(0))
            for i in range(8)
        ),
        start=F.lit(0),
    )
    v = F.transform("embedding", lambda x: x.cast("double"))
    nrm = F.sqrt(F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))
    base = e.select("vec_id", bucket.alias("bucket"),
                    v.alias("v"), nrm.alias("nrm"))
    q = (base.filter(F.col("vec_id") < _N_QUERIES)
         .select(F.col("vec_id").alias("query_id"), "bucket",
                 F.col("v").alias("qv"), F.col("nrm").alias("qn")))
    dot = F.aggregate(F.zip_with("qv", "v", lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    pairs = (
        F.broadcast(q).join(base, "bucket")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"),
                F.round(dot / (F.col("qn") * F.col("nrm")), 4).alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(),
                                               "neighbor_id")
    return (
        pairs.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= _TOP_K)
    )


# ---- q85: random-hyperplane LSH, L tables ORed ----------------------
#
# The signed-random-projection family (Charikar, STOC'02): bucket bit
# b of table t is the SIGN of <v, h_{t,b}> for a fixed ±1 hyperplane.
# Collision probability is 1 − θ/π per bit, so b bits select close
# cones and L independent tables OR-ed together recover recall lost
# to any single table — the standard recall/candidate-count dial
# (L·b here: 2×6). Hyperplanes are derived from md5 in the DRIVER
# (deterministic, data-independent, no fit step) and embedded as
# literal arrays in both the Spark plan and the DuckDB oracle, which
# is what keeps this LSH variant hash-exact cross-engine. The dot
# products accumulate left-to-right in double on both engines
# (F.aggregate / list_dot_product over double lists — the same
# contract q61's sim relies on).

_LSH_DIM = 64
_LSH_BITS = 6   # 64 buckets/table ≈ 8 vectors/bucket at sf0.01
_LSH_TABLES = 2


def _lsh_plane(t: int, b: int) -> list[float]:
    import hashlib

    signs = []
    for i in range(_LSH_DIM):
        h = hashlib.md5(f"{t}:{b}:{i}".encode()).hexdigest()
        signs.append(1.0 if int(h[0], 16) < 8 else -1.0)
    return signs


_LSH_PLANES = {(t, b): _lsh_plane(t, b)
               for t in range(_LSH_TABLES) for b in range(_LSH_BITS)}


def _lsh_oracle() -> str:
    def bucket_sql(t: int) -> str:
        bits = []
        for b in range(_LSH_BITS):
            lit = "[" + ", ".join(
                f"{x:.1f}" for x in _LSH_PLANES[(t, b)]) + "]"
            bits.append(f"(CASE WHEN list_dot_product(v, {lit}) >= 0 "
                        f"THEN (1 << {b}) ELSE 0 END)")
        return " + ".join(bits)

    tables = "\nUNION ALL\n".join(f"""
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROUND(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 4) AS sim
        FROM e q JOIN e c
          ON q.b{t} = c.b{t} AND q.vec_id <> c.vec_id
        WHERE q.vec_id < {_N_QUERIES}""" for t in range(_LSH_TABLES))
    return f"""
    WITH e AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
               SQRT(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm,
               {", ".join(f"{bucket_sql(t)} AS b{t}"
                          for t in range(_LSH_TABLES))}
        FROM embeddings
    ),
    cand AS (SELECT DISTINCT query_id, neighbor_id, sim FROM ({tables}))
    SELECT query_id, neighbor_id, sim, CAST(rk AS INT) AS rk
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY sim DESC, neighbor_id) AS rk FROM cand)
    WHERE rk <= {_TOP_K}
    """


@register("q85_ann_lsh", oracle=_lsh_oracle())
def q85_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 neighbor probe for queries vec_id < 10 through 2 OR-ed
    random-hyperplane LSH tables (see comment block above). Same
    output contract as q61; tests/test_ann.py pins that the union of
    tables recalls at least what either table alone does and that
    candidates stay a small fraction of n."""
    e = load_table(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    nrm = F.sqrt(F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))

    def dot(col, plane):
        lits = F.array(*[F.lit(x) for x in plane])
        return F.aggregate(F.zip_with(col, lits, lambda x, y: x * y),
                           F.lit(0.0), lambda acc, x: acc + x)

    def bucket(t):
        return sum(
            (F.when(dot(F.col("v"), _LSH_PLANES[(t, b)]) >= 0,
                    F.lit(1 << b)).otherwise(F.lit(0))
             for b in range(_LSH_BITS)),
            start=F.lit(0),
        )

    # optimization round 11, TRIED AND REJECTED: caching this frame
    # (three DAG branches re-evaluate it — the query filter + one
    # join probe per table). Quiet-gated paired A/B at sf0.1: the
    # uncached form ran 2.14-2.2 s median vs 2.8-3.5 s cached —
    # InMemoryRelation deserialization of the array<double> column
    # costs more than re-running scan + bucket expressions inside
    # whole-stage codegen, the same small-scale trade q83's indexed
    # lane documents. (An earlier 4-pair read in a degraded host
    # window had suggested the opposite; the gated re-measure
    # reversed it.) At cluster scale the bucketed base would be the
    # persisted index (q183's artifact lane), not a .cache().
    base = (e.select("vec_id", v.alias("v"), nrm.alias("nrm"))
            .select("vec_id", "v", "nrm",
                    *[bucket(t).alias(f"b{t}")
                      for t in range(_LSH_TABLES)]))
    q = (base.filter(F.col("vec_id") < _N_QUERIES)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("v").alias("qv"), F.col("nrm").alias("qn"),
                 *[F.col(f"b{t}").alias(f"qb{t}")
                   for t in range(_LSH_TABLES)]))
    sim = F.round(
        F.aggregate(F.zip_with("qv", "v", lambda x, y: x * y),
                    F.lit(0.0), lambda acc, x: acc + x)
        / (F.col("qn") * F.col("nrm")), 4)
    branches = [
        F.broadcast(q).join(base, F.col(f"qb{t}") == F.col(f"b{t}"))
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"),
                sim.alias("sim"))
        for t in range(_LSH_TABLES)
    ]
    cand = branches[0]
    for b in branches[1:]:
        cand = cand.unionByName(b)
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(),
                                               "neighbor_id")
    return (
        cand.distinct()
        .withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= _TOP_K)
    )


# ---- q87: IVF with multiprobe ---------------------------------------
#
# Single-probe IVF (q61) only recalls neighbors in the query's OWN
# quantizer cell. Multiprobe visits the nearest other cells too; for
# a sign-bit quantizer those are exactly the Hamming-1 cells (one
# flipped bit = one crossed hyperplane). Each query explodes into
# 1 + 8 probe bucket ids, the join stays a plain equi join on the
# bucket id, and — because a candidate lives in exactly ONE cell —
# the probe list never produces duplicate (query, candidate) pairs,
# so no dedup pass is needed. Candidate volume grows 9×, recall
# strictly dominates q61 (superset; pinned in tests/test_ann.py),
# and the plan shape stays bucket-join + windowed top-k.


@register(
    "q87_ann_ivf_multiprobe",
    oracle=f"""
    WITH e AS (
        SELECT vec_id,
               {_BUCKET_SQL} AS bucket,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
               SQRT(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        FROM embeddings
    ),
    probes AS (
        SELECT vec_id, v, nrm,
               CASE WHEN i = 0 THEN bucket
                    ELSE xor(bucket, (1 << (i - 1))) END AS pbucket
        FROM e CROSS JOIN generate_series(0, 8) g(i)
        WHERE vec_id < {_N_QUERIES}
    ),
    pairs AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROUND(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 4) AS sim
        FROM probes q JOIN e c
          ON q.pbucket = c.bucket AND q.vec_id <> c.vec_id
    )
    SELECT query_id, neighbor_id, sim, CAST(rk AS INT) AS rk
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY sim DESC, neighbor_id) AS rk FROM pairs)
    WHERE rk <= {_TOP_K}
    """,
)
def q87_ann_ivf_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q61's IVF probe with Hamming-1 multiprobe (9 cells/query; see
    comment block above). Same output contract as q61/q85."""
    e = load_table(spark, sf_dir, "embeddings")
    bucket = sum(
        (
            F.when(F.element_at("embedding", i + 1) >= 0, F.lit(1 << i))
            .otherwise(F.lit(0))
            for i in range(8)
        ),
        start=F.lit(0),
    )
    v = F.transform("embedding", lambda x: x.cast("double"))
    nrm = F.sqrt(F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))
    base = e.select("vec_id", bucket.alias("bucket"),
                    v.alias("v"), nrm.alias("nrm"))
    probe_buckets = F.array(
        F.col("bucket"),
        *[F.col("bucket").bitwiseXOR(F.lit(1 << i)) for i in range(8)])
    q = (base.filter(F.col("vec_id") < _N_QUERIES)
         .select(F.col("vec_id").alias("query_id"),
                 F.explode(probe_buckets).alias("pbucket"),
                 F.col("v").alias("qv"), F.col("nrm").alias("qn")))
    dot = F.aggregate(F.zip_with("qv", "v", lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    pairs = (
        F.broadcast(q).join(base, F.col("pbucket") == F.col("bucket"))
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"),
                F.round(dot / (F.col("qn") * F.col("nrm")), 4).alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(),
                                               "neighbor_id")
    return (
        pairs.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= _TOP_K)
    )
