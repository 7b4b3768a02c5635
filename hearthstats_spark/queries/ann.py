"""Group K — approximate-nearest-neighbor search (q61): IVF-style
bucketed probe over the embedding column.

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
