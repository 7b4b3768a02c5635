"""Round-5 batch: scale-path siblings of exact operators.

q177 pairs with q176 the way q151 pairs with q100 and q139/q140 pair
with their exact anchors: the exact kernel is the truth the tests pin
against; the sketch kernel is what a 100 TB monitoring deployment
actually runs. One truth, two kernels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hearthstats_spark.io import load_table
from hearthstats_spark.queries.registry import register


@register("q177_ks_sketch_drift", oracle=None)  # rows-only: GK cut
# placement is engine-specific (DuckDB can't reproduce Spark's
# sketch), so the driver gets a rows-only check; the REAL check is
# tests/test_ext8.py pinning q176's exact D inside [d_est, d_upper].
def q177_ks_sketch_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate two-sample Kolmogorov–Smirnov drift monitor — the
    100 TB answer beside q176's exact statistic (VERDICT r4 item 7).

    q176 is exact but needs the full range-partitioned prefix-sum
    machinery (a per-value sort). A drift MONITOR re-run per
    ingestion batch wants the mergeable-sketch shape instead:

    1. ONE aggregation builds a Greenwald–Khanna quantile sketch of
       the pooled value column (``approx_percentile`` — Spark's GK
       is exactly the mergeable per-partition-then-merge sketch a
       1000-executor scan produces) and emits B-1 cut points.
    2. ONE more aggregation bins every row JVM-side — bucket index =
       #cuts strictly below v, an O(B) ``F.aggregate`` over the
       broadcast cut array, no shuffle inflation — and counts each
       side per bucket: the only shuffle is ≤(B+1) rows of partial
       counts.

    The counts AT the cut points are exact; only cut PLACEMENT is
    approximate, and that affects tightness, not validity:

    - ``ks_d_est``  = max_j |F0(c_j) − F1(c_j)|  ≤  D_exact
      (a max over a subset of the sup's candidate points);
    - ``ks_d_upper``: inside bucket j both CDFs move monotonically by
      their bucket mass, so sup_{v∈bucket} |F0−F1| ≤ |F0−F1| at the
      left edge + max(mass0, mass1) of the bucket — a DATA-DRIVEN
      bound from the same counts, no sketch-error constants. Hence
      d_est ≤ D_exact ≤ d_upper, pinned against q176 in tests.

    All comparisons stay in exact integers (d_num = |c0·n1 − c1·n0|,
    the q176 discipline); the two IEEE divisions happen once, on the
    final scalars. The post-aggregation window runs over ≤B+1 rows —
    the allowlisted scalar-frame shape, never the raw table."""
    B = 64
    o = load_table(spark, sf_dir, "orders")
    s = o.select(
        F.col("o_totalprice").cast("double").alias("v"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 0).otherwise(1)
        .alias("g"))

    # pass 1 — the mergeable GK sketch; B-1 pooled quantile cuts
    cuts = sorted(set(s.agg(F.percentile_approx(
        "v", [i / B for i in range(1, B)], 10_000).alias("c"))
        .head()["c"]))
    cut_arr = F.array(*[F.lit(float(c)) for c in cuts])

    # pass 2 — exact per-side bucket masses (bucket j = (c_{j-1}, c_j])
    counts = (
        s.select(
            F.aggregate(
                cut_arr, F.lit(0),
                lambda acc, c: acc
                + F.when(F.col("v") > c, 1).otherwise(0)).alias("b"),
            "g")
        .groupBy("b")
        .agg(F.sum(F.when(F.col("g") == 0, 1).otherwise(0)).alias("m0"),
             F.sum(F.when(F.col("g") == 1, 1).otherwise(0)).alias("m1"))
    )

    w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding,
                                        Window.currentRow)
    tot = Window.rowsBetween(Window.unboundedPreceding,
                             Window.unboundedFollowing)
    lagw = Window.orderBy("b")
    scored = (
        counts
        .withColumn("c0", F.sum("m0").over(w))
        .withColumn("c1", F.sum("m1").over(w))
        .withColumn("n0", F.sum("m0").over(tot))
        .withColumn("n1", F.sum("m1").over(tot))
        # |F0-F1| at the bucket's RIGHT edge, as an exact integer
        # numerator over n0*n1 (at the last bucket's +inf edge it is
        # 0 by construction — harmless in the max)
        .withColumn("d_num",
                    F.abs(F.col("c0") * F.col("n1")
                          - F.col("c1") * F.col("n0")))
        # left-edge |F0-F1| + the bucket's larger side-mass bounds
        # the sup INSIDE the bucket
        .withColumn("bound_num",
                    F.coalesce(F.lag("d_num").over(lagw), F.lit(0))
                    + F.greatest(F.col("m0") * F.col("n1"),
                                 F.col("m1") * F.col("n0")))
    )
    return scored.agg(
        F.max("n0").cast("bigint").alias("n_urgent"),
        F.max("n1").cast("bigint").alias("n_other"),
        F.lit(len(cuts)).cast("int").alias("n_cuts"),
        (F.max("d_num") / (F.max("n0") * F.max("n1")))
        .alias("ks_d_est"),
        (F.max("bound_num") / (F.max("n0") * F.max("n1")))
        .alias("ks_d_upper"),
    )
