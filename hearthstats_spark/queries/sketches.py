"""Group L — mergeable sketches (q84): the datasketches HLL rollup
pattern a 100 TB pipeline uses for distinct counts.

The scale argument is the MERGE: per-shard (here per-nation) sketches
are tiny fixed-size register arrays that union losslessly and
order-independently (register-wise max), so distinct-count rollups
compose bottom-up — per-partition sketch → shuffle only the sketch
bytes (KB, not the key set) → union at the coarser level. At 100 TB
the exact alternative (`count_distinct`) shuffles every distinct key;
the sketch shuffles a few KB per group and re-aggregates to any
rollup level without rescanning. Spark ships Apache DataSketches HLL
natively: `hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`
(SPARK-16484, public API since 3.5).

Rows-only check: the estimate is engine-specific (DuckDB's
approx_count_distinct is a different HLL implementation), so there is
no cross-engine oracle; instead the query carries its own exact
distinct counts and relative error, and tests/test_sketches.py pins
(a) rel_err < 2 % per region at the default lgConfigK=12 and (b) the
two-level nation→region merge estimate == the direct region-level
sketch estimate (merge losslessness — the property that makes the
pattern safe to roll up).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hearthstats_spark.io import load_table
from hearthstats_spark.queries.registry import register


def hll_rollup(df: DataFrame, fine_keys: list[str], coarse_keys: list[str],
               value_col: str) -> DataFrame:
    """Two-level distinct-count rollup: per-``fine_keys`` HLL sketches,
    union-merged up to ``coarse_keys``. Returns coarse keys +
    ``est_distinct``. Both aggregations ride Spark's partial/final
    pair; only sketch bytes cross the second shuffle."""
    fine = df.groupBy(*fine_keys).agg(
        F.hll_sketch_agg(value_col).alias("__sk"))
    return fine.groupBy(*coarse_keys).agg(
        F.hll_sketch_estimate(F.hll_union_agg("__sk"))
        .alias("est_distinct"))


@register("q84_sketch_hll_rollup", oracle=None)  # rows-only: HLL estimate is engine-specific
def q84_sketch_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct customers per region two ways: nation-level HLL
    sketches union-merged to region (the rollup path a 100 TB
    pipeline takes) next to the exact count (feasible at test scale),
    with relative error. Self-verifying; see module docstring for why
    this is rows-only."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")

    cn = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    est = hll_rollup(cn, ["n_regionkey", "n_nationkey"], ["n_regionkey"],
                     "c_custkey")
    # customers live in exactly one nation and c_custkey is unique, so
    # summing per-nation exact distincts gives the exact region count
    # without a second wide shuffle
    exact = (cn.groupBy("n_regionkey")
             .agg(F.count_distinct("c_custkey").alias("exact_distinct")))
    return (
        est.join(exact, "n_regionkey")
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            "r_name",
            F.col("est_distinct").cast("long").alias("est_customers"),
            "exact_distinct",
            F.round(
                F.abs(F.col("est_distinct") - F.col("exact_distinct"))
                / F.col("exact_distinct"), 4).alias("rel_err"))
        .orderBy("r_name")
    )
