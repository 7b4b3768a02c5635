"""Group F — sorts / limits / set operations (SURVEY.md §2 q30-q33).

Spark-first notes:

- q30 compiles to ``TakeOrderedAndProject`` — per-partition top-N then
  a driver merge of N·partitions rows; never a full global sort.
- Set ops are distinct-based (INTERSECT/EXCEPT semantics) — each is
  one hash aggregate + join under the hood; inputs here are already
  key-only projections so the shuffle carries minimal width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hearthstats_spark.io import load_tables
from hearthstats_spark.queries.registry import register


@register(
    "q30_sort_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def q30_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-N: orderBy+limit fuses into TakeOrderedAndProject
    (check the plan) — O(N) memory per partition, no global sort."""
    t = load_tables(spark, sf_dir, ("orders",))
    return (
        t["orders"]
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "q31_union",
    oracle="""
    WITH a AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
         b AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
    SELECT 'all' AS tag, COUNT(*) AS n FROM (SELECT * FROM a UNION ALL SELECT * FROM b)
    UNION ALL
    SELECT 'distinct' AS tag, COUNT(*) AS n FROM (SELECT * FROM a UNION SELECT * FROM b)
    """,
)
def q31_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL vs UNION DISTINCT over two overlapping key sets."""
    t = load_tables(spark, sf_dir, ("customer",))
    a = t["customer"].filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = t["customer"].filter(F.col("c_acctbal") > 5000).select("c_custkey")
    ua = a.unionByName(b).agg(
        F.lit("all").alias("tag"), F.count(F.lit(1)).alias("n")
    ).select("tag", "n")
    ud = a.unionByName(b).distinct().agg(
        F.lit("distinct").alias("tag"), F.count(F.lit(1)).alias("n")
    ).select("tag", "n")
    return ua.unionByName(ud)


@register(
    "q32_intersect",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def q32_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics) — BUILDING ∩ urgent-order keys."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    building = (
        t["customer"].filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    )
    urgent = (
        t["orders"].filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return building.intersect(urgent)


@register(
    "q33_except",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders
    WHERE o_orderpriority = '1-URGENT'
    """,
)
def q33_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics) — customers with no urgent orders.
    (Plain "no orders at all" is empty at every SF — full FK coverage,
    SURVEY.md §1.3 note 4 — so the subtrahend is filtered to keep the
    check non-trivial.)"""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    urgent = t["orders"].filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        t["customer"].select("c_custkey")
        .subtract(urgent.select(F.col("o_custkey").alias("c_custkey")))
    )
