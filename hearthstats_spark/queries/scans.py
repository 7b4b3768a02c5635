"""Group A/B — scans, projection, filters, predicates (SURVEY.md §2
q01-q04).

The reference's equivalent surface is its scrape->load->select ETL
path (SURVEY.md §1.1 [R]; reference checkout empty, no file:line
available — §0). Spark-first notes:

- q01/q02 are deliberately thin: they exist to prove column pruning
  and predicate pushdown reach the Parquet scan. ``explain`` must
  show ReadSchema with only the projected columns and PushedFilters
  with the date/size predicates — at 100 TB that is the difference
  between scanning 4 columns of a few row groups vs 11 columns of
  everything.
- Filters are plain Column expressions so Catalyst can fold, reorder
  and push them; no UDFs anywhere in the predicate path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hearthstats_spark.io import load_table
from hearthstats_spark.queries.registry import register


@register(
    "q01_scan_project",
    oracle="""
    SELECT l_orderkey, l_partkey, l_suppkey, l_returnflag
    FROM lineitem
    """,
)
def q01_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet scan + column projection (4 of 11 cols -> pruned read)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_returnflag")
    )


@register(
    "q02_scan_pushdown",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderday
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
    """,
)
def q02_scan_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered scan; predicate pushes to Parquet (PushedFilters shows
    a GtEq on o_orderdate -> row-group skipping at scale). Dates are
    emitted as strings so both engines hash identical values."""
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderday"),
        )
    )


@register(
    "q03_filter_complex",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_type, p_size
    FROM part
    WHERE p_size BETWEEN 5 AND 20
      AND p_brand IN ('Brand#1', 'Brand#7', 'Brand#13', 'Brand#19', 'Brand#25')
      AND p_type LIKE '%M%'
      AND p_name LIKE '%e%'
    """,
)
def q03_filter_complex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive + range + IN + LIKE predicates (domains verified
    against the generated part table: 25 brands 'Brand#N', 6 single-word
    types, p_size 1..50)."""
    part = load_table(spark, sf_dir, "part")
    return part.filter(
        F.col("p_size").between(5, 20)
        & F.col("p_brand").isin("Brand#1", "Brand#7", "Brand#13", "Brand#19", "Brand#25")
        & F.col("p_type").like("%M%")
        & F.col("p_name").like("%e%")
    ).select("p_partkey", "p_name", "p_brand", "p_type", "p_size")


@register(
    "q04_project_case",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount), 4) AS net_price,
           CASE WHEN l_extendedprice < 20000 THEN 'low'
                WHEN l_extendedprice < 60000 THEN 'mid'
                ELSE 'high' END AS price_band
    FROM lineitem
    """,
)
def q04_project_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed columns + CASE WHEN. Per-row arithmetic on identical
    f64 inputs is bit-deterministic; ROUND(…,4) on both sides."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("net_price"),
        F.when(F.col("l_extendedprice") < 20000, "low")
        .when(F.col("l_extendedprice") < 60000, "mid")
        .otherwise("high")
        .alias("price_band"),
    )
