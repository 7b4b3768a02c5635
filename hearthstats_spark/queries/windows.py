"""Group E — window functions (SURVEY.md §2 q24-q29).

Reference surface: deck rankings / top-decks-per-class reports
(SURVEY.md §1.1 [R]). Spark-first notes:

- Every window here partitions by a real key (event_type, user_id,
  customer) so the sort is per-partition and scales; the two global
  windows (q28 cumulative, q29 ntile) first reduce cardinality
  (per-day pre-aggregation) or are explicitly flagged: a global
  ORDER BY window is a single-task sort and must stay small at
  100 TB (pre-aggregate, or bucket by range first).
- Orderings always carry a unique tie-break column — required for
  cross-engine hash equality and good practice anyway.
- q25 (rank-filter top-k) is the scalable alternative to per-group
  sort+limit: one shuffle, no driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hearthstats_spark.io import load_table
from hearthstats_spark.queries.registry import register

DEC = "decimal(28,4)"


@register(
    "q24_win_rank",
    oracle="""
    SELECT event_id, event_type, value,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
           CAST(RANK() OVER w AS BIGINT) AS rnk,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY value DESC, event_id)
    """,
)
def q24_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking trio per event_type; event_id tie-break makes row_number
    deterministic (value alone has duplicates)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").desc(), F.col("event_id")
    )
    return ev.select(
        "event_id", "event_type", "value",
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
    )


@register(
    "q25_win_topk",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
)
def q25_win_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via rank-filter — the 100 TB-safe
    top-k-per-group pattern (single shuffle on the group key; no
    per-group sort+limit on the driver)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_custkey", "o_orderkey", "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "q26_win_lag",
    oracle="""
    SELECT event_id, user_id,
           CAST(epoch(date_trunc('second', ts)) AS BIGINT)
             - LAG(CAST(epoch(date_trunc('second', ts)) AS BIGINT))
               OVER w AS sec_since_prev,
           LEAD(event_type) OVER w AS next_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q26_win_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead per user ordered by time. Timestamps are floored to
    whole epoch-seconds on both engines before differencing (ns vs µs
    precision rule, SURVEY.md §1.3 note 1)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    secs = F.unix_timestamp("ts")
    return ev.select(
        "event_id", "user_id",
        (secs - F.lag(secs).over(w)).alias("sec_since_prev"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@register(
    "q27_win_moving",
    oracle=f"""
    SELECT event_id, user_id,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(28,4))) OVER w AS DOUBLE)
                 / COUNT(*) OVER w, 4) AS mov_avg_5
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    """,
)
def q27_win_moving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-row moving average per user. Exact decimal sum / count keeps
    the frame aggregate order-independent (hash-stable)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    return ev.select(
        "event_id", "user_id",
        F.round(
            F.sum(F.col("value").cast(DEC)).over(w).cast("double")
            / F.count(F.lit(1)).over(w),
            4,
        ).alias("mov_avg_5"),
    )


@register(
    "q78_win_range_frame",
    oracle="""
    SELECT event_id, user_id,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_last_hour,
           CAST(SUM(CAST(value AS DECIMAL(28,4))) OVER w AS DOUBLE)
               AS sum_last_hour
    FROM events
    WINDOW w AS (PARTITION BY user_id
                 ORDER BY epoch(date_trunc('second', ts))
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
)
def q78_win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour per-user stats via a RANGE frame — the
    time-interval sibling of q27's ROWS frame: the frame holds every
    event within 3600 s of the current one, however many rows that
    is. Ordered by whole epoch-seconds (ns vs µs precision rule,
    SURVEY.md §1.3 note 1); RANGE frames include ALL ties of the
    boundary value on both engines, so no tie-break column is needed
    for determinism. Partitioned by user — per-partition sort, scales
    like every other keyed window."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, Window.currentRow)
    )
    return ev.select(
        "event_id", "user_id",
        F.count(F.lit(1)).over(w).cast("long").alias("n_last_hour"),
        F.sum(F.col("value").cast(DEC)).over(w).cast("double")
        .alias("sum_last_hour"),
    )


@register(
    "q28_win_cumulative",
    oracle="""
    WITH daily AS (
        SELECT strftime(o_orderdate, '%Y-%m-%d') AS order_day,
               SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS day_rev
        FROM orders GROUP BY 1
    )
    SELECT order_day,
           CAST(day_rev AS DOUBLE) AS day_revenue,
           CAST(SUM(day_rev) OVER (ORDER BY order_day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS cum_revenue
    FROM daily
    """,
)
def q28_win_cumulative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running revenue over order days. Pre-aggregates to one row per
    day *before* the global cumulative window — the global sort then
    touches ~2.4k rows regardless of fact-table size (100 TB-safe),
    instead of a single-task sort over every order."""
    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day"))
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).alias("day_rev"))
    )
    w = Window.orderBy("order_day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return daily.select(
        "order_day",
        F.col("day_rev").cast("double").alias("day_revenue"),
        F.sum("day_rev").over(w).cast("double").alias("cum_revenue"),
    )


@register(
    "q29_win_ntile",
    oracle="""
    SELECT o_orderkey,
           CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume
    FROM orders
    -- NULLS FIRST: the rank kernel's declared NULL placement
    -- (operators/rankops — NULL order values land in bucket 0 and
    -- Spark's window sorts NULLS FIRST; DuckDB's bare ASC default
    -- is NULLS LAST, so the order must be stated)
    WINDOW w AS (ORDER BY o_totalprice NULLS FIRST, o_orderkey)
    """,
)
def q29_win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution functions (ntile/percent_rank/cume_dist) over a
    global ordering WITHOUT a global single-task sort — the two-pass
    range-partitioned formulation:

    1. approxQuantile picks ~32 range boundaries on o_totalprice
       (driver receives 31 scalars — metadata, like any range
       partitioner); rows map to buckets with a codegen'd comparison
       chain. Equal prices always share a bucket, so bucket ranges
       respect the global (price, orderkey) order.
    2. exact per-bucket counts (one tiny aggregate, ≤32 rows to the
       driver) become each bucket's global-rank offset and the exact
       total n — broadcast-joined back.
    3. a PER-BUCKET window (partitionBy bucket) computes local
       row_number; global position = offset + local rank. The
       ordering (price, orderkey) is unique, so rank == row_number
       and the closed forms are exact: pct_rank = (pos-1)/(n-1),
       cume = pos/n, and NTILE's first n%4 tiles take ceil(n/4) rows.

    Every window in the plan partitions by a real key; the sort is
    per-bucket and the bucket count scales with the data (boundaries
    are quantiles, so buckets stay balanced under value skew).
    Hash-exact vs the single-window oracle.

    Implementation: hearthstats_spark.operators.rankops
    (with_global_position) — q75 shares the same two-pass kernel."""
    from hearthstats_spark.operators.rankops import with_global_position

    o = load_table(spark, sf_dir, "orders")
    pos_df, n = with_global_position(
        o.select("o_orderkey", "o_totalprice"),
        "o_totalprice", tiebreak=["o_orderkey"],
    )
    q4, r4 = divmod(n, 4)
    tile = F.when(
        F.col("__pos") <= r4 * (q4 + 1),
        F.ceil(F.col("__pos") / (q4 + 1)),
    ).otherwise(r4 + F.ceil((F.col("__pos") - r4 * (q4 + 1)) / F.lit(max(q4, 1))))
    return pos_df.select(
        "o_orderkey",
        tile.cast("long").alias("quartile"),
        F.round((F.col("__pos") - 1) / F.lit(max(n - 1, 1)), 6)
        .alias("pct_rank"),
        F.round(F.col("__pos") / F.lit(n), 6).alias("cume"),
    )
