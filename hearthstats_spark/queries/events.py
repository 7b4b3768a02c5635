"""Group H (batch forms) — event-time windows over the events table
(SURVEY.md §2 q41-q43).

These are the oracle-checked batch twins of the Structured Streaming
pipeline (streaming/pipeline.py, s03/s04): ``F.window`` /
``F.session_window`` work identically on batch DataFrames, so the
same expressions are checked here against gaps-and-islands /
bucket-expansion SQL, then reused streaming-side where DuckDB has no
oracle.

Scale notes: tumbling/sliding window aggs are plain hash aggregates
on (window, keys) — partial+final, shuffle carries one row per
bucket. Session windows shuffle once on user_id then merge sorted
runs per key — the same cost as the ASOF operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hearthstats_spark.functions import fsum_sql
from hearthstats_spark.io import load_table
from hearthstats_spark.queries.registry import register

DEC = "decimal(28,4)"


@register(
    "q41_win_tumbling",
    oracle=f"""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour_start,
           event_type,
           COUNT(*) AS n,
           {fsum_sql('value', 'total_value')}
    FROM events GROUP BY 1, 2
    """,
)
def q41_win_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window × event_type; window.start projected as
    a minute string (ns/µs hashing rule)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm").alias("hour_start"),
            "event_type", "n", "total_value",
        )
    )


@register(
    "q42_win_sliding",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL '15 minutes', ts)
                    - k.k * INTERVAL '15 minutes', '%Y-%m-%d %H:%M')
               AS win_start,
           COUNT(*) AS n
    FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) k
    GROUP BY 1
    """,
)
def q42_win_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1 h length, 15 min slide) — each event lands in
    4 windows; the oracle expands the same 4 buckets explicitly."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm").alias("win_start"),
            "n",
        )
    )


@register(
    "q43_win_session",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM ordered
    ),
    per_session AS (
        SELECT user_id, sid,
               CAST(epoch(date_trunc('second', MAX(ts)))
                    - epoch(date_trunc('second', MIN(ts))) AS BIGINT) AS dur_sec
        FROM sessions GROUP BY user_id, sid
    )
    SELECT user_id,
           COUNT(*) AS n_sessions,
           CAST(SUM(dur_sec) AS BIGINT) AS total_dur_sec,
           ROUND(CAST(SUM(dur_sec) AS DOUBLE) / COUNT(*), 4) AS avg_dur_sec
    FROM per_session GROUP BY user_id
    """,
)
def q43_win_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min gap) per user: session count + durations.
    The oracle is the classic gaps-and-islands formulation. NOTE
    Spark's session_window starts a NEW session when the gap is >= the
    gap duration (window end = last_ts + gap is exclusive), so the
    oracle's island-break condition is ``>=`` too (verified in
    tests/test_operators.py with exact 30-min gaps)."""
    ev = load_table(spark, sf_dir, "events")
    per_session = (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts")))
            .alias("dur_sec")
        )
    )
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("dur_sec").alias("total_dur_sec"),
        F.round(F.sum("dur_sec").cast("double") / F.count(F.lit(1)), 4)
        .alias("avg_dur_sec"),
    )


@register(
    "q82_funnel_steps",
    oracle="""
    WITH e AS (SELECT user_id, event_type,
                      epoch(date_trunc('second', ts)) AS sec
               FROM events),
         s1 AS (SELECT user_id, MIN(sec) AS t1
                FROM e WHERE event_type = 'view' GROUP BY user_id),
         s2 AS (SELECT e.user_id, MIN(e.sec) AS t2
                FROM e JOIN s1 ON e.user_id = s1.user_id
                WHERE e.event_type = 'click' AND e.sec > s1.t1
                GROUP BY e.user_id),
         s3 AS (SELECT e.user_id, MIN(e.sec) AS t3
                FROM e JOIN s2 ON e.user_id = s2.user_id
                WHERE e.event_type = 'purchase' AND e.sec > s2.t2
                GROUP BY e.user_id)
    SELECT CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n_viewed,
           CAST((SELECT COUNT(*) FROM s2) AS BIGINT) AS n_clicked_after,
           CAST((SELECT COUNT(*) FROM s3) AS BIGINT) AS n_purchased_after
    """,
)
def q82_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view → click → purchase): users counted at a
    stage only if that event happens strictly AFTER their first event
    of the previous stage — the sequential-pattern query engines with
    MATCH_RECOGNIZE express directly; Spark's formulation is staged
    min-aggregates: t1 = min(view), t2 = min(click > t1),
    t3 = min(purchase > t2).

    Timestamps floor to whole epoch-seconds on both engines before
    comparing (ns vs µs precision rule, SURVEY.md §1.3 note 1).

    Scale notes: three hash aggregates + two joins, ALL keyed on
    user_id — after the first shuffle every stage reuses the same
    hash partitioning, so this is one wide shuffle plus co-located
    narrow stages at any data size. One summary row out."""
    # optimization round 11 (guide §2.4): the staged-join form read
    # events once per stage and joined each stage back on user_id —
    # 6 scans / 8 exchanges at 3 stages. All three stage thresholds
    # are per-user unbounded mins, so they chain as window functions
    # over ONE user_id exchange: t1 = min(view), t2 = min(click
    # where sec > t1) — t1 is constant within the partition, so the
    # conditional min over the same window is exactly the staged
    # semi-join semantics — and t3 likewise over t2. One scan (the
    # funnel types filtered at the parquet scan), one exchange, one
    # sort; the per-user rollup and the 1-row count reuse the window
    # partitioning. Interleaved A/B at sf0.1 before adopting.
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_timestamp("ts").alias("sec")
    ).filter(F.col("event_type").isin("view", "click", "purchase"))
    w = Window.partitionBy("user_id")
    # NULL-key discipline (ADVICE r11, high): Window.partitionBy
    # treats NULL user_id as a real partition, but the oracle's s2/s3
    # stage JOINS are NULL-matches-nothing equality — a NULL user may
    # appear in s1 (GROUP BY keeps the NULL group → n_viewed counts
    # it) yet can never progress to s2/s3. Gate t2/t3 on a non-null
    # key so the window form keeps the staged-join semantics on the
    # --null-keys degenerate axis (repro: one NULL-user
    # view→click→purchase chain read (2,2,2) engine vs (2,1,1)
    # oracle before this guard).
    staged = (
        ev.withColumn(
            "t1", F.min(F.when(F.col("event_type") == "view",
                               F.col("sec"))).over(w))
        .withColumn(
            "t2", F.min(F.when(F.col("user_id").isNotNull()
                               & (F.col("event_type") == "click")
                               & (F.col("sec") > F.col("t1")),
                               F.col("sec"))).over(w))
        .withColumn(
            "t3", F.min(F.when(F.col("user_id").isNotNull()
                               & (F.col("event_type") == "purchase")
                               & (F.col("sec") > F.col("t2")),
                               F.col("sec"))).over(w))
    )
    per_user = staged.groupBy("user_id").agg(
        F.max("t1").alias("t1"), F.max("t2").alias("t2"),
        F.max("t3").alias("t3"))
    return per_user.agg(
        F.count("t1").alias("n_viewed"),
        F.count("t2").alias("n_clicked_after"),
        F.count("t3").alias("n_purchased_after"))
