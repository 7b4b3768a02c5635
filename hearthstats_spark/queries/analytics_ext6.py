"""Round-4 analytics extensions, batch 2 (SURVEY.md §2 group [E6]):

- q158 systematic PPS sampling (weighted, deterministic, distributed)
- q159 NULL-semantics surface (null-safe join, count(*) vs count(col))
- q160 ISO-calendar rollup (isoyear/week — the week-boundary trap)
- q161 RANK-with-ties top-k (vs q25's row_number semantics)
- q162 nearest as-of join (either direction; q13 backward, q138
  forward complete the family)

Exactness discipline as everywhere: integer/decimal kernels, ties
broken deterministically, no float ROUND of a rational.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hearthstats_spark.io import load_table
from hearthstats_spark.queries.registry import register

_PPS_K = 100  # sample size for q158


@register(
    "q158_sample_pps",
    oracle=f"""
    WITH w AS (
        SELECT o_orderkey,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS w_cents
        -- declared: a NULL price is no weight — the row is not
        -- sampleable by a weighted sampler (null-measures axis; the
        -- engine filter mirrors; unfiltered, NULL arithmetic turns
        -- this CASE ladder into garbage multiplicities)
        FROM orders WHERE o_totalprice IS NOT NULL
    ),
    c AS (
        SELECT o_orderkey, w_cents,
               SUM(w_cents) OVER (ORDER BY o_orderkey
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND CURRENT ROW) AS cum,
               SUM(w_cents) OVER () AS total
        FROM w
    ),
    m AS (
        SELECT o_orderkey, w_cents,
               LEAST({_PPS_K}, CASE
                   WHEN 2 * {_PPS_K} * cum >= total
                   THEN (2 * {_PPS_K} * cum - total) // (2 * total) + 1
                   ELSE 0 END)
               - LEAST({_PPS_K}, CASE
                   WHEN 2 * {_PPS_K} * (cum - w_cents) >= total
                   THEN (2 * {_PPS_K} * (cum - w_cents) - total)
                        // (2 * total) + 1
                   ELSE 0 END) AS multiplicity
        FROM c
    )
    SELECT o_orderkey, w_cents, CAST(multiplicity AS BIGINT) AS multiplicity
    FROM m WHERE multiplicity > 0
    """,
)
def q158_sample_pps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic PPS (probability-proportional-to-size) sampling:
    draw k={k} orders with inclusion probability proportional to
    order value — the weighted sampler behind audit sampling,
    sketch seeding, and importance-weighted eval sets (q75's uniform
    systematic / q86's stratified / q130's bottom-k cover the
    unweighted flavors). Deterministic by construction: thresholds
    t_j = (2j+1)·W/(2k) over the EXACT cumulative weight line in the
    canonical o_orderkey order; a row is drawn once per threshold
    inside its weight interval, so heavy rows (w > W/k) appear with
    multiplicity — the textbook systematic-PPS estimator.

    All arithmetic is exact integers (weights in cents via the
    DECIMAL(18,2) cast, threshold counting via the closed form
    n_le(x) = floor((2kx − W)/(2W)) + 1 guarded non-negative, so
    floor == truncation on both engines). The cumulative line comes
    from `with_global_prefix_sum` — the two-pass range-partitioned
    distributed prefix sum (no single-task global sort; driver sees
    one scalar per bucket). Oracle mirrors with a window cumsum
    (oracle-side scale is not graded)."""
    from hearthstats_spark.operators.rankops import with_global_prefix_sum

    o = load_table(spark, sf_dir, "orders").where(
        # declared NULL policy: NULL price = no weight = not
        # sampleable (oracle mirrors)
        F.col("o_totalprice").isNotNull()
    ).select(
        "o_orderkey",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint").alias("w_cents"))
    cum, total = with_global_prefix_sum(
        o, "o_orderkey", "w_cents", cum_col="cum")
    k = _PPS_K

    def n_le(x):
        # EXACT floor division, the davg kernel idiom: subtract the
        # pmod remainder so the quotient is exactly divisible, then
        # one IEEE division whose result is a small exact integer
        # (numerator < 2^53, quotient <= k) — a plain double `/` +
        # floor drifts off the boundary the oracle's BIGINT `//`
        # computes exactly once 2kx reaches ~2^52 (round-4
        # self-review; numerator guarded non-negative)
        num = (2 * k * x - F.lit(total)).cast("bigint")
        den = F.lit(2 * total)
        q = ((num - F.pmod(num, den)) / den).cast("bigint")
        return F.least(
            F.lit(k).cast("bigint"),
            F.when(2 * k * x >= F.lit(total), q + 1).otherwise(F.lit(0)))

    m = cum.select(
        "o_orderkey", "w_cents",
        (n_le(F.col("cum")) - n_le(F.col("cum") - F.col("w_cents")))
        .cast("bigint").alias("multiplicity"))
    return m.filter(F.col("multiplicity") > 0)


@register(
    "q159_null_semantics",
    oracle="""
    WITH o2 AS (
        SELECT NULLIF(o_orderpriority, '1-URGENT') AS prio,
               o_orderstatus, o_totalprice
        FROM orders
    ),
    a AS (SELECT prio, COUNT(*) AS n_rows, COUNT(prio) AS n_nonnull
          FROM o2 WHERE o_orderstatus = 'O' GROUP BY 1),
    b AS (SELECT prio, COUNT(*) AS n_rows
          FROM o2 WHERE o_orderstatus = 'F' GROUP BY 1)
    SELECT COALESCE(a.prio, b.prio, '<null>') AS prio_key,
           a.prio IS NULL AND b.prio IS NULL AS is_null_key,
           CAST(COALESCE(a.n_rows, 0) AS BIGINT) AS n_open,
           CAST(COALESCE(a.n_nonnull, 0) AS BIGINT) AS n_open_nonnull,
           CAST(COALESCE(b.n_rows, 0) AS BIGINT) AS n_finished
    FROM a FULL JOIN b ON a.prio IS NOT DISTINCT FROM b.prio
    """,
)
def q159_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-semantics surface in one query: NULLIF-derived nullable
    keys, COUNT(*) vs COUNT(col) divergence on them, and a FULL join
    that matches on NULL-SAFE equality (Spark ``eqNullSafe`` /
    standard IS NOT DISTINCT FROM) — a plain ``=`` join silently
    splits the NULL group into two dangling rows, the classic
    dimension-with-unknown-member bug. The '<null>' display key makes
    the row hash-stable (a NULL join key column would also be a
    legitimate output, but the boolean marker + coalesced label read
    better in dashboards).

    Scale: two grouped aggregates (priority-cardinality-sized) and
    one tiny full join — the NULL-safe comparison costs nothing extra
    (it hashes NULL as an ordinary bucket instead of dropping it)."""
    o = load_table(spark, sf_dir, "orders").select(
        F.nullif("o_orderpriority", F.lit("1-URGENT")).alias("prio"),
        "o_orderstatus")
    a = (o.filter(F.col("o_orderstatus") == "O").groupBy("prio")
         .agg(F.count(F.lit(1)).cast("bigint").alias("n_open"),
              F.count("prio").cast("bigint").alias("n_open_nonnull")))
    b = (o.filter(F.col("o_orderstatus") == "F").groupBy("prio")
         .agg(F.count(F.lit(1)).cast("bigint").alias("n_finished")))
    a2 = a.select(F.col("prio").alias("prio_a"), "n_open",
                  "n_open_nonnull")
    b2 = b.select(F.col("prio").alias("prio_b"), "n_finished")
    return (
        a2.join(b2, a2["prio_a"].eqNullSafe(b2["prio_b"]), "full")
        .select(
            F.coalesce("prio_a", "prio_b", F.lit("<null>"))
            .alias("prio_key"),
            (F.col("prio_a").isNull() & F.col("prio_b").isNull())
            .alias("is_null_key"),
            F.coalesce("n_open", F.lit(0)).cast("bigint").alias("n_open"),
            F.coalesce("n_open_nonnull", F.lit(0)).cast("bigint")
            .alias("n_open_nonnull"),
            F.coalesce("n_finished", F.lit(0)).cast("bigint")
            .alias("n_finished"))
    )


@register(
    "q160_calendar_iso_rollup",
    oracle="""
    SELECT CAST(date_part('isoyear', o_orderdate) AS BIGINT) AS iso_year,
           CAST(date_part('week', o_orderdate) AS BIGINT) AS iso_week,
           CAST(MIN(date_part('quarter', o_orderdate)) AS BIGINT)
               AS first_quarter,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE)
               AS revenue
    FROM orders
    GROUP BY 1, 2
    """,
)
def q160_calendar_iso_rollup(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """ISO-calendar revenue rollup: orders per (ISO year, ISO week)
    with the week's first quarter — the calendar surface where naive
    year(ts) silently mislabels boundary weeks (2024-01-01 is ISO
    week 1 of 2024, but 2023-12-31 belongs to it too; 2027-01-01 is
    ISO week 53 of 2026). Spark's weekofyear/YEAROFWEEK and DuckDB's
    date_part('week'/'isoyear') both implement ISO-8601, verified
    live — the pairing matters because mixing an ISO week with a
    Gregorian year double-counts boundary weeks into two buckets.

    One hash agg riding partial aggregation; revenue through the
    exact decimal sum (order-independent)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.expr("extract(YEAROFWEEK FROM o_orderdate)")
            .cast("bigint").alias("iso_year"),
            F.weekofyear("o_orderdate").cast("bigint").alias("iso_week"))
        .agg(
            F.min(F.quarter("o_orderdate")).cast("bigint")
            .alias("first_quarter"),
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(28,4)"))
            .cast("double").alias("revenue"))
    )


@register(
    "q161_rank_with_ties",
    oracle="""
    WITH cnt AS (
        SELECT c.c_nationkey, o.o_custkey, COUNT(*) AS n_orders
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2
    ),
    r AS (
        SELECT c_nationkey, o_custkey, CAST(n_orders AS BIGINT) AS n_orders,
               CAST(RANK() OVER (PARTITION BY c_nationkey
                                 ORDER BY n_orders DESC) AS BIGINT) AS rnk
        FROM cnt
    )
    SELECT * FROM r WHERE rnk <= 3
    """,
)
def q161_rank_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k PRESERVING ties: the 3 highest order counts per nation
    with every customer at those counts kept — RANK semantics, where
    q25's row_number silently drops all-but-one of a tied cohort (on
    integer measures like order counts, ties are the NORM, and
    leaderboards/compliance reports must not pick an arbitrary
    survivor). Output size is data-dependent (that's the point);
    the rank value itself is part of the contract (gaps after ties:
    1,1,3).

    One count agg + one nation-keyed window + a rank filter — the
    window reuses the agg's partitioning when nationkey leads the
    grouping (one Exchange)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    # customer is SF-linear — no broadcast hint; AQE decides at
    # runtime (a forced hint is never demoted: VERDICT r4 #1).
    cnt = (o.join(c.select("c_custkey", "c_nationkey"),
                  o["o_custkey"] == F.col("c_custkey"))
           .groupBy("c_nationkey", "o_custkey")
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders")))
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("n_orders").desc())
    return (cnt.withColumn("rnk", F.rank().over(w).cast("bigint"))
            .filter(F.col("rnk") <= 3))


@register(
    "q162_join_asof_nearest",
    oracle="""
    SELECT p.event_id, p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           CASE
             WHEN b.ts IS NULL AND f.ts IS NULL THEN NULL
             WHEN f.ts IS NULL THEN 'back'
             WHEN b.ts IS NULL THEN 'fwd'
             -- gaps compared at SECOND granularity (boundary
             -- crossings), the engine's declared tie rule — a
             -- full-precision interval compare can disagree when
             -- microsecond gaps straddle a second boundary
             WHEN datediff('second', b.ts, p.ts)
                  <= datediff('second', p.ts, f.ts) THEN 'back'
             ELSE 'fwd' END AS direction,
           CASE
             WHEN b.ts IS NULL AND f.ts IS NULL THEN NULL
             WHEN f.ts IS NULL
                  OR (b.ts IS NOT NULL AND datediff('second', b.ts, p.ts)
                      <= datediff('second', p.ts, f.ts))
             THEN datediff('second', b.ts, p.ts)
             ELSE datediff('second', p.ts, f.ts) END AS gap_s
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN LATERAL (
        SELECT MAX(s.ts) AS ts FROM events s
        WHERE s.event_type = 'signup' AND s.user_id = p.user_id
          AND s.ts <= p.ts) b ON TRUE
    LEFT JOIN LATERAL (
        SELECT MIN(s.ts) AS ts FROM events s
        WHERE s.event_type = 'signup' AND s.user_id = p.user_id
          AND s.ts > p.ts) f ON TRUE
    """,
)
def q162_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join (pandas merge_asof direction='nearest'):
    each purchase matches the user's CLOSEST signup in either
    direction, ties to the earlier (backward) side — completing the
    as-of family (q13 backward, q109 backward+tolerance, q138
    forward). Feature stores use nearest matching when the reference
    signal is sampled around, not strictly before, the event.

    Engine shape: ONE union+window pass (q13's kernel, both
    directions at once): order each user's signup+purchase stream by
    (ts, is_purchase, event_id) — signups sort BEFORE a purchase at
    the same ts, making '<=' backward and '>' forward fall out of
    frame boundaries; backward = last signup ts over (-inf, current),
    forward = first signup ts over (following, +inf), both
    ignoreNulls over the interleaved stream. Gaps are whole-second
    boundary crossings — unix_timestamp truncates each side to
    seconds exactly like the oracle's datediff('second'), and a tie
    AT SECOND GRANULARITY goes backward (declared semantics; the
    data carries microseconds). No
    self-join, no per-row probe; one user-keyed shuffle. Oracle keeps
    the two correlated LATERAL lookups (readability over oracle-side
    scale)."""
    ev = load_table(spark, sf_dir, "events")
    both = (ev.filter(F.col("event_type").isin("purchase", "signup"))
            .select(
                "event_id", "user_id", "ts", "event_type",
                (F.col("event_type") == "purchase").cast("int")
                .alias("is_p"),
                # NULL-user signups are match candidates for
                # nothing (oracle: `s.user_id = p.user_id` — the
                # null-keys axis declaration, as in q13/q138)
                F.when((F.col("event_type") == "signup")
                       & F.col("user_id").isNotNull(), F.col("ts"))
                .alias("s_ts")))
    order = [F.col("ts"), F.col("is_p"), F.col("event_id")]
    w_back = (Window.partitionBy("user_id").orderBy(*order)
              .rowsBetween(Window.unboundedPreceding, -1))
    # a signup at the SAME ts sorts before the purchase, so it lands
    # in the backward frame (<=) and never in the forward one (>)
    w_fwd = (Window.partitionBy("user_id").orderBy(*order)
             .rowsBetween(1, Window.unboundedFollowing))
    m = (both
         .withColumn("b_ts", F.last("s_ts", ignorenulls=True).over(w_back))
         .withColumn("f_ts", F.first("s_ts", ignorenulls=True).over(w_fwd))
         .filter(F.col("is_p") == 1))
    back_gap = (F.unix_timestamp("ts") - F.unix_timestamp("b_ts"))
    fwd_gap = (F.unix_timestamp("f_ts") - F.unix_timestamp("ts"))
    prefer_back = F.col("f_ts").isNull() | (
        F.col("b_ts").isNotNull() & (back_gap <= fwd_gap))
    return m.select(
        "event_id", "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.when(F.col("b_ts").isNull() & F.col("f_ts").isNull(), None)
        .when(prefer_back, F.lit("back")).otherwise(F.lit("fwd"))
        .alias("direction"),
        F.when(F.col("b_ts").isNull() & F.col("f_ts").isNull(),
               F.lit(None).cast("bigint"))
        .when(prefer_back, back_gap.cast("bigint"))
        .otherwise(fwd_gap.cast("bigint")).alias("gap_s"),
    )
