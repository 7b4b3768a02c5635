"""Group C — joins (SURVEY.md §2 q05-q14).

Reference surface: deck ⋈ card / deck_cards bridge joins in the
scrape→SQLite ETL (SURVEY.md §1.1 [R]; reference checkout was empty,
no file:line exists — §0). Spark-first notes:

- Dimension tables (region/nation/customer at these ratios) sit far
  under the broadcast threshold; AQE picks broadcast-hash joins on
  its own, q11 pins it explicitly with ``F.broadcast``.
- q12 keeps the equi key in the join condition so Catalyst plans a
  hash/sort-merge join with the theta predicate as a post-join
  residual — never a pure nested loop over the full cross product.
- q13 ASOF is the one operator stock Spark lacks; implemented as a
  library op (one shuffle + one sort, see operators/asof.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hearthstats_spark.functions import dsum, fsum_sql
from hearthstats_spark.io import load_table, load_tables
from hearthstats_spark.operators.asof import asof_join
from hearthstats_spark.queries.registry import register


@register(
    "q05_join_inner",
    oracle="""
    SELECT o_orderkey, c_custkey, c_name, o_totalprice
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def q05_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join fact⋈dim; AQE turns this into a broadcast-hash
    join at these size ratios (customer ≪ threshold)."""
    t = load_tables(spark, sf_dir, ("orders", "customer"))
    return (
        t["orders"]
        .join(t["customer"], t["orders"].o_custkey == t["customer"].c_custkey)
        .select("o_orderkey", "c_custkey", "c_name", "o_totalprice")
    )


_Q5_ORACLE = f"""
    SELECT n_name,
           {fsum_sql('l_extendedprice * (1 - l_discount)', 'revenue')}
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
"""


def _q5_shape(spark: SparkSession, sf_dir: str, hint_broadcast: bool) -> DataFrame:
    t = load_tables(
        spark, sf_dir,
        ("customer", "orders", "lineitem", "supplier", "nation", "region"),
    )
    nation = F.broadcast(t["nation"]) if hint_broadcast else t["nation"]
    region = F.broadcast(t["region"]) if hint_broadcast else t["region"]
    joined = (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            t["supplier"],
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(
            (F.col("r_name") == "ASIA")
            & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
    )
    return joined.groupBy("n_name").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue")
    )


@register("q06_join_multiway", oracle=_Q5_ORACLE)
def q06_join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped 6-table star join + agg; AQE/CBO pick the join
    strategy (dims end up broadcast without hints)."""
    return _q5_shape(spark, sf_dir, hint_broadcast=False)


@register("q11_join_broadcast", oracle=_Q5_ORACLE)
def q11_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same plan with explicit ``F.broadcast`` hints on the dims —
    the 100 TB-safe formulation (never shuffle a 25-row table's fact
    side)."""
    return _q5_shape(spark, sf_dir, hint_broadcast=True)


@register(
    "q07_join_left",
    oracle="""
    SELECT c_custkey, c_name,
           COUNT(o_orderkey) AS n_orders_1995,
           CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(28,4))), 0)
                AS DOUBLE) AS spent_1995
    FROM customer
    LEFT JOIN (
        SELECT * FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
    ) o ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
)
def q07_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with NULL handling: customers without 1995
    orders keep count 0 / spend 0 via COUNT(col) + COALESCE."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    o95 = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    return (
        t["customer"]
        .join(o95, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders_1995"),
            F.coalesce(
                F.sum(F.col("o_totalprice").cast("decimal(28,4)")), F.lit(0)
            ).cast("double").alias("spent_1995"),
        )
    )


@register(
    "q08_join_full",
    oracle="""
    WITH b AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
         u AS (SELECT DISTINCT o_custkey FROM orders
               WHERE o_orderpriority = '1-URGENT')
    SELECT COALESCE(b.c_custkey, u.o_custkey) AS custkey,
           CAST(b.c_custkey IS NOT NULL AS INT) AS in_building,
           CAST(u.o_custkey IS NOT NULL AS INT) AS has_urgent
    FROM b FULL OUTER JOIN u ON b.c_custkey = u.o_custkey
    """,
)
def q08_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join; NULLs manufactured by the disjoint halves
    (testdata itself has none — SURVEY.md §1.3 note 4)."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    b = t["customer"].filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    u = (
        t["orders"].filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey").distinct()
    )
    return (
        b.join(u, b.c_custkey == u.o_custkey, "full")
        .select(
            F.coalesce("c_custkey", "o_custkey").alias("custkey"),
            F.col("c_custkey").isNotNull().cast("int").alias("in_building"),
            F.col("o_custkey").isNotNull().cast("int").alias("has_urgent"),
        )
    )


@register(
    "q09_join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
    """,
)
def q09_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join — Spark never materializes the probe payload,
    and the build side carries only the key column."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    urgent = t["orders"].filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        t["customer"]
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    )


@register(
    "q10_join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 100000)
    """,
)
def q10_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join (customers with no order over 100k)."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    big = t["orders"].filter(F.col("o_totalprice") > 100000)
    return (
        t["customer"]
        .join(big, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    )


@register(
    "q12_join_theta",
    oracle="""
    SELECT l_orderkey, l_linenumber, p_partkey,
           ROUND(l_extendedprice - p_retailprice, 4) AS premium
    FROM lineitem JOIN part
      ON l_partkey = p_partkey AND l_extendedprice > p_retailprice
    """,
)
def q12_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + theta residual: the equi key keeps this a hash join with
    the ``>`` as residual filter (check: no NestedLoop in the plan)."""
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    return (
        t["lineitem"]
        .join(
            t["part"],
            (F.col("l_partkey") == F.col("p_partkey"))
            & (F.col("l_extendedprice") > F.col("p_retailprice")),
        )
        .select(
            "l_orderkey", "l_linenumber", "p_partkey",
            F.round(F.col("l_extendedprice") - F.col("p_retailprice"), 4)
            .alias("premium"),
        )
    )


@register(
    "q13_join_asof",
    oracle="""
    SELECT p.event_id, p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M') AS purchase_min,
           strftime(s.ts, '%Y-%m-%d %H:%M') AS signup_min
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
      ON p.user_id = s.user_id AND p.ts >= s.ts
    """,
)
def q13_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASOF join: latest prior (or simultaneous) signup per purchase.
    Library operator — union + last(ignorenulls) window, one shuffle
    (operators/asof.py). Timestamps projected as minute-truncated
    strings per the ns/µs hashing rule (SURVEY.md §1.3 note 1).

    NULL keys (round 8, null-keys degenerate axis): the operator
    drops NULL-keyed reference rows, so a NULL-user purchase keeps
    its row with a NULL match — exactly the oracle's ASOF JOIN
    equality semantics (`p.user_id = s.user_id` never matches NULL),
    not the one-NULL-partition grouping a bare window would give.
    Round 9 (ADVICE r8): NULL-keyed PROBE rows are now routed around
    the window inside the operator — same rows, same hash, but dirty
    FKs no longer pile into a single hot window partition at scale."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    signups = ev.filter(F.col("event_type") == "signup").select("user_id", "ts")
    joined = asof_join(purchases, signups, on=["user_id"], left_ts="ts")
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm").alias("purchase_min"),
        F.date_format("ts_asof", "yyyy-MM-dd HH:mm").alias("signup_min"),
    )


@register(
    "q14_join_cross",
    oracle="SELECT r_name, n_name FROM region CROSS JOIN nation",
)
def q14_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cross join (5 × 25 = 125 rows; both sides tiny →
    broadcast nested loop)."""
    t = load_tables(spark, sf_dir, ("region", "nation"))
    return t["region"].crossJoin(t["nation"]).select("r_name", "n_name")


@register(
    "q66_join_range",
    oracle="""
    WITH s AS (SELECT event_id AS signup_id, user_id,
                      CAST(floor(epoch(ts)) AS BIGINT) AS st
               FROM events WHERE event_type = 'signup'),
         p AS (SELECT user_id,
                      CAST(floor(epoch(ts)) AS BIGINT) AS pt
               FROM events WHERE event_type = 'purchase')
    SELECT s.signup_id, COUNT(p.user_id) AS n_purchases_24h
    FROM s LEFT JOIN p
      ON s.user_id = p.user_id AND p.pt >= s.st AND p.pt < s.st + 86400
    GROUP BY s.signup_id
    """,
)
def q66_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/range join: purchases within 24 h of each signup for
    the same user, counted per signup (zero-count signups kept).

    Implementation: hearthstats_spark.operators.rangejoin — the
    interval side explodes to its overlapped day buckets, points key
    to their own bucket, and the join is a plain equi join on
    (user_id, bucket) with the exact range as a post-filter. A naive
    formulation leaves the range as a join residual evaluated per
    equi-key candidate; with long-lived users that candidate set is
    quadratic, the bucketed plan stays linear in rows."""
    from hearthstats_spark.operators.rangejoin import range_join

    ev = load_table(spark, sf_dir, "events")
    secs = F.expr("unix_micros(ts) div 1000000")  # exact int division
    s = (ev.filter(F.col("event_type") == "signup")
         .select(F.col("event_id").alias("signup_id"), "user_id",
                 secs.alias("st"))
         .withColumn("en", F.col("st") + 86400))
    p = (ev.filter(F.col("event_type") == "purchase")
         .select("user_id", secs.alias("pt")))
    matched = range_join(s, p, ["user_id"], "st", "en", "pt",
                         bucket_width=86400)
    counts = matched.groupBy("signup_id").agg(
        F.count(F.lit(1)).alias("n_purchases_24h"))
    return (
        s.select("signup_id").join(counts, "signup_id", "left")
        .select("signup_id",
                F.coalesce("n_purchases_24h", F.lit(0)).cast("long")
                .alias("n_purchases_24h"))
    )


@register(
    "q69_join_nested_in",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey IN (
        SELECT o_custkey FROM orders
        WHERE o_orderpriority = '1-URGENT'
          AND o_orderkey IN (
              SELECT l_orderkey FROM lineitem
              WHERE l_extendedprice > 90000))
    ORDER BY c_custkey
    """,
)
def q69_join_nested_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-shaped two-level nested IN chain: customers holding
    an urgent order that contains a >90k lineitem. Each IN level is a
    LEFT SEMI join in the DataFrame form — the chain stays semi all
    the way down, so no level materializes more than its key set and
    duplicate matches never multiply rows (the failure mode of
    rewriting IN as a plain inner join)."""
    t = load_tables(spark, sf_dir, ("customer", "orders", "lineitem"))
    big_items = t["lineitem"].filter(F.col("l_extendedprice") > 90000)
    urgent_with_big = (
        t["orders"].filter(F.col("o_orderpriority") == "1-URGENT")
        .join(big_items.select(F.col("l_orderkey").alias("o_orderkey")),
              "o_orderkey", "left_semi")
    )
    return (
        t["customer"]
        .join(urgent_with_big.select(F.col("o_custkey").alias("c_custkey")),
              "c_custkey", "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "q70_join_nation_pairs",
    oracle="""
    SELECT supp_nation, cust_nation, yr,
           CAST(SUM(CAST(volume AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM (
        SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
               CAST(year(l.l_shipdate) AS INT) AS yr,
               l.l_extendedprice * (1 - l.l_discount) AS volume
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation ns ON ns.n_nationkey = s.s_nationkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation nc ON nc.n_nationkey = c.c_nationkey
        WHERE (ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
           OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1')
    )
    GROUP BY supp_nation, cust_nation, yr
    """,
)
def q70_join_nation_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shaped cross-nation volume: revenue shipped between a
    nation PAIR in both directions (disjunctive pair predicate the
    optimizer cannot turn into a single equi filter), per year. The
    two nation dims broadcast; lineitem⋈orders is the only big join.
    Decimal-cast sum keeps the revenue hash-stable (SURVEY §1.3)."""
    t = load_tables(spark, sf_dir,
                    ("lineitem", "supplier", "nation", "orders", "customer"))
    ns = t["nation"].select(F.col("n_nationkey").alias("s_nationkey"),
                            F.col("n_name").alias("supp_nation"))
    nc = t["nation"].select(F.col("n_nationkey").alias("c_nationkey"),
                            F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    joined = (
        t["lineitem"]
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(ns), "s_nationkey")
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nc), "c_nationkey")
        .filter(pair)
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        joined.select(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("int").alias("yr"),
            vol.alias("volume"))
        .groupBy("supp_nation", "cust_nation", "yr")
        .agg(F.sum(F.col("volume").cast("decimal(28,4)")).cast("double")
             .alias("revenue"),
             F.count(F.lit(1)).alias("n_items"))
    )


@register(
    "q80_join_salted",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey,
           CAST(o.o_totalprice AS DOUBLE) AS o_totalprice, c.c_name
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def q80_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact⋈dim join — the pre-shuffle skew lever
    (operators/skew.py) as a declared, oracle-checked query: the
    probe side scatters each key over 16 per-row-nonce salts, the
    dim side replicates ×16, and the join key becomes (key, salt) so
    a hot customer's rows land on 16 reducers instead of one. The
    result is row-identical to the plain join (hash-checked against
    the unsalted oracle); AQE's skew split is the post-shuffle
    complement, salting the pre-shuffle one. Cost model and how-many-
    salts guidance in the operator docstring."""
    from hearthstats_spark.operators.skew import salted_join

    t = load_tables(spark, sf_dir, ("orders", "customer"))
    return salted_join(
        t["orders"].select("o_orderkey", "o_custkey", "o_totalprice"),
        t["customer"].select(F.col("c_custkey").alias("o_custkey"), "c_name"),
        ["o_custkey"], n_salts=16,
    ).select("o_orderkey", "o_custkey",
             F.col("o_totalprice").cast("double").alias("o_totalprice"),
             "c_name")
