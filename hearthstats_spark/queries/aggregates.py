"""Group D — aggregations (SURVEY.md §2 q15-q23).

Reference surface: win-rate rollups / stats-by-group over the SQLite
tables (SURVEY.md §1.1 [R]). Spark-first notes:

- Every groupBy here compiles to a partial+final HashAggregate pair —
  map-side combine means the shuffle carries one row per (partition,
  group), not per input row. That is the property that survives a
  100x scale-up.
- Float sums use the decimal-cast trick from
  ``hearthstats_spark.functions.numeric`` (order-independent, hash-
  stable); see that module's docstring.
- Multi-distinct (q17) uses Spark's expand-based plan: the input is
  replicated once per distinct column. At 100 TB prefer one distinct
  per pass or approx_count_distinct (q22) when +-2% is acceptable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hearthstats_spark.functions import dsum, davg, fsum_sql, favg_sql
from hearthstats_spark.io import load_table, load_tables
from hearthstats_spark.queries.registry import register


@register(
    "q15_agg_pricing",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {fsum_sql('l_quantity', 'sum_qty')},
           {fsum_sql('l_extendedprice', 'sum_base_price')},
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
               AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))
                    * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE)
               AS sum_charge,
           {favg_sql('l_quantity', 'avg_qty')},
           {favg_sql('l_extendedprice', 'avg_price')},
           {favg_sql('l_discount', 'avg_disc')},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q15_agg_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary (the engine's flagship query).

    The computed measures (disc price, charge) multiply in DECIMAL,
    not double: raw prices are exact 2-dp values, so decimal casts and
    products are exact on both engines, while a double product cast to
    decimal diverges at half-way points (Spark rounds the shortest
    repr via BigDecimal.valueOf, DuckDB the exact binary expansion).

    Widths (extreme-measures axis, round 9): engine casts price to
    DECIMAL(18,2) — TPC-H's native (12,2) ANSI-aborted at 1e12-scale
    prices; (18,2) keeps the two chained multiplies inside Spark's
    38-precision cap with zero scale loss ((23,4) then (29,6)). The
    oracle casts to DECIMAL(28,2) instead because DuckDB's (18,2)
    multiply stays on the INT64 fast path and overflows at the same
    magnitudes — (28,2) forces HUGEINT. Asymmetric widths, identical
    exact values.
    """
    li = load_table(spark, sf_dir, "lineitem")
    ext = F.col("l_extendedprice").cast("decimal(18,2)")
    disc_price = ext * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
    charge = disc_price * (F.lit(1) + F.col("l_tax").cast("decimal(4,2)"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q16_agg_distinct",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
)
def q16_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact count-distinct per group (two-stage: partial distinct by
    (group, value), then count — Spark plans this automatically)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users")
    )


@register(
    "q17_agg_multidistinct",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_custs,
           COUNT(DISTINCT CAST(o_orderdate AS DATE)) AS n_days,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
)
def q17_agg_multidistinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Several distincts in one aggregate -> Expand-based plan (input
    replicated once per distinct set; see module note on scale)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_custs"),
        F.countDistinct(F.col("o_orderdate").cast("date")).alias("n_days"),
        F.count(F.lit(1)).alias("n_orders"),
    )


_ROLLUP_ORACLE = f"""
    SELECT COALESCE(r_name, 'ALL') AS r_name,
           COALESCE(n_name, 'ALL') AS n_name,
           CAST(GROUPING(r_name) AS INT) AS g_region,
           CAST(GROUPING(n_name) AS INT) AS g_nation,
           COUNT(*) AS n_orders,
           {fsum_sql('o_totalprice', 'revenue')}
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    HAVING COUNT(*) > 0
"""


@register("q18_agg_rollup", oracle=_ROLLUP_ORACLE)
def q18_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with GROUPING() disambiguation; rollup NULLs are
    COALESCE'd to 'ALL' so they hash cleanly against real values.

    Empty-input policy (degenerate audit, round 8): Spark's
    ``rollup()`` emits NO grand-total row on empty input while SQL's
    GROUP BY ROLLUP emits one — the oracle's ``HAVING COUNT(*) > 0``
    declares the Spark semantics on both engines (a no-op on any
    non-empty input: every real group has COUNT >= 1)."""
    t = load_tables(spark, sf_dir, ("orders", "customer", "nation", "region"))
    joined = (
        t["orders"]
        .join(t["customer"], t["orders"].o_custkey == t["customer"].c_custkey)
        .join(F.broadcast(t["nation"]),
              t["customer"].c_nationkey == t["nation"].n_nationkey)
        .join(F.broadcast(t["region"]),
              t["nation"].n_regionkey == t["region"].r_regionkey)
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "revenue"),
            F.grouping("r_name").cast("int").alias("g_region"),
            F.grouping("n_name").cast("int").alias("g_nation"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("r_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("n_name"),
            "g_region", "g_nation", "n_orders", "revenue",
        )
    )


@register(
    "q19_agg_cube",
    oracle=f"""
    SELECT COALESCE(c_mktsegment, 'ALL') AS segment,
           COALESCE(o_orderstatus, 'ALL') AS status,
           CAST(GROUPING(c_mktsegment) AS INT) AS g_seg,
           CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
           COUNT(*) AS n_orders,
           {fsum_sql('o_totalprice', 'revenue')}
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY CUBE (c_mktsegment, o_orderstatus)
    HAVING COUNT(*) > 0
    """,
)
def q19_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over segment x status (all 2^2 grouping combinations).
    Empty-input policy as q18: oracle ``HAVING COUNT(*) > 0`` pins
    the no-grand-total-row-on-empty Spark semantics (no-op
    otherwise)."""
    t = load_tables(spark, sf_dir, ("orders", "customer"))
    joined = t["orders"].join(
        t["customer"], t["orders"].o_custkey == t["customer"].c_custkey
    )
    return (
        joined.cube("c_mktsegment", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "revenue"),
            F.grouping("c_mktsegment").cast("int").alias("g_seg"),
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
        )
        .select(
            F.coalesce("c_mktsegment", F.lit("ALL")).alias("segment"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "g_seg", "g_status", "n_orders", "revenue",
        )
    )


_GSETS_SQL = """
    SELECT COALESCE(lang, 'ALL') AS lang,
           COALESCE(source, 'ALL') AS source,
           COUNT(*) AS n_docs,
           ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 4) AS avg_chars
    FROM documents
    GROUP BY GROUPING SETS ((lang), (source), ())
    HAVING COUNT(*) > 0
"""


@register("q20_agg_groupingsets", oracle=_GSETS_SQL)
def q20_agg_groupingsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via the SQL route (the DataFrame API has no direct
    grouping-sets builder); the same SQL text runs on both engines.
    The shared ``HAVING COUNT(*) > 0`` is a no-op on Spark (which
    emits no () row on empty input) and drops DuckDB's COUNT=0
    grand-total row — empty-input semantics declared once for both
    (degenerate audit, round 8)."""
    load_tables(spark, sf_dir, ("documents",), register=True)
    return spark.sql(_GSETS_SQL)


@register(
    "q21_agg_having",
    oracle=f"""
    SELECT event_type, {fsum_sql('value', 'total_value')}
    FROM events GROUP BY event_type
    HAVING CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) > 100000
    """,
)
def q21_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(dsum("value", "total_value"))
        .filter(F.col("total_value") > 100000)
    )


@register(
    "q22_agg_approx",
    # sketch-oracle policy (sketches.py module docstring): the HLL++
    # estimate is engine-specific, so the HASHED columns are the exact
    # twin + the in-plan error-band verdict, which the oracle emits as
    # literal TRUE — an out-of-band estimate flips the boolean and
    # fails the driver's value hash. Upgraded round 11 (VERDICT r10
    # item 2): the last rows-only q-op, scheduled for the round
    # aggregates.py was naturally stale.
    oracle="""
    SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS est_within_5pct
    FROM events
    """,
)
def q22_agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate count-distinct (HyperLogLog++). The scale-path twin
    of q16: mergeable sketch, no expand, bounded memory — at 100 TB
    the exact count shuffles every distinct key, the sketch shuffles a
    fixed-size register array. rsd=0.016 matches lgConfigK=12 (RSE
    1.04/sqrt(4096)), so the hashed 5 % band is ~3σ (the q84
    precedent: 2 % was 1.25σ and legitimately failed at sf0.1); the
    tighter 2 % pin stays in tests/test_operators.py at sf0.01. Both
    aggregates ride one pass over events (single partial/final pair,
    no second scan)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.count_distinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", rsd=0.016).alias("__est"),
    ).select(
        "exact_users",
        F.coalesce(
            F.abs(F.col("__est") - F.col("exact_users"))
            <= 0.05 * F.col("exact_users"),
            F.lit(True)).alias("est_within_5pct"))


@register(
    "q23_agg_stats",
    oracle="""
    SELECT event_type,
           ROUND(stddev_samp(value), 4) AS sd_value,
           ROUND(var_samp(value), 4) AS var_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value,
           ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY value), 4)
               AS median_value
    FROM events GROUP BY event_type
    """,
)
def q23_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates incl. exact interpolated median
    (Spark ``percentile`` == DuckDB ``percentile_cont``)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.stddev_samp("value"), 4).alias("sd_value"),
        F.round(F.var_samp("value"), 4).alias("var_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.round(F.percentile("value", 0.5), 4).alias("median_value"),
    )


@register(
    "q63_agg_regression",
    oracle="""
    SELECT l_returnflag,
           ROUND(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
           ROUND(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price,
           ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q63_agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistical aggregates (corr / covar_samp /
    regr_slope / regr_intercept) per return flag — the correlation
    surface an analytics engine needs for feature screening. All are
    single-pass moment aggregates: they ride the same partial+final
    HashAggregate pair as sums (no extra shuffle, no sort).

    Zero-variance policy (constant-measures audit, round 8): Spark's
    built-in ``corr``/``regr_slope``/``regr_intercept`` CRASH under
    ANSI mode when a group's variance is exactly 0 (DIVIDE_BY_ZERO in
    the final division) while SQL returns NULL — a constant-priced
    ingestion day would abort the whole query. The engine therefore
    composes them from the crash-free moment aggregates (covar_samp,
    stddev_samp, var_samp, avg — mathematically identical ratios:
    covar_samp/var_samp == covar_pop/var_pop) with a per-row-lazy
    zero-denominator CASE that declares NULL, matching the oracle.
    Same plan shape: one partial+final HashAggregate pair. The
    pairwise-complete subtlety (SQL's corr/regr_* drop rows where
    EITHER side is NULL, plain avg/stddev drop only their own) is
    moot on these columns: lineitem quantities/prices are non-null by
    generation."""
    li = load_table(spark, sf_dir, "lineitem")
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    cov = F.covar_samp(q, p)
    sd_prod = F.stddev_samp(q) * F.stddev_samp(p)
    var_q = F.var_samp(q)
    slope = F.when(var_q == 0, F.lit(None)).otherwise(cov / var_q)
    return li.groupBy("l_returnflag").agg(
        F.round(F.when(sd_prod == 0, F.lit(None)).otherwise(cov / sd_prod),
                4).alias("corr_qty_price"),
        F.round(cov, 4).alias("covar_qty_price"),
        F.round(slope, 4).alias("slope"),
        F.round(F.avg(p) - slope * F.avg(q), 4).alias("intercept"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q64_agg_collect",
    oracle="""
    SELECT o_orderpriority,
           array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',')
               AS statuses_csv,
           CAST(COUNT(DISTINCT o_orderstatus) AS INT) AS n_statuses
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q64_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered set collection (array_agg surface): distinct statuses
    per priority, emitted as a deterministically-sorted CSV string so
    the value hash is stable (collect_set order is partition-
    dependent; sort_array fixes it — the discipline any array-valued
    result needs for cross-engine comparison)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.concat_ws(",", F.sort_array(F.collect_set("o_orderstatus")))
        .alias("statuses_csv"),
        F.countDistinct("o_orderstatus").cast("int").alias("n_statuses"),
    )


@register(
    "q67_correlated_subquery",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_small_orders,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE)
               AS small_revenue
    FROM lineitem l1
    WHERE l_quantity < (SELECT 0.5 * AVG(l_quantity)
                        FROM lineitem l2
                        WHERE l2.l_partkey = l1.l_partkey)
    """,
)
def q67_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-shaped correlated scalar subquery, submitted as SQL
    so Catalyst's decorrelation rewrites it (RewriteCorrelatedScalar-
    Subquery → aggregate + join — SURVEY.md §4.2): lineitems whose
    quantity is below half their part's average quantity. The naive
    reading re-runs the subquery per outer row; the decorrelated plan
    computes per-part averages ONCE and joins — the only formulation
    that survives at scale. Exercises SQL entry point B end to end."""
    from hearthstats_spark.sql import register_views

    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_small_orders,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE)
                   AS small_revenue
        FROM lineitem l1
        WHERE l_quantity < (SELECT 0.5 * AVG(l_quantity)
                            FROM lineitem l2
                            WHERE l2.l_partkey = l1.l_partkey)
    """)


@register(
    "q68_data_audit",
    oracle="""
    SELECT 'lineitem_negative_price' AS check,
           CAST((SELECT COUNT(*) FROM lineitem WHERE l_extendedprice < 0)
                AS BIGINT) AS n_violations
    UNION ALL
    SELECT 'lineitem_discount_range',
           CAST((SELECT COUNT(*) FROM lineitem
                 WHERE l_discount < 0 OR l_discount > 1) AS BIGINT)
    UNION ALL
    SELECT 'lineitem_null_orderkey',
           CAST((SELECT COUNT(*) FROM lineitem WHERE l_orderkey IS NULL)
                AS BIGINT)
    UNION ALL
    SELECT 'orders_date_range',
           CAST((SELECT COUNT(*) FROM orders
                 WHERE o_orderdate < TIMESTAMP '1990-01-01'
                    OR o_orderdate > TIMESTAMP '2005-01-01') AS BIGINT)
    UNION ALL
    SELECT 'orders_orphan_custkey',
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT)
    UNION ALL
    SELECT 'lineitem_orphan_orderkey',
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT)
    """,
)
def q68_data_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit (expectations gate): range/null rules in a
    single conditional-count pass per table plus two referential
    anti-join checks — the validation a pipeline runs before a batch
    is admitted. All six checks return 0 on this corpus (generated
    with full integrity — SURVEY.md §1.3 note 4); the unit tests
    corrupt a copy to prove the checks actually fire.

    Implementation: hearthstats_spark.operators.expectations."""
    from hearthstats_spark.operators.expectations import audit, fk_violations

    t = load_tables(spark, sf_dir, ("lineitem", "orders", "customer"))
    li, o, c = t["lineitem"], t["orders"], t["customer"]
    row_rules = audit(li, {
        "lineitem_negative_price": F.col("l_extendedprice") < 0,
        "lineitem_discount_range": (F.col("l_discount") < 0)
        | (F.col("l_discount") > 1),
        "lineitem_null_orderkey": F.col("l_orderkey").isNull(),
    }).unionByName(audit(o, {
        "orders_date_range": (F.col("o_orderdate") < "1990-01-01")
        | (F.col("o_orderdate") > "2005-01-01"),
    }))
    # referential checks stay IN the plan (one-row aggregates over the
    # anti joins, unioned) — round 1 ran them as two eager driver-side
    # count() jobs before the main job even started
    def fk_count(name: str, child, ck, parent, pk):
        return (
            fk_violations(child, ck, parent, pk)
            .agg(F.count(F.lit(1)).alias("n_violations"))
            .select(F.lit(name).alias("check"), "n_violations")
        )

    fk = (fk_count("orders_orphan_custkey", o, "o_custkey", c, "c_custkey")
          .unionByName(fk_count("lineitem_orphan_orderkey",
                                li, "l_orderkey", o, "o_orderkey")))
    return row_rules.unionByName(fk)


@register(
    "q73_pivot",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT)
               AS status_F,
           CAST(COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT)
               AS status_O,
           CAST(COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT)
               AS status_P,
           CAST(SUM(CASE WHEN o_orderstatus = 'F'
                    THEN CAST(o_totalprice AS DECIMAL(28,4)) END) AS DOUBLE)
               AS revenue_F
    FROM orders GROUP BY o_orderpriority
    """,
)
def q73_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long → wide): order counts per priority spread across
    status columns, plus one pivoted measure. The value list is
    EXPLICIT (['F','O','P']) — with an implicit list Spark runs an
    extra distinct-collect job to discover columns and the output
    schema becomes data-dependent, both wrong at scale. Pivot
    compiles to the same conditional-aggregation pattern the oracle
    spells out: one pass, partial+final pair, no extra shuffle."""
    o = load_table(spark, sf_dir, "orders")
    counts = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select("o_orderpriority",
                F.coalesce("F", F.lit(0)).alias("status_F"),
                F.coalesce("O", F.lit(0)).alias("status_O"),
                F.coalesce("P", F.lit(0)).alias("status_P"))
    )
    rev = o.groupBy("o_orderpriority").agg(
        F.sum(F.when(F.col("o_orderstatus") == "F",
                     F.col("o_totalprice").cast("decimal(28,4)")))
        .cast("double").alias("revenue_F"))
    return counts.join(rev, "o_orderpriority")


@register(
    "q74_unpivot",
    oracle="""
    SELECT c_custkey, metric, val FROM (
        SELECT c_custkey, 'acctbal' AS metric,
               ROUND(c_acctbal, 4) AS val FROM customer
        UNION ALL
        SELECT c_custkey, 'nationkey', CAST(c_nationkey AS DOUBLE)
        FROM customer
    )
    """,
)
def q74_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (wide → long): customer measures stacked into
    (key, metric, value) rows via the native ``unpivot`` — a Generate
    node emitting N rows per input row with no shuffle at all (the
    shape feature stores and metric pipelines ingest)."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.select("c_custkey",
                 F.round("c_acctbal", 4).alias("acctbal"),
                 F.col("c_nationkey").cast("double").alias("nationkey"))
        .unpivot("c_custkey", ["acctbal", "nationkey"], "metric", "val")
    )


@register(
    "q75_sample_systematic",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sampled,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE)
               AS sampled_revenue
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY o_orderkey) AS rn
          FROM orders)
    WHERE rn % 10 = 1
    """,
)
def q75_sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% systematic sample (every 10th row by key
    order) + aggregate on the sample. `df.sample()` is the
    production path but its row set depends on partitioning, so the
    cross-engine-checkable form is the key-ordered modulus. The
    global key order comes from the two-pass range-partitioned
    position operator (operators/rankops.py — shared with q29), not
    a single-task global window; hash-mod on the key
    (`pmod(xxhash64(key), 10) = 0`) is the shuffle-free variant when
    key order doesn't matter."""
    from hearthstats_spark.operators.rankops import with_global_position

    o = load_table(spark, sf_dir, "orders")
    pos_df, _ = with_global_position(
        o.select("o_orderkey", "o_totalprice"), "o_orderkey",
        pos_col="rn",
        # orderkeys are dense-sequential → equal-width cuts are both
        # perfectly balanced and a cheaper pass than the quantile
        # sketch (min/max agg vs per-row sketch updates)
        boundaries="uniform",
    )
    return (
        pos_df.filter(F.col("rn") % 10 == 1)
        .agg(F.count(F.lit(1)).alias("n_sampled"),
             F.sum(F.col("o_totalprice").cast("decimal(28,4)"))
             .cast("double").alias("sampled_revenue"))
    )


@register(
    "q79_percentile_exact",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(quantile_cont(value, 0.25), 4) AS p25,
           ROUND(quantile_cont(value, 0.50), 4) AS p50,
           ROUND(quantile_cont(value, 0.75), 4) AS p75
    FROM events GROUP BY event_type
    """,
)
def q79_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles per event_type —
    ``F.percentile`` (SQL PERCENTILE_CONT semantics) vs DuckDB's
    quantile_cont, hash-exact after 4dp rounding. The exact form
    buffers each group's values; at 100 TB the drop-in scale
    substitute is ``approx_percentile`` (KLL-ish sketch, mergeable,
    bounded memory) — the q22 exact-vs-approx trade, applied to
    quantiles. Group count here is tiny (5 event types), so the
    buffered exact form is the right default until group cardinality
    × group size outgrows executor memory."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.percentile("value", F.lit(0.25)), 4).alias("p25"),
        F.round(F.percentile("value", F.lit(0.50)), 4).alias("p50"),
        F.round(F.percentile("value", F.lit(0.75)), 4).alias("p75"),
    )


@register(
    "q76_correlated_min",
    oracle="""
    SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS first_order_day,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM orders o1
    WHERE o_orderdate = (SELECT MIN(o2.o_orderdate)
                         FROM orders o2
                         WHERE o2.o_custkey = o1.o_custkey)
    """,
)
def q76_correlated_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-shaped MIN-correlated equality subquery: each
    customer's earliest order(s) — ``WHERE o_orderdate = (SELECT
    MIN(...) correlated on custkey)``. Submitted as SQL (entry point
    B) so Catalyst decorrelates it (RewriteCorrelatedScalarSubquery):
    the physical plan computes per-customer minima ONCE as an
    aggregate and joins — never a per-outer-row subquery (the
    registry-wide plan audit would flag the nested-loop shape).
    Complements q67's AVG-inequality form: the equality-on-MIN shape
    is the one that keeps ties (a customer with two same-day earliest
    orders returns both rows), which the oracle hash checks."""
    from hearthstats_spark.sql import register_views

    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT o_custkey, o_orderkey,
               date_format(o_orderdate, 'yyyy-MM-dd') AS first_order_day,
               CAST(o_totalprice AS DOUBLE) AS o_totalprice
        FROM orders o1
        WHERE o_orderdate = (SELECT MIN(o2.o_orderdate)
                             FROM orders o2
                             WHERE o2.o_custkey = o1.o_custkey)
    """)


@register(
    "q86_sample_stratified",
    oracle="""
    WITH rated AS (
        SELECT event_type, value,
               CASE event_type WHEN 'view' THEN 20
                               WHEN 'click' THEN 5
                               ELSE 1 END AS rate,
               event_id
        FROM events
    )
    SELECT event_type, CAST(rate AS BIGINT) AS rate,
           CAST(COUNT(*) FILTER (WHERE event_id % rate = 0) AS BIGINT)
               AS n_sampled,
           CAST(COUNT(*) FILTER (WHERE event_id % rate = 0) * rate
                AS BIGINT) AS est_total,
           CAST(COUNT(*) AS BIGINT) AS n_true,
           ROUND(SUM(value) FILTER (WHERE event_id % rate = 0) * rate, 4)
               AS est_value_sum
    FROM rated
    GROUP BY event_type, rate
    """,
)
def q86_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified systematic sampling: each event_type stratum keeps
    a different deterministic fraction (views 1/20, clicks 1/5,
    purchases all — the usual downsample-the-majority-class shape in
    training-data pipelines), via key-modulus so the row set is
    partitioning-independent and cross-engine checkable. Estimates
    are Horvitz–Thompson (sampled × rate) next to the true counts.

    Scale: no pre-shuffle — the sample predicate is a map-side
    filter fused into the scan stage, then ONE aggregation computes
    sampled and true measures together via conditional aggregates
    (no second pass over the fact table). `df.sampleBy` is the
    production variant when determinism across engines isn't
    required."""
    e = load_table(spark, sf_dir, "events")
    rate = (F.when(F.col("event_type") == "view", F.lit(20))
            .when(F.col("event_type") == "click", F.lit(5))
            .otherwise(F.lit(1)))
    in_sample = F.col("event_id") % F.col("rate") == 0
    return (
        e.withColumn("rate", rate)
        .groupBy("event_type", F.col("rate").cast("long").alias("rate"))
        .agg(
            F.count(F.when(in_sample, 1)).alias("n_sampled"),
            (F.count(F.when(in_sample, 1)) * F.first("rate"))
            .cast("long").alias("est_total"),
            F.count(F.lit(1)).alias("n_true"),
            F.round(F.sum(F.when(in_sample, F.col("value")))
                    * F.first("rate"), 4).alias("est_value_sum"),
        )
    )
