"""Round-3 analytics extensions (q122–q129):

- **q122**: equi-width histogram (20 buckets over a global min/max)
  per order priority — the distribution profile behind every query
  optimizer statistic and monitoring dashboard.
- **q123**: month-over-month revenue growth + trailing-3-month
  revenue — the BI time-series staple (lag + frame windows AFTER
  aggregation to calendar months).
- **q124**: revenue bridge / growth accounting — period revenue
  split into new / retained / churned customers between 1996 and
  1997 (the SaaS board-deck query).
- **q125**: key-skew report — per event type, the 5 hottest payload
  keys with their share of traffic (the diagnostic you run before
  choosing salting / isolation for a hot key).
- **q126**: open-order backlog age percentiles per priority at the
  corpus snapshot date (point-in-time operational reporting).
- **q127**: CDC apply — last-writer-wins with delete tombstones over
  a (key, seq, op) changelog, the compaction kernel every
  lakehouse MERGE/CDC sink runs.
- **q128**: k-NN majority-vote classification accuracy over the
  embedding column (IVF-cell candidates, the q61 quantizer) — the
  label-propagation / auto-labeling quality check.
- **q129**: per-column data profile (rows / distinct / nulls) of a
  dimension table in ONE aggregation pass — the profiling prelude
  to any ingestion contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hearthstats_spark.functions import fsum_sql
from hearthstats_spark.functions.numeric import DEC
from hearthstats_spark.io import load_table
from hearthstats_spark.queries.registry import register

_HIST_BUCKETS = 20


@register(
    "q122_histogram_price",
    oracle=f"""
    WITH stats AS (
        SELECT MIN(o_totalprice) AS lo,
               (MAX(o_totalprice) - MIN(o_totalprice)) / {_HIST_BUCKETS}.0
                   AS width
        FROM orders
    )
    SELECT o_orderpriority AS priority,
           CAST(LEAST(CASE WHEN width = 0 THEN 0
                           ELSE CAST(FLOOR((o_totalprice - lo) / width)
                                     AS INT) END,
                      {_HIST_BUCKETS - 1}) AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(lo + LEAST(CASE WHEN width = 0 THEN 0
                                 ELSE CAST(FLOOR((o_totalprice - lo)
                                                 / width) AS INT) END,
                            {_HIST_BUCKETS - 1}) * width, 4) AS bucket_lo
    FROM orders, stats
    GROUP BY 1, 2, 4
    """,
)
def q122_histogram_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20-bucket equi-width histogram of o_totalprice per priority.

    The global (min, width) frame is ONE row riding a broadcast
    cross join onto the scan (the engine's scalar-subquery shape —
    no driver action, no second pass over the data beyond the 1-row
    agg); bucket math is identical IEEE double arithmetic on both
    engines, with the top edge clamped into the last bucket. One
    hash agg on (priority, bucket) — at 100 TB the output is
    |priorities|x20 rows regardless of input size.

    Width-0 policy (degenerate audit, round 8): an all-equal price
    column makes width = 0, where IEEE x/0 is NaN/Inf (an ANSI
    divide crash on Spark, a fragile FLOOR(NaN)->INT-cast accident
    on DuckDB) — both sides now DECLARE that lane as bucket 0 via an
    explicit width = 0 CASE; a no-op whenever max > min."""
    o = load_table(spark, sf_dir, "orders")
    stats = o.agg(
        F.min("o_totalprice").alias("lo"),
        ((F.max("o_totalprice") - F.min("o_totalprice"))
         / float(_HIST_BUCKETS)).alias("width"),
    )
    bucket = F.least(
        F.when(F.col("width") == 0, F.lit(0)).otherwise(
            F.floor((F.col("o_totalprice") - F.col("lo"))
                    / F.col("width")).cast("int")),
        F.lit(_HIST_BUCKETS - 1),
    )
    return (
        o.crossJoin(F.broadcast(stats))
        .select(
            F.col("o_orderpriority").alias("priority"),
            bucket.alias("bucket"),
            F.round(F.col("lo") + bucket * F.col("width"), 4)
            .alias("bucket_lo"),
        )
        .groupBy("priority", "bucket", "bucket_lo")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("priority", "bucket", "n", "bucket_lo")
    )


@register(
    "q123_mom_growth",
    oracle=f"""
    WITH monthly AS (
        SELECT strftime(date_trunc('month', o.o_orderdate), '%Y-%m')
                   AS month,
               {fsum_sql("l.l_extendedprice * (1 - l.l_discount)",
                         "revenue")}
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY 1
    )
    SELECT month, revenue,
           ROUND((revenue - LAG(revenue) OVER w)
                 / LAG(revenue) OVER w, 4) AS mom_pct,
           CAST(SUM(CAST(revenue AS DECIMAL(28,4)))
                OVER (ORDER BY month
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS rev_3mo
    FROM monthly
    WINDOW w AS (ORDER BY month)
    """,
)
def q123_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue with month-over-month % change and trailing
    3-month revenue. Both window functions run AFTER aggregation to
    calendar months (≤ ~80 rows at any raw scale — q28's safe
    global-window shape); the trailing figure is an exact decimal
    frame SUM, deliberately NOT a rounded mean (cross-engine mean
    rounding is the one float trap this corpus has actually hit).

    Shuffle order (round 9, the q117 rewrite generalized): lineitem
    pre-aggregates to one (orderkey, decimal revenue partial) row
    BEFORE touching orders — the partial agg combines map-side, so
    the fact table crosses the wire once at ~1/4 the rows and the
    orderkey exchange it leaves behind already satisfies the join's
    distribution (join key ⊂ agg key). Decimal partials re-summed by
    month are bit-identical to the direct month sum (decimal addition
    is exact and associative; the double cast happens once, at the
    end — same DEC→double path dsum takes)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    per_order = (
        li.groupBy("l_orderkey")
        .agg(F.sum((F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))).cast(DEC))
             .alias("rev_part"))
    )
    monthly = (
        per_order.join(o.select("o_orderkey", "o_orderdate"),
                       F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.date_format(F.date_trunc("month", "o_orderdate"),
                               "yyyy-MM").alias("month"))
        .agg(F.sum("rev_part").cast("double").alias("revenue"))
    )
    w = Window.orderBy("month")
    frame = w.rowsBetween(-2, 0)
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "month", "revenue",
        F.round((F.col("revenue") - prev) / prev, 4).alias("mom_pct"),
        F.sum(F.col("revenue").cast(DEC)).over(frame).cast("double")
        .alias("rev_3mo"),
    )


@register(
    "q124_revenue_bridge",
    oracle="""
    WITH per_cust AS (
        SELECT o_custkey,
               SUM(CASE WHEN o_orderdate >= TIMESTAMP '1996-01-01'
                         AND o_orderdate <  TIMESTAMP '1997-01-01'
                        THEN CAST(o_totalprice AS DECIMAL(28,4)) END)
                   AS r96,
               SUM(CASE WHEN o_orderdate >= TIMESTAMP '1997-01-01'
                         AND o_orderdate <  TIMESTAMP '1998-01-01'
                        THEN CAST(o_totalprice AS DECIMAL(28,4)) END)
                   AS r97
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
        GROUP BY o_custkey
    )
    SELECT CASE WHEN r96 IS NULL THEN 'new'
                WHEN r97 IS NULL THEN 'churned'
                ELSE 'retained' END AS class,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(COALESCE(r96, 0)) AS DOUBLE) AS rev_1996,
           CAST(SUM(COALESCE(r97, 0)) AS DOUBLE) AS rev_1997
    FROM per_cust GROUP BY 1
    """,
)
def q124_revenue_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue bridge 1996 → 1997 (growth accounting): each active
    customer is new (1997 only), churned (1996 only), or retained;
    per class: customer count and both years' revenue. ONE
    conditional-aggregate pass per customer (no self-join of two
    year slices), then a 3-row class rollup; revenue stays DECIMAL
    until the final cast so both engines sum exactly."""
    o = load_table(spark, sf_dir, "orders")
    in96 = (F.col("o_orderdate") >= "1996-01-01") & \
           (F.col("o_orderdate") < "1997-01-01")
    in97 = (F.col("o_orderdate") >= "1997-01-01") & \
           (F.col("o_orderdate") < "1998-01-01")
    per_cust = (
        o.filter(in96 | in97)
        .groupBy("o_custkey")
        .agg(
            F.sum(F.when(in96, F.col("o_totalprice").cast(DEC)))
            .alias("r96"),
            F.sum(F.when(in97, F.col("o_totalprice").cast(DEC)))
            .alias("r97"),
        )
    )
    cls = (F.when(F.col("r96").isNull(), "new")
           .when(F.col("r97").isNull(), "churned")
           .otherwise("retained"))
    zero = F.lit(0).cast(DEC)
    return (
        per_cust.groupBy(cls.alias("class"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.coalesce("r96", zero)).cast("double").alias("rev_1996"),
            F.sum(F.coalesce("r97", zero)).cast("double").alias("rev_1997"),
        )
    )


@register(
    "q125_skew_report",
    oracle="""
    WITH items AS (
        SELECT event_type,
               TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
                   AS item
        FROM events
    ),
    cnt AS (SELECT event_type, item, COUNT(*) AS cnt
            FROM items GROUP BY 1, 2),
    -- share/rank BEFORE the top-5 filter: in the same SELECT, WHERE
    -- runs before window functions, which would silently turn the
    -- denominator into the top-5 subtotal
    ranked AS (
        SELECT event_type, item, cnt,
               ROUND(CAST(cnt AS DOUBLE)
                     / SUM(cnt) OVER (PARTITION BY event_type), 4)
                   AS share,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY cnt DESC, item) AS rk
        FROM cnt)
    SELECT event_type, item, CAST(cnt AS BIGINT) AS cnt, share,
           CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= 5
    """,
)
def q125_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew diagnostic: the 5 hottest payload keys per event type
    with their share of that type's traffic — what you run BEFORE
    deciding a join needs salting (q80) or a hot key needs isolation.
    One (type, item) hash agg; both windows (share denominator, rank)
    run over the aggregated key-frequency frame, which is bounded by
    the key domain, not the event volume."""
    ev = load_table(spark, sf_dir, "events")
    cnt = (
        ev.select(
            "event_type",
            F.get_json_object("props", "$.k").cast("bigint").alias("item"),
        )
        .groupBy("event_type", "item")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wt = Window.partitionBy("event_type")
    wr = wt.orderBy(F.col("cnt").desc(), "item")
    return (
        cnt.select(
            "event_type", "item", "cnt",
            F.round(F.col("cnt").cast("double") / F.sum("cnt").over(wt), 4)
            .alias("share"),
            F.row_number().over(wr).cast("int").alias("rk"),
        )
        .filter(F.col("rk") <= 5)
    )


@register(
    "q126_backlog_age",
    oracle="""
    WITH snap AS (SELECT MAX(o_orderdate) AS snap_d FROM orders),
    open_orders AS (
        SELECT o_orderpriority AS priority,
               date_diff('day', o_orderdate, snap_d) AS age_days
        FROM orders, snap WHERE o_orderstatus = 'O'
    )
    SELECT priority,
           CAST(COUNT(*) AS BIGINT) AS n_open,
           ROUND(quantile_cont(age_days, 0.5), 4) AS p50_age,
           ROUND(quantile_cont(age_days, 0.9), 4) AS p90_age,
           CAST(MAX(age_days) AS BIGINT) AS max_age
    FROM open_orders GROUP BY priority
    """,
)
def q126_backlog_age(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog age (days since order date at the corpus
    snapshot = max order date) per priority: count, exact p50/p90,
    max — point-in-time operational reporting. The snapshot is a
    1-row broadcast (scalar-subquery shape); percentiles are exact
    interpolated (q23/q79 discipline — `approx_percentile` is the
    documented 100 TB substitute)."""
    o = load_table(spark, sf_dir, "orders")
    snap = o.agg(F.max("o_orderdate").alias("snap_d"))
    return (
        o.filter(F.col("o_orderstatus") == "O")
        .crossJoin(F.broadcast(snap))
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.datediff("snap_d", "o_orderdate").alias("age_days"),
        )
        .groupBy("priority")
        .agg(
            F.count(F.lit(1)).alias("n_open"),
            F.round(F.percentile("age_days", F.lit(0.5)), 4)
            .alias("p50_age"),
            F.round(F.percentile("age_days", F.lit(0.9)), 4)
            .alias("p90_age"),
            F.max("age_days").cast("bigint").alias("max_age"),
        )
    )


@register(
    "q127_cdc_apply",
    oracle="""
    WITH log AS (
        SELECT l_orderkey AS key, l_linenumber AS seq,
               CASE WHEN l_quantity < 5 THEN 'D' ELSE 'U' END AS op,
               l_extendedprice AS val, l_returnflag AS flag
        FROM lineitem
    ),
    latest AS (
        -- (key, seq) is NOT unique in this synthetic changelog, so
        -- last-writer-wins needs a TOTAL tie-break order (val/op/
        -- flag) to be deterministic on both engines
        SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY key
                          ORDER BY seq DESC, val DESC, op, flag) AS rn
            FROM log)
        WHERE rn = 1
    )
    SELECT flag,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(CASE WHEN op = 'U' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_live,
           CAST(SUM(CASE WHEN op = 'U'
                         THEN CAST(val AS DECIMAL(28,4)) ELSE 0 END)
                AS DOUBLE) AS live_value
    FROM latest GROUP BY flag
    """,
)
def q127_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC / changelog compaction: a (key, seq, op∈{U,D}, value)
    change stream — synthesized deterministically from lineitem
    (key = orderkey, seq = linenumber, small quantities act as
    delete tombstones) — collapsed to last-writer-wins state, with
    deletes removing the key. This is the kernel a lakehouse CDC
    sink (Delta/Iceberg MERGE from a Debezium feed) runs on every
    batch: ONE key-partitioned window picks max-seq per key, then a
    3-ish-row rollup reports surviving keys and live value. At
    100 TB the window shuffle is the unavoidable per-key reduction;
    no joins, no driver state."""
    li = load_table(spark, sf_dir, "lineitem")
    log = li.select(
        F.col("l_orderkey").alias("key"),
        F.col("l_linenumber").alias("seq"),
        F.when(F.col("l_quantity") < 5, "D").otherwise("U").alias("op"),
        F.col("l_extendedprice").alias("val"),
        F.col("l_returnflag").alias("flag"),
    )
    # (key, seq) is not unique in this synthetic changelog — total
    # tie-break order keeps last-writer-wins deterministic
    w = Window.partitionBy("key").orderBy(
        F.col("seq").desc(), F.col("val").desc(), "op", "flag")
    latest = (log.withColumn("rn", F.row_number().over(w))
              .filter(F.col("rn") == 1))
    live = F.col("op") == "U"
    return latest.groupBy("flag").agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(F.when(live, 1).otherwise(0)).alias("n_live"),
        F.sum(F.when(live, F.col("val").cast(DEC)).otherwise(
            F.lit(0).cast(DEC))).cast("double").alias("live_value"),
    )


# ---- q128: k-NN classification accuracy ------------------------------

_KNN_K = 10
_KNN_MOD = 20  # probes: vec_id % 20 == 0

_BUCKET_SQL = " + ".join(
    f"(CASE WHEN embedding[{i + 1}] >= 0 THEN (1 << {i}) ELSE 0 END)"
    for i in range(8)
)


@register(
    "q128_knn_classify",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, label,
               {_BUCKET_SQL} AS bucket,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
               SQRT(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        FROM embeddings
    ),
    pairs AS (
        SELECT q.vec_id AS query_id, q.label AS true_label,
               c.label AS cand_label,
               ROUND(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 4)
                   AS sim,
               c.vec_id AS neighbor_id
        FROM e q JOIN e c
          ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
        WHERE q.vec_id % {_KNN_MOD} = 0
    ),
    knn AS (
        SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY sim DESC, neighbor_id) AS rk
            FROM pairs)
        WHERE rk <= {_KNN_K}
    ),
    votes AS (
        SELECT query_id, true_label, cand_label, COUNT(*) AS c
        FROM knn GROUP BY 1, 2, 3
    ),
    pred AS (
        SELECT query_id, true_label, cand_label AS pred_label
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY c DESC, cand_label) AS vr
              FROM votes)
        WHERE vr = 1
    )
    SELECT CAST(true_label AS INT) AS label,
           CAST(COUNT(*) AS BIGINT) AS n_scored,
           CAST(SUM(CASE WHEN pred_label = true_label
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
           ROUND(CAST(SUM(CASE WHEN pred_label = true_label
                              THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 4) AS accuracy
    FROM pred GROUP BY true_label
    """,
)
def q128_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN majority-vote classification accuracy (k=10) over the
    embedding table: every 20th vector is a probe, candidates come
    from the probe's own IVF cell (q61's sign-bit quantizer — the
    scale path; probes with an empty cell are unscored by declared
    semantics), neighbors rank by ROUNDED cosine (q61 discipline),
    and the majority label (count desc, label asc tie-break)
    predicts. Output: per true label, scored count / correct count /
    accuracy — the auto-labeling quality check a curation pipeline
    runs before trusting propagated labels."""
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
        F.transform("embedding",
                    lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))
    base = e.select("vec_id", "label", bucket.alias("bucket"),
                    v.alias("v"), nrm.alias("nrm"))
    q = (base.filter(F.col("vec_id") % _KNN_MOD == 0)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("label").alias("true_label"), "bucket",
                 F.col("v").alias("qv"), F.col("nrm").alias("qn")))
    dot = F.aggregate(F.zip_with("qv", "v", lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    pairs = (
        F.broadcast(q).join(base, "bucket")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id", "true_label",
            F.col("label").alias("cand_label"),
            F.round(dot / (F.col("qn") * F.col("nrm")), 4).alias("sim"),
            F.col("vec_id").alias("neighbor_id"),
        )
    )
    wk = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), "neighbor_id")
    knn = (pairs.withColumn("rk", F.row_number().over(wk))
           .filter(F.col("rk") <= _KNN_K))
    votes = knn.groupBy("query_id", "true_label", "cand_label").agg(
        F.count(F.lit(1)).alias("c"))
    wv = Window.partitionBy("query_id").orderBy(
        F.col("c").desc(), "cand_label")
    pred = (votes.withColumn("vr", F.row_number().over(wv))
            .filter(F.col("vr") == 1)
            .select("query_id", "true_label",
                    F.col("cand_label").alias("pred_label")))
    hit = F.when(F.col("pred_label") == F.col("true_label"), 1).otherwise(0)
    return (
        pred.groupBy(F.col("true_label").cast("int").alias("label"))
        .agg(
            F.count(F.lit(1)).alias("n_scored"),
            F.sum(hit).alias("n_correct"),
            F.round(F.sum(hit).cast("double") / F.count(F.lit(1)), 4)
            .alias("accuracy"),
        )
    )


@register(
    "q129_profile_columns",
    oracle="""
    SELECT 'c_custkey' AS column_name, COUNT(*) AS n_rows,
           CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_distinct,
           CAST(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_null
    FROM customer
    UNION ALL
    SELECT 'c_name', COUNT(*), CAST(COUNT(DISTINCT c_name) AS BIGINT),
           CAST(SUM(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM customer
    UNION ALL
    SELECT 'c_nationkey', COUNT(*),
           CAST(COUNT(DISTINCT c_nationkey) AS BIGINT),
           CAST(SUM(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM customer
    UNION ALL
    SELECT 'c_acctbal', COUNT(*),
           CAST(COUNT(DISTINCT c_acctbal) AS BIGINT),
           CAST(SUM(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM customer
    UNION ALL
    SELECT 'c_mktsegment', COUNT(*),
           CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT),
           CAST(SUM(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM customer
    """,
)
def q129_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column data profile (row/distinct/null counts) of the
    customer table in ONE pass: a single aggregation computes every
    column's statistics on native types (never stringified — double
    formatting differs across engines), then the 1-row result
    unpivots to the 5-row profile. The multi-distinct expansion is
    the same plan family as q17; at 100 TB you'd swap the exact
    distincts for approx_count_distinct per column, same shape."""
    c = load_table(spark, sf_dir, "customer")
    cols = ["c_custkey", "c_name", "c_nationkey", "c_acctbal",
            "c_mktsegment"]
    one = c.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[F.countDistinct(col).alias(f"d_{col}") for col in cols],
        *[F.sum(F.when(F.col(col).isNull(), 1).otherwise(0))
          .alias(f"z_{col}") for col in cols],
    )
    stack = ", ".join(f"'{col}', d_{col}, z_{col}" for col in cols)
    return one.select(
        F.expr(f"stack({len(cols)}, {stack})")
        .alias("column_name", "n_distinct", "n_null"),
        "n_rows",
    ).select("column_name", "n_rows", "n_distinct", "n_null")
