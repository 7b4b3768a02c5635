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
from hearthstats_spark.queries.analytics_ext7 import q176_ks_two_sample
from hearthstats_spark.queries.registry import REGISTRY, register

#: q177's oracle IS q176's (the exact twin it now hashes) plus the
#: two sandwich verdicts checked as TRUE — derived from the live
#: registry entry, not copied, so the twin can't drift from q176's
#: proven SQL. ext7 registers before this module in QUERY_MODULES
#: and the import above forces it for direct-module loads.
_Q177_ORACLE = REGISTRY["q176_ks_two_sample"].oracle.replace(
    "FROM n, d",
    ",\n           TRUE AS est_le_exact,\n"
    "           TRUE AS exact_le_upper\n    FROM n, d")
assert "est_le_exact" in _Q177_ORACLE  # the anchor text must exist


def _ks_sketch_bounds(spark: SparkSession, sf_dir: str,
                      vals: DataFrame | None = None) -> DataFrame:
    """q177's SKETCH lane, unchanged from its rows-only era except
    for the declared NULL policy (a NULL value is not a sample point
    — now applied here exactly as in q176, so the sandwich below
    compares like with like on the null-measures axis).

    ``vals`` (optimization round 12, guide §1.2): pass q176's cached
    distinct-value-grain frame (v, a0, a1) and pass 2's bucket masses
    aggregate IT instead of re-scanning orders — per bucket,
    SUM(a0)/SUM(a1) over the distinct values in the bucket are
    exactly the per-row side counts, so the emitted integers are
    identical; only the GK cut pass still reads the raw value column
    (approx_percentile has no frequency form, and the mergeable
    sketch over the raw stream is the deployment shape). Standalone
    calls (vals=None) keep the self-contained two-scan lane.

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
    s = o.where(F.col("o_totalprice").isNotNull()).select(
        F.col("o_totalprice").cast("double").alias("v"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 0).otherwise(1)
        .alias("g"))

    # pass 1 — the mergeable GK sketch; B-1 pooled quantile cuts.
    # Empty input: the GK sketch of zero rows is NULL, not a list —
    # an empty ingestion batch degrades to "no cuts" (one all-NULL
    # monitor row) instead of crashing (degenerate audit, round 8)
    sketch = s.agg(F.percentile_approx(
        "v", [i / B for i in range(1, B)], 10_000).alias("c")).head()["c"]
    cuts = sorted(set(sketch)) if sketch is not None else []
    cut_arr = (F.array(*[F.lit(float(c)) for c in cuts])
               if cuts else F.lit([]).cast("array<double>"))

    # pass 2 — exact per-side bucket masses (bucket j = (c_{j-1}, c_j]);
    # from the shared distinct-value frame when the caller has one
    # (identical integers — see the docstring), from the rows otherwise
    bucket = F.aggregate(
        cut_arr, F.lit(0),
        lambda acc, c: acc + F.when(F.col("v") > c, 1).otherwise(0))
    if vals is not None:
        counts = (vals.select(bucket.alias("b"), "a0", "a1")
                  .groupBy("b")
                  .agg(F.sum("a0").alias("m0"), F.sum("a1").alias("m1")))
    else:
        counts = (
            s.select(bucket.alias("b"), "g")
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
        F.max("d_num").cast("bigint").alias("d_est_num"),
        F.max("bound_num").cast("bigint").alias("d_bound_num"),
        (F.max("d_num") / (F.max("n0") * F.max("n1")))
        .alias("ks_d_est"),
        (F.max("bound_num") / (F.max("n0") * F.max("n1")))
        .alias("ks_d_upper"),
    )


@register("q177_ks_sketch_drift", oracle=_Q177_ORACLE)
def q177_ks_sketch_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate two-sample KS drift monitor, oracle-checked via
    its exact twin (upgraded round 10, VERDICT r9 item 5).

    The sketch lane (_ks_sketch_bounds above — GK cuts, exact bucket
    masses, data-driven d_est/d_upper sandwich) is what a 100 TB
    monitoring deployment runs; its VALUES depend on GK cut
    placement, which DuckDB cannot reproduce. So the hashed columns
    are q176's exact statistic (the twin is q176's registered kernel
    itself — one source of truth) plus the two sandwich verdicts as
    integer-numerator booleans over the COMMON denominator n0·n1:

    - est_le_exact:   max sketch d_num  ≤  exact d_numerator
      (d_est evaluates the sup on a subset of candidate points);
    - exact_le_upper: exact d_numerator ≤  max sketch bound_num
      (left-edge distance + larger bucket side-mass bounds the sup
      inside every bucket).

    A cut-placement regression that breaks either inequality flips a
    boolean and fails the driver hash. COALESCE(…, TRUE) covers the
    degenerate one-group/empty corpus where either side's numerator
    is NULL — both engines emit the same exact columns there. The
    1×1 scalar join is a broadcast nested loop on literally one row
    per side (the allowlisted scalar-frame shape)."""
    # optimization round 12 (guide §1.2): ONE cached distinct-value
    # frame feeds both lanes — the exact kernel's three evaluations
    # and the sketch's bucket-mass pass previously each re-ran the
    # orders scan + groupBy(v) agg (~5 scans per q177 build)
    from hearthstats_spark.queries.analytics_ext7 import (
        _ks_exact_from_vals, _ks_grouped_vals)

    vals = _ks_grouped_vals(spark, sf_dir)
    sk = _ks_sketch_bounds(spark, sf_dir, vals)
    ex = _ks_exact_from_vals(vals)
    return (
        ex.join(F.broadcast(sk.select("d_est_num", "d_bound_num")))
        .select(
            "n_urgent", "n_other", "d_numerator", "ks_d",
            F.coalesce(F.col("d_est_num") <= F.col("d_numerator"),
                       F.lit(True)).alias("est_le_exact"),
            F.coalesce(F.col("d_numerator") <= F.col("d_bound_num"),
                       F.lit(True)).alias("exact_le_upper"),
        )
    )


@register(
    "q178_multiset_setops",
    oracle="""
    WITH a AS (SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'),
         b AS (SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'),
         ia AS (SELECT l_partkey FROM a INTERSECT ALL
                SELECT l_partkey FROM b),
         ea AS (SELECT l_partkey FROM a EXCEPT ALL
                SELECT l_partkey FROM b)
    SELECT 'intersect_all' AS tag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_keys,
           CAST(COALESCE(SUM(l_partkey), 0) AS BIGINT) AS key_checksum
    FROM ia
    UNION ALL
    SELECT 'except_all',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT),
           CAST(COALESCE(SUM(l_partkey), 0) AS BIGINT)
    FROM ea
    """,
)
def q178_multiset_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTISET set operations — INTERSECT ALL / EXCEPT ALL, the
    duplicate-preserving flavors q32/q33's DISTINCT forms don't
    cover: per part, returned ('A') shipments ∩/− refused ('R')
    shipments with MULTIPLICITY semantics (a part with 5 'A' and 3 'R'
    lines contributes 3 rows to the intersection and 2 to the difference —
    bag algebra, not sets).

    Engine: ``intersectAll``/``exceptAll``. Catalyst rewrites both
    into ONE count-aggregate per side + a join + ``Generate``
    replicating each key min(cnt_a, cnt_b) (resp. cnt_a − cnt_b)
    times — so the data-sized shuffle is the two partial-aggregated
    key-count frames, never the raw multiplicity-expanded rows; the
    row explosion happens AFTER the join on the already-tiny key
    frame. That is exactly the 100 TB-safe plan one would hand-write,
    for free. Output: per-op row count, distinct keys, key checksum
    (multiplicity-weighted, so a wrong replication count flips it)."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "A").select("l_partkey")
    b = li.filter(F.col("l_returnflag") == "R").select("l_partkey")

    def _stats(df: DataFrame, tag: str) -> DataFrame:
        return df.agg(
            F.lit(tag).alias("tag"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.countDistinct("l_partkey").cast("bigint").alias("n_keys"),
            F.coalesce(F.sum("l_partkey"), F.lit(0))
            .cast("bigint").alias("key_checksum"),
        )

    return (_stats(a.intersectAll(b), "intersect_all")
            .unionByName(_stats(a.exceptAll(b), "except_all")))


@register(
    "q179_scd2_pit_join",
    oracle="""
    WITH o AS (
        SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
               LAG(o_orderstatus) OVER w AS prev_status
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey)
    ),
    chg AS (
        SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey
        FROM o
        WHERE prev_status IS NULL OR prev_status <> o_orderstatus
    ),
    dim AS (
        SELECT o_custkey AS custkey, o_orderstatus AS status,
               o_orderdate AS valid_from,
               LEAD(o_orderdate) OVER w2 AS valid_to
        FROM chg
        WINDOW w2 AS (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey)
    )
    SELECT d.status AS status_then,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN f.o_orderstatus <> d.status
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_superseded,
           CAST(SUM(CAST(f.o_totalprice AS DECIMAL(28,4)))
                AS DOUBLE) AS sum_totalprice
    FROM orders f JOIN dim d
      ON f.o_custkey = d.custkey
     AND d.valid_from <= f.o_orderdate
     AND (d.valid_to IS NULL OR f.o_orderdate < d.valid_to)
    GROUP BY 1
    """,
)
def q179_scd2_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINT-IN-TIME join against the SCD-2 dimension q96 builds —
    the feature-store correctness op (training rows must see the
    dimension AS OF their event time, or the model trains on the
    future): each order joins the customer-status version whose
    half-open validity interval [valid_from, valid_to) contains its
    order date. The versions tile [first_order, ∞) per customer, so
    every fact matches EXACTLY one version (same-date status flips
    produce zero-length intervals that correctly match nothing —
    ``n_superseded`` counts facts whose own status was superseded
    intra-date, making the degenerate-interval handling visible in
    the output rather than silent).

    Scale shape: equi-join on custkey with the interval test as a
    join FILTER — SMJ/shuffle-hash on the dimension key, per-key
    fan-out bounded by that customer's version count (timeline
    length), never a range cross product. The dimension frame comes
    out of q96's windows already hash(custkey)-partitioned, and the
    join keys on the same column, so the dimension side re-uses its
    shuffle — one exchange for the fact side only. Distinct from
    q13/q109/q162 (nearest-event as-of) and q66 (sliding range): PIT
    is interval-CONTAINMENT against versioned state."""
    from hearthstats_spark.queries.pipeline_ext import q96_scd2_history

    dim = q96_scd2_history(spark, sf_dir)
    f = load_table(spark, sf_dir, "orders")
    j = f.join(
        dim,
        (f["o_custkey"] == dim["custkey"])
        & (dim["valid_from"] <= f["o_orderdate"])
        & (dim["valid_to"].isNull()
           | (f["o_orderdate"] < dim["valid_to"])))
    return (j.groupBy(F.col("status").alias("status_then"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"),
                 F.sum(F.when(F.col("o_orderstatus") != F.col("status"), 1)
                       .otherwise(0)).cast("bigint").alias("n_superseded"),
                 F.sum(F.col("o_totalprice").cast("decimal(28,4)"))
                 .cast("double").alias("sum_totalprice")))


@register(
    "q180_dim_quantile_bucketing",
    oracle="""
    WITH r AS (
        SELECT p_brand, p_partkey, p_retailprice,
               ROW_NUMBER() OVER (PARTITION BY p_brand
                                  ORDER BY p_retailprice, p_partkey) AS rn,
               COUNT(*) OVER (PARTITION BY p_brand) AS n
        FROM part
    ),
    cuts AS (
        SELECT p_brand,
               MAX(CASE WHEN rn = CAST(CEIL(0.25 * n) AS BIGINT)
                        THEN p_retailprice END) AS c1,
               MAX(CASE WHEN rn = CAST(CEIL(0.50 * n) AS BIGINT)
                        THEN p_retailprice END) AS c2,
               MAX(CASE WHEN rn = CAST(CEIL(0.75 * n) AS BIGINT)
                        THEN p_retailprice END) AS c3
        FROM r GROUP BY p_brand
    ),
    pb AS (
        SELECT p.p_partkey, p.p_brand,
               1 + CASE WHEN p.p_retailprice > c.c1 THEN 1 ELSE 0 END
                 + CASE WHEN p.p_retailprice > c.c2 THEN 1 ELSE 0 END
                 + CASE WHEN p.p_retailprice > c.c3 THEN 1 ELSE 0 END AS q
        FROM part p JOIN cuts c ON p.p_brand = c.p_brand
    )
    SELECT pb.p_brand AS brand, CAST(pb.q AS INT) AS price_quartile,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(4,2))))
                AS DOUBLE) AS revenue
    FROM lineitem l JOIN pb ON l.l_partkey = pb.p_partkey
    GROUP BY 1, 2
    """,
)
def q180_dim_quantile_bucketing(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Dimension-derived quantile feature bucketing — the feature
    transform behind "price-tier" style model inputs: quartile cuts
    of part retail price are computed PER BRAND on the dimension,
    every part gets its value-based quartile label, and fact revenue
    aggregates per (brand, tier).

    Cut semantics are percentile_disc-style integer rank arithmetic
    (value at rank ceil(q·n) under a deterministic (price, partkey)
    order; bucket = 1 + #cuts strictly below the value) — ties share
    a bucket and no float interpolation exists to diverge across
    engines (q145's discipline).

    Scale shape: the expensive column (lineitem) is touched ONCE, by
    an equi-join on partkey. Quantiles, the usually-expensive part,
    run on the DIMENSION (part = 0.2% of lineitem rows): one window
    per brand + a brand-keyed groupBy, then a dimension⋈dimension
    join on brand — all part-scale. No forced broadcast anywhere
    (part is SF-linear; AQE promotes what fits — the plan-audit
    rule from VERDICT r4 item 1)."""
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("p_brand").orderBy("p_retailprice", "p_partkey")
    wn = Window.partitionBy("p_brand")
    r = (p.select("p_brand", "p_partkey", "p_retailprice")
         .withColumn("rn", F.row_number().over(w))
         .withColumn("n", F.count(F.lit(1)).over(wn)))
    cuts = r.groupBy("p_brand").agg(*[
        F.max(F.when(F.col("rn") == F.ceil(q * F.col("n")),
                     F.col("p_retailprice"))).alias(c)
        for q, c in ((0.25, "c1"), (0.50, "c2"), (0.75, "c3"))])
    pb = (p.join(cuts, "p_brand")
          .select("p_partkey", "p_brand",
                  (F.lit(1)
                   + (F.col("p_retailprice") > F.col("c1")).cast("int")
                   + (F.col("p_retailprice") > F.col("c2")).cast("int")
                   + (F.col("p_retailprice") > F.col("c3")).cast("int"))
                  .alias("q")))
    return (li.join(pb, li["l_partkey"] == pb["p_partkey"])
            .groupBy(F.col("p_brand").alias("brand"),
                     F.col("q").cast("int").alias("price_quartile"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_lineitems"),
                 F.sum(F.col("l_extendedprice").cast("decimal(18,2)")
                       * (F.lit(1) - F.col("l_discount")
                          .cast("decimal(4,2)")))
                 .cast("double").alias("revenue")))


@register(
    "q181_cdc_apply",
    oracle="""
    WITH log AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN event_type = 'error' THEN 'D'
                    WHEN event_type = 'signup' THEN 'I'
                    ELSE 'U' END AS op
        -- declared: a CDC record with a NULL key targets no row —
        -- excluded on both engines (the engine's NULL hash group
        -- would otherwise emit a phantom key whose NaN poisons the
        -- pandas int column; the oracle's equi-join silently drops
        -- it — null-keys degenerate axis)
        FROM events WHERE user_id IS NOT NULL
    ),
    w AS (
        SELECT user_id, op, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM log
    ),
    agg AS (
        SELECT user_id, COUNT(*) AS n_ops,
               SUM(CASE WHEN op = 'D' THEN 1 ELSE 0 END) AS n_deletes
        FROM log GROUP BY user_id
    )
    SELECT a.user_id, w.op AS last_op,
           CASE WHEN w.op = 'D' THEN NULL ELSE w.value END AS last_value,
           CAST(a.n_ops AS BIGINT) AS n_ops,
           CAST(a.n_deletes AS BIGINT) AS n_deletes
    FROM agg a JOIN w ON a.user_id = w.user_id AND w.rn = 1
    """,
)
def q181_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog compaction — apply an ordered
    insert/update/delete log to produce each key's live state
    (last-writer-wins upsert; a trailing delete tombstones the key's
    value but the row survives with last_op='D' so the consumer can
    propagate the tombstone — the Debezium/Delta CDF consumption
    pattern, and the batch twin of s09's MERGE which sees only the
    final image, not the op stream). Events map signup→I,
    view/click/purchase→U, error→D; order is (ts, event_id) —
    event_id uniqueness makes the winner deterministic.

    Scale shape: ONE hash aggregation — ``max_by(struct(op, value),
    struct(ts, event_id))`` picks the last op per key with map-side
    partial aggregation (two rows of any key meeting in a combiner
    keep the later one), so a 100 TB changelog compacts without any
    window sort over the raw table; counts ride the same agg. This
    beats the window-rank formulation (which must materialize the
    full per-key sort) precisely because CDC apply only needs the
    ARGMAX row, not ranks — the oracle uses the window form, which
    is the semantic definition."""
    ev = load_table(spark, sf_dir, "events")
    # declared: a CDC record with a NULL key targets no row
    log = ev.where(F.col("user_id").isNotNull()).select(
        "user_id", "ts", "event_id", "value",
        F.when(F.col("event_type") == "error", "D")
        .when(F.col("event_type") == "signup", "I")
        .otherwise("U").alias("op"))
    agg = log.groupBy("user_id").agg(
        F.max_by(F.struct("op", "value"),
                 F.struct("ts", "event_id")).alias("last"),
        F.count(F.lit(1)).cast("bigint").alias("n_ops"),
        F.sum(F.when(F.col("op") == "D", 1).otherwise(0))
        .cast("bigint").alias("n_deletes"))
    return agg.select(
        "user_id",
        F.col("last.op").alias("last_op"),
        F.when(F.col("last.op") == "D", F.lit(None).cast("double"))
        .otherwise(F.col("last.value")).alias("last_value"),
        "n_ops", "n_deletes")
