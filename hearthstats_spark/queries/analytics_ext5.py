"""Round-4 analytics extensions (SURVEY.md §2 group [E5]):

- q152 interval union coverage (gaps-and-islands over real intervals)
- q153 copied-span scan (longest shared n-gram run — memorization)
- q154 percent_rank / cume_dist window surface
- q155 sorted-neighborhood dedup (the SNM member of the dedup family)
- q156 referential-integrity orphan audit
- q157 market-basket lift (exact rational scoring over q94's shape)

Every float that reaches the output goes through the exact integer
half-away kernels (functions.numeric dratio/fratio_sql) or is a
single IEEE op on identical inputs — the engine-wide hash-stability
discipline (SURVEY.md §1.3 note 2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hearthstats_spark.functions.numeric import dratio, fratio_sql
from hearthstats_spark.io import load_table
from hearthstats_spark.queries.registry import register


@register(
    "q152_interval_coverage",
    oracle="""
    WITH iv AS (
        SELECT l_suppkey,
               datediff('day', DATE '1970-01-01', l_shipdate) AS s,
               datediff('day', DATE '1970-01-01', l_shipdate)
                   + CAST(l_quantity AS BIGINT) - 1 AS e,
               l_orderkey, l_linenumber
        -- declared: a NULL quantity gives the line no duration — it
        -- is not an interval and occupies no days (null-measures
        -- degenerate axis; engine filter mirrors)
        FROM lineitem WHERE l_quantity IS NOT NULL
    ),
    m AS (
        SELECT l_suppkey, s, e, l_orderkey, l_linenumber,
               MAX(e) OVER (PARTITION BY l_suppkey
                            ORDER BY s, e, l_orderkey, l_linenumber
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING) AS prev_e
        FROM iv
    ),
    g AS (
        SELECT l_suppkey, s, e,
               SUM(CASE WHEN prev_e IS NULL OR s > prev_e
                        THEN 1 ELSE 0 END)
                   OVER (PARTITION BY l_suppkey
                         ORDER BY s, e, l_orderkey, l_linenumber
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS island
        FROM m
    ),
    isl AS (
        SELECT l_suppkey, island,
               MAX(e) - MIN(s) + 1 AS covered
        FROM g GROUP BY 1, 2
    ),
    per_supp AS (
        SELECT l_suppkey,
               CAST(SUM(covered) AS BIGINT) AS covered_days,
               CAST(COUNT(*) AS BIGINT) AS n_islands
        FROM isl GROUP BY 1
    )
    SELECT n.n_name,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           CAST(SUM(covered_days) AS BIGINT) AS total_covered_days,
           CAST(MAX(covered_days) AS BIGINT) AS max_covered_days,
           CAST(SUM(n_islands) AS BIGINT) AS total_islands
    FROM per_supp
    JOIN supplier s ON s.s_suppkey = per_supp.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    GROUP BY 1
    """,
)
def q152_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval UNION length (utilization / coverage): each lineitem
    occupies its supplier for [shipdate, shipdate + quantity - 1]
    days; report per nation the total DISTINCT days covered across
    that nation's suppliers — overlapping shipments must not double-
    count. The machine-utilization / SLA-coverage / on-call-overlap
    query family, and the canonical gaps-and-islands instance over
    REAL intervals (q43's sessionization is the point-event special
    case).

    Algorithm: sort a supplier's intervals by start; an interval
    starts a new ISLAND iff its start exceeds the running MAX of all
    previous ends (not lag(e) — an earlier long interval can swallow
    several later ones); island coverage = max(e) - min(s) + 1, all
    exact BIGINT day arithmetic (datediff from a fixed epoch).

    Scale: one shuffle on l_suppkey for the two stacked windows
    (Spark reuses the partitioning — one Exchange), then supplier-
    and nation-sized aggs; never an interval×interval self-join
    (the quadratic formulation q117 also avoids). Skewed suppliers
    are bounded by their lineitem count; the window state is one
    running max."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    epoch = F.lit("1970-01-01").cast("date")
    iv = li.where(
        # declared NULL policy: no quantity -> no duration -> not an
        # interval (a NULL end would also make the running-max island
        # test order-dependent across engines' NULL sort defaults)
        F.col("l_quantity").isNotNull()
    ).select(
        "l_suppkey", "l_orderkey", "l_linenumber",
        F.datediff(F.col("l_shipdate"), epoch).cast("bigint").alias("s"),
        (F.datediff(F.col("l_shipdate"), epoch)
         + F.col("l_quantity").cast("bigint") - 1).alias("e"),
    )
    w_prev = (Window.partitionBy("l_suppkey")
              .orderBy("s", "e", "l_orderkey", "l_linenumber")
              .rowsBetween(Window.unboundedPreceding, -1))
    # the cumulative window MUST use the same FULLY deterministic
    # ordering as w_prev: with ties on (s, e) alone, only the
    # tie-group's first row (in w_prev order) can carry the
    # new-island flag, and an engine-arbitrary tie order in this
    # ROWS frame could file the group's other rows under the
    # previous island (round-4 self-review; masked at current data)
    w_cum = (Window.partitionBy("l_suppkey")
             .orderBy("s", "e", "l_orderkey", "l_linenumber")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    m = iv.withColumn("prev_e", F.max("e").over(w_prev))
    g = m.withColumn(
        "island",
        F.sum(F.when(F.col("prev_e").isNull()
                     | (F.col("s") > F.col("prev_e")), 1)
              .otherwise(0)).over(w_cum))
    isl = (g.groupBy("l_suppkey", "island")
           .agg((F.max("e") - F.min("s") + 1).alias("covered")))
    per_supp = (isl.groupBy("l_suppkey")
                .agg(F.sum("covered").cast("bigint").alias("covered_days"),
                     F.count(F.lit(1)).cast("bigint").alias("n_islands")))
    return (
        per_supp
        # supplier is SF-linear — no broadcast hint (AQE decides);
        # nation (25 rows) keeps its hint.
        .join(sup,
              per_supp["l_suppkey"] == sup["s_suppkey"])
        .join(F.broadcast(nat),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
             F.sum("covered_days").cast("bigint")
             .alias("total_covered_days"),
             F.max("covered_days").cast("bigint")
             .alias("max_covered_days"),
             F.sum("n_islands").cast("bigint").alias("total_islands"))
    )


_SPAN_N = 5  # word n-gram width for the copied-span scan


@register(
    "q153_copied_spans",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
                  FROM documents WHERE text IS NOT NULL),
    sh AS (SELECT doc_id, i + 1 AS pos,
                  array_to_string(t[i+1:i+{_SPAN_N}], ' ') AS s
           FROM toks CROSS JOIN generate_series(0, 4096) g(i)
           WHERE i <= len(t) - {_SPAN_N}),
    own AS (SELECT s, COUNT(DISTINCT doc_id) AS nd FROM sh GROUP BY 1),
    flags AS (
        SELECT sh.doc_id, sh.pos,
               CASE WHEN own.nd >= 2 THEN 1 ELSE 0 END AS shared
        FROM sh JOIN own ON own.s = sh.s
    ),
    runs AS (
        SELECT doc_id, pos,
               pos - ROW_NUMBER() OVER (PARTITION BY doc_id
                                        ORDER BY pos) AS grp
        FROM flags WHERE shared = 1
    ),
    max_run AS (
        SELECT doc_id, CAST(MAX(run) AS BIGINT) AS max_copied_run
        FROM (SELECT doc_id, grp, COUNT(*) AS run
              FROM runs GROUP BY 1, 2)
        GROUP BY 1
    ),
    per_doc AS (
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_shingles,
               CAST(SUM(shared) AS BIGINT) AS n_shared
        FROM flags GROUP BY 1
    )
    SELECT p.doc_id, p.n_shingles, p.n_shared,
           {fratio_sql('p.n_shared', 'p.n_shingles', 'shared_share')},
           COALESCE(m.max_copied_run, 0) AS max_copied_run
    FROM per_doc p LEFT JOIN max_run m ON m.doc_id = p.doc_id
    """,
)
def q153_copied_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copied-span scan (memorization / verbatim-overlap audit): per
    document, the share of its word-{n}-gram positions that appear in
    at least one OTHER document, and the length of the longest
    CONSECUTIVE run of such positions — the "longest copied span".
    Distinct from q134 (first-owner novelty: asymmetric, ingestion-
    ordered) and q91 (screen against a designated eval split): this
    is the symmetric any-other-doc overlap profile, with the run
    length that separates boilerplate phrases (short runs) from
    wholesale copying (long runs) — the span statistic memorization
    audits report.

    Plan: positioned shingle explode → vocabulary-sized distinct-owner
    agg → join back on the shingle → per-doc agg + a gaps-and-islands
    window (pos - row_number) for the max run. Linear shuffles; the
    vocab agg is q134's shape with an owner COUNT instead of min.
    shared_share uses the exact half-away ratio kernel (small integer
    ratios are the cross-engine ROUND trap)."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull())
    # docs shorter than the shingle width have no positions — filter
    # them BEFORE the sequence: Spark's sequence(1, 0) runs
    # DESCENDING ([1, 0]) instead of empty and would fabricate
    # truncated shingles at pos 1/0 (round-4 self-review; the oracle's
    # WHERE i <= len(t) - 5 already excludes them)
    toks = (d.select("doc_id", F.split("text", " ").alias("t"))
            .filter(F.size("t") >= _SPAN_N))
    sh = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(1),
                    F.size("t") - (_SPAN_N - 1)),
                lambda i: F.struct(
                    i.alias("pos"),
                    F.array_join(F.slice("t", i, _SPAN_N), " ")
                    .alias("s")))).alias("ps"),
    ).select("doc_id", F.col("ps.pos").alias("pos"),
             F.col("ps.s").alias("s"))
    # the owner agg and the join back both read sh; cache like q134
    sh = sh.cache()
    own = sh.groupBy("s").agg(
        F.count_distinct("doc_id").alias("nd"))
    # optimization round 11 (guide §2.3): join against the SHARED
    # vocabulary only — an inner join on the full owner table carried
    # every unique shingle (most of a natural corpus) through the
    # s-keyed exchange just to flag it 0. Filtering the agg to
    # nd ≥ 2 first shrinks the join's build side to the shared
    # vocabulary (a left join + null-test is flag-identical), which
    # both halves the exchange bytes and lets AQE broadcast the
    # build side when the shared vocab is small — the common case a
    # copied-spans audit expects. Same rows by construction.
    flags = (sh.join(own.filter(F.col("nd") >= 2)
                     .select("s", F.lit(1).alias("__sh_hit")),
                     "s", "left_outer")
             .select("doc_id", "pos",
                     F.coalesce("__sh_hit", F.lit(0)).alias("shared")))
    # A/B'd and REJECTED in optimization round 11 (guide §2.4 trial):
    # a doc_id-partitioned checkpoint of flags — to run the
    # duplicated own-agg/join subtree once and make per_doc/window/
    # final-join exchange-free — measured WORSE interleaved at sf0.1
    # (old 2.5-3.2 s vs checkpointed 3.1-3.4 s): the "duplicate"
    # subtree reads the cached sh and a map-combined vocab-sized own
    # agg (cheap), while the checkpoint pays a shingle-scale
    # materialization round-trip. The cache+recompute shape stands.
    per_doc = (flags.groupBy("doc_id")
               .agg(F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
                    F.sum("shared").cast("bigint").alias("n_shared")))
    runs = (flags.filter(F.col("shared") == 1)
            .withColumn(
                "grp",
                F.col("pos") - F.row_number().over(
                    Window.partitionBy("doc_id").orderBy("pos"))))
    max_run = (runs.groupBy("doc_id", "grp")
               .agg(F.count(F.lit(1)).alias("run"))
               .groupBy("doc_id")
               .agg(F.max("run").cast("bigint").alias("max_copied_run")))
    return (
        per_doc.join(max_run, "doc_id", "left")
        .select(
            "doc_id", "n_shingles", "n_shared",
            dratio(F.col("n_shared"), F.col("n_shingles"),
                   "shared_share"),
            F.coalesce("max_copied_run", F.lit(0)).cast("bigint")
            .alias("max_copied_run"))
    )


@register(
    "q154_percent_rank_cume_dist",
    oracle="""
    SELECT event_id, event_type,
           percent_rank() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS pct_rank,
           cume_dist() OVER (PARTITION BY event_type
                             ORDER BY value, event_id) AS cume
    FROM events
    WHERE value IS NOT NULL
    """,
)
def q154_percent_rank_cume_dist(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Relative-standing window functions: percent_rank and cume_dist
    of each event's value within its type — the percentile-position
    surface q24/q29/q145 (rank / ntile / percentile_disc) don't
    cover; scorecards and anomaly dashboards consume exactly these.

    Cross-engine exactness WITHOUT rounding: both engines define
    percent_rank = (rank-1)/(n-1) and cume_dist = n_peers_le/n, and
    with a tie-free ordering ((value, event_id) is unique) every
    numerator/denominator is an exact integer — each value is then
    ONE correctly-rounded IEEE division of identical integers, so the
    doubles agree bit-for-bit and need no ROUND discipline. NULL
    values are filtered on both sides (q145's engine-default
    asymmetry). One user-keyed... type-keyed shuffle, two window
    functions over the same frame — one Exchange."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull())
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return e.select(
        "event_id", "event_type",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@register(
    "q155_dedup_sorted_neighborhood",
    oracle="""
    WITH d AS (
        SELECT doc_id, text,
               string_split(text, ' ')[1] AS blk,
               list_distinct(string_split(text, ' ')) AS words
        FROM documents WHERE text IS NOT NULL
    ),
    nb AS (
        SELECT doc_id AS id_a, words AS w_a, text,
               LEAD(doc_id) OVER (PARTITION BY blk
                                  ORDER BY text, doc_id) AS id_b,
               LEAD(words) OVER (PARTITION BY blk
                                 ORDER BY text, doc_id) AS w_b
        FROM d
    )
    SELECT id_a, id_b,
           CAST(len(list_intersect(w_a, w_b)) AS BIGINT) AS n_inter,
           CAST(len(w_a) AS BIGINT) AS sz_a,
           CAST(len(w_b) AS BIGINT) AS sz_b
    FROM nb
    WHERE id_b IS NOT NULL
      AND 3 * len(list_intersect(w_a, w_b)) >= len(w_a) + len(w_b)
    """,
)
def q155_dedup_sorted_neighborhood(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Sorted-Neighborhood dedup (SNM — the third classical blocking
    family after LSH banding (q118) and prefix filtering (q83)): sort
    records within a blocking key (first token), slide a window of
    adjacent records, and compare ONLY neighbors. Catches the
    near-dups that cluster under the sort key at a guaranteed
    O(n·w) comparison budget — the method of record-linkage stacks
    (Hernández-Stolfo) and a standard pre-pass before expensive pair
    scoring.

    Here w=2 (immediate neighbor via lead()); the match predicate is
    exact distinct-word Jaccard >= 0.5 expressed as the INTEGER
    inequality 3·|A∩B| >= |A|+|B| (t=1/2 ⟺ |∩|/(|A|+|B|-|∩|) >= 1/2)
    — no float ratio anywhere, so the threshold can't drift between
    engines. Scale: the window shuffles once on the block key; within
    a block the comparison count is exactly n-1 regardless of how
    similar the docs are (the property that makes SNM predictable
    where q83's candidate count is data-dependent)."""
    d = (load_table(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull())
         .select("doc_id", "text",
                 F.split("text", " ").alias("t")))
    d = d.select(
        "doc_id", "text",
        F.element_at("t", 1).alias("blk"),
        F.array_distinct("t").alias("words"))
    w = Window.partitionBy("blk").orderBy("text", "doc_id")
    nb = d.select(
        F.col("doc_id").alias("id_a"),
        F.col("words").alias("w_a"),
        F.lead("doc_id").over(w).alias("id_b"),
        F.lead("words").over(w).alias("w_b"),
    ).filter(F.col("id_b").isNotNull())
    inter = F.size(F.array_intersect("w_a", "w_b"))
    return (
        nb.filter(3 * inter >= F.size("w_a") + F.size("w_b"))
        .select("id_a", "id_b",
                inter.cast("bigint").alias("n_inter"),
                F.size("w_a").cast("bigint").alias("sz_a"),
                F.size("w_b").cast("bigint").alias("sz_b"))
    )


@register(
    "q156_fk_orphans",
    oracle="""
    SELECT 'lineitem->orders' AS fk, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN NOT EXISTS (
               SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
               THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
    FROM lineitem l
    UNION ALL
    SELECT 'lineitem->part', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN NOT EXISTS (
               SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
               THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem l
    UNION ALL
    SELECT 'lineitem->supplier', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN NOT EXISTS (
               SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)
               THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem l
    UNION ALL
    SELECT 'orders->customer', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN NOT EXISTS (
               SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
               THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders o
    """,
)
def q156_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity profiler: for each declared FK edge of
    the star schema, the fact row count and how many rows point at a
    MISSING dimension key — the first audit any warehouse load runs
    (complements q68's null/range audit and q129's per-column
    profile, which don't cross tables).

    Plan: each check is one LEFT join + conditional sum, emitted as
    one row and unioned — never a row-multiplying join (joining on a
    candidate key can only null-extend, not fan out), never a
    correlated probe per row. At 100 TB each check is a single
    fact-sized shuffle-or-broadcast join; the four checks share
    nothing so AQE runs them as independent stages. All counts exact
    BIGINT."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")

    def check(fact: DataFrame, fk: str, dim: DataFrame, pk: str,
              label: str) -> DataFrame:
        probe = dim.select(F.col(pk).alias("__pk")).distinct()
        return (
            fact.join(probe, fact[fk] == F.col("__pk"), "left")
            .agg(F.lit(label).alias("fk"),
                 F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                 F.sum(F.when(F.col("__pk").isNull(), 1).otherwise(0))
                 .cast("bigint").alias("n_orphans"))
        )

    return (
        check(li, "l_orderkey", o, "o_orderkey", "lineitem->orders")
        .unionByName(check(li, "l_partkey", p, "p_partkey",
                           "lineitem->part"))
        .unionByName(check(li, "l_suppkey", s, "s_suppkey",
                           "lineitem->supplier"))
        .unionByName(check(o, "o_custkey", c, "c_custkey",
                           "orders->customer"))
    )


_LIFT_CAP = 64     # per-order basket cap (q98's declared winsorization)
_LIFT_MINCO = 3    # min pair support before scoring
_LIFT_TOPN = 20


@register(
    "q157_basket_lift",
    oracle=f"""
    WITH po0 AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    po AS (
        SELECT l_orderkey, l_partkey
        FROM (SELECT l_orderkey, l_partkey,
                     row_number() OVER (PARTITION BY l_orderkey
                                        ORDER BY l_partkey) AS rn
              FROM po0)
        WHERE rn <= {_LIFT_CAP}
    ),
    n_tot AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM po),
    item AS (SELECT l_partkey, COUNT(*) AS ni FROM po GROUP BY 1),
    pair AS (
        SELECT a.l_partkey AS item_a, b.l_partkey AS item_b,
               COUNT(*) AS co
        FROM po a JOIN po b
          ON a.l_orderkey = b.l_orderkey
         AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        HAVING COUNT(*) >= {_LIFT_MINCO}
    ),
    scored AS (
        SELECT item_a, item_b, CAST(co AS BIGINT) AS co,
               {fratio_sql('pair.co * n_tot.n', 'ia.ni * ib.ni', 'lift')}
        FROM pair, n_tot
        JOIN item ia ON ia.l_partkey = pair.item_a
        JOIN item ib ON ib.l_partkey = pair.item_b
    )
    SELECT * FROM scored
    ORDER BY lift DESC, item_a, item_b LIMIT {_LIFT_TOPN}
    """,
)
def q157_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket LIFT: top-{k} part pairs by
    lift = P(a,b) / (P(a)·P(b)) = co·N / (n_a·n_b) over order
    baskets — the association-rule score that separates genuinely
    correlated items from merely popular ones (q94's co-count ranks
    popular×popular pairs first; lift normalizes that away).

    Exactness: co·N and n_a·n_b are exact BIGINT products, the lift
    is ONE exact half-away-rounded ratio (dratio — ratios of small
    integers are the cross-engine ROUND trap), and the ranking uses
    the ROUNDED value with (item_a, item_b) tie-breaks (q61/q108
    discipline). Plan: q98's basket formulation instead of the
    capped-basket SELF-JOIN the oracle spells — per-order basket
    (collect_set), sorted-slice winsorization to the {cap} smallest
    parts (identical semantics to the oracle's row_number cap; the
    equivalence is co_order_edges' proven one), then map-side HOF
    pair expansion with pairs PACKED into one BIGINT riding a single
    hash agg — ONE basket shuffle + one single-long-key pair agg
    replaces distinct + window sort + join-shuffle×2. Unlike
    co_order_edges there is NO distinct: a pair occurs at most once
    per order (ps is a set), so the agg's count IS the co-occurrence
    support. Precondition partkeys < 2³¹ (generation-guaranteed; see
    operators/pairs — the signed-BIGINT pack overflows past 2³¹). Item counts and the 1-row N frame read the
    same checkpointed basket frame; min-support HAVING prune, item
    counts joined back key-equi (O(parts) — AQE promotes to
    broadcast only when the runtime size fits), the N scalar riding
    on via broadcast cross join (the scalar-subquery shape,
    plan-audit allowlisted), then orderBy+LIMIT top-k (per-partition
    heaps, no global sort)."""
    from hearthstats_spark.operators.pairs import (
        capped_basket, packed_pairs, unpack_pair,
    )

    li = load_table(spark, sf_dir, "lineitem")
    basket = (li.groupBy("l_orderkey")
              .agg(*capped_basket("l_orderkey", "l_partkey", _LIFT_CAP))
              # the N scalar, the item counts, and the pair expansion
              # all read this frame; materialize once (q98's rule)
              .localCheckpoint())
    n_tot = basket.agg(F.count(F.lit(1)).alias("n"))
    item = (basket.select(F.explode("ps").alias("l_partkey"))
            .groupBy("l_partkey").agg(F.count(F.lit(1)).alias("ni")))
    pair = (
        basket.select(F.explode(packed_pairs("ps")).alias("pk"))
        .groupBy("pk").agg(F.count(F.lit(1)).alias("co"))
        .filter(F.col("co") >= _LIFT_MINCO)
        .select(*unpack_pair("pk", "item_a", "item_b"), "co")
    )
    ia = item.select(F.col("l_partkey").alias("item_a"),
                     F.col("ni").alias("na"))
    ib = item.select(F.col("l_partkey").alias("item_b"),
                     F.col("ni").alias("nb"))
    scored = (
        pair.crossJoin(F.broadcast(n_tot))
        # ia/ib are O(parts) — SF-linear, so no broadcast hint: a
        # forced hint bypasses AQE's size check and OOMs at the
        # 100 TB design point.  These are key-equi joins; AQE
        # promotes them to broadcast when (and only when) the
        # runtime size fits (VERDICT r4 #1).
        .join(ia, "item_a")
        .join(ib, "item_b")
        .select("item_a", "item_b", F.col("co").cast("bigint").alias("co"),
                dratio(F.col("co") * F.col("n"),
                       F.col("na") * F.col("nb"), "lift"))
    )
    return (scored
            .orderBy(F.col("lift").desc(), "item_a", "item_b")
            .limit(_LIFT_TOPN))
