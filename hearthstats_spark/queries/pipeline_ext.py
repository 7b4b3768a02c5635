"""Group L — training-data-pipeline extensions (round 2): PII
redaction, benchmark-contamination screening, BM25 retrieval,
doc-internal repetition scoring, and item co-occurrence similarity.

These close the remaining gaps a real 100 TB curation pipeline has
beyond dedup/quality/langid (groups D/K): scrubbing PII before
training, keeping eval benchmarks out of the training split,
keyword retrieval over the corpus, repetition-based quality
filtering, and co-occurrence mining over event logs.

Corpus note (same caveat as q56, textops.py): the synthetic
documents contain no real PII, so q90 injects deterministic
PII-shaped fixtures IN-PLAN (identical concat expressions in both
engines) and then redacts them — the graded artifact is the
detection/redaction mechanism, not corpus prevalence.

Engine-portability discipline (SURVEY.md §1.3): RE2-safe regexes
only (no lookaround — Spark's Java regex accepts them, DuckDB's RE2
does not); DuckDB ``regexp_replace`` needs the explicit ``'g'`` flag
to match Spark's replace-all default; float emissions ROUND(…, 4)
with explicit left-to-right addition order where doubles are summed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hearthstats_spark.io import load_table
from hearthstats_spark.operators.bounded import broadcast_bounded
from hearthstats_spark.queries.registry import register

# RE2- and Java-compatible patterns (no lookaround, no back-refs)
_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_PHONE_RE = r"\d{3}-555-\d{4}"


@register(
    "q90_pii_redact",
    oracle=f"""
    WITH aug AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com call 202-555-'
                    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                    || CASE WHEN doc_id % 3 = 0
                            THEN ' alt admin@test.org' ELSE '' END
               AS text
        FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS BIGINT)
               AS n_emails,
           CAST(len(regexp_extract_all(text, '{_PHONE_RE}')) AS BIGINT)
               AS n_phones,
           CAST(length(regexp_replace(regexp_replace(text,
                    '{_EMAIL_RE}', '[EMAIL]', 'g'),
                    '{_PHONE_RE}', '[PHONE]', 'g')) AS BIGINT)
               AS red_len,
           md5(regexp_replace(regexp_replace(text,
                    '{_EMAIL_RE}', '[EMAIL]', 'g'),
                    '{_PHONE_RE}', '[PHONE]', 'g'))
               AS red_md5
    FROM aug
    """,
)
def q90_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction over documents: count email/phone
    hits and emit the length + md5 of the scrubbed text (fixtures
    injected in-plan — see module docstring).

    Plan: pure per-row expressions — zero shuffle, fully pushed into
    whole-stage codegen; at 100 TB this is the ideal map-only pass
    that scales with input bytes and nothing else."""
    d = load_table(spark, sf_dir, "documents")
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"), F.col("doc_id").cast("string"),
            F.lit("@example.com call 202-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.when(F.col("doc_id") % 3 == 0, F.lit(" alt admin@test.org"))
             .otherwise(F.lit("")),
        ).alias("text"),
    )
    red = F.regexp_replace(
        F.regexp_replace("text", _EMAIL_RE, "[EMAIL]"),
        _PHONE_RE, "[PHONE]")
    return aug.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(_EMAIL_RE), 0))
         .cast("bigint").alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(_PHONE_RE), 0))
         .cast("bigint").alias("n_phones"),
        F.length(red).cast("bigint").alias("red_len"),
        F.md5(red).alias("red_md5"),
    )


_EVAL_MOD = 97     # doc_id % 97 == 0 -> held-out "benchmark" split
_GRAM = 4          # contamination shingle width (words)


@register(
    "q91_contamination",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
                  FROM documents),
    sh AS (
        SELECT doc_id, array_to_string(list_slice(t, i, i + {_GRAM - 1}),
                                       ' ') AS g
        FROM toks, LATERAL unnest(generate_series(
                 1, greatest(len(t) - {_GRAM - 1}, 0))) AS u(i)
    ),
    eval_sh AS (SELECT DISTINCT g FROM sh
                WHERE doc_id % {_EVAL_MOD} = 0),
    train_sh AS (SELECT DISTINCT doc_id, g FROM sh
                 WHERE doc_id % {_EVAL_MOD} <> 0)
    SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM train_sh t JOIN eval_sh e USING (g)
    GROUP BY t.doc_id
    """,
)
def q91_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination screen: flag training docs sharing any
    word-{_GRAM}-gram with the held-out eval split (doc_id % {_EVAL_MOD}
    == 0), with the count of distinct shared shingles per doc.

    Plan: shingles via built-in HOFs (sequence → transform(slice) →
    explode — no Python); the eval shingle set is small here
    (1/{_EVAL_MOD} of the corpus) so the screen is a map-side hash
    join over the training shingle stream plus one count aggregate.
    At 100 TB the eval set is benchmarks (MMLU/GSM8K/…) — bounded by
    workload, NOT by construction — so the broadcast goes through
    ``broadcast_bounded``: the hint only applies if a limit-probe
    proves ≤ 1M distinct eval shingles, and a bigger eval side
    degrades to a shuffle join instead of an executor OOM (VERDICT
    r5 item 4 — this was the allowlist's riskiest narrative bound).
    This is the standard n-gram decontamination pass (e.g. GPT-3
    appendix C) as one Spark job."""
    d = load_table(spark, sf_dir, "documents")
    # size filter BEFORE the sequence (the q172/q153 guard style): a
    # doc with < _GRAM tokens has no shingles. The previous
    # greatest(size - 2, 0) bound was the cross-engine trap the
    # empty-text degenerate axis caught — DuckDB's
    # generate_series(1, 0) is EMPTY but Spark's sequence(1, 0) runs
    # DESCENDING ([1, 0]), feeding slice(t, 0, …) an illegal start
    # and crashing the whole screen on any 1-2-word document.
    toks = (d.select("doc_id", F.split("text", " ").alias("t"))
            .filter(F.size("t") >= _GRAM))
    sh = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - (_GRAM - 1)),
                lambda i: F.array_join(F.slice("t", i, _GRAM), " "),
            )
        ).alias("g"),
    )
    eval_sh = (sh.filter(F.col("doc_id") % _EVAL_MOD == 0)
               .select("g").distinct())
    # optimization round 11 (guide §2.3/§2.4): screen the RAW training
    # shingle stream and dedup only the survivors. The previous
    # distinct-before-join shuffled every training (doc_id, g) pair —
    # the query's largest exchange — before the broadcast screen
    # dropped almost all of them; filtering first confines the dedup
    # (count_distinct's map-side partial) to matched shingles, which
    # contamination screens expect to be rare. Same value by
    # construction: per doc, |distinct matched g| == |distinct (doc,g)
    # pairs joined to eval|. In the declined-broadcast lane the join
    # shuffles raw shingles once instead of dedup'd shingles twice —
    # still ahead while within-doc n-gram repetition stays under 2×.
    train_sh = sh.filter(F.col("doc_id") % _EVAL_MOD != 0)
    return (
        train_sh.join(broadcast_bounded(eval_sh, 1_000_000), "g")
        .groupBy("doc_id")
        .agg(F.count_distinct("g").alias("n_shared"))
    )


_BM25_TERMS = ("hash", "join", "scan")
_K1, _B = 1.2, 0.75
_TOPN = 15


@register(
    "q92_bm25_topk",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                 FROM documents),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
    stats AS (SELECT COUNT(*) AS n,
                     CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
              FROM dl),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok
           WHERE term IN ('hash', 'join', 'scan')
           GROUP BY doc_id, term),
    df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok
           WHERE term IN ('hash', 'join', 'scan') GROUP BY term),
    contrib AS (
        SELECT tf.doc_id, tf.term,
               LN((s.n - df.df + 0.5) / (df.df + 0.5) + 1)
               * (tf.tf * ({_K1} + 1))
               / (tf.tf + {_K1} * (1 - {_B} + {_B} * dl.dl / s.avgdl))
               AS c
        FROM tf JOIN df USING (term) JOIN dl USING (doc_id)
        CROSS JOIN stats s
    ),
    pivoted AS (
        SELECT doc_id,
               COALESCE(MAX(CASE WHEN term = 'hash' THEN c END), 0) AS c1,
               COALESCE(MAX(CASE WHEN term = 'join' THEN c END), 0) AS c2,
               COALESCE(MAX(CASE WHEN term = 'scan' THEN c END), 0) AS c3
        FROM contrib GROUP BY doc_id
    ),
    scored AS (SELECT doc_id, ROUND(c1 + c2 + c3, 4) AS score
               FROM pivoted)
    SELECT doc_id, score,
           CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id)
                AS BIGINT) AS rk
    FROM scored
    QUALIFY rk <= {_TOPN}
    """,
)
def q92_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-{_TOPN} retrieval for the query {_BM25_TERMS}
    (k1={_K1}, b={_B}) — keyword search over the corpus.

    Float discipline: per-term contributions are pivoted to fixed
    columns and summed in explicit written order (c1+c2+c3) so both
    engines add the same doubles in the same order; ranking keys off
    the ROUNDED score (then doc_id), so rank boundaries can't drift
    on sub-1e-4 differences. avgdl is SUM/COUNT (one division), not
    an engine-internal AVG.

    Plan: two hash aggs (tf over 3 terms only — filter pushed below
    the explode; dl over all tokens), tiny df/stats broadcast, final
    global top-k. The ONLY global window is over ≤ corpus rows
    already reduced to one row per doc with a score; at 100 TB you
    cut it with `ORDER BY score DESC LIMIT k` (TakeOrderedAndProject
    — per-partition heaps, no global sort); here rk must be emitted,
    so the window runs on the scored (per-doc, not per-token)
    frame."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    # optimization round 11 (guide §1.2/§2.4): four token-scale
    # explode passes collapsed to two. dl is cached so stats (its
    # only other consumer) and the contrib join read one pass; df is
    # derived FROM tf — tf already has exactly one row per (doc,
    # term), so COUNT(*) per term IS count(distinct doc_id) — which
    # deletes the second filtered explode outright. tf is doc-scale
    # × ≤3 query terms; caching it lets contrib and df share it.
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl")).cache()
    stats = dl.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    qt = tok.filter(F.col("term").isin(*_BM25_TERMS))
    tf = (qt.groupBy("doc_id", "term")
          .agg(F.count(F.lit(1)).alias("tf")).cache())
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # df is ≤ |query terms| rows by the isin filter, but the bound
    # lives in the expression, not the plan text — enforce it with
    # the runtime guard instead of a plan-audit allowlist entry
    contrib = (
        tf.join(broadcast_bounded(df, 16), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id", "term",
            (F.log((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
             * (F.col("tf") * (_K1 + 1))
             / (F.col("tf") + _K1 * (1 - _B + _B * F.col("dl") / F.col("avgdl")))
             ).alias("c"),
        )
    )
    pivoted = contrib.groupBy("doc_id").agg(
        F.coalesce(F.max(F.when(F.col("term") == "hash", F.col("c"))),
                   F.lit(0.0)).alias("c1"),
        F.coalesce(F.max(F.when(F.col("term") == "join", F.col("c"))),
                   F.lit(0.0)).alias("c2"),
        F.coalesce(F.max(F.when(F.col("term") == "scan", F.col("c"))),
                   F.lit(0.0)).alias("c3"),
    )
    scored = pivoted.select(
        "doc_id",
        F.round(F.col("c1") + F.col("c2") + F.col("c3"), 4).alias("score"),
    )
    # top-k FIRST via orderBy+limit (TakeOrderedAndProject: per-
    # partition heaps, no global sort); the rank window then runs
    # over ≤ _TOPN rows at ANY scale (allowlisted in the plan audit)
    top = scored.orderBy(F.col("score").desc(), "doc_id").limit(_TOPN)
    w = Window.orderBy(F.col("score").desc(), "doc_id")
    return top.withColumn("rk", F.row_number().over(w).cast("long"))


@register(
    "q93_repetition",
    oracle="""
    WITH tc AS (
        SELECT doc_id, term, COUNT(*) AS n
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
              FROM documents)
        GROUP BY doc_id, term
    ),
    agg AS (
        SELECT doc_id,
               CAST(SUM(n) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_distinct,
               ROUND(1 - CAST(COUNT(*) AS DOUBLE) / SUM(n), 4)
                   AS rep_ratio
        FROM tc GROUP BY doc_id
    ),
    top AS (
        SELECT doc_id, term AS top_term, CAST(n AS BIGINT) AS top_n
        FROM (SELECT doc_id, term, n,
                     ROW_NUMBER() OVER (PARTITION BY doc_id
                         ORDER BY n DESC, term) AS rk
              FROM tc)
        WHERE rk = 1
    )
    SELECT a.doc_id, a.n_tokens, a.n_distinct, a.rep_ratio,
           t.top_term, t.top_n
    FROM agg a JOIN top t USING (doc_id)
    """,
)
def q93_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-internal repetition scoring — the quality signal that
    catches boilerplate/spam: token count, distinct count,
    repetition ratio (1 - distinct/total), and the most repeated
    token (ties → lexicographically smallest).

    Plan: one explode + (doc, term) hash agg feeds BOTH outputs —
    the per-doc reduction and the doc-partitioned top-1 window (doc
    cardinality = perfect partitioning; no single-task window). One
    shuffle on doc_id end to end after the (doc,term) agg, because
    groupBy(doc) and the window share the doc_id clustering."""
    d = load_table(spark, sf_dir, "documents")
    tc = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("n"))
    )
    agg = tc.groupBy("doc_id").agg(
        F.sum("n").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.round(1 - F.count(F.lit(1)).cast("double") / F.sum("n"), 4)
         .alias("rep_ratio"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("n").desc(), "term")
    top = (
        tc.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("doc_id", F.col("term").alias("top_term"),
                F.col("n").cast("bigint").alias("top_n"))
    )
    return agg.join(top, "doc_id").select(
        "doc_id", "n_tokens", "n_distinct", "rep_ratio",
        "top_term", "top_n")


_MIN_CO = 5    # min co-occurring users for an item pair
_CO_TOPN = 50


@register(
    "q94_item_cooccur",
    oracle=f"""
    WITH ui AS (
        SELECT DISTINCT user_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
        FROM events WHERE event_type = 'view'
    ),
    cnt AS (SELECT item, COUNT(*) AS n FROM ui GROUP BY item),
    co AS (
        SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS co
        FROM ui a JOIN ui b
          ON a.user_id = b.user_id AND a.item < b.item
        GROUP BY a.item, b.item
    ),
    scored AS (
        SELECT item_a, item_b, CAST(co AS BIGINT) AS co,
               ROUND(CAST(co AS DOUBLE) / (ca.n + cb.n - co), 4)
                   AS jaccard
        FROM co JOIN cnt ca ON co.item_a = ca.item
                JOIN cnt cb ON co.item_b = cb.item
        WHERE co >= {_MIN_CO}
    )
    SELECT item_a, item_b, co, jaccard,
           CAST(ROW_NUMBER() OVER (ORDER BY co DESC, item_a, item_b)
                AS BIGINT) AS rk
    FROM scored
    QUALIFY rk <= {_CO_TOPN}
    """,
)
def q94_item_cooccur(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item co-occurrence mining over view events ("users who viewed
    X also viewed Y"): top-{_CO_TOPN} item pairs by number of
    co-viewing users, with the user-set Jaccard similarity.

    Plan: distinct (user, item) → self-equi-join on user_id (the
    blocking key — never all item pairs) → pair count agg; item
    totals broadcast back. Co-occurrence out of a 100 TB event log
    is this exact shape plus two standard bounds the docstring
    declares and the operator inherits from the skew toolkit:
    cap items per user (explode cost is Σ k_u², so winsorize heavy
    users — q86's sampler shape) and min-support prune items below
    {_MIN_CO} users before the join (cnt is already computed for
    exactly this)."""
    e = load_table(spark, sf_dir, "events")
    from hearthstats_spark.operators.graph import checkpoint_preserving

    # optimization round 11 (guide §2.4): ui — the JSON-extract +
    # distinct event pass — was re-derived by all four consumers
    # (both self-join sides, ca, cb: 4 corpus scans). Materialize it
    # ONCE, user_id-partitioned with the layout preserved, so the
    # self-join reads both sides in place (zero join exchanges) and
    # cnt aggregates the materialized frame; cnt itself is cached so
    # ca/cb share one item-keyed aggregation.
    #
    # round 12 (VERDICT r11 item 5; guide §2.3/§2.4): the r11 form
    # paid TWO exchanges to reach that layout — distinct's
    # hash(user_id, item) plus checkpoint_partitioned's
    # re-repartition to hash(user_id). Repartitioning the RAW rows
    # by user_id FIRST lets the planner run distinct exchange-free
    # (hash(user_id) satisfies the (user_id, item) clustering) and
    # checkpoint_preserving keeps that layout: ONE exchange of
    # ~1.07× the distinct bytes (measured view-event dup factor at
    # sf0.1) instead of two at ~1.0× each — ≈46% fewer shuffled
    # bytes on the materialization path, same zero-join-exchange
    # self-join. The VERDICT-flagged alternative (cache-only, no
    # checkpoint) was A/B'd in the same windows: it ties locally
    # (2.80 vs 2.82 s interleaved medians) but pays TWO extra
    # distinct-frame exchanges at the join — wrong at scale.
    ui = checkpoint_preserving(
        e.filter(F.col("event_type") == "view")
        .select("user_id",
                F.get_json_object("props", "$.k").cast("bigint")
                 .alias("item"))
        .repartition(int(spark.conf.get("spark.sql.shuffle.partitions")),
                     "user_id")
        .distinct()
    )
    # round 12: cnt was `.cache()`d, but a cached frame derived from
    # a localCheckpoint and referenced through two branches (ca, cb)
    # of the same plan is re-instanced by relation dedup and the
    # cache silently never substitutes (0 InMemoryTableScan in the
    # r11 plan dump — the same failure q108's degree frame hit), so
    # ca and cb each re-aggregated ui. checkpoint_preserving is the
    # immune form: the item-grain agg runs ONCE and keeps its
    # hash(item) layout, so at scale the ca/cb joins can read it
    # co-partitioned.
    cnt = checkpoint_preserving(
        ui.groupBy("item").agg(F.count(F.lit(1)).alias("n")))
    a, b = ui.alias("a"), ui.alias("b")
    co = (
        a.join(b, (F.col("a.user_id") == F.col("b.user_id"))
               & (F.col("a.item") < F.col("b.item")))
        .groupBy(F.col("a.item").alias("item_a"),
                 F.col("b.item").alias("item_b"))
        .agg(F.count(F.lit(1)).alias("co"))
        .filter(F.col("co") >= _MIN_CO)
    )
    ca = cnt.select(F.col("item").alias("item_a"), F.col("n").alias("na"))
    cb = cnt.select(F.col("item").alias("item_b"), F.col("n").alias("nb"))
    scored = (
        # ca/cb are item-cardinality (catalog-scale) — no broadcast
        # hint; AQE promotes when the runtime size fits (VERDICT r4 #1)
        co.join(ca, "item_a").join(cb, "item_b")
        .select(
            "item_a", "item_b", F.col("co").cast("bigint").alias("co"),
            F.round(F.col("co").cast("double")
                    / (F.col("na") + F.col("nb") - F.col("co")), 4)
             .alias("jaccard"),
        )
    )
    # same bounded-rank shape as q92: heap top-k, then rank ≤ k rows
    top = (scored.orderBy(F.col("co").desc(), "item_a", "item_b")
           .limit(_CO_TOPN))
    w = Window.orderBy(F.col("co").desc(), "item_a", "item_b")
    return top.withColumn("rk", F.row_number().over(w).cast("long"))


_SEQ_CAP = 50   # max events kept per user sequence


@register(
    "q95_user_sequence",
    oracle=f"""
    WITH s AS (
        SELECT user_id,
               COUNT(*) AS n_events,
               list(event_type ORDER BY ts, event_id) AS seq
        FROM events GROUP BY user_id
    )
    SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
           array_to_string(list_slice(seq, 1, {_SEQ_CAP}), '>') AS seq
    FROM s
    """,
)
def q95_user_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavior-sequence assembly for sequence-model training data:
    each user's first {_SEQ_CAP} event types in (ts, event_id) order
    as one '>'-joined string, plus the total event count.

    Plan: ONE hash agg — collect_list of (ts, event_id, type)
    structs per user, sorted/truncated/projected with array HOFs
    entirely map-side after the agg (struct order = lexicographic =
    the SQL ORDER BY; event_id is the unique tiebreak). No window,
    no second shuffle. At 100 TB the cap bounds state per key the
    same way the slice does here; heavy users winsorize (q94's
    note applies)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sort_array(F.collect_list(F.struct("ts", "event_id",
                                                 "event_type"))).alias("s"),
        )
        .select(
            "user_id", "n_events",
            F.array_join(
                F.transform(F.slice("s", 1, _SEQ_CAP),
                            lambda x: x["event_type"]), ">").alias("seq"),
        )
    )


@register(
    "q96_scd2_history",
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
    )
    SELECT o_custkey AS custkey, o_orderstatus AS status,
           o_orderdate AS valid_from,
           LEAD(o_orderdate) OVER w2 AS valid_to,
           CAST(ROW_NUMBER() OVER w2 AS BIGINT) AS version
    FROM chg
    WINDOW w2 AS (PARTITION BY o_custkey
                  ORDER BY o_orderdate, o_orderkey)
    """,
)
def q96_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-2 history build — the warehouse pattern s09's SCD-1 merge
    doesn't cover: collapse each customer's order-status timeline
    into change rows with (valid_from, valid_to, version), valid_to
    NULL on the open row.

    Plan: two windows, both partitioned by custkey (the natural
    dimension key — bounded rows per partition), over the SAME
    (custkey, date, orderkey) sort order, so Catalyst plans one
    shuffle + one sort reused by lag, lead and row_number. This is
    the batch path a Delta/Iceberg SCD-2 MERGE runs at 100 TB."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    chg = (
        o.withColumn("prev_status", F.lag("o_orderstatus").over(w))
        .filter(F.col("prev_status").isNull()
                | (F.col("prev_status") != F.col("o_orderstatus")))
    )
    w2 = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return chg.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderdate").alias("valid_from"),
        F.lead("o_orderdate").over(w2).alias("valid_to"),
        F.row_number().over(w2).cast("bigint").alias("version"),
    )
