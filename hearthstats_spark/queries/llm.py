"""Group J — LLM-data-pipeline extensions (SURVEY.md §2 q48-q55):
dedup, similarity search, text analysis, multimodal column assembly.

These are the north-star operators a 100 TB training-data pipeline
needs (BASELINE.json:6 [D]); the reference has no counterpart
(SURVEY.md §1.1 — batch scrape/ETL only). Scale design per operator:

- exact dedup (q48): hash-groupBy — one shuffle on the digest.
- near-dup (q49): MinHash LSH — shingle → MinHash → band-bucket
  join; candidate pairs only, never the O(n²) cross product.
- similarity (q50/q51): brute-force cosine is the ≤sf0.1 baseline
  and correctness oracle; the scale path is blocking (q51 joins on
  the label key first — at 100 TB substitute an IVF/LSH bucket id)
  so the pair space shrinks by the bucket count before any math runs.
- text ops (q52-q54): split/explode + hash aggs — all JVM-side.
- multimodal (q55): nested struct assembly + flat projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hearthstats_spark.io import load_table, load_tables
from hearthstats_spark.queries.registry import register


@register(
    "q48_dedup_exact",
    oracle="""
    SELECT COUNT(*) AS n_total,
           COUNT(DISTINCT md5(text)) AS n_unique,
           COUNT(*) - COUNT(DISTINCT md5(text)) AS n_dups
    FROM documents
    """,
)
def q48_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup accounting via content digest (md5 groupBy). The
    dedup itself would be groupBy(h).agg(min(doc_id)) — deterministic
    survivor; here we emit before/after counts (sf0.1 has 8 dup
    texts, smaller SFs none — FIXTURES.md)."""
    d = load_table(spark, sf_dir, "documents")
    h = F.md5(F.col("text").cast("binary"))
    return d.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.countDistinct(h).alias("n_unique"),
        (F.count(F.lit(1)) - F.countDistinct(h)).alias("n_dups"),
    )


_N_BANDS = 8  # 1-row bands: P(candidate) = 1-(1-j)^8 → recall ≈ 1 for j ≥ 0.7


# shared shingling lives with the dedup operators
from hearthstats_spark.operators.dedup import shingles as _shingles  # noqa: E402


#: q49's oracle (added round 10, VERDICT r9 item 5): the SURVIVING
#: pairs are exact-verified Jaccard, so the full output is
#: cross-engine checkable by an exact brute-force twin — q83's
#: prefix-filtered AllPairs SQL at k=5, with the candidate threshold
#: loosened to 0.69 (Spark filters on the ROUNDED distance, so a
#: true J ∈ [0.69995, 0.7) still rounds into ≤ 0.3 — the prefix
#: filter must not prune it) and the final filter mirroring the
#: engine's ROUND(dist, 4) ≤ 0.3 exactly. This makes the MinHash
#: lane's ~1-recall a HASHED contract at driver scale: a banding
#: regression that drops a true pair fails the row hash. Shingle
#: semantics (whole-text shingle for docs ≤ 5 words, NULL text
#: contributes nothing) mirror operators/dedup.shingles via the
#: q83-proven slice-truncation form.
_Q49_ORACLE = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
              FROM documents WHERE text IS NOT NULL),
sh AS (SELECT DISTINCT doc_id, array_to_string(t[i+1:i+5], ' ') AS s
       FROM toks CROSS JOIN generate_series(0, 4096) g(i)
       WHERE i <= greatest(len(t) - 5, 0)),
freq AS (SELECT s, count(*) AS df FROM sh GROUP BY s),
ranked AS (
    SELECT sh.doc_id, sh.s,
           row_number() OVER (PARTITION BY sh.doc_id
                              ORDER BY f.df, sh.s) AS rk,
           count(*)    OVER (PARTITION BY sh.doc_id) AS sz
    FROM sh JOIN freq f USING (s)),
prefix AS (SELECT * FROM ranked
           WHERE rk <= sz - (69*sz + 99) // 100 + 1),
cand AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                    a.sz AS sz_a, b.sz AS sz_b
    FROM prefix a JOIN prefix b ON a.s = b.s AND a.doc_id < b.doc_id),
inter AS (
    SELECT c.id_a, c.id_b, c.sz_a, c.sz_b, count(*) AS i
    FROM cand c
    JOIN sh x ON x.doc_id = c.id_a
    JOIN sh y ON y.doc_id = c.id_b AND y.s = x.s
    GROUP BY 1, 2, 3, 4)
SELECT id_a AS doc_id_a, id_b AS doc_id_b,
       ROUND(1.0 - CAST(i AS DOUBLE) / (sz_a + sz_b - i), 4)
           AS jaccard_dist
FROM inter
WHERE ROUND(1.0 - CAST(i AS DOUBLE) / (sz_a + sz_b - i), 4) <= 0.3
"""


@register("q49_dedup_near", oracle=_Q49_ORACLE)
def q49_dedup_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs (Jaccard distance ≤ 0.3 over word
    5-shingles) via DataFrame-native MinHash banding — built-in
    functions end to end, no ML fit, no Python in the row path:

    1. per doc: 8 minhash signatures, each ``array_min`` of a seeded
       ``xxhash64`` over the shingle set (one JVM HOF pass),
    2. explode to (band, signature) keys and self-join — candidate
       generation is a plain hash join on the band key, linear in
       data + collisions, never the O(n²) pair space,
    3. exact Jaccard on the candidates only, via
       ``array_intersect``/set sizes, then filter ≤ 0.3.

    Exactness on survivors means tests/test_operators.py can compare
    against brute-force Jaccard with zero sketch tolerance; missing a
    true pair needs all 8 bands to disagree (P ≈ (1-0.7)^8 ≈ 7e-5 at
    the threshold, ~1e-14 for real near-dups). Fully oracle-checked
    since round 10 against the exact prefix-filtered twin
    (_Q49_ORACLE above) — recall at driver scale is a hashed
    contract, not just a probability argument.

    Scale notes: two shuffles (band join, pair distinct); signature
    width is a constant 8 longs per doc; skewed bands (stop-phrase
    shingles) are AQE-split like any hot join key.

    Implementation: hearthstats_spark.operators.dedup
    (minhash_near_dup_pairs) — this query is its declared form."""
    from hearthstats_spark.operators.dedup import minhash_near_dup_pairs

    d = load_table(spark, sf_dir, "documents")
    return (
        minhash_near_dup_pairs(d, "doc_id", "text",
                               k=5, n_bands=_N_BANDS, max_jaccard_dist=0.3)
        .withColumnRenamed("id_a", "doc_id_a")
        .withColumnRenamed("id_b", "doc_id_b")
    )


def _indexable(e: DataFrame) -> DataFrame:
    """The exact-similarity family's load edge (q50/q51/q77): drop
    NULL-embedding / NULL-vec_id rows — the declared null policy
    shared with the ANN tier; see the note on _COS_ORACLE_CTE."""
    return e.filter(
        F.col("vec_id").isNotNull() & F.col("embedding").isNotNull()
    )


def _vec_dbl(df: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """embedding list<float> → list<double> + L2 norm (exact per-row)."""
    v = F.transform("embedding", lambda x: x.cast("double"))
    norm = F.sqrt(
        F.aggregate(
            F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0), lambda acc, x: acc + x,
        )
    )
    return df.select(F.col(id_col), "label", v.alias("v"), norm.alias("nrm"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


# Declared null policy for the exact-similarity family (q50/q51/q77),
# matching the ANN tier's (ann2.subvectors_of): a NULL embedding is
# not an indexable vector and a NULL vec_id is not a joinable key —
# both are excluded on BOTH engines (the engine filters at its load
# edge, this CTE filters here). No-op on the shipped corpus; without
# it the numpy kernels crash on a NULL vector and Spark's window
# grouping vs SQL's id-inequality diverge on NULL ids (degenerate
# audit, round 8).
_COS_ORACLE_CTE = """
    WITH e AS (
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
               SQRT(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        FROM embeddings
        WHERE vec_id IS NOT NULL AND embedding IS NOT NULL
    )
"""


@register(
    "q50_sim_topk",
    oracle=_COS_ORACLE_CTE + """
    SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
           ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 4) AS sim
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    ORDER BY sim DESC, vec_id_a, vec_id_b LIMIT 100
    """,
)
def q50_sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-100 pairs via the chunk-pair kernel: ids hash
    into B ≈ n/4096 chunks, every chunk PAIR is one ``applyInPandas``
    task running one numpy matmul and emitting its tie-safe local
    top-k, and the global top-100 is a TakeOrderedAndProject over
    ≤ k·tasks candidate rows.

    Plan shape: rows join a broadcast task list (B(B+1)/2 tiny rows),
    so shuffle is O(n·B) — never the O(n²) pair space, and unlike the
    round-1 broadcast-matrix version, NO driver-side collect of the
    vector table (the only driver action is a count() to size B).
    The quadratic COMPUTE is inherent to exact all-pairs; it is
    spread evenly across tasks, and past ~1M vectors the right
    operator is the ANN tier (q61), validated against this one.

    Implementation: hearthstats_spark.operators.similarity
    (chunked_topk_pairs) — this query is its declared form;
    brute_force_topk_pairs remains the guarded small-data fast path
    and the unit-test cross-check (tests/test_operators.py)."""
    from hearthstats_spark.operators.similarity import chunked_topk_pairs

    e = _indexable(load_table(spark, sf_dir, "embeddings"))
    return chunked_topk_pairs(e, "vec_id", "embedding", k=100)


@register(
    "q51_sim_threshold",
    oracle=_COS_ORACLE_CTE + """
    SELECT a.label AS label, a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
           ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 4) AS sim
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.3
    """,
)
def q51_sim_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked similarity join: one shuffle partitions vectors by the
    blocking key (label — at 100 TB substitute an IVF/LSH bucket id),
    then each block runs a block-local O(b²) numpy kernel inside
    ``applyInPandas``. The pair space never crosses the wire: a block
    of b vectors ships b rows in and only the ≥-threshold pairs out.
    This is the standard IVF shape: shuffle cost linear in data,
    quadratic work confined to blocks (AQE splits skewed blocks).

    Threshold 0.3: embeddings are random per label (verified —
    same/diff-label sims identically distributed, max ≈ 0.48), so a
    0.95 threshold would be vacuous.

    Implementation: hearthstats_spark.operators.similarity
    (blocked_threshold_pairs) — this query is its declared form."""
    from hearthstats_spark.operators.similarity import blocked_threshold_pairs

    e = _indexable(load_table(spark, sf_dir, "embeddings"))
    return (
        blocked_threshold_pairs(e, "vec_id", "embedding", "label",
                                min_sim=0.3)
        .select(F.col("block").alias("label"),
                F.col("id_a").alias("vec_id_a"),
                F.col("id_b").alias("vec_id_b"), "sim")
    )


@register(
    "q77_dedup_embedding",
    oracle=_COS_ORACLE_CTE + """
    , dup AS (
        SELECT DISTINCT b.vec_id
        FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.3
    )
    SELECT e.vec_id, e.label
    FROM e LEFT JOIN dup ON e.vec_id = dup.vec_id
    WHERE dup.vec_id IS NULL
    """,
)
def q77_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate DEDUP (the end-form q51's pair
    finder feeds): a vector is dropped iff it has a same-label
    lower-id neighbor with cosine ≥ 0.3 — the deterministic
    keep-first-id rule, non-transitive so both engines agree exactly.

    Plan: q51's blocked kernel emits (id_a < id_b) pairs with one
    shuffle on the blocking key (label — IVF/LSH bucket at 100 TB);
    the distinct id_b set is every dropped vector; a left-anti join
    back to the table keeps survivors. Never materializes the O(n²)
    pair space — only ≥-threshold pairs exist, and the anti join is
    id-keyed. For TRANSITIVE dedup (cluster survivors) chain
    operators/graph.dedup_clusters on the same pairs (rows-only —
    iterative propagation has no SQL oracle)."""
    from hearthstats_spark.operators.similarity import blocked_threshold_pairs

    e = _indexable(load_table(spark, sf_dir, "embeddings"))
    dropped = (
        blocked_threshold_pairs(e, "vec_id", "embedding", "label",
                                min_sim=0.3)
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
    )
    return (
        e.join(dropped, "vec_id", "left_anti")
        .select("vec_id", "label")
    )


@register(
    "q52_text_tokens",
    oracle="""
    SELECT term, COUNT(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
    GROUP BY term ORDER BY n DESC, term LIMIT 20
    """,
)
def q52_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize + word count, top-20 terms (tie-break on term)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term").agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "term").limit(20)
    )


@register(
    "q53_text_tfidf",
    oracle="""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                 FROM documents),
         tf  AS (SELECT doc_id, term, COUNT(*) AS tf
                 FROM tok GROUP BY doc_id, term),
         df  AS (SELECT term, COUNT(DISTINCT doc_id) AS df
                 FROM tok GROUP BY term),
         n   AS (SELECT COUNT(*) AS n_docs FROM documents),
         w   AS (SELECT doc_id, term,
                        ROUND(tf * LN(CAST(n_docs AS DOUBLE) / df), 4) AS weight
                 FROM tf JOIN df USING (term) CROSS JOIN n),
         r   AS (SELECT doc_id, term, weight,
                        ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY weight DESC, term) AS rk
                 FROM w)
    SELECT doc_id, term, weight, CAST(rk AS BIGINT) AS rk
    FROM r WHERE rk <= 3
    """,
)
def q53_text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc top-3 terms by tf·idf. Two hash aggs (tf, df) + a
    key-equi df join (vocabulary-sized — AQE broadcasts it only when
    it fits) + one window — no O(corpus²) anywhere. n_docs stays IN the plan
    as a broadcast one-row aggregate cross-joined into the weight
    expression (a 1-row broadcast NLJ — the scalar-subquery shape),
    so the query is a single job instead of count()-then-plan."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    nd = d.agg(F.count(F.lit(1)).cast("double").alias("__n_docs"))
    # df is vocabulary-sized — unbounded on web-scale corpora, so no
    # broadcast hint (AQE decides); the 1-row nd frame keeps its hint
    w = (tf.join(df, "term")
         .crossJoin(F.broadcast(nd))
         .select(
             "doc_id", "term",
             F.round(F.col("tf") * F.log(F.col("__n_docs") / F.col("df")), 4)
             .alias("weight"),
         ))
    win = Window.partitionBy("doc_id").orderBy(F.col("weight").desc(), "term")
    return (
        w.withColumn("rk", F.row_number().over(win).cast("long"))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "weight", "rk")
    )


@register(
    "q54_text_stats",
    oracle="""
    SELECT lang, source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 4) AS avg_chars,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM documents GROUP BY lang, source
    """,
)
def q54_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus stats per lang × source (integer sums — exact)."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.sum("n_chars").cast("double") / F.count(F.lit(1)), 4)
        .alias("avg_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@register(
    "q55_multimodal_join",
    oracle="""
    SELECT d.doc_id, d.lang, d.source, e.label,
           CAST(len(e.embedding) AS INT) AS dim,
           CAST(d.n_chars AS BIGINT) AS n_chars
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    """,
)
def q55_multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal column assembly: join text metadata with the vector
    modality into a nested struct record (the shape a training
    pipeline ships), then project flat checkable columns. The nested
    Parquet round-trip is exercised in tests/test_operators.py."""
    t = load_tables(spark, sf_dir, ("documents", "embeddings"))
    assembled = (
        t["documents"]
        .join(t["embeddings"], F.col("doc_id") == F.col("vec_id"))
        .select(
            "doc_id",
            F.struct("lang", "source", "n_chars").alias("text_meta"),
            F.struct("label", F.col("embedding")).alias("vector"),
        )
    )
    return assembled.select(
        "doc_id",
        F.col("text_meta.lang").alias("lang"),
        F.col("text_meta.source").alias("source"),
        F.col("vector.label").alias("label"),
        F.size("vector.embedding").cast("int").alias("dim"),
        F.col("text_meta.n_chars").alias("n_chars"),
    )


# ---- q89: token-budget shard packing --------------------------------
#
# The last step of a training-data pipeline: pack documents into
# ~equal-token shards (sequential fill in a canonical order, cut a
# new shard every TARGET tokens). The naive formulation is a GLOBAL
# running sum — a no-partition window, i.e. one task sorting 100 TB.
# The scale-safe form is the classic distributed prefix sum
# (operators/rankops.with_global_prefix_sum): range-bucket on the
# order key, per-bucket token totals (≤ n_buckets scalars to the
# driver), broadcast exclusive offsets back, per-bucket window
# cumsum. shard_id = exclusive_prefix // TARGET is then a pure
# map-side expression.

_SHARD_TARGET = 4096  # tokens per training shard


@register(
    "q89_shard_pack",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    )
    SELECT doc_id, n_tokens,
           CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                0) AS BIGINT) AS start_offset,
           CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                0) // {_SHARD_TARGET} AS BIGINT) AS shard_id
    FROM t
    """,
)
def q89_shard_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into {_SHARD_TARGET}-token training shards by
    whitespace-token count in doc_id order (see comment block above —
    distributed prefix sum, no global window; the oracle states the
    same thing as the naive global running sum, which DuckDB can
    afford single-node)."""
    from hearthstats_spark.operators.rankops import (
        with_global_prefix_sum,
    )

    d = load_table(spark, sf_dir, "documents")
    # materialize the 16-byte/row (doc_id, n_tokens) projection once:
    # the prefix sum runs three actions (boundaries, bucket sums,
    # output) and would otherwise re-scan + re-split the text column
    # each time (measured 3× the scan cost at sf0.1)
    # the prefix-sum measure is ZERO-FILLED (n_tok0): SQL's windowed
    # SUM skips NULL tokens and the oracle COALESCEs the empty prefix
    # to 0, while a windowed sum fed raw NULLs would go NULL — the
    # zero-filled measure declares the same semantics in the engine
    # (degenerate audit, round 8; no-op when no text is NULL). The
    # emitted n_tokens column stays nullable as-is on both engines.
    t = d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    ).withColumn(
        "n_tok0", F.coalesce(F.col("n_tokens"), F.lit(0).cast("bigint"))
    ).localCheckpoint()
    cum, _total = with_global_prefix_sum(
        t, "doc_id", "n_tok0", n_buckets=32, boundaries="uniform")
    prev = F.col("__cum") - F.col("n_tok0")  # exclusive prefix
    return cum.select(
        "doc_id", "n_tokens",
        prev.alias("start_offset"),
        F.floor(prev / F.lit(_SHARD_TARGET)).cast("bigint")
        .alias("shard_id"),
    )
