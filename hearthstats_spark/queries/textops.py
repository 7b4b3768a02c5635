"""Group K — text-analysis extensions beyond SURVEY.md §2's original
inventory (q56-q59): language-ID, quality scoring, token counting,
document fingerprinting. These are the text half of the
training-data-pipeline surface (BASELINE.json north star); SURVEY.md
§2K documents them as round-1 additions.

Note on the corpus: the generated documents share one vocabulary
across all ``lang`` values (verified — text is language-independent),
so q56's prediction accuracy is meaningless BY CONSTRUCTION; what is
graded is the mechanism (train marker sets from labels → score →
argmax) being deterministic and engine-portable. All four queries are
built-ins only — no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hearthstats_spark.io import load_table
from hearthstats_spark.operators.bounded import broadcast_bounded
from hearthstats_spark.queries.registry import register

_STOPWORDS = ("a", "the")


@register(
    "q56_text_langid",
    oracle="""
    WITH tok AS (
        SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    lang_term AS (
        SELECT lang, term, COUNT(*) AS n
        FROM tok GROUP BY lang, term
    ),
    markers AS (
        SELECT lang AS pred_lang, term
        FROM (SELECT lang, term,
                     ROW_NUMBER() OVER (PARTITION BY lang
                         ORDER BY n DESC, term) AS rk
              FROM lang_term)
        WHERE rk <= 10
    ),
    scores AS (
        SELECT t.doc_id, m.pred_lang, COUNT(*) AS score
        FROM tok t JOIN markers m ON t.term = m.term
        GROUP BY t.doc_id, m.pred_lang
    ),
    dense AS (
        SELECT d.doc_id, d.lang AS true_lang, l.pred_lang,
               COALESCE(s.score, 0) AS score
        FROM documents d
        CROSS JOIN (SELECT DISTINCT lang AS pred_lang FROM documents) l
        LEFT JOIN scores s
          ON s.doc_id = d.doc_id AND s.pred_lang = l.pred_lang
    )
    SELECT doc_id, true_lang, pred_lang,
           CAST(score AS BIGINT) AS score,
           CAST(pred_lang = true_lang AS INT) AS is_correct
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
              ORDER BY score DESC, pred_lang) AS rk FROM dense)
    WHERE rk = 1
    """,
)
def q56_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram-heuristic language ID, trained on the corpus itself:
    top-10 terms per labeled language become marker sets; each doc is
    scored by marker hits (integer counts — hash-exact) and argmax'd
    with a deterministic tie-break.

    Scale: marker table is O(langs × 10) and the lang frame O(langs)
    — but "langs is small" is a data property, not a plan property,
    so both broadcasts go through ``broadcast_bounded`` (runtime
    limit-probe; above the cap the hint is withheld and Catalyst
    plans a shuffle join — VERDICT r5 item 4). Scoring is one
    explode + hash agg, linear in tokens."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", "lang",
                   F.explode(F.split("text", " ")).alias("term"))
    lang_term = tok.groupBy("lang", "term").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), "term")
    markers = (lang_term.withColumn("rk", F.row_number().over(w))
               .filter(F.col("rk") <= 10)
               .select(F.col("lang").alias("pred_lang"), "term"))
    langs = d.select(F.col("lang").alias("pred_lang")).distinct()
    # markers ≤ 10 rows/language by the rank filter, so the CHEAP
    # enum frame (column-pruned lang scan) is the probe — counting
    # markers itself would re-run the token aggregation
    scores = (tok.join(broadcast_bounded(markers, 4096,
                                         probe=langs, per_probe_row=10),
                       "term")
              .groupBy("doc_id", "pred_lang")
              .agg(F.count(F.lit(1)).alias("score")))
    # optimization round 11 (guide §2.3/§2.4): the argmax previously
    # densified to docs × langs (crossJoin + left join + a window
    # over the dense frame). Every hit lang scores ≥ 1 > 0, so an
    # absent lang can only win for a doc with NO marker hits at all,
    # and there the old dense argmax picked the smallest lang at
    # score 0 — a corpus CONSTANT. The window therefore only needs
    # the HIT rows (≤ docs × hit-langs, one doc-keyed exchange of
    # the scored frame instead of the ×langs expansion), and
    # zero-hit docs take the broadcast 1-row min-lang fallback.
    # Identical output by the argument above; oracle re-checked at
    # three SFs.
    pick = Window.partitionBy("doc_id").orderBy(F.col("score").desc(),
                                                "pred_lang")
    winner = (scores.withColumn("rk", F.row_number().over(pick))
              .filter(F.col("rk") == 1)
              .select("doc_id", "pred_lang", "score"))
    fallback = F.broadcast(langs.agg(F.min("pred_lang").alias("__fb")))
    return (
        d.select("doc_id", F.col("lang").alias("true_lang"))
        .join(winner, "doc_id", "left")
        .crossJoin(fallback)
        .select("doc_id", "true_lang",
                F.coalesce("pred_lang", F.col("__fb")).alias("pred_lang"),
                F.coalesce("score", F.lit(0)).cast("long").alias("score"),
                (F.coalesce("pred_lang", F.col("__fb"))
                 == F.col("true_lang")).cast("int").alias("is_correct"))
    )


@register(
    "q57_text_quality",
    oracle=f"""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
           CAST(len(list_distinct(string_split(text, ' '))) AS INT)
               AS n_types,
           ROUND(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                 / len(string_split(text, ' ')), 4) AS type_token_ratio,
           ROUND(CAST(len(list_filter(string_split(text, ' '),
                     t -> t IN {_STOPWORDS!r})) AS DOUBLE)
                 / len(string_split(text, ' ')), 4) AS stopword_ratio,
           ROUND(CAST(n_chars - (len(string_split(text, ' ')) - 1) AS DOUBLE)
                 / len(string_split(text, ' ')), 4) AS avg_token_len,
           CASE WHEN len(string_split(text, ' ')) < 20 THEN 'short'
                WHEN len(string_split(text, ' ')) < 60 THEN 'medium'
                ELSE 'long' END AS length_band
    FROM documents
    """,
)
def q57_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc quality signals: token/type counts, type-token ratio,
    stopword ratio, average token length, length band — the scalar
    features a corpus-filtering pass gates on. Linear scan, no
    shuffle, whole-stage codegen (HOF filter excepted)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tok = F.size(toks)
    n_typ = F.size(F.array_distinct(toks))
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*_STOPWORDS)))
    return d.select(
        "doc_id",
        n_tok.cast("int").alias("n_tokens"),
        n_typ.cast("int").alias("n_types"),
        F.round(n_typ.cast("double") / n_tok, 4).alias("type_token_ratio"),
        F.round(n_stop.cast("double") / n_tok, 4).alias("stopword_ratio"),
        F.round((F.col("n_chars") - (n_tok - 1)).cast("double") / n_tok, 4)
        .alias("avg_token_len"),
        F.when(n_tok < 20, "short").when(n_tok < 60, "medium")
        .otherwise("long").alias("length_band"),
    )


@register(
    "q58_token_count",
    oracle="""
    SELECT lang, source,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
           CAST(SUM(len(regexp_extract_all(text,
                '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))) AS BIGINT) AS bpe_ish_tokens,
           ROUND(CAST(SUM(n_chars) AS DOUBLE)
                 / SUM(len(string_split(text, ' '))), 4) AS chars_per_token
    FROM documents
    GROUP BY lang, source
    """,
)
def q58_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token accounting per lang × source: whitespace tokens and a
    BPE-ish regex tokenization (alpha runs | digit runs | other
    glyphs) — the budget numbers an LLM-data pipeline reports.
    Integer sums → hash-exact; regex kept to a class-only pattern so
    Java and RE2 semantics agree."""
    d = load_table(spark, sf_dir, "documents")
    ws = F.size(F.split("text", " "))
    bpe = F.size(F.regexp_extract_all(
        "text", F.lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), 0))
    return d.groupBy("lang", "source").agg(
        F.sum(ws).cast("long").alias("ws_tokens"),
        F.sum(bpe).cast("long").alias("bpe_ish_tokens"),
        F.round(F.sum("n_chars").cast("double") / F.sum(ws), 4)
        .alias("chars_per_token"),
    )


@register(
    "q59_fingerprint",
    oracle="""
    WITH fp AS (
        SELECT doc_id,
               md5(array_to_string(list_slice(list_sort(list_distinct(
                   list_transform(
                       generate_series(0, greatest(len(string_split(text, ' ')) - 5, 0)),
                       i -> array_to_string(list_slice(string_split(text, ' '),
                                            i + 1, i + 5), ' ')
                   ))), 1, 3), chr(31))) AS fingerprint
        FROM documents
    )
    SELECT fingerprint,
           COUNT(*) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS canonical_doc
    FROM fp GROUP BY fingerprint HAVING COUNT(*) > 1
    """,
)
def q59_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting (winnowing-lite): md5 over the 3
    lexicographically-smallest word-5-shingles — a locality-sensitive
    content key. Groups with >1 doc are duplicate clusters; emitting
    (fingerprint, size, canonical survivor) is the dedup-map a
    pipeline persists. One scan + one hash agg on the digest."""
    from hearthstats_spark.queries.llm import _shingles

    d = load_table(spark, sf_dir, "documents")
    # NULL text ⇒ NULL fingerprint: concat_ws SKIPS a null array (so
    # a null doc would md5 to the empty-string digest and merge with
    # genuinely empty-shingle docs), while SQL's md5(NULL) is NULL —
    # the guard matches the oracle and keeps null docs in their own
    # cluster (all-null-text degenerate audit; no-op on the shipped
    # corpora, whose ≤1 null doc never survives HAVING > 1)
    fp = F.when(F.col("text").isNotNull(), F.md5(F.concat_ws(
        "\x1f", F.slice(F.array_sort(_shingles()), 1, 3)).cast("binary")))
    return (
        d.select("doc_id", fp.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.min("doc_id").cast("long").alias("canonical_doc"))
        .filter(F.col("n_docs") > 1)
    )
