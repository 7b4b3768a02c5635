"""Group L — tokenizer training kernels (q188): the BPE statistics
pass every LLM data pipeline runs before training a tokenizer.

Byte-pair encoding (Sennrich et al., ACL 2016) trains by repeatedly
(1) counting the frequency of every ADJACENT SYMBOL PAIR across the
corpus and (2) merging the most frequent pair into a new symbol.
Step (1) is the entire distributed cost, and its classical
optimization is the one implemented here: collapse the corpus to a
WORD-FREQUENCY table first (one hash agg over the raw text — words
repeat enormously), then count pairs over the VOCABULARY weighted by
word frequency. The pair-counting pass therefore touches vocab-sized
data (thousands of rows) instead of corpus-sized data (billions),
which is exactly why production BPE trainers are feasible at 100 TB:
the only corpus-scale operation is the word-count agg, which is
map-side combinable.

q188 runs the first-iteration pair count from characters (the merge
candidates every BPE run starts from) and reports the top-20 pairs —
the head of the merge table. No end-of-word marker is appended (a
production trainer adds '</w>'; it changes bookkeeping, not the
counting shape). Top-k via orderBy+LIMIT (per-partition heaps →
TakeOrderedAndProject) with the rank window running AFTER the limit
over ≤ 20 rows — q92's bounded-global-window discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hearthstats_spark.io import load_table
from hearthstats_spark.queries.registry import register

_TOP_PAIRS = 20


def _q188_oracle() -> str:
    return rf"""
    WITH w AS (
        SELECT word, COUNT(*) AS freq
        FROM (SELECT unnest(regexp_split_to_array(text, '\s+')) AS word
              FROM documents WHERE text IS NOT NULL)
        WHERE length(word) >= 2
        GROUP BY word
    ),
    p AS (
        SELECT pair, CAST(SUM(freq) AS BIGINT) AS pair_count
        FROM (SELECT unnest(list_transform(
                  generate_series(1, length(word) - 1),
                  i -> substr(word, i, 2))) AS pair, freq
              FROM w)
        GROUP BY pair
    )
    SELECT pair, pair_count, CAST(rk AS INT) AS rk
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY pair_count DESC, pair)
              AS rk FROM p)
    WHERE rk <= {_TOP_PAIRS}
    """


def word_freqs(docs: DataFrame) -> DataFrame:
    """(word, freq): the corpus collapsed to its vocabulary — the
    one corpus-scale agg of a BPE iteration (map-side combinable;
    everything downstream is vocab-sized). Words shorter than 2
    chars carry no pairs and are dropped here."""
    return (
        docs.filter(F.col("text").isNotNull())
        .select(F.explode(F.split("text", r"\s+")).alias("word"))
        .filter(F.length("word") >= 2)
        .groupBy("word").agg(F.count("*").alias("freq"))
    )


def pair_counts(vocab: DataFrame) -> DataFrame:
    """(pair, pair_count): adjacent character-pair frequencies over
    the vocabulary, weighted by word frequency — every occurrence of
    a pair inside a word counts once per corpus occurrence of the
    word. Runs on vocab-sized input by construction."""
    return (
        vocab.select(
            "freq",
            F.explode(F.expr(
                "transform(sequence(1, length(word) - 1), "
                "i -> substring(word, i, 2))")).alias("pair"))
        .groupBy("pair").agg(F.sum("freq").alias("pair_count"))
    )


@register("q188_bpe_pair_stats", oracle=_q188_oracle())
def q188_bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_TOP_PAIRS} BPE merge candidates: adjacent character
    pairs ranked by corpus frequency (count desc, pair asc), computed
    vocabulary-weighted (see module docstring for why that is the
    scale story)."""
    vocab = word_freqs(load_table(spark, sf_dir, "documents"))
    top = (pair_counts(vocab)
           .orderBy(F.desc("pair_count"), "pair").limit(_TOP_PAIRS))
    rk = Window.orderBy(F.desc("pair_count"), "pair")
    return top.withColumn("rk", F.row_number().over(rk).cast("int"))


# ---- q189: apply merge #1, recount — the BPE iteration step -------

def _q189_oracle() -> str:
    return rf"""
    WITH w AS (
        SELECT word, COUNT(*) AS freq
        FROM (SELECT unnest(regexp_split_to_array(text, '\s+')) AS word
              FROM documents WHERE text IS NOT NULL)
        WHERE length(word) >= 2
        GROUP BY word
    ),
    p AS (
        SELECT pair, CAST(SUM(freq) AS BIGINT) AS pair_count
        FROM (SELECT unnest(list_transform(
                  generate_series(1, length(word) - 1),
                  i -> substr(word, i, 2))) AS pair, freq
              FROM w)
        GROUP BY pair
    ),
    best AS (SELECT pair FROM p ORDER BY pair_count DESC, pair LIMIT 1),
    sym AS (
        SELECT w.freq,
               string_split(
                   replace(
                       array_to_string(list_transform(
                           generate_series(1, length(w.word)),
                           i -> substr(w.word, i, 1)), ' '),
                       substr(b.pair, 1, 1) || ' ' || substr(b.pair, 2, 1),
                       b.pair),
                   ' ') AS s
        FROM w CROSS JOIN best b
    ),
    p2 AS (
        SELECT pr AS pair, CAST(SUM(freq) AS BIGINT) AS pair_count
        FROM (SELECT freq, unnest(list_transform(
                  generate_series(1, len(s) - 1),
                  i -> s[i] || ' ' || s[i + 1])) AS pr
              FROM sym)
        GROUP BY pr
    )
    SELECT pair, pair_count, CAST(rk AS INT) AS rk
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY pair_count DESC, pair)
              AS rk FROM p2)
    WHERE rk <= {_TOP_PAIRS}
    """


def apply_merge(vocab: DataFrame, best: DataFrame) -> DataFrame:
    """(freq, s): each vocabulary word's symbol sequence after
    applying the winning merge — chars joined by single spaces, the
    merge applied via leftmost non-overlapping string replace
    (IDENTICAL greedy semantics in Spark and DuckDB, verified:
    'a a a' + merge(a,a) → ['aa', 'a']), then re-split. The spaced
    representation is the standard BPE working form: symbol
    boundaries stay unambiguous once symbols grow past one char."""
    return (
        vocab.crossJoin(F.broadcast(best))  # 1 row: keyless-agg bound
        .select("freq", F.split(
            F.replace(
                F.concat_ws(" ", F.split("word", "")),
                F.concat(F.substring("bp", 1, 1), F.lit(" "),
                         F.substring("bp", 2, 1)),
                F.col("bp")),
            " ").alias("s"))
    )


@register("q189_bpe_merge_apply", oracle=_q189_oracle())
def q189_bpe_merge_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One full BPE iteration: select merge #1 (q188's top pair —
    computed, not hard-coded), apply it greedily to every vocabulary
    word, and recount adjacent SYMBOL pairs (now 'sym sym' spaced
    strings, since symbols can exceed one char) — the top-{_TOP_PAIRS}
    of the recount is what merge #2 would choose from.

    Scale shape: identical to q188 (everything past the corpus
    word-count agg is vocab-sized) plus one broadcast of the 1-row
    winning-pair frame riding the vocabulary — the scalar-subquery
    broadcast shape (q53), and the merge apply itself is a per-row
    string op inside whole-stage codegen. The winning pair is
    selected with ONE min_by hash agg over (-count, pair) — q181's
    argmax-shortcut, no sort of the pair table."""
    vocab = word_freqs(load_table(spark, sf_dir, "documents"))
    best = pair_counts(vocab).agg(
        F.min_by("pair", F.struct((-F.col("pair_count")).alias("n"),
                                  F.col("pair"))).alias("bp"))
    sym = apply_merge(vocab, best)
    p2 = (
        sym.select("freq", F.explode(F.expr(
            "transform(sequence(1, size(s) - 1), "
            "i -> concat(element_at(s, i), ' ', element_at(s, i + 1)))"
        )).alias("pair"))
        .groupBy("pair").agg(F.sum("freq").alias("pair_count"))
    )
    top = p2.orderBy(F.desc("pair_count"), "pair").limit(_TOP_PAIRS)
    rk = Window.orderBy(F.desc("pair_count"), "pair")
    return top.withColumn("rk", F.row_number().over(rk).cast("int"))
