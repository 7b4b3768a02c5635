"""Round-6 pipeline extensions (q182): incremental dedup.

Every dedup lane through round 5 (q48/q49/q83/q118/q136/q155/q172…)
self-joins the WHOLE corpus — the right shape for a one-shot backfill,
but a production crawl dedups INCREMENTALLY: each ingestion batch is
screened against the signature index of everything already accepted,
and only survivors append to the corpus (the Delta-ingest shape —
VERDICT r5 item 3). q182 is that operator:

- the **corpus side** is q118's deterministic MinHash band table —
  scan → one 16-min hash agg → constant ×8 band explode, NO join
  anywhere in its plan (test_pipeline_ext3 pins this): at 100 TB this
  frame is PERSISTED once and appended per batch, so per-ingestion
  cost is a parquet read of the index, never a corpus re-shingle;
- the **new batch** (here the doc_id % 10 == 0 slice; in production
  the day's crawl) builds the same signatures over batch-sized input
  only;
- the screen is a plain band **equi-join** (new × corpus — never
  corpus × corpus), candidate pairs verified by full-signature match
  count, and every batch doc emits a row: its candidate count, best
  match, and the kept/dropped decision (est_jaccard ≥ 0.5 ⇒ drop).

The MinHash family, banding geometry, and md5 base hash are imported
from q118 (pipeline_ext2) — one deterministic signature definition
shared by the backfill and the incremental lane, so an index built by
either is readable by the other. The oracle replays the identical
algorithm in DuckDB, so the WHOLE incremental screen is hash-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hearthstats_spark.io import load_table
from hearthstats_spark.operators.ann_index import persisted
from hearthstats_spark.queries.pipeline_ext2 import (
    _MH_BANDS, _MH_K, _MH_P, _MH_ROWS, _mh_consts, _mh_hash_sql,
)
from hearthstats_spark.queries.registry import register

_BATCH_MOD = 10          # doc_id % 10 == 0 ⇒ "today's batch"
_DROP_AT = _MH_K // 2    # n_match ≥ 8 of 16 ⇒ est_jaccard ≥ 0.5 ⇒ drop


def signatures_of(docs: DataFrame) -> DataFrame:
    """q118's 16-slot MinHash signature frame over ANY (doc_id, text)
    frame: shingle explode → one 16-min hash agg — no joins. Shared
    by q182's two lanes and s23's per-micro-batch screen, so every
    consumer reads/writes ONE signature-index format."""
    from hearthstats_spark.operators.dedup import shingles

    base = F.pmod(
        F.conv(F.substring(F.md5(F.col("s").cast("binary")), 1, 8),
               16, 10).cast("long"),
        F.lit(_MH_P),
    )
    sh = (docs.select(F.col("doc_id").alias("id"),
                      shingles("text", 3).alias("arr"))
          .select("id", F.explode("arr").alias("s"))
          .select("id", base.alias("b")))
    consts = _mh_consts()

    def h(j: int):
        a, c = consts[j]
        return F.pmod(F.lit(a) * F.col("b") + F.lit(c), F.lit(_MH_P))

    return sh.groupBy("id").agg(
        *[F.min(h(j)).alias(f"m{j}") for j in range(_MH_K)])


def _signatures(spark: SparkSession, sf_dir: str, batch: bool) -> DataFrame:
    """Signature frame over ONE slice of the corpus (batch=True: the
    new batch; False: the accepted corpus). scan → agg only, which is
    what lets the corpus side stand in for a persisted index read."""
    d = load_table(spark, sf_dir, "documents")
    pred = (F.col("doc_id") % _BATCH_MOD == 0) if batch \
        else (F.col("doc_id") % _BATCH_MOD != 0)
    return signatures_of(d.filter(pred))


def _band_table(sig: DataFrame) -> DataFrame:
    """(id, band, k0, k1) — q118's banding, 8 bands × 2 rows."""
    return sig.select(
        "id",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                *[F.col(f"m{b * _MH_ROWS + r}").alias(f"k{r}")
                  for r in range(_MH_ROWS)],
            )
            for b in range(_MH_BANDS)
        ])).alias("bk"),
    ).select("id", "bk.*")


def _q182_oracle() -> str:
    mins = ",\n               ".join(
        f"MIN({_mh_hash_sql(j, 'b')}) AS m{j}" for j in range(_MH_K))
    band_selects = "\n        UNION ALL ".join(
        f"SELECT id, {b} AS band, "
        + ", ".join(f"m{b * _MH_ROWS + r} AS k{r}" for r in range(_MH_ROWS))
        + " FROM {src}"
        for b in range(_MH_BANDS))
    corpus_bands = band_selects.format(src="corpus")
    new_bands = band_selects.format(src="newb")
    band_eq = " AND ".join(f"n.k{r} = c.k{r}" for r in range(_MH_ROWS))
    n_match = " + ".join(
        f"CASE WHEN sa.m{j} = sb.m{j} THEN 1 ELSE 0 END"
        for j in range(_MH_K))
    return f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
                  FROM documents WHERE text IS NOT NULL),
    sh AS (SELECT DISTINCT doc_id, array_to_string(t[i+1:i+3], ' ') AS s
           FROM toks CROSS JOIN generate_series(0, 4096) g(i)
           WHERE i <= greatest(len(t) - 3, 0)),
    based AS (SELECT doc_id AS id,
                     CAST(CONCAT('0x', SUBSTRING(md5(s), 1, 8))
                          AS BIGINT) % {_MH_P} AS b
              FROM sh),
    sig AS (SELECT id, {mins} FROM based GROUP BY id),
    corpus AS (SELECT * FROM sig WHERE id % {_BATCH_MOD} <> 0),
    newb AS (SELECT * FROM sig WHERE id % {_BATCH_MOD} = 0),
    cb AS ({corpus_bands}),
    nb AS ({new_bands}),
    cand AS (
        SELECT DISTINCT n.id AS new_id, c.id AS corpus_id
        FROM nb n JOIN cb c ON n.band = c.band AND {band_eq}
    ),
    best AS (
        SELECT cand.new_id,
               CAST(COUNT(*) AS BIGINT) AS n_candidates,
               MAX({n_match}) AS n_match_best
        FROM cand
        JOIN sig sa ON sa.id = cand.new_id
        JOIN sig sb ON sb.id = cand.corpus_id
        GROUP BY cand.new_id
    )
    SELECT d.doc_id,
           COALESCE(b.n_candidates, 0) AS n_candidates,
           CAST(COALESCE(b.n_match_best, 0) AS INT) AS n_match_best,
           CAST(COALESCE(b.n_match_best, 0) < {_DROP_AT} AS INT) AS kept
    FROM (SELECT doc_id FROM documents
          WHERE text IS NOT NULL AND doc_id % {_BATCH_MOD} = 0) d
    LEFT JOIN best b ON b.new_id = d.doc_id
    """


def best_match_against_index(new_sig: DataFrame,
                             index_sig: DataFrame) -> DataFrame:
    """(new_id, n_candidates, n_match_best) for every new-side doc
    sharing ≥ 1 band with the signature index: ONE band equi-join
    (never new × new or index × index), then two id-keyed joins fetch
    both signatures for the full match count. Shared by q182 (static
    corpus slice) and s23 (growing per-batch index)."""
    cand = (
        _band_table(new_sig).alias("n")
        .join(_band_table(index_sig).alias("c"),
              [F.col("n.band") == F.col("c.band"),
               *[F.col(f"n.k{r}") == F.col(f"c.k{r}")
                 for r in range(_MH_ROWS)]])
        .select(F.col("n.id").alias("new_id"),
                F.col("c.id").alias("corpus_id"))
        .distinct()
    )
    sa = new_sig.select(F.col("id").alias("new_id"),
                        *[F.col(f"m{j}").alias(f"a{j}")
                          for j in range(_MH_K)])
    sb = index_sig.select(F.col("id").alias("corpus_id"),
                          *[F.col(f"m{j}").alias(f"b{j}")
                            for j in range(_MH_K)])
    n_match = sum(
        (F.when(F.col(f"a{j}") == F.col(f"b{j}"), 1).otherwise(0)
         for j in range(_MH_K)),
        start=F.lit(0),
    )
    return (
        cand.join(sa, "new_id").join(sb, "corpus_id")
        .groupBy("new_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
             F.max(n_match).alias("n_match_best"))
    )


@register("q182_dedup_incremental", oracle=_q182_oracle())
def q182_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (new-batch vs signature-index) near-dup screen —
    one row per batch doc: (doc_id, n_candidates, n_match_best,
    kept). kept = 0 iff the best full-signature match against the
    accepted corpus reaches n_match ≥ {_DROP_AT}/{_MH_K}
    (est_jaccard ≥ 0.5).

    Plan: the corpus lane is scan → 16-min agg → constant band
    explode with NO join (the persisted-index stand-in; pinned by
    tests/test_pipeline_ext3.py); the batch lane is the same over
    batch-sized input; ONE band equi-join screens new against
    corpus (hash join on (band, k0, k1) — never corpus × corpus),
    two id-keyed joins fetch both signatures for the match count,
    and a left join from the batch id list keeps zero-candidate
    docs. At 100 TB: per-batch cost is O(batch shingles) + an
    index-sized join keyed by bands — the corpus is touched only
    through its (persisted) signature index, which is the entire
    point of the operator."""
    # the corpus signature index is the literal persisted artifact
    # (operators/ann_index): built on first touch, content-keyed on
    # the documents table, shared with the s23/s25/s26 streaming
    # lanes — per-batch cost is a parquet read of the index, exactly
    # the 100 TB story the docstring promises
    corpus_sig = persisted(spark, sf_dir, "minhash_sig_index",
                           lambda: _signatures(spark, sf_dir, batch=False),
                           table="documents").cache()
    new_sig = _signatures(spark, sf_dir, batch=True).cache()
    best = best_match_against_index(new_sig, corpus_sig)
    d = load_table(spark, sf_dir, "documents")
    batch_ids = (d.filter(F.col("text").isNotNull()
                          & (F.col("doc_id") % _BATCH_MOD == 0))
                 .select("doc_id"))
    return (
        batch_ids.join(best, batch_ids["doc_id"] == best["new_id"], "left")
        .select(
            "doc_id",
            F.coalesce("n_candidates", F.lit(0)).alias("n_candidates"),
            F.coalesce("n_match_best", F.lit(0)).cast("int")
            .alias("n_match_best"),
            (F.coalesce("n_match_best", F.lit(0)) < _DROP_AT)
            .cast("int").alias("kept"),
        )
    )


# ---- q197: train/val/test split-leakage audit ----------------------
#
# q91 decontaminates against an EXTERNAL benchmark; the other leak a
# pipeline must audit is INTERNAL: near-duplicate documents landing
# on opposite sides of the train/eval split (q119's hash-mod rule
# assigns docs independently, so a near-dup pair straddles the split
# with probability 2·p·(1−p) — eval metrics silently become
# memorization tests). q197 reports, per split-pair class, the
# candidate pairs (q118's banding), the confirmed pairs
# (n_match ≥ 8 of 16 — q182's drop rule), and the distinct
# EVAL-side documents leaked (the rows you would quarantine).
#
# Everything is a composition: signatures_of → _band_table self-join
# (the only quadratic surface stays inside band buckets), splits are
# a PURE FUNCTION of doc_id (q119's md5-mod rule) computed by
# expression on the pair frame — no join against a split table.

_SPLIT_SQL = ("CASE WHEN CAST(CONCAT('0x', SUBSTRING(md5("
              "CAST({c} AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 80 "
              "THEN 'train' WHEN CAST(CONCAT('0x', SUBSTRING(md5("
              "CAST({c} AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 90 "
              "THEN 'val' ELSE 'test' END")


def _q197_oracle() -> str:
    mins = ",\n               ".join(
        f"MIN({_mh_hash_sql(j, 'b')}) AS m{j}" for j in range(_MH_K))
    band_selects = "\n        UNION ALL ".join(
        f"SELECT id, {b} AS band, "
        + ", ".join(f"m{b * _MH_ROWS + r} AS k{r}" for r in range(_MH_ROWS))
        + " FROM sig"
        for b in range(_MH_BANDS))
    band_eq = " AND ".join(f"a.k{r} = b.k{r}" for r in range(_MH_ROWS))
    n_match = " + ".join(
        f"CASE WHEN sa.m{j} = sb.m{j} THEN 1 ELSE 0 END"
        for j in range(_MH_K))
    sp_a, sp_b = _SPLIT_SQL.format(c="x.id_a"), _SPLIT_SQL.format(c="x.id_b")
    rk = "CASE {s} WHEN 'train' THEN 0 WHEN 'val' THEN 1 ELSE 2 END"
    return f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
                  FROM documents WHERE text IS NOT NULL),
    sh AS (SELECT DISTINCT doc_id, array_to_string(t[i+1:i+3], ' ') AS s
           FROM toks CROSS JOIN generate_series(0, 4096) g(i)
           WHERE i <= greatest(len(t) - 3, 0)),
    based AS (SELECT doc_id AS id,
                     CAST(CONCAT('0x', SUBSTRING(md5(s), 1, 8))
                          AS BIGINT) % {_MH_P} AS b
              FROM sh),
    sig AS MATERIALIZED (SELECT id, {mins} FROM based GROUP BY id),
    bands AS MATERIALIZED ({band_selects}),
    cand AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND {band_eq} AND a.id < b.id
    ),
    x AS (
        SELECT c.id_a, c.id_b, CAST({n_match} AS INT) AS n_match
        FROM cand c
        JOIN sig sa ON sa.id = c.id_a
        JOIN sig sb ON sb.id = c.id_b
    ),
    y AS (
        SELECT n_match, {sp_a} AS split_a, {sp_b} AS split_b,
               x.id_a, x.id_b
        FROM x
        WHERE {sp_a} <> {sp_b}
    ),
    z AS (
        SELECT n_match,
               CASE WHEN {rk.format(s='split_a')}
                         < {rk.format(s='split_b')}
                    THEN split_a || '-' || split_b
                    ELSE split_b || '-' || split_a END AS pair_class,
               CASE WHEN {rk.format(s='split_a')}
                         > {rk.format(s='split_b')}
                    THEN id_a ELSE id_b END AS eval_id
        FROM y
    )
    SELECT pair_class,
           CAST(COUNT(*) AS BIGINT) AS n_candidate_pairs,
           CAST(SUM(CASE WHEN n_match >= {_DROP_AT} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_confirmed_pairs,
           CAST(COUNT(DISTINCT CASE WHEN n_match >= {_DROP_AT}
                                    THEN eval_id END) AS BIGINT)
               AS n_leaked_eval_docs
    FROM z GROUP BY pair_class
    """


def _split_of(c):
    """q119's deterministic hash-mod split as a pure expression of a
    doc-id COLUMN (no join against a split table)."""
    b = F.pmod(
        F.conv(F.substring(F.md5(F.col(c).cast("string")
                                 .cast("binary")), 1, 8), 16, 10)
        .cast("long"),
        F.lit(100),
    )
    return (F.when(b < 80, "train").when(b < 90, "val")
            .otherwise("test"))


@register("q197_split_leakage", oracle=_q197_oracle())
def q197_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-leakage audit: near-duplicate pairs straddling q119's
    train/val/test split, per split-pair class — candidate pairs
    (band collision), confirmed pairs (n_match ≥ {_DROP_AT}/16), and
    distinct leaked EVAL-side docs (see section comment).

    Plan: q118's signature agg (cached: band explode + both pair
    joins read it) → band self-join → pair distinct → two id-keyed
    sig joins for the match count; split membership is computed BY
    EXPRESSION from the id columns on the pair frame (pure function
    of doc_id), so the split adds zero joins and zero shuffles to
    q118's shape."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull())
    # all-documents signature frame, persisted once (the audit reruns
    # on every split-rule change; the signatures never change)
    sig = persisted(spark, sf_dir, "minhash_sig_all",
                    lambda: signatures_of(d), table="documents").cache()
    bands = _band_table(sig)
    cand = (
        bands.alias("a")
        .join(bands.alias("b"),
              [F.col("a.band") == F.col("b.band"),
               *[F.col(f"a.k{r}") == F.col(f"b.k{r}")
                 for r in range(_MH_ROWS)],
               F.col("a.id") < F.col("b.id")])
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sa = sig.select(F.col("id").alias("id_a"),
                    *[F.col(f"m{j}").alias(f"a{j}") for j in range(_MH_K)])
    sb = sig.select(F.col("id").alias("id_b"),
                    *[F.col(f"m{j}").alias(f"b{j}") for j in range(_MH_K)])
    n_match = sum(
        (F.when(F.col(f"a{j}") == F.col(f"b{j}"), 1).otherwise(0)
         for j in range(_MH_K)),
        start=F.lit(0),
    ).cast("int")
    ra, rb = (F.when(s == "train", 0).when(s == "val", 1).otherwise(2)
              for s in (F.col("split_a"), F.col("split_b")))
    confirmed = F.col("n_match") >= _DROP_AT
    return (
        cand.join(sa, "id_a").join(sb, "id_b")
        .select("id_a", "id_b", n_match.alias("n_match"),
                _split_of("id_a").alias("split_a"),
                _split_of("id_b").alias("split_b"))
        .filter(F.col("split_a") != F.col("split_b"))
        .select(
            "n_match",
            F.when(ra < rb,
                   F.concat_ws("-", "split_a", "split_b"))
            .otherwise(F.concat_ws("-", "split_b", "split_a"))
            .alias("pair_class"),
            F.when(ra > rb, F.col("id_a")).otherwise(F.col("id_b"))
            .alias("eval_id"))
        .groupBy("pair_class")
        .agg(F.count(F.lit(1)).alias("n_candidate_pairs"),
             F.sum(confirmed.cast("int")).cast("long")
             .alias("n_confirmed_pairs"),
             F.count_distinct(F.when(confirmed, F.col("eval_id")))
             .alias("n_leaked_eval_docs"))
    )


# ---- q199: end-to-end quality-gate funnel --------------------------

def _q199_oracle() -> str:
    sp = _SPLIT_SQL.format(c="doc_id")
    return f"""
    WITH raw AS MATERIALIZED (
        SELECT doc_id, len(string_split(text, ' ')) AS nt,
               md5(text) AS th
        FROM documents WHERE text IS NOT NULL
    ),
    g AS MATERIALIZED (SELECT * FROM raw WHERE nt >= 20),
    ded AS MATERIALIZED (
        SELECT MIN(doc_id) AS doc_id, MIN(nt) AS nt
        FROM g GROUP BY th
    )
    SELECT stage, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(sum_tokens AS BIGINT) AS sum_tokens
    FROM (
        SELECT 'raw' AS stage, COUNT(*) AS n_docs,
               SUM(nt) AS sum_tokens FROM raw
        UNION ALL
        SELECT 'gated', COUNT(*), SUM(nt) FROM g
        UNION ALL
        SELECT 'deduped', COUNT(*), SUM(nt) FROM ded
        UNION ALL
        SELECT {sp}, COUNT(*), SUM(nt) FROM ded GROUP BY 1
    )
    """


@register("q199_quality_gate_funnel", oracle=_q199_oracle())
def q199_quality_gate_funnel(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """The standard ingest funnel as ONE report: raw corpus → length
    gate (q57's short-band cutoff, n_tokens ≥ 20) → exact-dedup
    survivors (min-doc_id per md5(text) — the house survivor rule) →
    q119's split assignment; one (stage, n_docs, sum_tokens) row per
    stage and per split — the yield accounting read before any
    training run ("how many tokens survive to train?").

    Plan (restructured in optimization round 11 — guide §1.2 step 1,
    fewer passes): the four stages cost TWO corpus scans instead of
    four and ONE dedup shuffle instead of two. Scan 1 computes the
    raw AND gated rows as one conditional aggregation (the md5 column
    prunes away — the stats only need nt); scan 2 feeds the single
    md5-dedup aggregation, whose per-split stats are materialized
    (split-count-sized, ~3 rows) and the 'deduped' row is their exact
    integer sum — dedup duplicates share identical text so MIN(nt)
    per hash group IS the survivor's count (no join-back), and the
    split is a pure expression of doc_id (q197's rule, one shared
    definition). All integer arithmetic — no doubles anywhere."""
    base = (load_table(spark, sf_dir, "documents")
            .filter(F.col("text").isNotNull())
            .select("doc_id",
                    F.size(F.split("text", " ")).alias("nt"),
                    F.md5(F.col("text").cast("binary")).alias("th")))
    gated = F.col("nt") >= 20

    # scan 1 — raw + gated in one pass (conditional agg; th pruned)
    rg = base.agg(
        F.count(F.lit(1)).alias("rn"),
        F.sum("nt").cast("long").alias("rt"),
        F.count(F.when(gated, F.lit(1))).alias("gn"),
        F.sum(F.when(gated, F.col("nt"))).cast("long").alias("gt"))
    rg_rows = rg.select(F.explode(F.array(
        F.struct(F.lit("raw").alias("stage"),
                 F.col("rn").alias("n_docs"),
                 F.col("rt").alias("sum_tokens")),
        F.struct(F.lit("gated").alias("stage"),
                 F.col("gn").alias("n_docs"),
                 F.col("gt").alias("sum_tokens")))).alias("s")
    ).select("s.*")

    # scan 2 — the one dedup agg; split stats materialized tiny so
    # the 'deduped' total reads 3 rows instead of re-running the
    # corpus-scale dedup (localCheckpoint is split-count-sized)
    ded = (base.filter(gated)
           .groupBy("th").agg(F.min("doc_id").alias("doc_id"),
                              F.min("nt").alias("nt")))
    splits = (ded.groupBy(_split_of("doc_id").alias("stage"))
              .agg(F.count(F.lit(1)).alias("n_docs"),
                   F.sum("nt").cast("long").alias("sum_tokens"))
              .select("stage", "n_docs", "sum_tokens")
              .localCheckpoint())
    # exact integer roll-up of the split rows == the direct dedup
    # stats; COALESCE keeps n_docs = 0 (not NULL) on an empty corpus,
    # matching COUNT(*) on both engines (sum_tokens stays NULL there
    # on both — SUM over zero rows)
    dedup_row = splits.agg(
        F.coalesce(F.sum("n_docs"), F.lit(0).cast("long"))
        .alias("n_docs"),
        F.sum("sum_tokens").cast("long").alias("sum_tokens")
    ).select(F.lit("deduped").alias("stage"), "n_docs", "sum_tokens")
    return rg_rows.unionByName(dedup_row).unionByName(splits)
