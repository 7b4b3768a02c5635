"""Group K cont'd — q183: product-quantization ANN (ADC scan).

The third classical ANN family beside the inverted-file probe
(q61/q87) and random-hyperplane LSH (q85) — VERDICT r5 item 5.
Product quantization (Jégou et al., "Product Quantization for
Nearest Neighbor Search", TPAMI 2011): split each D-dim vector into
M subvectors, vector-quantize each subspace against its own K-entry
codebook, and approximate squared-L2 distances as the SUM of
per-subspace table lookups (Asymmetric Distance Computation — the
query stays exact, only the database side is quantized). The
database compresses from M·(D/M) floats to M small code ids — at
the 100 TB design point that is the difference between scanning
embeddings and scanning a 16-byte code per vector.

Spark shape (every step a DataFrame op, no driver matrix):
- **codebook training** = one k-means half-step per subspace (q101's
  machinery run M times in a single plan): deterministic init (the
  subvectors of vec_id < K), broadcast-assign with the argmin as a
  map-side-combinable ``min_by`` hash agg (q181's argmax-shortcut
  discipline — no candidate-row window sort), one per-(subspace,
  code, dim) exact mean — davg_signed, the q141 centroid
  discipline, so the trained codebook is hash-exact cross-engine.
  Empty clusters drop deterministically on both engines.
- **encoding** = subvectors ⋈ codebook (runtime-guarded broadcast)
  → argmin per (vec_id, subspace): the code table, O(n·M) narrow
  rows.
- **ADC** = the probe set's per-(query, subspace, code) distance
  table (Q·M·K rows, broadcast) equi-joined to the code table on
  (subspace, code), then ONE hash agg summing the M parts per
  (query, vector) in exact decimal — order-independent, and
  map-side combinable at any scale.

Every float step follows the house exactness rules (fold-left d2 in
double + ROUND 4, exact decimal sums/means, ties broken on ids), so
unlike most engines' PQ this one is oracle-checked HASH-EXACT — the
recall/approximation trade is pinned separately against brute force
in tests/test_ann2.py (recall@5 must be ≥ the IVF probe's on the
same query set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hearthstats_spark.functions.numeric import favg_signed_sql
from hearthstats_spark.functions import davg_signed
from hearthstats_spark.io import load_table
from hearthstats_spark.operators.ann_index import persisted
from hearthstats_spark.operators.bounded import broadcast_bounded
from hearthstats_spark.queries.registry import register

_DIM = 64
_M = 8                  # subspaces
_SUBD = _DIM // _M      # dims per subspace
_K = 16                 # codes per subspace codebook
_N_QUERIES = 10         # probe set: vec_id < 10 (q61's convention)
_TOP_K = 5


def _pq_ctes() -> str:
    """The shared WITH-body (training → codebook → codes → query
    distance tables) q183's and q184's oracles both replay."""
    d2 = ("ROUND(list_sum(list_transform(generate_series(1, {n}), "
          "i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))), 4)")
    return f"""
    WITH e AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings WHERE embedding IS NOT NULL
    ),
    sub AS (
        SELECT vec_id, m, v[m * {_SUBD} + 1 : (m + 1) * {_SUBD}] AS sv
        FROM e CROSS JOIN generate_series(0, {_M - 1}) g(m)
    ),
    init AS (SELECT m, vec_id AS cid, sv AS cv FROM sub
             WHERE vec_id < {_K}),
    a0 AS (
        SELECT vec_id, m, cid, sv,
               ROW_NUMBER() OVER (PARTITION BY vec_id, m
                   ORDER BY {d2.format(n=_SUBD, a='sv', b='cv')}, cid)
                   AS rk
        FROM sub JOIN init USING (m)
    ),
    upd AS (
        SELECT m, cid, dim, {favg_signed_sql('sv[dim]', 'c')}
        FROM a0 CROSS JOIN generate_series(1, {_SUBD}) gd(dim)
        WHERE rk = 1
        GROUP BY m, cid, dim
    ),
    cb AS (SELECT m, cid, list(c ORDER BY dim) AS cv
           FROM upd GROUP BY m, cid),
    enc AS (
        SELECT vec_id, m, cid
        FROM (SELECT sub.vec_id, sub.m, cb.cid,
                     ROW_NUMBER() OVER (PARTITION BY sub.vec_id, sub.m
                         ORDER BY {d2.format(n=_SUBD, a='sub.sv',
                                             b='cb.cv')}, cb.cid) AS rk
              FROM sub JOIN cb USING (m))
        WHERE rk = 1
    ),
    dtab AS (
        SELECT q.vec_id AS query_id, cb.m, cb.cid,
               {d2.format(n=_SUBD, a='q.sv', b='cb.cv')} AS part
        FROM sub q JOIN cb USING (m)
        WHERE q.vec_id < {_N_QUERIES}
    )"""


def _pq_oracle() -> str:
    return _pq_ctes() + f""",
    adc AS (
        SELECT t.query_id, c.vec_id AS neighbor_id,
               CAST(SUM(CAST(t.part AS DECIMAL(28,4))) AS DOUBLE)
                   AS adc_d2
        FROM enc c JOIN dtab t ON c.m = t.m AND c.cid = t.cid
        WHERE c.vec_id <> t.query_id
        GROUP BY t.query_id, c.vec_id
    )
    SELECT query_id, neighbor_id, adc_d2, CAST(rk AS INT) AS rk
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY adc_d2, neighbor_id) AS rk FROM adc)
    WHERE rk <= {_TOP_K}
    """


def subvectors_of(e: DataFrame) -> DataFrame:
    """(vec_id, m, sv): the M per-subspace views of every vector in
    any (vec_id, embedding) frame — shared by q183 and s24's
    streaming serving lane (one subvector definition everywhere)."""
    v = F.transform("embedding", lambda x: x.cast("double"))
    return (
        # declared null policy for the whole PQ family (training,
        # codes, queries, s24 serving): a NULL embedding is not an
        # indexable vector — excluded on BOTH engines (the oracles
        # filter embedding IS NOT NULL); no-op on the shipped corpus
        e.filter(F.col("embedding").isNotNull())
        .select("vec_id", v.alias("v"))
        .select("vec_id", F.explode(F.array(*[
            F.struct(F.lit(m).alias("m"),
                     F.slice("v", m * _SUBD + 1, _SUBD).alias("sv"))
            for m in range(_M)
        ])).alias("s"))
        .select("vec_id", "s.*")
    )


def _subvectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    return subvectors_of(load_table(spark, sf_dir, "embeddings"))


def _d2(a: str, b: str):
    """Fold-left squared-L2 between two double arrays, rounded 4dp —
    q101's cross-engine-exact distance discipline."""
    return F.round(
        F.aggregate(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0), lambda acc, x: acc + x),
        4)


def _trained_codebook(sub: DataFrame) -> DataFrame:
    """(m, cid, cv): one k-means half-step per subspace from the
    deterministic init (subvectors of vec_id < K). Means are exact
    (davg_signed) and clusters that end up empty drop on BOTH
    engines, so the codebook is hash-exact."""
    init = (sub.filter(F.col("vec_id") < _K)
            .select("m", F.col("vec_id").alias("cid"),
                    F.col("sv").alias("cv")))
    # argmin as ONE min_by hash agg, not a row_number window: the
    # agg pair is map-side combinable (ships one row per (vec, m)
    # per partition), where a window must sort all n·M·K candidate
    # rows through the exchange — q181's argmax-shortcut discipline.
    # (d2, cid) is unique per group, so min_by is deterministic.
    # init is ≤ K·M rows by construction, but q186 trains on the
    # RESIDUAL frame whose lineage includes the centroid agg (no
    # pushed vec_id filter on every scan), so the hint goes through
    # the runtime guard rather than relying on the audit's
    # pushed-LessThan rule.
    assign = (
        sub.join(broadcast_bounded(init, _K * _M), "m")
        .select("vec_id", "m", "cid", "sv", _d2("sv", "cv").alias("d2"))
        .groupBy("vec_id", "m")
        .agg(F.min_by(F.struct("cid", "sv"),
                      F.struct("d2", "cid")).alias("best"))
        .select("vec_id", "m", F.col("best.cid").alias("cid"),
                F.col("best.sv").alias("sv"))
    )
    upd = (
        assign.select("m", "cid", F.posexplode("sv").alias("dim0", "x"))
        .groupBy("m", "cid", (F.col("dim0") + 1).alias("dim"))
        .agg(davg_signed(F.col("x"), "c"))
    )
    return (
        upd.groupBy("m", "cid")
        .agg(F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "c"))),
            lambda s: s["c"]).alias("cv"))
    )


def encode_against(sub: DataFrame, cb: DataFrame) -> DataFrame:
    """(vec_id, m, cid) PQ code table: argmin as ONE min_by hash agg
    (map-side combinable — q181's argmax-shortcut discipline), never
    a candidate-row window sort."""
    return (
        sub.join(broadcast_bounded(cb, _M * _K), "m")
        .select("vec_id", "m", "cid", _d2("sv", "cv").alias("d2"))
        .groupBy("vec_id", "m")
        .agg(F.min_by("cid", F.struct("d2", "cid")).alias("cid"))
    )


def adc_topk(qsub: DataFrame, enc: DataFrame, cb: DataFrame,
             max_queries: int, top_k: int = _TOP_K) -> DataFrame:
    """ADC scan: per-(query, subspace, code) distance table
    (≤ max_queries·M·K rows, runtime-guarded broadcast) equi-joined
    to the code table, parts summed per (query, vector) in exact
    decimal, self excluded, top_k ranked on (adc_d2, neighbor_id).
    Shared by q183 (one-shot probe) and s24 (per-micro-batch
    serving)."""
    dtab = (
        qsub.select(F.col("vec_id").alias("query_id"), "m", "sv")
        .join(broadcast_bounded(cb, _M * _K), "m")
        .select("query_id", "m", "cid", _d2("sv", "cv").alias("part"))
    )
    adc = (
        enc.join(broadcast_bounded(dtab, max_queries * _M * _K),
                 ["m", "cid"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum(F.col("part").cast("decimal(28,4)")).cast("double")
             .alias("adc_d2"))
    )
    pick = Window.partitionBy("query_id").orderBy("adc_d2", "neighbor_id")
    return (
        adc.withColumn("rk", F.row_number().over(pick).cast("int"))
        .filter(F.col("rk") <= top_k)
    )


@register("q183_ann_pq", oracle=_pq_oracle())
def q183_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ/ADC top-{_TOP_K} neighbor probe for queries vec_id <
    {_N_QUERIES}: (query_id, neighbor_id, adc_d2, rk) — approximate
    squared-L2 by per-subspace codebook lookup (see module
    docstring for the training/encode/ADC plan shape).

    Train-once/serve-many (VERDICT r6 item 5): the codebook and the
    code table are content-keyed persisted artifacts
    (operators/ann_index.py) — trained on first touch, read back by
    every later probe in this or any other process; both are
    deterministic so read-back == rebuild bit-for-bit. The
    self-contained retrain lane is SPARK_GRAFT_ANN_CACHE=0."""
    sub = _subvectors(spark, sf_dir)
    # trained codebook: ≤ M·K rows, but its lineage scans the fact
    # table, so each join-site hint is runtime-guarded, not narrated
    # (guarded per site, hinting a cached frame once would duplicate
    # one guard across two exchanges and fail the audit's accounting)
    cb = persisted(spark, sf_dir, "pq_codebook",
                   lambda: _trained_codebook(sub)).cache()
    enc = persisted(spark, sf_dir, "pq_codes",
                    lambda: encode_against(sub, cb))
    return adc_topk(sub.filter(F.col("vec_id") < _N_QUERIES), enc, cb,
                    max_queries=_N_QUERIES)


# ---- q184: IVF-PQ — the composed production architecture ----------
#
# FAISS's IVFPQ shape (Jégou et al. 2011 §V): a coarse quantizer
# routes every vector to a cell, and the PQ/ADC machinery scores ONLY
# the query's own cell. q61 contributes the coarse quantizer (sign
# bits of the first 8 dims — deterministic, the cells a production
# system would train with k-means), q183 the codebooks/codes; the
# scoring join gains one extra equi-key (the cell id), which is
# exactly how the candidate pruning reaches the PLAN: the join
# output shrinks from n·Q pairs to same-cell pairs before any
# distance math or aggregation runs.

def _ivf_pq_oracle() -> str:
    from hearthstats_spark.queries.ann import _BUCKET_SQL

    return _pq_ctes() + f""",
    bkt AS (SELECT vec_id, {_BUCKET_SQL} AS bucket FROM embeddings WHERE embedding IS NOT NULL),
    adc AS (
        SELECT t.query_id, c.vec_id AS neighbor_id,
               CAST(SUM(CAST(t.part AS DECIMAL(28,4))) AS DOUBLE)
                   AS adc_d2
        FROM enc c
        JOIN bkt bc ON bc.vec_id = c.vec_id
        JOIN dtab t ON c.m = t.m AND c.cid = t.cid
        JOIN bkt bq ON bq.vec_id = t.query_id
                   AND bq.bucket = bc.bucket
        WHERE c.vec_id <> t.query_id
        GROUP BY t.query_id, c.vec_id
    )
    SELECT query_id, neighbor_id, adc_d2, CAST(rk AS INT) AS rk
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY adc_d2, neighbor_id) AS rk FROM adc)
    WHERE rk <= {_TOP_K}
    """


@register("q184_ann_ivf_pq", oracle=_ivf_pq_oracle())
def q184_ann_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ probe: top-{_TOP_K} by ADC distance among the
    candidates in the query's OWN coarse cell (q61's sign-bit
    quantizer × q183's PQ codebooks — see the section comment).

    Plan: the code table carries its cell id (one equi-join of two
    narrow frames), the query distance table carries the query's
    cell, and the scoring join keys on (bucket, m, cid) — candidate
    pruning happens IN the hash join, before any part is summed. At
    scale this is the standard two-level index: cells bound the
    candidate set, codes bound the per-candidate cost; with the
    code+cell table bucketed by cell id the probe becomes a
    partition-pruned scan."""
    e = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull())  # family null policy
    # q61's coarse quantizer (sign bits of the first 8 dims)
    bucket = sum(
        (
            F.when(F.element_at("embedding", i + 1) >= 0, F.lit(1 << i))
            .otherwise(F.lit(0))
            for i in range(8)
        ),
        start=F.lit(0),
    )
    bkt = e.select("vec_id", bucket.alias("bucket"))
    sub = subvectors_of(e)
    # q183's persisted artifacts, shared verbatim (one codebook, one
    # code table for the whole PQ family — the two-level index only
    # ADDS the cell key, it never retrains)
    cb = persisted(spark, sf_dir, "pq_codebook",
                   lambda: _trained_codebook(sub)).cache()
    enc = persisted(spark, sf_dir, "pq_codes",
                    lambda: encode_against(sub, cb)).join(bkt, "vec_id")
    qsub = sub.filter(F.col("vec_id") < _N_QUERIES)
    dtab = (
        qsub.select(F.col("vec_id").alias("query_id"), "m", "sv")
        .join(broadcast_bounded(cb, _M * _K), "m")
        .select("query_id", "m", "cid", _d2("sv", "cv").alias("part"))
        .join(bkt.filter(F.col("vec_id") < _N_QUERIES)
              .select(F.col("vec_id").alias("query_id"), "bucket"),
              "query_id")
    )
    adc = (
        enc.join(broadcast_bounded(dtab, _N_QUERIES * _M * _K),
                 ["bucket", "m", "cid"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum(F.col("part").cast("decimal(28,4)")).cast("double")
             .alias("adc_d2"))
    )
    pick = Window.partitionBy("query_id").orderBy("adc_d2", "neighbor_id")
    return (
        adc.withColumn("rk", F.row_number().over(pick).cast("int"))
        .filter(F.col("rk") <= _TOP_K)
    )
