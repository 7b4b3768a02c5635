"""Group K — SimHash near-dup fingerprinting (q60), the second
sketch family a dedup pipeline runs alongside MinHash (q49).

SimHash here is 60-bit (not 64) so every intermediate stays inside a
signed BIGINT on both engines: the per-token hash is the first 15 hex
chars of md5 (identical in Spark and DuckDB — verified), and each
signature bit is the sign of the ±1 vote sum over the doc's tokens.
The whole computation is integer arithmetic → hash-exact oracle, no
sketch tolerance needed (unlike MinHash, SimHash has no randomness
once the hash function is fixed).

Scale: one explode + one 60-expression hash agg per doc — a single
shuffle on doc_id; the 60 votes ride the partial-aggregation pair
like any other measure. Near-dup candidates at scale come from
banding the signature (4×15-bit keys), same join shape as q49.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hearthstats_spark.io import load_table
from hearthstats_spark.queries.registry import register

_BITS = 60


def _oracle() -> str:
    votes = ",\n               ".join(
        f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(_BITS)
    )
    simhash = " + ".join(
        f"(CASE WHEN v{b} >= 0 THEN (CAST(1 AS BIGINT) << {b}) ELSE 0 END)"
        for b in range(_BITS)
    )
    return f"""
    WITH tok AS (
        SELECT doc_id,
               CAST(CONCAT('0x', SUBSTRING(md5(unnest(string_split(text, ' '))), 1, 15))
                    AS BIGINT) AS h
        FROM documents
    ),
    votes AS (
        SELECT doc_id,
               {votes}
        FROM tok GROUP BY doc_id
    )
    SELECT doc_id, {simhash} AS simhash
    FROM votes
    """


_JACCARD_ORACLE = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
              FROM documents WHERE text IS NOT NULL),
sh AS (SELECT DISTINCT doc_id, array_to_string(t[i+1:i+3], ' ') AS s
       FROM toks CROSS JOIN generate_series(0, 4096) g(i)
       WHERE i <= greatest(len(t) - 3, 0)),
freq AS (SELECT s, count(*) AS df FROM sh GROUP BY s),
ranked AS (
    SELECT sh.doc_id, sh.s,
           row_number() OVER (PARTITION BY sh.doc_id ORDER BY f.df, sh.s) AS rk,
           count(*)    OVER (PARTITION BY sh.doc_id) AS sz
    FROM sh JOIN freq f USING (s)),
prefix AS (SELECT * FROM ranked WHERE rk <= sz - (3*sz + 4) // 5 + 1),
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
SELECT id_a, id_b,
       ROUND(CAST(i AS DOUBLE) / (sz_a + sz_b - i), 4) AS jaccard
FROM inter
WHERE 5*i >= 3*(sz_a + sz_b - i)
"""


@register("q83_dedup_jaccard_exact", oracle=_JACCARD_ORACLE)
def q83_dedup_jaccard_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT word-3-gram Jaccard near-dup pairs at J ≥ 3/5 via
    prefix-filtered set-similarity self-join (AllPairs/PPJoin
    candidate generation) — no LSH recall loss, no all-pairs blow-up.

    Unlike q49 (MinHash banding: approximate candidate recall) and
    q60 (SimHash sketch), this is the exact formulation a dedup
    pipeline runs when false negatives are unacceptable; the prefix
    filter keeps it linear-ish at 100 TB (see
    operators/dedup.prefix_filtered_jaccard_pairs for the guarantee
    and shuffle budget). Oracle: same algorithm in DuckDB SQL —
    integer-only threshold math, so the match is hash-exact; the
    prefix-filter output is additionally brute-force-verified in
    tests/test_operators.py.

    Two lanes, measured crossover (round 9): the default recomputes
    shingles in-plan — at the 5k-doc bench corpus that BEATS reading
    the persisted index back (r8: 1.92 s vs 2.46 s; corpus-sized
    array<long> deserialization loses to xxhash64 in codegen). At
    50k docs the trade flips hard (in-plan 5.60 s vs indexed 3.73 s,
    −33% — the corpus-wide doc-frequency shuffle dominates), so
    SPARK_GRAFT_JACCARD_INDEX=1 serves the shingle-set frame and
    prefix posting list from the artifact store (the q118 shape);
    lane equality is pinned at 10× scale in the round-9 experiment
    and in tests. A cluster deployment past the crossover flips the
    env var; results are bit-identical either way."""
    return _jaccard_pairs(spark, sf_dir)


def _jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q83/q88's shared pair source: env-gated lane selection (see
    q83's docstring for the measured crossover)."""
    import os

    from hearthstats_spark.operators.dedup import (
        prefix_filtered_jaccard_pairs,
        prefix_filtered_jaccard_pairs_indexed,
    )

    if os.environ.get("SPARK_GRAFT_JACCARD_INDEX") == "1":
        return prefix_filtered_jaccard_pairs_indexed(
            spark, sf_dir, "doc_id", "text", k=3, t_num=3, t_den=5)
    d = load_table(spark, sf_dir, "documents")
    return prefix_filtered_jaccard_pairs(
        d, "doc_id", "text", k=3, t_num=3, t_den=5)


@register("q60_dedup_simhash", oracle=_oracle())
def q60_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash per document (see module docstring).

    Implementation: hearthstats_spark.operators.dedup (simhash) —
    this query is its declared form."""
    from hearthstats_spark.operators.dedup import simhash

    d = load_table(spark, sf_dir, "documents")
    return simhash(d, "doc_id", "text", bits=_BITS)


# ---- q88: near-dup pairs -> dedup CLUSTERS -------------------------
#
# q83 emits near-dup PAIRS; an actual dedup pass needs CLUSTERS —
# the transitive closure of the pair graph, one canonical survivor
# per component (A~B and B~C must collapse to ONE kept doc even when
# A~C was never emitted as a pair). Spark side: iterative min-label
# propagation (operators/graph.connected_components — two joins + a
# groupBy min per round, localCheckpoint lineage cuts, loud failure
# on non-convergence). Oracle side: transitive closure IS
# expressible in DuckDB — a recursive CTE expands reachability pairs
# (UNION dedups, so it terminates) and the min-per-vertex aggregate
# happens OUTSIDE the recursion, which is the part recursive SQL
# restricts.

_CLUSTER_ORACLE = f"""
WITH RECURSIVE pairs AS ({_JACCARD_ORACLE}),
und AS (
    SELECT id_a AS a, id_b AS b FROM pairs
    UNION
    SELECT id_b AS a, id_a AS b FROM pairs
),
reach(a, b) AS (
    SELECT a, b FROM und
    UNION
    SELECT r.a, e.b FROM reach r JOIN und e ON r.b = e.a
)
SELECT CAST(a AS BIGINT) AS member,
       CAST(LEAST(a, MIN(b)) AS BIGINT) AS canonical
FROM reach GROUP BY a
"""


@register("q88_dedup_clusters", oracle=_CLUSTER_ORACLE)
def q88_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collapse q83's exact-Jaccard near-dup pairs into dedup
    clusters: (member, canonical) for every clustered doc, canonical
    being the component's min doc_id — the survivor the dedup pass
    keeps (see comment block above; scale notes in SCALE.md §dedup).
    Pair source is q83's env-gated lane (_jaccard_pairs): the
    persisted-index tier applies identically here (−27% at 10×,
    round-9 experiment)."""
    from hearthstats_spark.operators.graph import dedup_clusters

    pairs = _jaccard_pairs(spark, sf_dir)
    return dedup_clusters(pairs.select("id_a", "id_b"))
