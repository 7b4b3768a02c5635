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


@register("q60_dedup_simhash", oracle=_oracle())
def q60_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash per document (see module docstring).

    Implementation: hearthstats_spark.operators.dedup (simhash) —
    this query is its declared form."""
    from hearthstats_spark.operators.dedup import simhash

    d = load_table(spark, sf_dir, "documents")
    return simhash(d, "doc_id", "text", bits=_BITS)
