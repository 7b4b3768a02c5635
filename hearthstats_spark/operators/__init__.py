"""Library operators the engine adds on top of stock Spark
(SURVEY.md §4.3): pure DataFrame compositions plus two Arrow-batched
numpy kernels — no Catalyst rules needed.
"""

from hearthstats_spark.operators.asof import asof_join
from hearthstats_spark.operators.expectations import audit, fk_violations
from hearthstats_spark.operators.graph import connected_components, dedup_clusters
from hearthstats_spark.operators.dedup import (
    exact_dedup,
    minhash_near_dup_pairs,
    shingles,
    simhash,
    winnow_fingerprints,
)
from hearthstats_spark.operators.rangejoin import range_join
from hearthstats_spark.operators.rankops import with_global_position
from hearthstats_spark.operators.skew import salted_join
from hearthstats_spark.operators.similarity import (
    blocked_threshold_pairs,
    brute_force_topk_pairs,
)

__all__ = [
    "asof_join",
    "audit",
    "blocked_threshold_pairs",
    "brute_force_topk_pairs",
    "connected_components",
    "dedup_clusters",
    "exact_dedup",
    "fk_violations",
    "minhash_near_dup_pairs",
    "range_join",
    "salted_join",
    "shingles",
    "simhash",
    "winnow_fingerprints",
    "with_global_position",
]
