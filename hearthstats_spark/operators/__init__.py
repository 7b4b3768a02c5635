"""Library operators the engine adds on top of stock Spark
(SURVEY.md §4.3): pure DataFrame compositions, no Catalyst rules.
"""

from hearthstats_spark.operators.asof import asof_join

__all__ = ["asof_join"]
