"""hearthstats_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first reimplementation of the query and
data-processing capabilities of the reference project
``waymanglover/hearthstats`` (a scrape -> SQLite -> aggregate ETL
pipeline; see SURVEY.md §0/§1 — the reference checkout was empty at
build time, so the binding contract is SURVEY.md §2's operator
inventory), extended with the LLM-data-pipeline operators
(dedup, similarity search, multimodal columns, text analysis) that a
100 TB training-data pipeline needs.

Design principles (SURVEY.md §4):
- Everything is DataFrame/SQL so Catalyst optimizes it; RDDs nowhere.
- Pandas/Arrow UDFs only where built-ins can't express the semantics.
- Every operator is written for a 1000-executor cluster: broadcast
  small dims, pre-aggregate before joins, block similarity joins,
  keep predicates/pruning pushed to the Parquet scan.
"""

from hearthstats_spark.session import get_spark, stop_spark
from hearthstats_spark.io import load_tables, TABLES

__all__ = ["get_spark", "stop_spark", "load_tables", "TABLES"]
__version__ = "0.1.0"
