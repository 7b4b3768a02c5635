"""SQL entry lane (SURVEY.md §3.2 entry point B).

DataFrame calls and ``spark.sql`` strings converge on the same
unresolved-logical-plan IR, so exposing the ten tables as temp views
gives users the full ANSI-SQL surface over exactly the data the
DataFrame queries see (including the events ts normalization, which
happens in the loader before the view is registered).

tests/test_sql.py asserts DataFrame/SQL parity on representative
queries — same IR in, same rows out.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from hearthstats_spark.io import TABLES, load_table


def register_views(spark: SparkSession, sf_dir: str,
                   prefix: str = "") -> list[str]:
    """Register every testdata table as a temp view (optionally
    prefixed); returns the view names."""
    names = []
    for t in TABLES:
        name = f"{prefix}{t}"
        load_table(spark, sf_dir, t).createOrReplaceTempView(name)
        names.append(name)
    return names


def run_sql(spark: SparkSession, sf_dir: str, query: str):
    """Convenience: ensure views exist, then run a SQL string."""
    register_views(spark, sf_dir)
    return spark.sql(query)
