"""Source/sink surface.

Batch sources live in :mod:`hearthstats_spark.io` (Parquet loaders
with the events-ns normalization); CSV/JSON/JDBC round-trips are
exercised by s01/s02 (queries/sinks.py); the streaming file source
is built in streaming/pipeline.py.

At 100 TB the loaders here are where layout policy lives (SURVEY.md
§1.3): date-partitioned directories for orders/lineitem/events so
partition pruning + dynamic partition pruning fire, bucketed-by-key
copies for shuffle-free joins. The single-file-per-table test layout
keeps the same entry points.
"""

from hearthstats_spark.io import DEFAULT_SF_DIR, TABLES, load_table, load_tables

__all__ = ["DEFAULT_SF_DIR", "TABLES", "load_table", "load_tables"]
