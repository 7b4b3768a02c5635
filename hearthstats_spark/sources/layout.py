"""Storage-layout policy for cluster scale (SURVEY.md §1.3 / §4.2).

The test corpus is one Parquet file per table; at 100 TB the same
loaders point at layouts produced by these writers:

- ``write_time_partitioned`` — facts partitioned by a time bucket
  (orders/lineitem by month, events by day). Date-ranged queries
  then prune whole directories at planning time (PartitionFilters)
  and dimension-joined date filters prune at runtime via dynamic
  partition pruning.
- ``write_bucketed`` — co-located copies bucketed (and sorted) by
  join key. Two tables bucketed the same way sort-merge-join with
  ZERO exchange: the shuffle that would dominate a 100 TB fact-fact
  join is paid once at write time and amortized over every read.

Both are verified by plan-shape tests (tests/test_layout.py): the
partitioned scan must show PartitionFilters + a pruned file count,
the bucketed join must show SelectedBucketsCount and no Exchange.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_time_partitioned(df: DataFrame, path: str, ts_col: str,
                           granularity: str = "month") -> None:
    """Write ``df`` partitioned by a derived time bucket of ``ts_col``
    (directory layout ``<path>/p_<granularity>=.../part-*.parquet``)."""
    bucket = F.date_format(F.date_trunc(granularity, F.col(ts_col)),
                           "yyyy-MM-dd").alias(f"p_{granularity}")
    (df.withColumn(f"p_{granularity}", bucket)
       .write.mode("overwrite")
       .partitionBy(f"p_{granularity}")
       .parquet(path))


def write_bucketed(df: DataFrame, table: str, bucket_cols: Sequence[str],
                   num_buckets: int,
                   sort_cols: Sequence[str] | None = None) -> None:
    """Persist ``df`` as a bucketed (+optionally sorted) catalog
    table. Bucket count is a layout constant the cluster agrees on —
    both sides of a co-located join must match it."""
    w = (df.write.mode("overwrite").format("parquet")
         .bucketBy(num_buckets, *bucket_cols))
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a layout written by ``write_time_partitioned`` (partition
    column comes back as a string directory key)."""
    return spark.read.parquet(path)
