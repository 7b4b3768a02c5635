"""Two production-readiness proofs:

1. ANALYZE TABLE column statistics reach the catalog (distinct
   counts, max, null counts) — the input CBO join-reordering and
   sizeInBytes-based broadcast decisions consume at cluster scale.
2. The RocksDB state-store provider (the disk-backed state backend
   a 100 TB streaming deployment runs, vs the default in-heap
   HDFS-backed store) executes the watermarked streaming pipeline
   and produces the identical final state.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hearthstats_spark.io import load_table
from tests.conftest import SF_SMALL

ROCKSDB = ("org.apache.spark.sql.execution.streaming.state."
           "RocksDBStateStoreProvider")


def test_analyze_column_stats_reach_catalog(spark):
    orders = load_table(spark, SF_SMALL, "orders")
    orders.write.mode("overwrite").format("parquet") \
        .saveAsTable("t_stats_check")
    try:
        spark.sql("ANALYZE TABLE t_stats_check COMPUTE STATISTICS "
                  "FOR COLUMNS o_custkey, o_totalprice")
        desc = {r["info_name"]: r["info_value"]
                for r in spark.sql(
                    "DESC EXTENDED t_stats_check o_custkey").collect()}
        want_distinct = orders.select("o_custkey").distinct().count()
        got_distinct = int(desc["distinct_count"])
        # NDV is HyperLogLog-estimated; exact at this cardinality ±5%
        assert abs(got_distinct - want_distinct) <= 0.05 * want_distinct
        assert desc["num_nulls"] == "0"
        # table-level stats drive broadcast decisions
        stats = spark.table("t_stats_check")._jdf.queryExecution() \
            .optimizedPlan().stats()
        assert int(stats.sizeInBytes()) > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS t_stats_check")


@pytest.mark.slow
def test_rocksdb_state_store_matches_default(spark, registry):
    q41_batch = {
        (r["hour_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in _batch_q41(spark)
    }
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB)
    try:
        got = {(r["hour_start"], r["event_type"]): (r["n"], r["total_value"])
               for r in registry["s03_stream_pipeline"]
               .fn(spark, SF_SMALL).collect()}
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    assert got == q41_batch


def _batch_q41(spark):
    ev = load_table(spark, SF_SMALL, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.col("value").cast("decimal(28,4)")).cast("double")
             .alias("total_value"))
        .select(F.date_format("w.start", "yyyy-MM-dd HH:mm")
                .alias("hour_start"), "event_type", "n", "total_value")
        .collect()
    )
