"""Table loaders (SURVEY.md §1.3, §7 step 0).

The driver's testdata lives at ``/root/testdata/sf{0.001,0.01,0.1}/``
as one Parquet file per table. All tables read cleanly except
``events``: the driver has shipped its ``ts`` column in two physical
forms across regenerations — TIMESTAMP(NANOS), which Spark 4.x
rejects ([PARQUET_TYPE_ILLEGAL]) unless
``spark.sql.legacy.parquet.nanosAsLong=true`` hands it over as bigint
nanoseconds, and TIMESTAMP(isAdjustedToUTC=false), which Spark reads
as TIMESTAMP_NTZ. ``load_table`` normalizes both — once, at load — to
a plain microsecond TIMESTAMP under the engine's pinned UTC session
timezone, so every downstream query sees one stable type.

At 100 TB these would be directory-partitioned datasets (orders and
lineitem partitioned by month of their date column, events by day)
so that Catalyst's partition pruning and dynamic partition pruning
kick in; the loaders keep that concern in one place.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _enable_nanos_as_long(spark: SparkSession) -> None:
    """Runtime-set the legacy ns flag (the driver may hand us a session
    we did not build)."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table; normalizes events.ts bigint-ns -> timestamp(µs)."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        _enable_nanos_as_long(spark)
        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # integer div (not /1000-then-cast): keeps µs exact
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # driver regenerations have also shipped ts as
            # TIMESTAMP(isAdjustedToUTC=false) → Spark reads TIMESTAMP_NTZ.
            # Session tz is pinned UTC (session.py), so this cast is a
            # wall-clock-preserving relabel to the TIMESTAMP type the
            # event-time queries/watermarks expect — same instants the
            # bigint-ns path produced.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR,
                names: tuple[str, ...] = TABLES,
                register: bool = False) -> dict[str, DataFrame]:
    """Load the requested tables into a dict; optionally register each
    as a temp view (used by the SQL-route queries, e.g. GROUPING SETS,
    so Spark-side SQL can mirror the DuckDB oracle text)."""
    out: dict[str, DataFrame] = {}
    for name in names:
        df = load_table(spark, sf_dir, name)
        if register:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
