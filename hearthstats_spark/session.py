"""SparkSession bootstrap (SURVEY.md §4.2 / §7 step 0).

Pins the configs every query in this engine relies on:

- ``spark.sql.session.timeZone=UTC`` — timestamp values must hash
  identically against the DuckDB oracle.
- ``spark.sql.legacy.parquet.nanosAsLong=true`` — the driver's
  ``events.parquet`` stores ``ts`` as TIMESTAMP(NANOS); Spark 4.x
  refuses the file outright without this flag (verified:
  ``[PARQUET_TYPE_ILLEGAL]``). The loader converts the resulting
  bigint-ns column to a microsecond timestamp once, at load.
- Arrow execution for every pandas UDF / toPandas path.
- AQE on (coalesce shuffle partitions + skew-join splitting): at
  100 TB AQE's runtime re-planning is the main defence against skew;
  at test scale it collapses the shuffle tail.
- Modest shuffle parallelism by default (local mode): the driver's
  bench runs at sf0.1 where 200 default partitions would be pure
  scheduling overhead. On a real cluster set SPARK_GRAFT_SHUFFLE to
  ~2-3x total executor cores.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_driver_mem() -> str:
    """Local-harness driver heap: big enough to keep bench's 300
    query executions out of GC churn, but never more than the host
    can give (ADVICE r3: a flat 24g default failed JVM launch on
    smaller machines). min(24g, 1/4 of detected RAM), floor 2g;
    SPARK_GRAFT_DRIVER_MEM always wins. Real clusters size executors
    via spark-submit — this only shapes local[] runs."""
    env = os.environ.get("SPARK_GRAFT_DRIVER_MEM")
    if env:
        return env
    try:
        with open("/proc/meminfo") as fh:
            for line in fh:
                if line.startswith("MemTotal:"):
                    total_gib = int(line.split()[1]) // (1024 * 1024)
                    return f"{max(2, min(24, total_gib // 4))}g"
    except OSError:
        pass
    return "8g"


_DEFAULTS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # dims here are tiny; on a cluster this is the default 10MB anyway
    "spark.sql.autoBroadcastJoinThreshold": str(32 * 1024 * 1024),
    # exact-distinct inside 32 threads; bump on a real cluster
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_SHUFFLE", "32"),
    # allow co-partitioning on a SUBSET of the join keys: a frame
    # already hash-partitioned/bucketed by src joining on (src, dst)
    # then keeps its layout and only the other side moves — q98's
    # closing triangle join drops from 2 exchanges (both sides,
    # 2-key) to 1 (wedge frame only), and the bucketed lanes in
    # tests/test_layout.py read every scan bucket-local. Planner
    # choice only, never semantics.
    "spark.sql.requireAllClusterKeysForCoPartition": "false",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.files.maxPartitionBytes": "128m",
    # local mode = 32 executor threads + every cached/checkpointed
    # block in ONE JVM: 8g caused visible GC churn across bench's 280
    # query executions (q88 read 12.4 s in-bench vs 5.2 s with a 24g
    # heap on the 125 GiB bench box) — but a flat 24g fails to launch
    # on smaller hosts, so the default now scales with detected RAM.
    "spark.driver.memory": _default_driver_mem(),
    "spark.ui.enabled": "false",
    # local mode runs the whole 165-query bench (330 plan
    # compilations) in ONE JVM: the default 240m JIT code cache fills
    # near the end of the sweep and HotSpot silently stops compiling,
    # which is why late-alphabet complex queries (q98) measured 2-3x
    # slower IN-bench than isolated on identical code. Driver-only
    # setting; real clusters size executor JVMs separately.
    "spark.driver.extraJavaOptions": "-XX:ReservedCodeCacheSize=512m",
    # shuffle-file deletion is ASYNC by default: after hundreds of
    # sf0.1 executions in one JVM the ContextCleaner's deletion
    # backlog races whatever query runs next (bench measured the
    # late-alphabet q98 at 18-24s in-bench vs 6.5-12s cold in every
    # controlled session — fresh, 10-aged, 120-aged). Blocking
    # deletion moves that work inside bench's untimed cleanup window.
    # On a real cluster each executor cleans its own few shuffles and
    # the setting is a no-op in practice.
    "spark.cleaner.referenceTracking.blocking.shuffle": "true",
    "spark.sql.streaming.statefulOperator.checkCorrectness.enabled": "false",
}


def get_spark(app_name: str = "hearthstats-spark", master: str | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (all cores if
    unset). On a cluster, leave ``master`` to spark-submit.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULTS)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def ensure_conf(spark: SparkSession) -> SparkSession:
    """Apply the engine's runtime-settable configs to an externally
    created session (the driver hands us one we didn't build)."""
    for k, v in _DEFAULTS.items():
        if k.startswith("spark.sql.") and "legacy.parquet" not in k:
            try:
                spark.conf.set(k, v)
            except Exception:
                pass  # static conf on a live session; loader handles the rest
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
