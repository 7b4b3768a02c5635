"""Group I — UDF / UDAF / UDTF surface (SURVEY.md §2 q44-q47).

Reference surface: Python parse helpers in the scraper (SURVEY.md
§1.1 [R]). Spark-first notes:

- UDFs are the slow path (SURVEY.md §3.2 boundary #4). q44 is a
  deliberate row-at-a-time Python UDF *specimen*; everything
  performance-relevant uses the Arrow lane: ``pandas_udf`` (q45/q46)
  and ``applyInPandas`` (q47), which move data JVM→Python in Arrow
  record batches (~10-100× less overhead).
- Each UDF's logic is kept SQL-replicable so the DuckDB oracle still
  applies (the declared contract's discipline).
- Rounding happens JVM-side (F.round) *after* the UDF: numpy's
  half-even rounding differs from SQL ROUND half-up at boundaries.
- UDFs are built lazily inside each query fn: pandas_udf parses its
  return-type DDL against the ACTIVE session, so decorating at import
  time breaks when the module loads before a SparkSession exists
  (the driver imports queries() first).
"""

from __future__ import annotations

import re

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType

from hearthstats_spark.io import load_table
from hearthstats_spark.queries.registry import register


def _normalize_type_py(s: str | None) -> str | None:
    """lowercase, collapse whitespace, take the last token."""
    if s is None:
        return None
    toks = re.sub(r"\s+", " ", s.lower()).strip().split(" ")
    return toks[-1] if toks else ""


@register(
    "q44_udf_python",
    oracle=r"""
    SELECT p_partkey,
           regexp_extract(trim(regexp_replace(lower(p_type), ' +', ' ', 'g')),
                          '(\S+)$', 1) AS type_norm
    FROM part
    """,
)
def q44_udf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar Python UDF (row-at-a-time — the slow-lane specimen;
    pickled row batches across the Python boundary)."""
    normalize = F.udf(_normalize_type_py, StringType())
    p = load_table(spark, sf_dir, "part")
    return p.select("p_partkey", normalize("p_type").alias("type_norm"))


@register(
    "q45_udf_pandas",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6)
               AS net_price
    FROM lineitem
    """,
)
def q45_udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized pandas UDF (Arrow batches). Identical f64 ops in the
    same order as the oracle expression → bit-equal before rounding.
    ROUND is applied JVM-side at 6 dp: the exact product has ≤6
    decimals, so 6-dp rounding never hits a halfway point (4 dp does,
    73 rows at sf0.01 — engines disagree there)."""

    def net(ext: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        return ext * (1.0 - disc) * (1.0 + tax)

    net_price = F.pandas_udf(net, DoubleType())
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber",
        F.round(net_price("l_extendedprice", "l_discount", "l_tax"), 6)
        .alias("net_price"),
    )


@register(
    "q46_udaf_grouped_agg",
    oracle="""
    SELECT event_type, ROUND(MAX(value) - MIN(value), 4) AS value_range
    FROM events GROUP BY event_type
    """,
)
def q46_udaf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas grouped-aggregate UDAF per event_type (max - min: no
    summation → deterministic)."""

    def value_range(v: pd.Series) -> float:
        return float(v.max() - v.min())

    rng = F.pandas_udf(value_range, DoubleType(),
                       F.PandasUDFType.GROUPED_AGG)
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(rng("value"), 4).alias("value_range")
    )


def _zscore(pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped-map: z-score of value within the group (ddof=1).

    Identical-valued-group policy (constant-measures audit, round 8):
    pandas' two-pass std is NOT exactly 0 on a constant group — the
    float mean of n identical values can differ from them by one ulp,
    making every deviation the same tiny e and z = e/(|e|·√(n/(n−1)))
    ≈ ±0.9975 GARBAGE — while SQL's Welford stddev is exactly 0 there
    (M2 accumulates (x−mean)·(x−mean_new) = 0 when x == mean always),
    so the oracle's division yields NULL. The kernel declares the
    same: a group with ≤ 1 distinct non-null value has no z-scores.
    No-op on any well-conditioned group (the shipped corpora)."""
    mean = pdf["value"].mean()
    sd = pdf["value"].std(ddof=1)
    if pdf["value"].nunique(dropna=True) <= 1 or pd.isna(sd) or sd == 0:
        z = pd.array([None] * len(pdf), dtype="Float64")
    else:
        z = (pdf["value"] - mean) / sd
    return pd.DataFrame({
        "event_id": pdf["event_id"],
        "event_type": pdf["event_type"],
        "z_raw": z,
    })


@register(
    "q47_udtf_grouped_map",
    oracle="""
    SELECT event_id, event_type,
           ROUND((value - AVG(value) OVER w) / STDDEV_SAMP(value) OVER w, 4) AS z
    FROM events
    WINDOW w AS (PARTITION BY event_type)
    """,
)
def q47_udtf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map transform via applyInPandas (Arrow batches, one
    pandas frame per group — groups must fit an executor's memory;
    fine for 5 event types, repartition by a finer key at 100 TB)."""
    ev = load_table(spark, sf_dir, "events")
    out = (
        ev.select("event_id", "event_type", "value")
        .groupBy("event_type")
        .applyInPandas(_zscore,
                       schema="event_id long, event_type string, z_raw double")
    )
    return out.select(
        "event_id", "event_type", F.round("z_raw", 4).alias("z")
    )


@register(
    "q81_udtf_lateral",
    oracle="""
    SELECT n.n_nationkey, n.n_name, gs.part AS installment,
           ROUND(n.n_nationkey * 10.0 / 4, 4) AS share
    FROM nation n, generate_series(1, 4) AS gs(part)
    """,
)
def q81_udtf_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native Python UDTF (Spark 4 ``@udtf``) in a LATERAL join —
    each nation row fans out to 4 installment rows with an equal
    share. This is the table-function API surface (one→many row
    transforms with per-row Python logic: parsers, exploders,
    enrichers); the DuckDB oracle is the equivalent
    ``generate_series`` lateral.

    Scale notes: UDTFs run row-at-a-time through the Python worker —
    the slow lane, same policy as q44's scalar UDF (plan-audit
    allowlisted). For pure fan-out like this the JVM path is
    ``explode(sequence(...))`` (q38); a UDTF earns its cost only when
    the per-row logic is genuinely Python. The tiny nation dim keeps
    the demo honest."""
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="installment int, share double")
    class InstallmentPlan:
        def eval(self, nationkey: int, n_parts: int):
            for i in range(1, n_parts + 1):
                yield i, round(nationkey * 10.0 / n_parts, 4)

    spark.udtf.register("installment_plan", InstallmentPlan)
    n = load_table(spark, sf_dir, "nation")
    n.createOrReplaceTempView("nation_v")
    return spark.sql("""
        SELECT n.n_nationkey, n.n_name, p.installment, p.share
        FROM nation_v n,
             LATERAL installment_plan(CAST(n.n_nationkey AS INT), 4) p
    """)
