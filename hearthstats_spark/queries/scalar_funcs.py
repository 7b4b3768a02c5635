"""Group G — scalar functions: string / date / math / array / map /
JSON (SURVEY.md §2 q34-q40).

Reference surface: card-name munging, stats-by-date, scraped-JSON
parsing (SURVEY.md §1.1 [R]). Spark-first notes:

- Everything here is built-in ``pyspark.sql.functions`` — JVM-side,
  inside whole-stage codegen. No Python in the row path.
- Cross-engine traps handled per SURVEY.md §1.3 / §2 notes:
  Spark ``dayofweek`` (Sun=1) vs ISO — both sides use the isodow
  convention; DuckDB ``/`` is float division — ``//`` in oracles;
  integer-typed outputs are cast to the same width on both sides;
  dates/timestamps are emitted as formatted strings.
- Array HOFs (``transform``/``aggregate``/``zip_with``) evaluate
  left-to-right, matching DuckDB's ``list_*`` order — sums over a
  64-float list are bit-identical after per-element double casts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hearthstats_spark.io import load_table
from hearthstats_spark.queries.registry import register


@register(
    "q34_str_funcs",
    oracle=r"""
    SELECT p_partkey,
           UPPER(p_name) AS name_upper,
           SUBSTRING(p_name, 1, 8) AS name_prefix,
           CONCAT_WS('|', p_brand, p_type) AS brand_type,
           CAST(LENGTH(p_name) AS INT) AS name_len,
           REGEXP_EXTRACT(p_name, '^(\w+)', 1) AS first_word,
           CAST(LEN(STRING_SPLIT(p_name, ' ')) AS INT) AS n_words,
           REPLACE(p_name, ' ', '_') AS name_snake,
           TRIM('  ' || p_name || ' ') AS name_trimmed
    FROM part
    """,
)
def q34_str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String kitchen-sink over p_name (card-name munging analog)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").cast("int").alias("name_len"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.size(F.split("p_name", " ")).cast("int").alias("n_words"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias("name_trimmed"),
    )


@register(
    "q35_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mo,
           CAST(quarter(o_orderdate) AS INT) AS qtr,
           CAST(date_part('isodow', o_orderdate) AS INT) AS iso_dow,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           CAST(date_diff('day', DATE '1995-01-01',
                          CAST(o_orderdate AS DATE)) AS INT) AS days_since_epoch95,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end
    FROM orders
    """,
)
def q35_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date kitchen-sink. Spark dayofweek is Sun=1 — converted to ISO
    (Mon=1..Sun=7) to match DuckDB's date_part('isodow')."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    iso_dow = ((F.dayofweek(d) + 5) % 7 + 1).cast("int")
    return o.select(
        "o_orderkey",
        F.year(d).cast("int").alias("yr"),
        F.month(d).cast("int").alias("mo"),
        F.quarter(d).cast("int").alias("qtr"),
        iso_dow.alias("iso_dow"),
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("month_start"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("int").alias("days_since_epoch95"),
        F.date_format(F.last_day(d.cast("date")), "yyyy-MM-dd").alias("month_end"),
    )


@register(
    "q36_math_funcs",
    oracle="""
    SELECT o_orderkey,
           ROUND(o_totalprice, 2) AS price_r2,
           ROUND(ABS(o_totalprice - 200000), 4) AS abs_dev,
           CAST(CEIL(o_totalprice) AS BIGINT) AS price_ceil,
           CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
           CASE WHEN o_totalprice >= 0
                THEN ROUND(SQRT(o_totalprice), 4) END AS price_sqrt,
           CASE WHEN o_totalprice > 0
                THEN ROUND(LN(o_totalprice), 4) END AS price_ln,
           CASE WHEN o_totalprice > 0
                THEN ROUND(LOG10(o_totalprice), 4) END AS price_log10,
           ROUND(POW(o_totalprice / 100000, 2), 4) AS price_pow2,
           CAST(MOD(o_orderkey, 7) AS BIGINT) AS key_mod7
    FROM orders
    """,
)
def q36_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math kitchen-sink. ceil/floor yield BIGINT in Spark but DOUBLE
    in DuckDB — cast both to BIGINT; key_mod7 is over the
    always-positive orderkey so pmod==mod.

    Declared domains (negated-measures audit, round 8): sqrt/ln/log10
    of an out-of-domain price (a refund row) are NULL on BOTH engines
    — without the guard Spark answers NaN for sqrt(<0) while DuckDB
    ABORTS the whole query (Out of Range), the crash-vs-value
    asymmetry class. abs/ceil/floor/round/pow are sign-complete and
    stay unguarded."""
    o = load_table(spark, sf_dir, "orders")
    p = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.round(p, 2).alias("price_r2"),
        F.round(F.abs(p - 200000), 4).alias("abs_dev"),
        F.ceil(p).cast("long").alias("price_ceil"),
        F.floor(p).cast("long").alias("price_floor"),
        F.when(p >= 0, F.round(F.sqrt(p), 4)).alias("price_sqrt"),
        F.when(p > 0, F.round(F.log(p), 4)).alias("price_ln"),
        F.when(p > 0, F.round(F.log10(p), 4)).alias("price_log10"),
        F.round(F.pow(p / 100000, 2), 4).alias("price_pow2"),
        F.pmod(F.col("o_orderkey"), F.lit(7)).cast("long").alias("key_mod7"),
    )


@register(
    "q37_array_funcs",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
           ROUND(CAST(list_aggregate(list_transform(embedding,
                 x -> CAST(x AS DOUBLE)), 'max') AS DOUBLE), 6) AS max_val,
           ROUND(CAST(list_aggregate(list_transform(embedding,
                 x -> CAST(x AS DOUBLE)), 'min') AS DOUBLE), 6) AS min_val,
           ROUND(CAST(embedding[1] AS DOUBLE) + CAST(embedding[2] AS DOUBLE)
               + CAST(embedding[3] AS DOUBLE) + CAST(embedding[4] AS DOUBLE), 6)
               AS head4_sum,
           ROUND(SQRT(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm
    FROM embeddings
    """,
)
def q37_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array ops + higher-order functions over the 64-dim embedding
    column. head4_sum exercises slice(); the oracle spells the same
    4-term sum out left-to-right so addition order is identical."""
    e = load_table(spark, sf_dir, "embeddings")
    dbl = F.transform("embedding", lambda x: x.cast("double"))
    sq_sum = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    head4 = F.aggregate(
        F.transform(F.slice("embedding", 1, 4), lambda x: x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return e.select(
        "vec_id",
        F.size("embedding").cast("int").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_val"),
        F.round(F.array_max(dbl), 6).alias("max_val"),
        F.round(F.array_min(dbl), 6).alias("min_val"),
        F.round(head4, 6).alias("head4_sum"),
        F.round(F.sqrt(sq_sum), 6).alias("l2_norm"),
    )


@register(
    "q38_explode",
    oracle="""
    SELECT vec_id,
           CAST(generate_subscripts(embedding[1:4], 1) AS BIGINT) AS pos,
           ROUND(CAST(unnest(embedding[1:4]) AS DOUBLE), 6) AS val
    FROM embeddings
    """,
)
def q38_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode of the embedding head (UDTF-shaped row expansion);
    4× row multiplication, 1-based positions on both sides."""
    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.select("vec_id", F.posexplode(F.slice("embedding", 1, 4)))
        .select(
            "vec_id",
            (F.col("pos") + 1).cast("long").alias("pos"),
            F.round(F.col("col").cast("double"), 6).alias("val"),
        )
    )


@register(
    "q39_json_funcs",
    oracle="""
    SELECT CAST(CAST(json_extract_string(props, '$.k') AS INT) // 10
                AS BIGINT) AS k_bucket,
           COUNT(*) AS n,
           CAST(MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS INT)
               AS k_min
    FROM events GROUP BY 1
    """,
)
def q39_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the scraped-payload column (get_json_object
    stays JVM-side); integer-division bucketing (// on DuckDB — its /
    is float division)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select(k.alias("k"))
        .groupBy(F.expr("k div 10").cast("long").alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("k").cast("int").alias("k_min"),
        )
    )


@register(
    "q40_map_struct",
    oracle="""
    SELECT doc_id,
           lang AS s_lang, source AS s_source, lang AS m_lang,
           lang || ':' || source AS packed
    FROM documents
    """,
)
def q40_map_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct/map construction and field access; the Spark side does a
    real struct+map round-trip, projected flat for hashing (the oracle
    is the flat identity since construction→access is identity)."""
    d = load_table(spark, sf_dir, "documents")
    packed = d.select(
        "doc_id",
        F.struct("lang", "source").alias("meta"),
        F.create_map(F.lit("lang"), F.col("lang")).alias("m"),
    )
    return packed.select(
        "doc_id",
        F.col("meta.lang").alias("s_lang"),
        F.col("meta").getField("source").alias("s_source"),
        F.col("m").getItem("lang").alias("m_lang"),
        F.concat_ws(":", F.col("meta.lang"), F.col("meta.source")).alias("packed"),
    )
