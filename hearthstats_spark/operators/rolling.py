"""Trailing-window distinct-count kernels (q100/q166/q151's twin).

Two independent formulations of the same semantics — trailing-24h
distinct active users per event_type, one row per (window-end hour,
type) — kept side by side because their agreement is a standing
cross-check (tests/test_ext5.py) and their COSTS differ by the
window length:

- :func:`rolling_distinct_expansion` — contribution expansion: every
  distinct (hour, type, user) triple fans out to the 24 windows it
  contributes to, then one dedup shuffle + one count. Simple, and
  the fan-out factor (window length) multiplies the DATA-sized
  shuffle.
- :func:`rolling_distinct_delta` — delta sweep: each user's active
  hours merge into covered window intervals (gaps-and-islands), each
  island emits exactly TWO deltas, and the per-type counts are a
  running sum over the type×hour GRID. The 24× factor multiplies
  only the grid, never the user-sized data.

Optimization round 11: the DECLARED q100/q166 queries (and q151's
exact twin, which imports q100) both route through the delta kernel
— measured at sf0.1: expansion 3.46 s vs delta 2.75 s steady, and
the gap grows with the window length and user cardinality, which is
the 100 TB direction (guide §2.3: shuffle fewer bytes). The
expansion kernel remains here as the independent cross-check the
equality test exercises; the DuckDB oracle (contribution-expansion
SQL, unchanged) independently verifies the delta kernel on every
driver run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _format(out: DataFrame) -> DataFrame:
    return out.select(
        F.date_format("win", "yyyy-MM-dd HH:mm").alias("win_end_hour"),
        "event_type",
        F.col("users_24h").cast("bigint").alias("users_24h"))


def rolling_distinct_expansion(ev: DataFrame) -> DataFrame:
    """Contribution-expansion formulation (q100's original kernel —
    see module docstring; retained as the cross-check twin)."""
    hu = (ev.select(F.date_trunc("hour", "ts").alias("h"),
                    "event_type", "user_id")
          .distinct())
    contrib = (
        hu.select("event_type", "user_id", "h",
                  F.explode(F.sequence(F.lit(0), F.lit(23))).alias("i"))
        .select("event_type", "user_id",
                F.expr("h + i * INTERVAL '1' HOUR").alias("win"))
        .distinct()
    )
    return _format(
        contrib.groupBy("win", "event_type")
        .agg(F.count(F.lit(1)).alias("users_24h")))


def rolling_distinct_delta(ev: DataFrame) -> DataFrame:
    """Delta-sweep formulation (q166's kernel — see module docstring
    and q166's docstring for the derivation and the full-domain
    sweep subtlety)."""
    hu = (ev.select(F.date_trunc("hour", "ts").alias("h"),
                    "event_type", "user_id")
          .distinct())
    hu = hu.cache()  # islands pass + grid both read it
    # islands over each user's active hours: a new island starts when
    # the gap to the previous active hour exceeds the window length
    # (24h) — inside that, the covered windows [h, prev_last + 23]
    # overlap into one run
    hrs = F.unix_timestamp("h")
    w_prev = (Window.partitionBy("event_type", "user_id").orderBy("h")
              .rowsBetween(Window.unboundedPreceding, -1))
    w_cum = (Window.partitionBy("event_type", "user_id").orderBy("h")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    g = (hu.withColumn("prev_h", F.max(hrs).over(w_prev))
         .withColumn(
             "island",
             F.sum(F.when(F.col("prev_h").isNull()
                          | (hrs - F.col("prev_h") > 24 * 3600), 1)
                   .otherwise(0)).over(w_cum)))
    isl = (g.groupBy("event_type", "user_id", "island")
           .agg(F.min("h").alias("first_h"), F.max("h").alias("last_h")))
    deltas = (
        isl.select("event_type", F.col("first_h").alias("win"),
                   F.lit(1).alias("d"))
        .unionAll(isl.select(
            "event_type",
            F.expr("last_h + INTERVAL '24' HOUR").alias("win"),
            F.lit(-1).alias("d")))
        .groupBy("event_type", "win").agg(F.sum("d").alias("d"))
    )
    grid = (hu.select("event_type", "h").distinct()
            .select("event_type", "h",
                    F.explode(F.sequence(F.lit(0), F.lit(23))).alias("i"))
            .select("event_type",
                    F.expr("h + i * INTERVAL '1' HOUR").alias("win"))
            .distinct())
    w_run = (Window.partitionBy("event_type").orderBy("win")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    # the running sum must see EVERY delta, including a −1 whose
    # window falls in a >24h activity gap and therefore is NOT a grid
    # window (a grid-left-join would silently drop it and overcount
    # every later window of that type — round-4 self-review; masked
    # while the test data has no per-type gaps); sweep over
    # grid ∪ delta-windows, then keep only grid rows for output
    domain = (grid.withColumn("__g", F.lit(1))
              .join(deltas, ["event_type", "win"], "full")
              .withColumn("d", F.coalesce("d", F.lit(0))))
    return _format(
        domain
        .withColumn("users_24h", F.sum("d").over(w_run))
        .filter(F.col("__g") == 1))
