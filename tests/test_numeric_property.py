"""Property tests for the exact-rounding helper family (dratio /
davg / davg_signed) against a Decimal reference — ratios and means
of small integers are the recurring cross-engine ROUND bug class
(q97 at sf0.1, the dyadic-half cast edge), so the helpers get
randomized coverage beyond the fixed boundary cases in
test_ext4.py. Hypothesis generates the case lists; each example
runs as ONE DataFrame so the Spark round-trip cost stays sane."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hearthstats_spark.functions import davg_signed, dratio


def _half_away(num: Decimal, den: int, nd: int = 4) -> float:
    # half-away-from-zero == half-up on |x| with the sign reapplied
    sign = -1 if num < 0 else 1
    q = (abs(num) / den).quantize(Decimal(1).scaleb(-nd),
                                  rounding=ROUND_HALF_UP)
    return float(sign * q)


@settings(max_examples=15, deadline=None)
@given(st.lists(st.tuples(st.integers(-(10**12), 10**12),
                          st.integers(1, 10**9)),
                min_size=1, max_size=40))
def test_dratio_matches_decimal_reference(spark, cases):
    """Signed-safe since ADVICE r3: negative numerators round
    half-AWAY-FROM-ZERO identically on both engines (previously the
    pmod kernel silently disagreed with HUGEINT truncation)."""
    import duckdb

    from hearthstats_spark.functions.numeric import fratio_sql

    df = spark.createDataFrame(cases, "num long, den long")
    got = df.select("num", "den",
                    dratio(F.col("num"), F.col("den"), "r")).collect()
    con = duckdb.connect()
    con.execute("CREATE TABLE t (num BIGINT, den BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", cases)
    duck = con.execute(
        f"SELECT num, den, {fratio_sql('num', 'den', 'r')} FROM t"
    ).fetchall()
    duck_map = {(n, d): r for n, d, r in duck}
    for row in got:
        want = _half_away(Decimal(row["num"]), row["den"])
        assert row["r"] == want, (row["num"], row["den"], row["r"], want)
        assert duck_map[(row["num"], row["den"])] == want


@settings(max_examples=10, deadline=None)
@given(st.lists(st.integers(-10**8, 10**8), min_size=1, max_size=30))
def test_davg_matches_favg_sql_on_signed_input(spark, raw):
    """Cross-engine pin of the round-8 unification: davg (Spark) and
    favg_sql (DuckDB text) are the SAME signed half-away kernel for
    any sign mix — the unsigned pair diverged by one rounding ulp on
    every negative non-divisible sum (negated-measures audit)."""
    import duckdb

    from hearthstats_spark.functions import davg
    from hearthstats_spark.functions.numeric import favg_sql

    vals = [v / 10_000.0 for v in raw]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = df.agg(davg(F.col("v"), "m")).collect()[0]["m"]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    duck = con.execute(
        f"SELECT {favg_sql('v', 'm')} FROM t").fetchone()[0]
    assert got == duck, (vals, got, duck)


@settings(max_examples=10, deadline=None)
@given(st.lists(st.integers(-10**8, 10**8), min_size=1, max_size=30))
def test_davg_signed_matches_decimal_reference(spark, raw):
    # values with exactly <= 4 dp so the per-row decimal cast is exact
    vals = [v / 10_000.0 for v in raw]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = df.agg(davg_signed(F.col("v"), "m")).collect()[0]["m"]
    p = sum(Decimal(v).quantize(Decimal("0.0001"),
                                rounding=ROUND_HALF_UP) for v in vals)
    n = len(vals)
    # replay the engine's exact integer half-away kernel (a Decimal
    # divide-then-quantize would double-round near halves)
    P = int(p.scaleb(4))  # exact: p has 4 dp
    a, sign = abs(P), (-1 if P < 0 else 1)
    r = a % n
    q = (a - r) // n + (1 if 2 * r >= n else 0)
    want = sign * q / 10_000
    assert got == want, (vals, got, want)
