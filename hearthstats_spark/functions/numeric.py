"""Numeric helpers that make float aggregates hash-stable across
engines (SURVEY.md §1.3 note 2).

A plain ``SUM(double)`` is summation-order dependent: Spark's partial
aggregates sum per shuffle partition, DuckDB sums in its own morsel
order, and at 60k rows x 1e5 magnitude the drift reaches ~1e-4 —
right at a ROUND(...,4) boundary. The fix used engine-wide:

    SUM(CAST(x AS DECIMAL(18,4)))  -- exact, order-independent
    -> CAST(... AS DOUBLE)         -- identical f64 bits both engines

Per-row double->decimal(…,4) conversion is itself deterministic:
almost no binary double is exactly halfway between two 4-dp decimals
— the exceptions are dyadic rationals like ±0.03125 (odd/2^k hitting
(2m+1)/20000) — and at exactly those points BOTH engines round
half-away-from-zero (verified: Spark and DuckDB each map ±0.03125 to
±0.0313), so the casts agree bit-for-bit everywhere.

AVG follows as exact-sum / count, then ROUND — identical float ops on
identical inputs. At cluster scale the decimal cast costs one widening
per row inside whole-stage codegen; no extra shuffle or pass.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(28,4)"  # 24 integer digits: safe for 100 TB-scale sums


def dsum(col: Column | str, alias: str) -> Column:
    """Order-independent float sum: SUM(decimal) cast back to double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double").alias(alias)


def dcumsum(col: Column | str, window, alias: str) -> Column:
    """Windowed (e.g. cumulative) order-independent float sum."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).over(window).cast("double").alias(alias)


def davg(col: Column | str, alias: str, ndigits: int = 4) -> Column:
    """Hash-stable mean: exact decimal sum / count, rounded to
    ``ndigits`` by EXACT INTEGER half-up division — never a float
    ROUND.

    Why not ``round(sum_double / n, 4)``: when the true mean
    terminates exactly one digit past the rounding point (e.g.
    1512.12 / 32 = 47.25375) the two engines disagree — Java's
    round() rounds the SHORTEST decimal representation of the
    quotient (-> 47.2538) while DuckDB rounds the binary double
    (-> 47.2537). Found live at sf0.1 (q97, 4 cells of 3600).

    Exact formulation: with p = sum·10^d (an integer-valued decimal)
    and n = count, the half-away-rounded mean is
    ``sign(p)·((|p| div n) + [2·(|p| mod n) >= n])``, all in exact
    decimal/integer arithmetic, then one deterministic double
    division by 10^d. ``(|p| - r)/n`` is exactly divisible, so the
    decimal division is exact and floor is safe.

    SIGNED-SAFE since round 8: the kernel runs on |sum| with the
    sign reapplied (identical to :func:`davg_signed`). The previous
    bare pmod/floor form assumed a non-negative sum — on a NEGATIVE
    non-divisible sum Spark's floor + positive remainder disagrees
    with DuckDB's truncating HUGEINT ``//``/``%`` by one ulp of the
    rounding scale on EVERY such group, not just ties (the
    negated-measures audit found q97 live at one grid cell; q15 was
    latent). For sum >= 0 the signed kernel is bit-identical, so
    every green hash is unchanged."""
    return davg_signed(col, alias, ndigits)


def round4(col: Column | str, alias: str | None = None) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    r = F.round(c, 4)
    return r.alias(alias) if alias else r


def dratio(num: Column, den: Column, alias: str,
           ndigits: int = 4) -> Column:
    """Hash-stable ratio num/den, generalizing :func:`davg` to an
    explicit denominator (window sums, weighted means, shares of a
    windowed total): exact decimal/integer half-up rounding, never a
    float ROUND.

    Requirements: ``num`` with <= 4 decimal places of true precision
    (an integer count, or a SUM(CAST(.. AS DEC)) aggregate), ``den``
    a positive integer-valued column. The ratio of small integers is
    the WORST case for cross-engine float rounding — n/32 terminates
    exactly one digit past the rounding point, the exact q97 failure
    mode davg was built for.

    Signed-safe (half-AWAY-FROM-ZERO): the kernel runs on |num| with
    the sign reapplied, the davg_signed discipline — a bare
    pmod/floor kernel disagrees with DuckDB's truncating HUGEINT
    ``//``/``%`` exactly when num < 0 (ADVICE r3). For num >= 0 the
    result is bit-identical to the previous half-up form."""
    scale = 10 ** ndigits
    p = num.cast(DEC) * scale
    a = F.abs(p)
    r = F.pmod(a, den)
    qf = F.floor((a - r) / den)
    bump = F.when(F.lit(2) * r >= den, 1).otherwise(0)
    sign = F.when(p < 0, -1).otherwise(1)
    return ((sign * (qf + bump)).cast("double") / scale).alias(alias)


def davg_signed(col: Column | str, alias: str,
                ndigits: int = 4) -> Column:
    """:func:`davg` for columns that may be NEGATIVE (embedding
    coordinates, deltas): exact half-AWAY-FROM-ZERO mean via the
    half-up kernel on |sum| with the sign reapplied. davg's
    pmod/floor formulation silently assumes a non-negative sum —
    pmod returns the positive remainder, which flips the bump
    direction for negative dividends."""
    c = F.col(col) if isinstance(col, str) else col
    scale = 10 ** ndigits
    p = F.sum(c.cast(DEC)) * scale
    n = F.count(c)
    a = F.abs(p)
    r = F.pmod(a, n)
    qf = F.floor((a - r) / n)
    bump = F.when(F.lit(2) * r >= n, 1).otherwise(0)
    sign = F.when(p < 0, -1).otherwise(1)
    return ((sign * (qf + bump)).cast("double") / scale).alias(alias)


# --- DuckDB-side SQL fragments (oracle text builders) ---------------

def fsum_sql(expr: str, alias: str) -> str:
    """Oracle twin of dsum()."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(28,4))) AS DOUBLE) AS {alias}"


def fratio_sql(num: str, den: str, alias: str, ndigits: int = 4) -> str:
    """Oracle twin of dratio(): exact HUGEINT half-away-from-zero
    ratio on ABS(num) with the sign reapplied (matching dratio's
    signed-safe kernel — DuckDB's ``//``/``%`` truncate toward zero,
    so the unsigned form diverges from Spark's pmod/floor when
    num < 0).

    ``num`` must be integer-valued after a DECIMAL(28,4) cast times
    10^ndigits (counts and decimal-cast sums qualify); ``den`` a
    positive integer expression. Window aggregates may appear in
    either argument — the expression text is duplicated, which
    DuckDB evaluates deterministically."""
    scale = 10 ** ndigits
    p = f"CAST(CAST({num} AS DECIMAL(28,4)) * {scale} AS HUGEINT)"
    a = f"ABS({p})"
    return (
        f"(CASE WHEN {p} < 0 THEN -1 ELSE 1 END)"
        f" * CAST(({a} // ({den}))"
        f" + CASE WHEN 2 * ({a} % ({den})) >= ({den}) THEN 1 ELSE 0 END"
        f" AS DOUBLE) / {scale} AS {alias}"
    )


def favg_signed_sql(expr: str, alias: str, ndigits: int = 4) -> str:
    """Oracle twin of davg_signed(): half-away-from-zero via the
    HUGEINT half-up kernel on ABS(sum), sign reapplied."""
    scale = 10 ** ndigits
    p = (f"CAST(SUM(CAST({expr} AS DECIMAL(28,4))) * {scale}"
         f" AS HUGEINT)")
    a = f"ABS({p})"
    n = f"COUNT({expr})"
    return (
        f"(CASE WHEN {p} < 0 THEN -1 ELSE 1 END)"
        f" * CAST(({a} // {n})"
        f" + CASE WHEN 2 * ({a} % {n}) >= {n} THEN 1 ELSE 0 END"
        f" AS DOUBLE) / {scale} AS {alias}"
    )


def favg_sql(expr: str, alias: str, ndigits: int = 4) -> str:
    """Oracle twin of davg(): the same exact integer half-away mean.
    SIGNED-SAFE since round 8 — delegates to the signed kernel, which
    is bit-identical for non-negative sums (see davg's note; the old
    unsigned ``//``/``%`` form truncated toward zero and disagreed
    with Spark's floor on every negative non-divisible sum)."""
    return favg_signed_sql(expr, alias, ndigits)
