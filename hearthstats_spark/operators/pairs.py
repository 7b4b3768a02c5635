"""Packed-pair expansion: the shared kernel of the co-occurrence
family (co_order_edges / q98 / q108 / q142 / q144 graph tier, q157
basket lift).

Given a per-group array of sorted distinct BIGINT ids, emit every
a < b pair PACKED into one BIGINT (a·2³² + b): the pairs ride their
downstream shuffle (distinct or count agg) as a single-long hash key —
half the shuffle bytes and a single-long hash-agg key vs the struct
form (measured ~25% faster edge build at sf0.1, co_order_edges'
docstring).

PRECONDITION: ids < 2³¹ — NOT 2³¹..2³²−1: a·2³² + b overflows signed
BIGINT once a ≥ 2³¹ (throws under ANSI mode, or wraps negative so
unpack_pair's div/pmod decode the WRONG pair); with a < 2³¹ the max
packed value is exactly 2⁶³−1 (ADVICE r7 — the bound was previously
mis-documented as 2³²). Holds by generation for partkeys here and is
worth one audit rule at a larger key domain; beyond it, pack into
DECIMAL or the 2-column struct form (same plan shape). This module
is the ONE place the 2³² pack base lives (round-7 review: the
expression had been copy-pasted with the literal spelled six times
across two modules).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: pack base; ids must be < PAIR_BASE // 2 (signed-BIGINT headroom —
#: see the module precondition note)
PAIR_BASE = 1 << 32


def packed_pairs(array_col: str = "ps") -> Column:
    """All a < b pairs of the BIGINT array column, packed
    a·PAIR_BASE + b — explode and shuffle as one long each."""
    return F.expr(
        f"flatten(transform({array_col}, (x, i) -> "
        f" filter(transform({array_col}, y -> "
        f"   IF(x < y, x * {PAIR_BASE} + y, NULL)),"
        "  s -> s IS NOT NULL)))"
    )


def unpack_pair(pk: str = "pk", a: str = "a", b: str = "b") -> list[Column]:
    """The two id columns back out of a packed pair column."""
    return [
        F.expr(f"{pk} div {PAIR_BASE}").alias(a),
        F.pmod(pk, F.lit(PAIR_BASE)).alias(b),
    ]


def capped_basket(key_col: str, item_col: str, cap: int) -> list[Column]:
    """groupBy(key).agg(...) columns for the winsorized basket: the
    ``cap`` SMALLEST distinct items per key as a sorted array —
    sorted-slice semantics, provably identical to the row_number cap
    the SQL oracles spell (q98's equivalence)."""
    return [
        F.slice(F.array_sort(F.collect_set(item_col)), 1, cap).alias("ps"),
    ]
