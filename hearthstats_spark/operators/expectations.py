"""Data-quality expectations — the validation gate a training-data
pipeline runs before anything else consumes a batch.

An expectation is (name, violation_predicate); ``audit`` evaluates
every rule in ONE pass over the table (conditional-count aggregation,
no shuffle beyond the final 1-row combine) and returns the violation
counts. Referential checks are anti-join counts — one shuffle each,
broadcastable when the referenced keyset is dimension-sized.

This is the groundwork both q68 (the declared audit query) and any
write-path gate (`assert audit(...).violations == 0`) share.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, functions as F


def audit(df: DataFrame, rules: Mapping[str, Column]) -> DataFrame:
    """One row per rule: (check, n_violations). ``rules`` maps check
    name → boolean Column that is True WHEN THE ROW VIOLATES.

    count(when) rather than sum(when·1): identical on any non-empty
    frame, but a keyless SUM over an EMPTY table is NULL while a
    violation count must be 0 — the SQL-oracle scalar COUNT form and
    the degenerate-corpus audit both say 0 (ADVICE-r6-class
    asymmetry found by scripts/audit_degenerate.py)."""
    agg = df.agg(*[
        F.count(F.when(pred, 1)).cast("long").alias(name)
        for name, pred in rules.items()
    ])
    stacked = ", ".join(f"'{n}', `{n}`" for n in rules)
    return agg.selectExpr(
        f"stack({len(rules)}, {stacked}) as (check, n_violations)")


def fk_violations(child: DataFrame, child_key: str,
                  parent: DataFrame, parent_key: str) -> DataFrame:
    """Child rows whose key has no parent (anti join)."""
    return child.join(
        parent.select(F.col(parent_key).alias(child_key)).distinct(),
        child_key, "left_anti")
