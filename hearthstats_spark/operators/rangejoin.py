"""Interval/range join as a library operator.

``points ⋈ intervals ON key AND point ∈ [start, end)`` written
naively is an equi+theta join whose range residual Spark must
evaluate per candidate — and with NO equi key it degenerates to a
nested-loop product. The scalable formulation buckets time:

- every point lands in bucket ``floor(p / width)``,
- every interval explodes to the buckets it overlaps
  (``length/width + 1`` rows — pick width ≈ typical length),
- the join becomes a plain equi join on (key..., bucket) with the
  exact range predicate as a cheap post-filter.

A point's bucket is unique, so a matching (interval, point) pair
meets in exactly one bucket — no dedup pass needed. This is the
standard time-series/overlap-join technique (DuckDB's IEJoin and
KDB's window joins solve the same problem engine-side; Spark needs
it expressed in the plan).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

_BUCKET = "__rj_bucket"


def range_join(intervals: DataFrame, points: DataFrame,
               on: Sequence[str], start_col: str, end_col: str,
               point_col: str, bucket_width: int) -> DataFrame:
    """Inner-join ``intervals`` with ``points`` on the equi keys
    ``on`` plus ``start_col <= point_col < end_col``. All three
    bound columns must be numeric (cast timestamps to epoch units
    first). Returns interval columns + non-key point columns."""
    on = list(on)
    iv = intervals.withColumn(
        _BUCKET,
        F.explode(F.sequence(
            F.floor(F.col(start_col) / bucket_width),
            F.floor((F.col(end_col) - 1) / bucket_width),
        )),
    )
    pt = points.withColumn(
        _BUCKET, F.floor(F.col(point_col) / bucket_width))
    out = iv.join(pt, on + [_BUCKET]).filter(
        (F.col(point_col) >= F.col(start_col))
        & (F.col(point_col) < F.col(end_col))
    )
    return out.drop(_BUCKET)
