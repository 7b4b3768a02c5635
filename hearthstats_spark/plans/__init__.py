"""Physical-plan introspection (SURVEY.md §4.2: verify what Catalyst
gives us, don't reimplement it).

The helpers here capture ``explain`` output so tests can assert the
plan SHAPE — filters pushed to Parquet, scans pruned to referenced
columns, dims broadcast, partial+final aggregation pairs, top-k
fused into TakeOrderedAndProject, pandas UDFs on the Arrow path.
Plan-shape tests are the scale story's regression net: a silently
lost pushdown is invisible at sf0.1 and fatal at 100 TB.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import DataFrame

__all__ = ["explain_str", "executed_plan_str"]


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """``df.explain(mode)`` captured as a string."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def executed_plan_str(df: DataFrame) -> str:
    """The physical plan (post-planning, pre/post-AQE depending on
    execution state) as a string, via the JVM queryExecution."""
    return df._jdf.queryExecution().executedPlan().toString()
