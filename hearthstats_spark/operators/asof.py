"""ASOF join as a library operator (SURVEY.md §4.3.1, q13).

Spark's DataFrame API has no native ASOF join (pandas-on-Spark
``merge_asof`` exists but routes through the pandas API layer).
This implements the classic union+window formulation:

1. union both sides with a side tag (probe=1, reference=0),
2. one window per key: ``last(ref_payload, ignorenulls=True)`` over
   rows ``unboundedPreceding..currentRow`` ordered by (ts, side) —
   at equal timestamps the reference row sorts first, giving
   ``>=`` (inclusive) ASOF semantics like DuckDB's ``ON p.ts >= r.ts``,
3. filter back to probe rows and unpack the matched payload struct.

Scale notes (100 TB): this costs exactly one shuffle on the join
keys plus one sort within partitions — the same cost profile as a
sort-merge ASOF join in engines that have one natively. There is no
cross product and no per-group collect; skewed keys are handled by
AQE like any other shuffle. Compare: a naive
``join(l.ts >= r.ts) + max()`` approach is O(n·m) per key and
explodes at scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TS = "__asof_ts"
_SIDE = "__asof_side"
_PAYLOAD = "__asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str | None = None,
    right_cols: Sequence[str] | None = None,
    suffix: str = "_asof",
    inclusive: bool = True,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` (or ``<`` when ``inclusive=False``) within
    the same ``on`` key group. Left rows with no prior right row get
    NULL payload columns (LEFT ASOF semantics).

    ``right_cols`` defaults to all non-key right columns (including
    its timestamp). Payload columns colliding with left column names
    get ``suffix`` appended.
    """
    on = list(on)
    if right_ts is None:
        right_ts = left_ts
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in on]
    right_cols = list(right_cols)

    # SQL ASOF equality semantics by construction: a reference row
    # with a NULL key can match NOTHING (`p.key = r.key` is never
    # true for NULL), but the union+window formulation would group
    # it with NULL-keyed probe rows into one partition and serve it
    # as a match — the null-keys degenerate axis caught q13/q109
    # diverging from the DuckDB ASOF JOIN on exactly this. Dropping
    # NULL-keyed reference rows restores the join semantics; probe
    # rows keep LEFT semantics (a NULL-keyed probe row survives with
    # a NULL payload, since its partition then holds no references).
    #
    # NULL-keyed PROBE rows are routed AROUND the window entirely
    # (ADVICE r8): Spark's partitionBy treats NULL as ONE key, so on
    # dirty-FK data every NULL-keyed probe row would land in a single
    # hot partition and sort there for nothing — they can never match.
    # Split them out up front, attach NULL payload columns directly,
    # and union them back after the window. Only keys the schema
    # declares nullable can produce such rows, so the split (an extra
    # filter branch over the probe scan) is skipped when the schema
    # proves it dead.
    null_probe = None
    nullable_keys = [k for k in on if left.schema[k].nullable]
    if nullable_keys:
        null_cond = F.lit(False)
        for key in nullable_keys:
            null_cond = null_cond | F.col(key).isNull()
        null_probe = left.filter(null_cond)
        left = left.filter(~null_cond)

    r = right
    for key in on:
        r = r.filter(F.col(key).isNotNull())
    r = r.select(
        *on,
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        F.struct(*[F.col(c) for c in right_cols]).alias(_PAYLOAD),
    )
    l = left.withColumn(_TS, F.col(left_ts)).withColumn(_SIDE, F.lit(1))
    unioned = l.unionByName(r, allowMissingColumns=True)

    # at equal ts: side 0 (reference) sorts before side 1 (probe) for
    # inclusive (>=); after it for strict (>)
    order = [F.col(_TS).asc(),
             F.col(_SIDE).asc() if inclusive else F.col(_SIDE).desc()]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn(
        _PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w)
    )

    out_payload = [
        F.col(f"{_PAYLOAD}.{c}").alias(c + suffix if c in left.columns else c)
        for c in right_cols
    ]
    out = (
        matched.filter(F.col(_SIDE) == 1)
        .select(*[F.col(c) for c in left.columns], *out_payload)
    )
    if null_probe is not None:
        null_payload = [
            F.lit(None).cast(right.schema[c].dataType)
            .alias(c + suffix if c in left.columns else c)
            for c in right_cols
        ]
        out = out.unionByName(
            null_probe.select(*[F.col(c) for c in left.columns],
                              *null_payload))
    return out
