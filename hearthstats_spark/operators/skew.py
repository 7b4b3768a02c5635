"""Skew-handling join (salting) as a library operator.

AQE's skew-join splitting (on by default in this engine's session)
handles most skew by splitting oversized shuffle partitions, but it
only fires for sort-merge/shuffled-hash joins and after a shuffle
already materialized the skew. Salting removes the hot key BEFORE
the shuffle: the big (probe) side scatters each key over ``n_salts``
sub-keys, the small (build) side replicates each row ``n_salts``
times, and the join key becomes (key, salt) — a hot key's rows now
land on ``n_salts`` different reducers.

Cost model: build side inflates ×n_salts (use on dimension-sized or
pre-aggregated build sides), probe side pays one extra int column.
Pick n_salts ≈ hot-key rows / target-partition rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

_SALT = "__salt"


def salt_expr(n_salts: int):
    """Per-row nonce salt in [0, n_salts): monotonically_increasing_id
    cycles salts round-robin WITHIN each partition, so even
    byte-identical duplicate rows of a hot key (the common
    dedup-workload shape — a whole-row HASH would send them all to
    one salt) spread over all ``n_salts`` reducers. Retry-safe for
    joins: which salt a row gets never affects the result, since the
    build side replicates to every salt."""
    return F.pmod(F.monotonically_increasing_id(),
                  F.lit(n_salts)).cast("int")


def salted_join(probe: DataFrame, build: DataFrame, on: Sequence[str],
                n_salts: int = 16, how: str = "inner") -> DataFrame:
    """Join ``probe`` (large, possibly skewed) with ``build`` (small)
    on ``on`` with the key space salted ``n_salts`` ways. Result
    equals ``probe.join(build, on, how)`` (column order: probe cols
    then non-key build cols). Supported ``how``: inner / left."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    on = list(on)
    p = probe.withColumn(_SALT, salt_expr(n_salts))
    b = build.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    out = p.join(b, on + [_SALT], how)
    return out.drop(_SALT)
