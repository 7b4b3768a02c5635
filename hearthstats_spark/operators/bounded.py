"""Runtime size-guarded broadcast hint (VERDICT r5 item 4).

``FORCED_BROADCAST_OK`` (tests/test_plan_audit.py) used to carry
entries whose "this frame stays small at 100 TB" argument was
narrative — e.g. q91's eval-shingle set, which at the TEST scale is
doc_id % 97 of the corpus and therefore SF-LINEAR even though the
design-point workload (a fixed benchmark suite) is bounded.
``broadcast_bounded`` replaces narration with enforcement: the hint
is applied only after a cheap limit-probe proves the frame currently
holds at most ``max_rows`` rows; anything larger is returned
UNHINTED so Catalyst/AQE plan a regular shuffle join. The same
query therefore degrades gracefully from "map-side hash join" to
"shuffle join" as the data grows past the cap — no OOM cliff.

The probe is ``df.limit(max_rows + 1).count()`` — it never ships
more than cap+1 rows, mirroring operators/similarity.py's
``max_broadcast_rows`` guard (the established fast-path pattern).
The probe does run the frame's plan once at query-BUILD time; every
adopter's frame is a small aggregate whose recompute cost is noise
next to the join it guards (and at scale the probe's full-scan cost
is the price of not OOMing 1000 executors).

Machine verification: each call appends to ``GUARDED_SITES`` while
the query builds, and ``test_no_forced_broadcast_of_fact_frames``
counts the sites recorded during a query's build into that query's
allowance — a forced fact-frame broadcast is legal ONLY if it is
either statically bounded in the plan text (keyless agg / limit) or
went through this guard. The static allowlist keeps only entries
whose bound is visible by construction (constant probe filters,
sketch geometry).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: max_rows of every broadcast_bounded call, in build order; the plan
#: audit snapshots this around each query build (never cleared —
#: consumers diff lengths).
GUARDED_SITES: list[int] = []


def broadcast_bounded(df: DataFrame, max_rows: int,
                      probe: DataFrame | None = None,
                      per_probe_row: int = 1) -> DataFrame:
    """``F.broadcast(df)`` iff df provably holds ≤ max_rows rows
    right now; otherwise df unhinted, leaving the join strategy to
    Catalyst/AQE's size statistics.

    Default probe is df itself (limit-probe count). When df is
    expensive to evaluate but STRUCTURALLY bounded by a cheaper
    frame — q56's rank-filtered marker table is ≤ 10 rows per
    language — pass that frame as ``probe`` with ``per_probe_row``
    the static multiplier: df ≤ |probe| · per_probe_row, and only
    the cheap frame is counted (at 100 TB the difference is a
    column-pruned enum scan vs re-running a token aggregation)."""
    src = df if probe is None else probe
    budget = max_rows // per_probe_row
    n = src.limit(budget + 1).count()
    GUARDED_SITES.append(max_rows)
    return F.broadcast(df) if n * per_probe_row <= max_rows else df
