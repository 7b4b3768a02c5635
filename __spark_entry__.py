"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``hearthstats_spark``; this module just
re-exports the declared-query registry (SURVEY.md §2).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (q15 pricing summary, TPC-H Q1 shape) on
    /root/testdata/sf0.001; driver checks rows>0."""
    from hearthstats_spark.queries.registry import load_all
    from hearthstats_spark.session import ensure_conf

    ensure_conf(spark)
    reg = load_all()
    return reg["q15_agg_pricing"].fn(spark, "/root/testdata/sf0.001")


def _driver_covered() -> set[str]:
    """Union of query ids across every checked-in CORRECTNESS_r*.json.

    The driver caps each round's CORRECTNESS file at 50 entries taken
    from the head of ``queries()``; these files are the only durable
    record of which ids have ever had driver eyes. Round 1 covered
    q01–q50 and round 2 covered q68–q117, so coverage must be tracked
    across rounds, not guessed from id ranges (round 2's newest-first
    heuristic left q51–q67 unverified twice)."""
    import glob
    import json

    here = os.path.dirname(os.path.abspath(__file__))
    covered: set[str] = set()
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        try:
            with open(path) as fh:
                covered.update(json.load(fh).keys())
        except Exception:
            continue  # a malformed file must not break the contract
    return covered


def _contract_order(names) -> list[str]:
    """The driver's per-round CORRECTNESS file holds exactly 50
    entries from the head of this ordering, so ordering IS coverage
    policy. Emit ids that have NEVER appeared in any round's
    CORRECTNESS file first — oldest (lowest-numbered) gap first, so a
    band skipped once cannot be starved again by newer additions —
    then never-covered s-ops, then everything already covered. Every
    query is still present either way, and scripts/check_oracle.py
    runs the full sweep locally regardless (see README §Correctness).

    Numeric parse, not string compare: lexicographically
    "q102" < "q51", which would silently file new queries under the
    already-covered head."""
    def qnum(n: str) -> int:
        return int(n[1:n.index("_")])

    covered = _driver_covered()
    qs = sorted((n for n in names if n.startswith("q")), key=qnum)
    sops = sorted(n for n in names if not n.startswith("q"))
    gap_q = [n for n in qs if n not in covered]
    gap_s = [n for n in sops if n not in covered]
    seen_q = [n for n in qs if n in covered]
    seen_s = [n for n in sops if n in covered]
    return gap_q + gap_s + seen_q + seen_s


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from hearthstats_spark.queries.registry import load_all

    reg = load_all()
    return {name: reg[name].fn for name in _contract_order(reg)}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every oracle-checked query; rows-only
    ops (streaming, sketches, side-effect sinks) are omitted."""
    from hearthstats_spark.queries.registry import load_all

    reg = load_all()
    return {
        name: reg[name].oracle
        for name in _contract_order(reg)
        if reg[name].oracle is not None
    }
