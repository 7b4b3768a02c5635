"""CLI: run declared queries from the shell.

    python -m hearthstats_spark list
    python -m hearthstats_spark run q15_agg_pricing [--sf DIR] [--limit N]
    python -m hearthstats_spark explain q06 [--sf DIR]

Query ids may be unambiguous prefixes (``q15`` → q15_agg_pricing).
This is the "switch from the reference" entry point: the reference's
scrape→SQLite→report loop becomes load→DataFrame query→show/sink.
"""

from __future__ import annotations

import argparse
import sys


def _resolve(registry: dict, prefix: str) -> str:
    hits = [n for n in sorted(registry) if n.startswith(prefix)]
    if len(hits) != 1:
        sys.exit(f"query {prefix!r} matches {hits or 'nothing'}")
    return hits[0]


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="hearthstats_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list declared queries")
    for c in ("run", "explain"):
        p = sub.add_parser(c)
        p.add_argument("query")
        p.add_argument("--sf", default="/root/testdata/sf0.01")
        if c == "run":
            p.add_argument("--limit", type=int, default=20)
    args = ap.parse_args(argv)

    from hearthstats_spark.queries.registry import load_all

    registry = load_all()
    if args.cmd == "list":
        for name, q in sorted(registry.items()):
            kind = "oracle" if q.oracle else "rows-only"
            print(f"{name:28s} [{kind}]  {(q.fn.__doc__ or '').strip().splitlines()[0]}")
        return 0

    from hearthstats_spark.session import get_spark

    spark = get_spark("hearthstats-cli")
    spark.sparkContext.setLogLevel("ERROR")
    name = _resolve(registry, args.query)
    df = registry[name].fn(spark, args.sf)
    if args.cmd == "explain":
        df.explain("formatted")
    else:
        df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
