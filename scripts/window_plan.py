#!/usr/bin/env python
"""Driver-window planner: what happens to the 50-slot re-verification
window if I edit FILE(s)?

The driver's CORRECTNESS file covers exactly 50 entries from the head
of ``__spark_entry__._contract_order``, and an edit to any
query-defining module re-files its co-located queries into a
re-verification class (VERIFIED.json hash mismatch). Editing the
wrong file can therefore EVICT planned coverage — observed live in
round 7, twice: migrating q118 (pipeline_ext2.py, round-3-verified)
silently pushed 4 of the 20 first-ever streaming-op records out of
the window; migrating q98/q108 (round-5 files) would have pushed out
all 20. This script makes that arithmetic visible BEFORE the edit:

    python scripts/window_plan.py                       # current window
    python scripts/window_plan.py hearthstats_spark/queries/pipeline_ext2.py
    python scripts/window_plan.py queries/tokenizer.py queries/ann2.py

For each scenario it prints the window's class composition, which ids
ENTER and which LEAVE versus the no-edit baseline, and a verdict line:
UNSAFE (exit 1) if never-covered or stale coverage is evicted, a
WARNING if a just-lapsed id (edited after its latest-round check)
loses its slot — that only DELAYS a re-check, it does not starve a
first record. Paths may be repo-relative or any unambiguous suffix.

The simulation calls ``__spark_entry__._ordering`` itself with a
hash-override map — the classes and sort key are the REAL driver
policy, never a reimplementation (round-7 review: a hand copy here
goes stale the moment the policy changes).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entry  # noqa: E402

WINDOW = 50

#: human labels for _ordering's 0-based class values
LABEL = {0: "never-covered q", 1: "declared-edited q",
         2: "never-covered s", 3: "co-located stale q",
         4: "just-lapsed q", 5: "fresh q", 6: "covered s"}


def _resolve(arg: str, known_files: set[str]) -> str:
    """Repo-relative path, or unique suffix match against the files
    VERIFIED.json knows about."""
    if arg in known_files:
        return arg
    hits = [f for f in known_files if f.endswith(arg)]
    if len(hits) == 1:
        return hits[0]
    raise SystemExit(
        f"'{arg}' matches {len(hits)} tracked files "
        f"({hits[:4] if hits else 'none'}) — pass a repo-relative path")


def _order_and_classes(edited: set[str]):
    """The REAL driver ordering with the given files' hashes forced
    stale (thin wrapper kept for tests/test_entry.py's pins)."""
    from hearthstats_spark.queries.registry import load_all

    return entry._ordering(
        load_all(), {f: "<<edited>>" for f in edited})


def main() -> int:
    import json

    with open(os.path.join(REPO, "VERIFIED.json")) as fh:
        verified = json.load(fh)
    known_files = {v["file"] for v in verified.values() if v.get("file")}

    edits = {_resolve(a, known_files) for a in sys.argv[1:]}

    base_order, base_cls = _order_and_classes(set())
    base_win = base_order[:WINDOW]
    order, cls = _order_and_classes(edits)
    win = order[:WINDOW]

    def comp(w, c):
        out: dict[str, int] = {}
        for n in w:
            out[LABEL[c[n]]] = out.get(LABEL[c[n]], 0) + 1
        return out

    print(f"baseline window: {comp(base_win, base_cls)}")
    if not edits:
        return 0
    print(f"after editing {sorted(edits)}:")
    print(f"  window: {comp(win, cls)}")
    enter = [n for n in win if n not in base_win]
    leave = [n for n in base_win if n not in win]
    if enter:
        print(f"  ENTER ({len(enter)}): {enter}")
    if leave:
        print(f"  LEAVE ({len(leave)}): {leave}")
    # classes 0-2 are planned coverage (first records / declared
    # semantic-edit re-checks); losing one starves it for the round
    evicted = [n for n in leave if base_cls[n] in (0, 1, 2)]
    # class 3 (co-located stale) and 4 (just-lapsed) evictions only
    # DELAY a re-check of an id whose behavior is asserted unchanged
    # and locally re-verified — flag them, don't fail on them
    delayed = [n for n in leave if base_cls[n] in (3, 4)]
    if delayed:
        print(f"  WARNING: delays just-lapsed re-checks: {delayed}")
    if evicted:
        print(f"  VERDICT: UNSAFE — evicts planned coverage: {evicted}")
        return 1
    print("  VERDICT: SAFE — no planned coverage evicted")
    return 0


if __name__ == "__main__":
    sys.exit(main())
