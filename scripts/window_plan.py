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
ENTER and which LEAVE versus the no-edit baseline, and a verdict line
(SAFE if nothing planned is evicted). Paths may be repo-relative or
any unambiguous suffix.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entry  # noqa: E402

WINDOW = 50


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
    """Replicate _contract_order with the given files' hashes forced
    stale. Returns (ordered names, name -> class int) using the
    docstring's 1-6 numbering."""
    from hearthstats_spark.queries.registry import load_all

    reg = load_all()
    covered = entry._driver_covered()
    verified = entry._verified_map()
    cur = entry._current_file_hashes(
        v.get("file") for v in verified.values())
    for f in edited:  # the hypothetical edit
        cur[f] = "<<edited>>"
    latest = max((v.get("round", 0) for v in verified.values()), default=0)

    def klass(n: str) -> int:
        if not n.startswith("q"):
            return 3 if n not in covered else 6
        if n not in covered:
            return 1
        v = verified.get(n)
        if (not v or not v.get("sha256")
                or cur.get(v.get("file")) != v["sha256"]):
            if v and v.get("round", 0) >= latest:
                return 4
            return 2
        return 5

    # _SOP_PRIORITY is local to _contract_order; recover the same
    # ranking from the live no-edit ordering instead of duplicating it
    # (q-file edits never reorder s-ops, so the live order is exact)
    live_sops = [n for n in entry._contract_order(reg) if n.startswith("s")]
    sop_rank = {n.split("_")[0]: i for i, n in enumerate(live_sops)}

    def qnum(n: str) -> int:
        return int(n[1:n.index("_")])

    def key(n: str):
        rnd = verified.get(n, {}).get("round", 0)
        if n.startswith("q"):
            return (klass(n), rnd, qnum(n), n)
        return (klass(n), rnd, sop_rank.get(n.split("_")[0], 99), n)

    names = sorted(reg, key=key)
    return names, {n: klass(n) for n in names}


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
        out: dict[int, int] = {}
        for n in w:
            out[c[n]] = out.get(c[n], 0) + 1
        return dict(sorted(out.items()))

    label = {1: "never-covered q", 2: "stale q", 3: "never-covered s",
             4: "just-lapsed q", 5: "fresh q", 6: "covered s"}

    print(f"baseline window: { {label[k]: v for k, v in comp(base_win, base_cls).items()} }")
    if not edits:
        return 0
    print(f"after editing {sorted(edits)}:")
    print(f"  window: { {label[k]: v for k, v in comp(win, cls).items()} }")
    enter = [n for n in win if n not in base_win]
    leave = [n for n in base_win if n not in win]
    if enter:
        print(f"  ENTER ({len(enter)}): {enter}")
    if leave:
        print(f"  LEAVE ({len(leave)}): {leave}")
    evicted = [n for n in leave
               if base_cls[n] in (1, 2, 3)]  # planned coverage classes
    if evicted:
        print(f"  VERDICT: UNSAFE — evicts planned coverage: {evicted}")
        return 1
    print("  VERDICT: SAFE — no planned coverage evicted")
    return 0


if __name__ == "__main__":
    sys.exit(main())
