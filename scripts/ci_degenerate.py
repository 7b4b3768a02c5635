#!/usr/bin/env python
"""The degenerate-corpus gate (VERDICT r7 item 7): one command that
fails on ANY engine/oracle divergence or crash across every audit
mode, so the bug class the round-7 audit uncovered (27 findings seven
rounds of green real-data checks could never reach) cannot silently
re-enter.

Runs scripts/audit_degenerate.py in every corpus mode:

    rows=0                      every lane empty at once (+ rows-only
                                crash smoke — found s09/s10/s19 live)
    rows=1                      one-sided groups / zero denominators
    rows=3                      small-but-plural (q122's width-0 lane
                                needs equal prices; rows=3 passes it)
    rows=-1 --null-text         all-null document payloads
    rows=-1 --null-embedding    all-null vectors
    rows=-1 --constant-text     maximal duplication / all-ties axis
    rows=-1 --constant-measures zero-variance axis (found the q47
                                unstable-std garbage and q63's ANSI
                                corr crash on first run, round 8)
    rows=-1 --unicode-text      multi-byte UTF-8 axis (CJK / emoji /
                                combining marks / RTL / ß and Σ case
                                landmines through the text family)
    rows=-1 --negated-measures  refunds/returns axis: mixed-sign
                                measures (found q133's ANSI '-' cast
                                abort, q36's crash-vs-NaN asymmetry
                                and the unsigned davg/favg floor-vs-
                                trunc divergence, round 8)
    rows=-1 --null-measures     missing-data axis: every 3rd measure
                                value NULL — SQL NULL-skipping vs the
                                numpy/pandas kernel lanes and
                                COUNT(*)-vs-COUNT(col) confusions
                                (found the two NULL-sort-order
                                divergence families, round 8)
    rows=-1 --constant-ts       one-instant axis: every time value
                                flattened — all-ties as-of, single-
                                bucket windows, zero durations
                                (first run 193/193 clean — the
                                deterministic-tie-break discipline
                                held)
    rows=-1 --null-keys         dirty-FK axis: every 3rd foreign-key
                                value NULL — NULL-as-one-group
                                windows vs NULL-matches-nothing SQL
                                equality (found the as-of kernel
                                serving NULL-keyed references, the
                                q175 '0x' crash and the q181 phantom
                                CDC key, round 8)
    rows=-1 --extreme-measures  magnitude axis: measures scaled to
                                1e12 (exact cents·10^5 integers) —
                                DECIMAL headroom vs double 2^53 vs
                                BIGINT intermediates (found the
                                q15/q180 DECIMAL(12,2) ANSI aborts
                                and q171's 2^63 denominator, round
                                9; the documented double-output /
                                q158 domain bounds are [SKIP]-listed
                                in EXTREME_EXPECTED with reasons)
    rows=-1 --empty-text        ''-vs-NULL axis: every 3rd document
                                empty-string — zero-length text
                                through the whole family (found
                                q91's sequence(1,0)-descending
                                crash on sub-gram docs, round 8)

Exit code = total non-PASS results across all modes (0 = gate green).
Each mode is a subprocess (own SparkSession) — ~15 s JVM startup per
mode, ~15-25 min total at the audit's full 193-query scope. Use
--fast to limit every mode to the ids named in --only.

    python scripts/ci_degenerate.py            # the full CI gate
    python scripts/ci_degenerate.py --only q18,q122
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
AUDIT = os.path.join(HERE, "audit_degenerate.py")

MODES: list[tuple[str, list[str]]] = [
    ("empty", ["--rows", "0", "--include-rows-only"]),
    ("one-row", ["--rows", "1"]),
    ("three-row", ["--rows", "3"]),
    ("null-text", ["--rows", "-1", "--null-text"]),
    ("null-embedding", ["--rows", "-1", "--null-embedding"]),
    ("constant-text", ["--rows", "-1", "--constant-text"]),
    ("constant-measures", ["--rows", "-1", "--constant-measures"]),
    ("unicode-text", ["--rows", "-1", "--unicode-text"]),
    ("negated-measures", ["--rows", "-1", "--negated-measures"]),
    ("null-measures", ["--rows", "-1", "--null-measures"]),
    ("constant-ts", ["--rows", "-1", "--constant-ts"]),
    ("null-keys", ["--rows", "-1", "--null-keys"]),
    ("empty-text", ["--rows", "-1", "--empty-text"]),
    ("extreme-measures", ["--rows", "-1", "--extreme-measures"]),
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None,
                    help="comma list of query-id prefixes (passed to "
                         "every mode)")
    args = ap.parse_args()

    total_bad = 0
    for label, flags in MODES:
        cmd = [sys.executable, AUDIT, *flags]
        if args.only:
            cmd += ["--only", args.only]
        print(f"=== mode: {label} ({' '.join(flags)}) ===", flush=True)
        rc = subprocess.run(cmd).returncode
        print(f"=== mode {label}: "
              f"{'PASS' if rc == 0 else f'{rc} non-PASS'} ===\n",
              flush=True)
        total_bad += rc
    print(f"degenerate gate: "
          f"{'GREEN' if total_bad == 0 else f'{total_bad} non-PASS total'}")
    return min(total_bad, 120)


if __name__ == "__main__":
    sys.exit(main())
