#!/usr/bin/env python
"""Block until the host is in a measurement-quality window, then
optionally exec a command — the front door to every timing run
(bench.py, perf_trend.py, steady A/Bs).

Round-8 and round-11 both lost bench attempts to hypervisor noise;
round 11 characterized the two regimes (see bench.steal_probe):

- TRUE CPU steal: all probe runs degrade (10.9/0.18/4.2 s
  back-to-back) — nothing measured in this window is trustworthy.
- idle→busy transition penalty: ONLY the first run after an idle
  gap is slow (3-25 s page reclaim) while sustained runs sit at the
  0.12-0.17 s quiet reference — continuously-busy measurements are
  fine.

Quiet therefore means: sustained median (runs after the first) under
``--quiet-ref`` ON ``--consecutive`` probe rounds in a row. The
transition penalty does NOT block (the measurement tools' own
warm-ups absorb it), but it is logged so the operator sees it.

    python scripts/wait_quiet.py                    # wait, exit 0 when quiet
    python scripts/wait_quiet.py -- python bench.py # wait, then run
    python scripts/wait_quiet.py --max-wait 7200 --consecutive 3
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def is_quiet(runs: list[float], quiet_ref: float) -> bool:
    """The round-11 two-regime decision: sustained runs (after the
    idle→busy first run) must sit at the quiet reference; run 0 is
    ignored because it measures the transition, not steady work.

    Two conditions, because true steal is BURSTY — a single probe
    round can catch one 4 s burst between fast runs and a bare
    median waves it through: (a) the sustained median
    (``bench.steal_sustained`` — ONE definition of "sustained",
    shared with the perf-trend gate) is at the quiet reference,
    (b) no single sustained run exceeds 10× it (healthy windows
    show occasional ~1 s blips — measured 1/12 runs — which must
    NOT block, but a multi-second sustained run is the steal
    signature)."""
    from bench import steal_sustained

    tail = runs[1:] or runs
    return (steal_sustained(runs) < quiet_ref
            and max(tail) < 10 * quiet_ref)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quiet-ref", type=float, default=None,
                    help="sustained-median threshold in seconds "
                         "(default: 1.75x bench.STEAL_PROBE_QUIET_S)")
    ap.add_argument("--consecutive", type=int, default=2)
    ap.add_argument("--interval", type=float, default=120.0)
    ap.add_argument("--max-wait", type=float, default=4 * 3600)
    ap.add_argument("cmd", nargs="*",
                    help="command to exec once quiet (after `--`)")
    args = ap.parse_args()

    from bench import STEAL_PROBE_QUIET_S, steal_probe

    quiet_ref = (args.quiet_ref if args.quiet_ref is not None
                 else 1.75 * STEAL_PROBE_QUIET_S)
    deadline = time.time() + args.max_wait
    consec = 0
    while True:
        runs = steal_probe(4)
        quiet = is_quiet(runs, quiet_ref)
        consec = consec + 1 if quiet else 0
        print(f"[wait_quiet] probe {runs} quiet={quiet} "
              f"({consec}/{args.consecutive})", flush=True)
        if consec >= args.consecutive:
            break
        if time.time() >= deadline:
            print("[wait_quiet] max-wait exhausted without a quiet "
                  "window", file=sys.stderr)
            return 2
        time.sleep(args.interval)

    if not args.cmd:
        return 0
    print(f"[wait_quiet] quiet; running: {' '.join(args.cmd)}",
          flush=True)
    return subprocess.run(args.cmd, cwd=REPO).returncode


if __name__ == "__main__":
    raise SystemExit(main())
