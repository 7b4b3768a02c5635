"""Rebuild VERIFIED.json — the per-query verified-at record.

For every id in every checked-in CORRECTNESS_r*.json this records

    id -> {"round": N, "file": <repo-relative source file>,
           "sha256": <hash of that file AT the commit that landed the
                      round-N CORRECTNESS file>}

`__spark_entry__._contract_order` compares the recorded hash against
the CURRENT file hash: a mismatch means the query's source changed
after its last driver check, so the id is re-ordered into the head of
``queries()`` (the driver caps CORRECTNESS at 50 entries from the
head, so ordering IS re-verification policy — VERDICT r3 item 2).

Hash granularity is the defining FILE, not the function: a kernel
rewrite usually lands in the query's own module, and co-located
queries getting conservatively re-verified is the safe direction.
Shared-operator edits (operators/*.py) are NOT tracked here; rely on
scripts/check_oracle.py locally when touching those.

Run after each round's CORRECTNESS file lands (round-start checklist):

    python scripts/update_verified.py
"""

from __future__ import annotations

import glob
import hashlib
import inspect
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _git(*args: str) -> str | None:
    try:
        out = subprocess.run(
            ["git", *args], cwd=REPO, capture_output=True, text=True, timeout=30
        )
        return out.stdout if out.returncode == 0 else None
    except Exception:
        return None


def _source_relpath(fn) -> str | None:
    try:
        path = inspect.getsourcefile(inspect.unwrap(fn))
        return os.path.relpath(path, REPO) if path else None
    except Exception:
        return None


def main() -> int:
    from hearthstats_spark.queries.registry import load_all

    reg = load_all()
    id_to_file = {name: _source_relpath(q.fn) for name, q in reg.items()}

    rounds: list[tuple[int, str]] = []
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if m:
            rounds.append((int(m.group(1)), path))
    rounds.sort()  # later rounds override earlier entries per id

    verified: dict[str, dict] = {}
    for rnd, path in rounds:
        rel = os.path.relpath(path, REPO)
        sha = (_git("log", "-n1", "--format=%H", "--", rel) or "").strip() or None
        with open(path) as fh:
            ids = list(json.load(fh).keys())
        for qid in ids:
            src = id_to_file.get(qid)
            file_hash = None
            if sha and src:
                blob = _git("show", f"{sha}:{src}")
                if blob is not None:
                    file_hash = hashlib.sha256(blob.encode()).hexdigest()
            verified[qid] = {"round": rnd, "file": src, "sha256": file_hash}

    out = os.path.join(REPO, "VERIFIED.json")
    with open(out, "w") as fh:
        json.dump(verified, fh, indent=1, sort_keys=True)
        fh.write("\n")
    n_hashed = sum(1 for v in verified.values() if v["sha256"])
    print(f"VERIFIED.json: {len(verified)} ids, {n_hashed} with source hashes")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
