#!/usr/bin/env python
"""ANN recall measurement (VERDICT r9 item 4): grade the index
families on RECALL@5 against global brute force — exactness against
the deterministic oracles proves the plumbing, but recall is the
quality metric an ANN serving deployment actually buys.

For each registered index family the script runs the DECLARED query
(same probe set vec_id < 10, same parameters) on a corpus and
compares its neighbor sets to the exact global top-5 computed
independently in DuckDB (brute-force cosine over the same parquet —
no shared code with the engine). Three corpora, three regimes
(VERDICT r10 item 5): the shipped sf0.1 (2k near-random vectors —
the floor regime), .bench_corpus/emb10x (20k dithered replicas —
the ceiling regime), and .bench_corpus/embplanted (40 planted
Gaussian clusters with known membership — the middle regime where
quantizer choice and multiprobe ordering actually rank the
families; built on demand, deterministic).

    python scripts/ann_recall.py                  # both corpora
    python scripts/ann_recall.py --sf <dir>       # one corpus

Prints one JSON line {corpus: {family: recall@5}} and a markdown
row block for SCALE.md. Lower bounds are pinned in
tests/test_ann3.py (test_recall_floor_*).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TOP_K = 5
N_QUERIES = 10

#: family -> registered query id (all emit (query_id, neighbor_id, …))
FAMILIES = {
    "ivf_signbit": "q61_ann_ivf",
    "ivf_multiprobe": "q87_ann_ivf_multiprobe",
    "lsh": "q85_ann_lsh",
    "ivf_kmeans": "q187_ann_ivf_kmeans",
    "ivf_pq": "q184_ann_ivf_pq",
    "ivf_pq_multiprobe": "q185_ann_ivf_pq_multiprobe",
    "ivfadc_residual": "q186_ann_ivfadc_residual",
}

_TRUTH_SQL = f"""
WITH e AS (
    SELECT vec_id,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
           SQRT(list_sum(list_transform(embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
    FROM read_parquet('{{path}}')
    WHERE vec_id IS NOT NULL AND embedding IS NOT NULL
),
pairs AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS sim
    FROM e q JOIN e c ON q.vec_id <> c.vec_id
    WHERE q.vec_id < {N_QUERIES}
)
SELECT query_id, neighbor_id
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
          ORDER BY sim DESC, neighbor_id) AS rk FROM pairs)
WHERE rk <= {TOP_K}
"""


def exact_top5(path: str) -> dict[int, set[int]]:
    import duckdb

    if os.path.isdir(path):  # Spark-written dataset directory
        path = os.path.join(path, "*.parquet")
    con = duckdb.connect()
    rows = con.execute(_TRUTH_SQL.format(path=path)).fetchall()
    truth: dict[int, set[int]] = {}
    for qid, nid in rows:
        truth.setdefault(qid, set()).add(nid)
    return truth


def measure(spark, sf_dir: str) -> dict[str, float]:
    from hearthstats_spark.queries.registry import load_all

    reg = load_all()
    truth = exact_top5(os.path.join(sf_dir, "embeddings.parquet"))
    out: dict[str, float] = {}
    for fam, qid in FAMILIES.items():
        got: dict[int, set[int]] = {}
        for r in reg[qid].fn(spark, sf_dir).collect():
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        hits = sum(len(got.get(q, set()) & t) for q, t in truth.items())
        denom = sum(len(t) for t in truth.values())
        out[fam] = round(hits / denom, 3) if denom else float("nan")
        print(f"[recall] {os.path.basename(sf_dir)} {fam} ({qid}): "
              f"{out[fam]}", file=sys.stderr)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=None)
    args = ap.parse_args()

    from hearthstats_spark.session import get_spark

    corpora = ([args.sf] if args.sf else
               ["/root/testdata/sf0.1",
                os.path.join(REPO, ".bench_corpus", "emb10x"),
                os.path.join(REPO, ".bench_corpus", "embplanted")])
    # the planted recall corpus is cheap and deterministic — build it
    # on demand (VERDICT r10 item 5)
    planted = os.path.join(REPO, ".bench_corpus", "embplanted",
                           "embeddings.parquet")
    if args.sf is None and not os.path.exists(planted):
        import subprocess
        subprocess.run(
            [sys.executable,
             os.path.join(REPO, "scripts", "make_bench_corpus.py"),
             "--tables", "planted"], check=True, cwd=REPO, timeout=600)
    spark = get_spark("ann-recall")
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    for sf in corpora:
        if not os.path.exists(os.path.join(sf, "embeddings.parquet")):
            print(f"[recall] skip {sf} (no embeddings)", file=sys.stderr)
            continue
        results[os.path.basename(sf.rstrip("/"))] = measure(spark, sf)
    print(json.dumps(results))
    # markdown block for SCALE.md
    fams = list(FAMILIES)
    print("| corpus | " + " | ".join(fams) + " |")
    print("|" + "---|" * (len(fams) + 1))
    for tag, r in results.items():
        print(f"| {tag} | " + " | ".join(str(r[f]) for f in fams) + " |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
