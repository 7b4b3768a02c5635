"""Round-4 operator semantics (q152-q157, s20) pinned against
independent brute-force reimplementations — the oracle sweep proves
Spark==DuckDB; these prove both match the DEFINITION."""

from __future__ import annotations

from collections import defaultdict

import duckdb
from pyspark.sql import functions as F

from hearthstats_spark.io import load_table
from tests.conftest import SF_SMALL


def test_interval_coverage_matches_bruteforce(spark, registry):
    """q152's islands must equal a literal day-set union (feasible at
    sf0.001: quantity <= 50 days per interval)."""
    li = load_table(spark, SF_SMALL, "lineitem").select(
        "l_suppkey", "l_shipdate", "l_quantity").collect()
    sup = {r["s_suppkey"]: r["s_nationkey"]
           for r in load_table(spark, SF_SMALL, "supplier").collect()}
    nat = {r["n_nationkey"]: r["n_name"]
           for r in load_table(spark, SF_SMALL, "nation").collect()}
    days = defaultdict(set)
    epoch = __import__("datetime").date(1970, 1, 1)
    for r in li:
        s = (r["l_shipdate"].date() - epoch).days
        for d in range(s, s + int(r["l_quantity"])):
            days[r["l_suppkey"]].add(d)
    want = defaultdict(int)
    for k, ds in days.items():
        want[nat[sup[k]]] += len(ds)

    got = {r["n_name"]: r["total_covered_days"]
           for r in registry["q152_interval_coverage"]
           .fn(spark, SF_SMALL).collect()}
    assert got == dict(want)


def test_copied_spans_matches_bruteforce(spark, registry):
    """q153's shared flags and max consecutive run vs a dict-based
    scan of the whole corpus."""
    docs = {r["doc_id"]: r["text"].split(" ")
            for r in load_table(spark, SF_SMALL, "documents")
            .filter(F.col("text").isNotNull()).collect()}
    owners = defaultdict(set)
    for did, t in docs.items():
        for i in range(len(t) - 4):
            owners[" ".join(t[i:i + 5])].add(did)
    want = {}
    for did, t in docs.items():
        flags = [len(owners[" ".join(t[i:i + 5])]) >= 2
                 for i in range(len(t) - 4)]
        if not flags:
            continue
        run = best = 0
        for f in flags:
            run = run + 1 if f else 0
            best = max(best, run)
        want[did] = (len(flags), sum(flags), best)

    got = {r["doc_id"]: (r["n_shingles"], r["n_shared"],
                         r["max_copied_run"])
           for r in registry["q153_copied_spans"]
           .fn(spark, SF_SMALL).collect()}
    assert got == want


def test_sorted_neighborhood_pairs_and_threshold(spark, registry):
    """q155: every emitted pair must be sort-adjacent within its
    first-token block AND meet exact distinct-word Jaccard >= 0.5;
    and every adjacent pair meeting it must be emitted."""
    rows = (load_table(spark, SF_SMALL, "documents")
            .filter(F.col("text").isNotNull())
            .select("doc_id", "text").collect())
    blocks = defaultdict(list)
    for r in rows:
        blocks[r["text"].split(" ")[0]].append((r["text"], r["doc_id"]))
    want = set()
    for blk in blocks.values():
        blk.sort()
        for (ta, ia), (tb, ib) in zip(blk, blk[1:]):
            wa, wb = set(ta.split(" ")), set(tb.split(" "))
            inter = len(wa & wb)
            if 3 * inter >= len(wa) + len(wb):
                want.add((ia, ib))
    got = {(r["id_a"], r["id_b"])
           for r in registry["q155_dedup_sorted_neighborhood"]
           .fn(spark, SF_SMALL).collect()}
    assert got == want and len(got) > 0


def test_basket_lift_values(spark, registry):
    """q157's lift for its returned pairs vs a brute-force DuckDB
    recomputation from the raw counts (rounding replayed exactly)."""
    out = registry["q157_basket_lift"].fn(spark, SF_SMALL).collect()
    con = duckdb.connect()
    con.execute(f"""CREATE VIEW lineitem AS
                    SELECT * FROM '{SF_SMALL}/lineitem.parquet'""")
    po = con.execute("""
        WITH po0 AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        SELECT l_orderkey, l_partkey FROM (
            SELECT l_orderkey, l_partkey,
                   row_number() OVER (PARTITION BY l_orderkey
                                      ORDER BY l_partkey) rn FROM po0)
        WHERE rn <= 64""").fetchall()
    orders = defaultdict(set)
    for ok, pk in po:
        orders[ok].add(pk)
    n_tot = len(orders)
    item = defaultdict(int)
    pair = defaultdict(int)
    for ps in orders.values():
        for p in ps:
            item[p] += 1
        ps = sorted(ps)
        for i, a in enumerate(ps):
            for b in ps[i + 1:]:
                pair[(a, b)] += 1
    from decimal import ROUND_HALF_UP, Decimal
    for r in out:
        a, b = r["item_a"], r["item_b"]
        assert pair[(a, b)] == r["co"] >= 3
        num = Decimal(pair[(a, b)] * n_tot)
        den = item[a] * item[b]
        want = float((num / den).quantize(Decimal("0.0001"),
                                          rounding=ROUND_HALF_UP))
        assert r["lift"] == want, (a, b, r["lift"], want)


def test_csv_corrupt_modes_agree(spark, registry):
    row = (registry["s20_csv_corrupt_records"]
           .fn(spark, SF_SMALL).collect()[0])
    assert row["modes_agree"]
    assert row["n_corrupt"] == row["n_injected"] == 3
    assert row["n_good_permissive"] == row["n_clean"]
