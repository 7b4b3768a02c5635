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


def test_pps_sample_invariants(spark, registry):
    """q158: multiplicities must sum to exactly k, every drawn row's
    multiplicity is ~ceil(w·k/W), and heavy rows repeat."""
    rows = registry["q158_sample_pps"].fn(spark, SF_SMALL).collect()
    assert sum(r["multiplicity"] for r in rows) == 100
    total = (load_table(spark, SF_SMALL, "orders")
             .agg(F.sum((F.col("o_totalprice").cast("decimal(18,2)")
                         * 100).cast("bigint"))).first()[0])
    for r in rows:
        # systematic PPS: multiplicity differs from w·k/W by < 1
        exact = r["w_cents"] * 100 / total
        assert abs(r["multiplicity"] - exact) < 1


def test_rank_with_ties_keeps_cohorts(spark, registry):
    """q161: within a nation, every customer tied at a kept rank's
    n_orders must be present; ranks come gapped (1,1,3 pattern)."""
    rows = registry["q161_rank_with_ties"].fn(spark, SF_SMALL).collect()
    by_nation = defaultdict(list)
    for r in rows:
        by_nation[r["c_nationkey"]].append((r["rnk"], r["n_orders"]))
    cnt = (load_table(spark, SF_SMALL, "orders")
           .join(load_table(spark, SF_SMALL, "customer"),
                 F.col("o_custkey") == F.col("c_custkey"))
           .groupBy("c_nationkey", "o_custkey")
           .agg(F.count(F.lit(1)).alias("n")).collect())
    full = defaultdict(list)
    for r in cnt:
        full[r["c_nationkey"]].append(r["n"])
    for nk, kept in by_nation.items():
        kept_counts = sorted((n for _, n in kept), reverse=True)
        want = sorted(full[nk], reverse=True)
        # every count >= the lowest kept count must be in the output
        floor_n = kept_counts[-1]
        assert kept_counts == [n for n in want if n >= floor_n]


def test_asof_nearest_matches_bruteforce(spark, registry):
    """q162 vs a per-user python scan (backward ties win). Gaps are
    whole-second boundary crossings — both engines truncate each
    timestamp to seconds before differencing (unix_timestamp /
    datediff('second')), so the reference must too."""
    ev = load_table(spark, SF_SMALL, "events").select(
        "event_id", "user_id", "ts", "event_type").collect()
    signups = defaultdict(list)
    for r in ev:
        if r["event_type"] == "signup":
            signups[r["user_id"]].append(r["ts"])

    def secgap(a, b):  # a >= b, per-side second truncation
        return int((a.replace(microsecond=0)
                    - b.replace(microsecond=0)).total_seconds())

    want = {}
    for r in ev:
        if r["event_type"] != "purchase":
            continue
        back = [t for t in signups[r["user_id"]] if t <= r["ts"]]
        fwd = [t for t in signups[r["user_id"]] if t > r["ts"]]
        bg = secgap(r["ts"], max(back)) if back else None
        fg = secgap(min(fwd), r["ts"]) if fwd else None
        if bg is None and fg is None:
            want[r["event_id"]] = (None, None)
        elif fg is None or (bg is not None and bg <= fg):
            want[r["event_id"]] = ("back", int(bg))
        else:
            want[r["event_id"]] = ("fwd", int(fg))
    got = {r["event_id"]: (r["direction"], r["gap_s"])
           for r in registry["q162_join_asof_nearest"]
           .fn(spark, SF_SMALL).collect()}
    assert got == want


def test_hrw_minimal_disruption(spark, registry):
    """q164: removing the last shard must move ONLY that shard's
    docs (n_moved_improperly == 0 everywhere) and every doc lands on
    exactly one shard."""
    rows = registry["q164_shard_rendezvous"].fn(spark, SF_SMALL).collect()
    assert all(r["n_moved_improperly"] == 0 for r in rows)
    n_docs = (load_table(spark, SF_SMALL, "documents").count())
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert len(rows) == 8  # every shard gets traffic at this size


def test_bpe_pairs_match_bruteforce(spark, registry):
    """q163 vs a python Counter over the corpus."""
    from collections import Counter
    texts = [r["text"] for r in
             load_table(spark, SF_SMALL, "documents")
             .filter(F.col("text").isNotNull()).collect()]
    cnt = Counter()
    for t in texts:
        for w in t.split(" "):
            for i in range(len(w) - 1):
                cnt[w[i:i + 2]] += 1
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [(r["pair"], r["cnt"]) for r in
           registry["q163_bpe_pair_counts"].fn(spark, SF_SMALL).collect()]
    assert got == want


def test_eval_metrics_consistency(spark, registry):
    """q165: tp <= min(n_true, n_pred); micro-averaged recall over
    classes == overall accuracy of q56's predictions."""
    rows = registry["q165_eval_confusion_metrics"].fn(
        spark, SF_SMALL).collect()
    assert all(r["tp"] <= min(r["n_true"], r["n_pred"]) for r in rows)
    n_correct = sum(r["tp"] for r in rows)
    n_total = sum(r["n_true"] for r in rows)
    preds = registry["q56_text_langid"].fn(spark, SF_SMALL)
    assert n_correct == preds.agg(F.sum("is_correct")).first()[0]
    assert n_total == preds.count()


def test_binary_file_source_verified(spark, registry):
    row = (registry["s21_binary_file_source"]
           .fn(spark, SF_SMALL).collect()[0])
    assert row["all_match"] and row["glob_pruned"]
    assert row["n_files_verified"] == row["n_files_written"]


def test_rolling_distinct_kernels_agree(spark, registry):
    """Delta sweep must equal contribution expansion row-for-row —
    two independent kernels, one truth. Since optimization round 11
    the DECLARED q100/q166 both route through the delta kernel, so
    the expansion side is exercised here via its operator function
    (operators/rolling) — the cross-check is unchanged."""
    from hearthstats_spark.operators.rolling import \
        rolling_distinct_expansion

    from hearthstats_spark.io import load_table

    k = ["win_end_hour", "event_type", "users_24h"]
    a = rolling_distinct_expansion(
        load_table(spark, SF_SMALL, "events")).select(k)
    b = registry["q166_rolling_distinct_delta"].fn(spark, SF_SMALL).select(k)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    assert a.count() > 0


def test_largest_remainder_allocation_invariants(spark, registry):
    """q169: allocations sum to EXACTLY the budget, and every
    nation's allocation is within 1 unit of its exact share."""
    from decimal import Decimal
    rows = registry["q169_largest_remainder_alloc"].fn(
        spark, SF_SMALL).collect()
    assert sum(r["alloc"] for r in rows) == 1_000_000
    o = load_table(spark, SF_SMALL, "orders")
    c = load_table(spark, SF_SMALL, "customer")
    n = load_table(spark, SF_SMALL, "nation")
    rev = {r["n_name"]: Decimal(str(r["r"])) for r in
           (o.join(c, F.col("o_custkey") == F.col("c_custkey"))
            .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
            .groupBy("n_name")
            .agg(F.sum(F.col("o_totalprice").cast("decimal(28,4)"))
                 .alias("r"))).collect()}
    tot = sum(rev.values())
    for r in rows:
        exact = rev[r["n_name"]] * 1_000_000 / tot
        assert abs(Decimal(r["alloc"]) - exact) < 1


def test_kanonymity_audit_matches_bruteforce(spark, registry):
    from collections import Counter
    row = registry["q170_kanonymity_audit"].fn(
        spark, SF_SMALL).collect()[0]
    o = load_table(spark, SF_SMALL, "orders")
    c = load_table(spark, SF_SMALL, "customer")
    qi = (o.join(c, F.col("o_custkey") == F.col("c_custkey"))
          .select("c_nationkey", "o_orderpriority",
                  F.date_format(F.date_trunc("month", "o_orderdate"),
                                "yyyy-MM").alias("m")).collect())
    sizes = Counter((r["c_nationkey"], r["o_orderpriority"], r["m"])
                    for r in qi)
    assert row["n_classes"] == len(sizes)
    assert row["n_violating_classes"] == sum(
        1 for v in sizes.values() if v < 5)
    assert row["n_rows_at_risk"] == sum(
        v for v in sizes.values() if v < 5)
    assert row["n_rows"] == sum(sizes.values())


def test_share_of_parent_sums(spark, registry):
    """q171: nation shares sum to 1 within each region, region
    shares sum to 1 at the root, and the root's share is 1.0 —
    up to the declared 4dp rounding (n_children · 5e-5 slack)."""
    rows = registry["q171_share_of_parent"].fn(spark, SF_SMALL).collect()
    root = [r for r in rows if r["region"] == "TOTAL"]
    assert len(root) == 1 and root[0]["share_of_parent"] == 1.0
    regions = [r for r in rows
               if r["region"] != "TOTAL" and r["nation"] == "*"]
    leaves = defaultdict(list)
    for r in rows:
        if r["region"] != "TOTAL" and r["nation"] != "*":
            leaves[r["region"]].append(r["share_of_parent"])
    assert abs(sum(r["share_of_parent"] for r in regions) - 1.0) \
        <= len(regions) * 5e-5
    for reg, shares in leaves.items():
        assert abs(sum(shares) - 1.0) <= len(shares) * 5e-5, reg


def test_weighted_jaccard_matches_bruteforce(spark, registry):
    """q172 vs a python Counter-based multiset Jaccard over all
    pairs (feasible at sf0.001)."""
    from collections import Counter
    docs = {r["doc_id"]: r["text"].split(" ")
            for r in load_table(spark, SF_SMALL, "documents")
            .filter(F.col("text").isNotNull()).collect()}
    bags = {}
    for did, t in docs.items():
        if len(t) < 3:
            continue
        bags[did] = Counter(" ".join(t[i:i + 3])
                            for i in range(len(t) - 2))
    ids = sorted(bags)
    want = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = sum((bags[a] & bags[b]).values())
            ta, tb = sum(bags[a].values()), sum(bags[b].values())
            if 5 * inter >= 3 * (ta + tb - inter):
                want.add((a, b))
    got = {(r["id_a"], r["id_b"]) for r in
           registry["q172_dedup_weighted_jaccard"]
           .fn(spark, SF_SMALL).collect()}
    assert got == want and len(got) > 0


def test_stratified_split_exact_proportions(spark, registry):
    """q174: test count per stratum is EXACTLY floor(n*0.2) and
    train+test == n."""
    rows = registry["q174_split_stratified_exact"].fn(
        spark, SF_SMALL).collect()
    per = defaultdict(dict)
    for r in rows:
        per[r["lang"]][r["split"]] = r["n_docs"]
    assert per
    for lang, d in per.items():
        n = d.get("train", 0) + d.get("test", 0)
        assert d.get("test", 0) == (n * 20) // 100, (lang, d)


def test_token_drift_tv_bruteforce(spark, registry):
    from collections import Counter
    from fractions import Fraction
    row = registry["q173_token_drift_tv"].fn(spark, SF_SMALL).collect()[0]
    docs = load_table(spark, SF_SMALL, "documents").filter(
        F.col("text").isNotNull()).select("doc_id", "text").collect()
    c0, c1 = Counter(), Counter()
    for r in docs:
        (c0 if r["doc_id"] % 2 == 0 else c1).update(r["text"].split(" "))
    n0, n1 = sum(c0.values()), sum(c1.values())
    s = sum(abs(c0[t] * n1 - c1[t] * n0) for t in set(c0) | set(c1))
    tv = Fraction(s, 2 * n0 * n1)
    assert row["n_tokens_a"] == n0 and row["n_tokens_b"] == n1
    assert row["vocab"] == len(set(c0) | set(c1))
    got = Fraction(row["tv_millionths_floor"]) + Fraction(
        row["tv_frac_part"]).limit_denominator(2 * n0 * n1)
    assert got == tv
    assert 0 <= tv < 1


def test_ks_two_sample_bruteforce(spark, registry):
    """q176 vs scipy-free python KS over collected orders."""
    from fractions import Fraction
    row = registry["q176_ks_two_sample"].fn(spark, SF_SMALL).collect()[0]
    rows = load_table(spark, SF_SMALL, "orders").select(
        "o_totalprice", "o_orderpriority").collect()
    s0 = sorted(r["o_totalprice"] for r in rows
                if r["o_orderpriority"] == "1-URGENT")
    s1 = sorted(r["o_totalprice"] for r in rows
                if r["o_orderpriority"] != "1-URGENT")
    n0, n1 = len(s0), len(s1)
    import bisect
    vals = sorted(set(s0) | set(s1))
    dnum = max(abs(bisect.bisect_right(s0, v) * n1
                   - bisect.bisect_right(s1, v) * n0) for v in vals)
    assert (row["n_urgent"], row["n_other"]) == (n0, n1)
    assert row["d_numerator"] == dnum
    assert Fraction(row["ks_d"]).limit_denominator(n0 * n1) \
        == Fraction(dnum, n0 * n1)


def test_srm_check_balanced(spark, registry):
    row = registry["q175_srm_check"].fn(spark, SF_SMALL).collect()[0]
    n = row["n_arm0"] + row["n_arm1"]
    assert n == (load_table(spark, SF_SMALL, "events")
                 .select("user_id").distinct().count())
    # a hash split of real users must not trip its own guardrail
    assert not row["srm_flag"]
    assert row["chi2"] == round(
        (row["n_arm0"] - row["n_arm1"]) ** 2 / n, 4)
