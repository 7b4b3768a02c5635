"""q84 HLL sketch rollup: accuracy and merge-losslessness (the two
properties that make the sketch pattern safe at 100 TB; no DuckDB
oracle exists because estimates are implementation-specific)."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def test_hll_rollup_accuracy(spark, registry):
    rows = registry["q84_sketch_hll_rollup"].fn(spark, SF).collect()
    assert len(rows) == 5  # one per region
    for r in rows:
        assert r["exact_distinct"] > 0
        # default lgConfigK=12 → ~1.6% relative standard error
        assert r["rel_err"] < 0.02, (r["r_name"], r["rel_err"])


def test_hll_merge_equals_direct_sketch(spark):
    """union(per-nation sketches) must estimate EXACTLY what a single
    region-level sketch estimates — HLL merge is lossless
    (register-wise max), which is why rollups compose."""
    from hearthstats_spark.io import load_table
    from hearthstats_spark.queries.sketches import hll_rollup

    c = load_table(spark, SF, "customer")
    n = load_table(spark, SF, "nation")
    cn = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)

    merged = {
        r["n_regionkey"]: r["est_distinct"]
        for r in hll_rollup(cn, ["n_regionkey", "n_nationkey"],
                            ["n_regionkey"], "c_custkey").collect()
    }
    direct = {
        r["n_regionkey"]: r["est"]
        for r in cn.groupBy("n_regionkey")
        .agg(F.hll_sketch_estimate(
            F.hll_sketch_agg("c_custkey")).alias("est"))
        .collect()
    }
    assert merged == direct


def test_partitioned_layout_sink(spark, registry):
    row = registry["s10_partitioned_layout"].fn(spark, SF).collect()[0]
    assert row["pruning_pushed"], "partition filter not pushed to scan"
    assert row["n_f_zeroed"] == row["n_f"]
    assert row["other_partitions_untouched"]
    assert row["total_preserved"]


def test_compaction_preserves_content(spark, registry):
    """s12: compaction must be a pure layout change — fewer files,
    same rows, identical order-independent content digest."""
    row = registry["s12_compaction"].fn(spark, SF).collect()[0]
    assert row["files_before"] > row["files_after"]
    assert row["files_after"] == row["files_budgeted"]
    assert row["rows_preserved"] and row["content_digest_equal"]


def test_hll_window_rollup_error_bound_vs_exact(spark, registry):
    """q151's sketch-merge sliding windows vs q100's exact expansion:
    same window set, and every estimate within HLL lgK=12 error bands
    (theoretical RSE ~1.04/sqrt(2^12) ≈ 1.6%; assert a generous 5%
    plus an absolute slack of 2 for tiny counts)."""
    est = {(r["win_end_hour"], r["event_type"]): r["est_users_24h"]
           for r in registry["q151_hll_window_rollup"]
           .fn(spark, SF).collect()}
    exact = {(r["win_end_hour"], r["event_type"]): r["users_24h"]
             for r in registry["q100_rolling_distinct"]
             .fn(spark, SF).collect()}
    assert set(est) == set(exact)  # identical window grid
    worst = 0.0
    for k, e in est.items():
        x = exact[k]
        err = abs(e - x) / x
        worst = max(worst, err)
        assert abs(e - x) <= max(2, 0.05 * x), (k, e, x)
    # the sketch must also be USEFUL, not vacuous: sub-1% typical
    assert worst < 0.05
