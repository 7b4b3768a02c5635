"""Property-based tests (hypothesis): the custom operators against
independent references on randomized inputs — edge shapes a
hand-written fixture won't cover (duplicate timestamps, empty sides,
all-one-key, reference-after-every-probe).

Example counts are small: each example pays Spark job overhead, and
the properties are about structural correctness, not statistical
coverage.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hearthstats_spark.operators.asof import asof_join

_ROWS = st.lists(
    st.tuples(st.integers(0, 2),        # key
              st.integers(0, 50),       # ts
              st.integers(0, 999)),     # payload tag
    min_size=0, max_size=12,
)

_SETTINGS = settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(probe=_ROWS, ref=_ROWS)
@_SETTINGS
def test_asof_matches_pandas_merge_asof(spark, probe, ref):
    probe_pd = (pd.DataFrame(probe, columns=["k", "ts", "pv"])
                .astype("int64").drop_duplicates(["k", "ts"]))
    ref_pd = (pd.DataFrame(ref, columns=["k", "ts", "rv"])
              .astype("int64").drop_duplicates(["k", "ts"]))

    left = spark.createDataFrame(probe_pd.itertuples(index=False),
                                 "k long, ts long, pv long") \
        if len(probe_pd) else spark.createDataFrame([], "k long, ts long, pv long")
    right = spark.createDataFrame(ref_pd.itertuples(index=False),
                                  "k long, ts long, rv long") \
        if len(ref_pd) else spark.createDataFrame([], "k long, ts long, rv long")

    got_df = asof_join(left, right, on=["k"], right_cols=["rv"])
    got = {(r["k"], r["ts"]): r["rv"] for r in got_df.collect()}

    if len(probe_pd) and len(ref_pd):
        want_df = pd.merge_asof(
            probe_pd.sort_values(["ts", "k"]),
            ref_pd.sort_values(["ts", "k"]),
            on="ts", by="k", direction="backward",
        )
    else:
        want_df = probe_pd.assign(rv=None)
    want = {
        (r.k, r.ts): (None if pd.isna(r.rv) else int(r.rv))
        for r in want_df.itertuples()
    }
    assert got == want


@given(rows=st.lists(st.tuples(st.integers(0, 5), st.integers(0, 10)),
                     min_size=1, max_size=20))
@_SETTINGS
def test_salted_join_always_equals_plain(spark, rows):
    from hearthstats_spark.operators.skew import salted_join

    probe = spark.createDataFrame(rows, "k long, payload long")
    build = spark.createDataFrame([(i, f"d{i}") for i in range(0, 6, 2)],
                                  "k long, name string")
    got = sorted(map(tuple, salted_join(probe, build, ["k"]).collect()))
    want = sorted(map(tuple, probe.join(build, ["k"]).collect()))
    assert got == want


_VALS = st.lists(
    st.tuples(st.integers(0, 10_000),          # unique-ish id
              st.floats(-1e6, 1e6, allow_nan=False, width=32)),
    min_size=1, max_size=40, unique_by=lambda t: t[0],
)


@given(rows=_VALS, n_buckets=st.integers(1, 5),
       boundaries=st.sampled_from(["quantile", "uniform"]))
@_SETTINGS
def test_global_position_matches_sorted_order(spark, rows, n_buckets,
                                              boundaries):
    """with_global_position must equal the plain sorted position for
    ANY value distribution, bucket count, and boundary strategy —
    including duplicate order values (tiebreak column),
    single-bucket, all-equal values, and more buckets than rows."""
    from hearthstats_spark.operators.rankops import with_global_position

    df = spark.createDataFrame(rows, "id long, v double")
    got_df, n = with_global_position(df, "v", tiebreak=["id"],
                                     n_buckets=n_buckets,
                                     boundaries=boundaries)
    got = {r["id"]: r["__pos"] for r in got_df.collect()}
    want = {rid: i + 1
            for i, (rid, _) in enumerate(sorted(rows, key=lambda t: (t[1], t[0])))}
    assert n == len(rows)
    assert got == want


@given(rows=st.lists(
    st.tuples(st.integers(0, 10_000),           # unique order key
              st.integers(0, 1_000)),           # integer measure
    min_size=1, max_size=40, unique_by=lambda t: t[0],
), n_buckets=st.integers(1, 5),
    boundaries=st.sampled_from(["quantile", "uniform"]))
@_SETTINGS
def test_global_prefix_sum_matches_sequential(spark, rows, n_buckets,
                                              boundaries):
    """with_global_prefix_sum must equal the sequential running sum
    for ANY distribution, bucket count, and boundary strategy —
    including single-bucket, all-equal keys' measures, and more
    buckets than rows (integer measures: sums must be EXACT)."""
    from hearthstats_spark.operators.rankops import with_global_prefix_sum

    df = spark.createDataFrame(rows, "id long, m long")
    got_df, total = with_global_prefix_sum(
        df, "id", "m", n_buckets=n_buckets, boundaries=boundaries)
    got = {r["id"]: r["__cum"] for r in got_df.collect()}
    want, acc = {}, 0
    for rid, m in sorted(rows):
        acc += m
        want[rid] = acc
    assert total == acc
    assert got == want


@given(rows=st.lists(
    st.tuples(st.integers(0, 10_000),           # unique order key
              st.integers(0, 1_000),            # measure a
              st.integers(0, 1_000)),           # measure b
    min_size=1, max_size=40, unique_by=lambda t: t[0],
), n_buckets=st.integers(1, 5),
    boundaries=st.sampled_from(["quantile", "uniform"]))
@_SETTINGS
def test_global_prefix_sums_multi_measure(spark, rows, n_buckets,
                                          boundaries):
    """with_global_prefix_sums (the multi-measure kernel q176's
    two-sided CDF uses) must equal the per-measure sequential running
    sums — both cumulative columns from ONE bucketing pass agree with
    independent single-measure computation for any distribution."""
    from hearthstats_spark.operators.rankops import \
        with_global_prefix_sums

    df = spark.createDataFrame(rows, "id long, a long, b long")
    got_df, totals = with_global_prefix_sums(
        df, "id", ["a", "b"], n_buckets=n_buckets,
        cum_cols=["ca", "cb"], boundaries=boundaries)
    got = {r["id"]: (r["ca"], r["cb"]) for r in got_df.collect()}
    want, acc_a, acc_b = {}, 0, 0
    for rid, a, b in sorted(rows):
        acc_a += a
        acc_b += b
        want[rid] = (acc_a, acc_b)
    assert totals == [acc_a, acc_b]
    assert got == want


@given(rows=st.lists(
    st.tuples(st.integers(0, 10_000),           # unique order key
              st.integers(-50, 50)),            # integer measure
    min_size=1, max_size=40, unique_by=lambda t: t[0],
), n_buckets=st.integers(1, 5), strict=st.booleans())
@_SETTINGS
def test_global_running_max_matches_sequential(spark, rows, n_buckets,
                                               strict):
    """with_global_running_max must equal the sequential running max
    for ANY distribution and bucket count — including single-bucket,
    more buckets than rows, and both strict (exclusive, NULL first
    row) and inclusive modes."""
    from hearthstats_spark.operators.rankops import with_global_running_max

    df = spark.createDataFrame(rows, "id long, m long")
    got_df = with_global_running_max(df, "id", "m", n_buckets=n_buckets,
                                     out_col="rm", strict=strict)
    got = {r["id"]: r["rm"] for r in got_df.collect()}
    want, acc = {}, None
    for rid, m in sorted(rows):
        if strict:
            want[rid] = acc
            acc = m if acc is None else max(acc, m)
        else:
            acc = m if acc is None else max(acc, m)
            want[rid] = acc
    assert got == want


@given(rows=st.lists(
    st.tuples(st.integers(0, 10_000),
              st.lists(st.floats(0.125, 8.0, allow_nan=False),
                       min_size=4, max_size=4)),
    min_size=2, max_size=24, unique_by=lambda t: t[0],
), chunk=st.integers(1, 8))
@_SETTINGS
def test_chunked_topk_matches_numpy_bruteforce(spark, rows, chunk):
    """chunked_topk_pairs (the q50 kernel) must reproduce the exact
    numpy all-pairs top-k for any chunking — single chunk, chunk
    bigger than data, chunk=1 (every row its own task group)."""
    import numpy as np

    from hearthstats_spark.operators.similarity import chunked_topk_pairs

    df = spark.createDataFrame(rows, "id long, emb array<double>")
    k = 5
    got = [(r["id_a"], r["id_b"], r["sim"]) for r in
           chunked_topk_pairs(df, "id", "emb", k=k,
                              rows_per_chunk=chunk).collect()]

    ids = np.array([r[0] for r in rows])
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    nrm = np.sqrt((mat * mat).sum(axis=1))
    sims = np.round((mat @ mat.T) / np.outer(nrm, nrm), 4)
    pairs = [(int(min(ids[i], ids[j])), int(max(ids[i], ids[j])),
              float(sims[i, j]))
             for i in range(len(ids)) for j in range(i + 1, len(ids))]
    want = sorted(pairs, key=lambda t: (-t[2], t[0], t[1]))[:k]
    assert got == want


@given(docs=st.lists(st.lists(st.sampled_from(["a", "b", "c"]),
                              min_size=1, max_size=6),
                     min_size=0, max_size=8))
@_SETTINGS
def test_prefix_jaccard_matches_bruteforce(spark, docs):
    """prefix_filtered_jaccard_pairs (the q83 kernel) must equal the
    all-pairs exact Jaccard for ANY corpus — the prefix filter is a
    candidate-pruning step that may never drop a qualifying pair.
    Tiny vocab forces heavy shingle sharing (hot-shingle suffixes),
    short docs hit the truncated-shingle (n < k) path."""
    from hearthstats_spark.operators.dedup import (
        prefix_filtered_jaccard_pairs,
    )

    k, tn, td = 2, 1, 2

    def shingle_set(tokens):
        return {" ".join(tokens[i:i + k])
                for i in range(max(len(tokens) - k, 0) + 1)}

    sets = [shingle_set(d) for d in docs]
    want = {}
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            inter = len(sets[i] & sets[j])
            un = len(sets[i] | sets[j])
            if td * inter >= tn * un:
                want[(i, j)] = round(inter / un, 4)

    schema = "doc_id long, text string"
    rows = [(i, " ".join(d)) for i, d in enumerate(docs)]
    df = (spark.createDataFrame(rows, schema) if rows
          else spark.createDataFrame([], schema))
    got = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in prefix_filtered_jaccard_pairs(
               df, "doc_id", "text", k=k, t_num=tn, t_den=td).collect()}
    assert got == want


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(edges=st.sets(
    st.tuples(st.integers(0, 14), st.integers(0, 14)).filter(
        lambda e: e[0] != e[1]),
    min_size=1, max_size=40))
def test_pagerank_iterations_match_numpy(spark, edges):
    """The Spark PageRank loop (decimal-summed contributions) must
    match a dense numpy reference to float tolerance on arbitrary
    small graphs — same damping, same 1.0 init, same 4 iterations."""
    import numpy as np
    from pyspark.sql import functions as F

    und = {(min(a, b), max(a, b)) for a, b in edges}
    e = spark.createDataFrame(sorted(und), "a int, b int")
    u = (e.select(F.col("a").alias("src"), F.col("b").alias("dst"))
         .unionAll(e.select(F.col("b").alias("src"),
                            F.col("a").alias("dst"))))
    deg = u.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    ud = u.join(deg, "src")
    ranks = deg.select(F.col("src").alias("node"),
                       F.lit(1.0).alias("rank"))
    for _ in range(4):
        contrib = ud.join(ranks, ud.src == ranks.node).select(
            "dst",
            (F.col("rank") / F.col("d")).cast("decimal(28,12)").alias("c"))
        ranks = (contrib.groupBy("dst")
                 .agg((F.lit(0.15) + F.lit(0.85)
                       * F.sum("c").cast("double")).alias("rank"))
                 .select(F.col("dst").alias("node"), "rank"))
    got = {r["node"]: r["rank"] for r in ranks.collect()}

    nodes = sorted({n for p in und for n in p})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    adj = np.zeros((n, n))
    for a, b in und:
        adj[idx[a], idx[b]] = adj[idx[b], idx[a]] = 1
    d = adj.sum(axis=1)
    r = np.ones(n)
    for _ in range(4):
        r = 0.15 + 0.85 * adj.T @ (r / d)
    for node in nodes:
        assert abs(got[node] - r[idx[node]]) < 1e-6, (node, got[node],
                                                      r[idx[node]])


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=st.lists(
    st.tuples(st.integers(0, 2),        # user
              st.integers(0, 50_000)),  # offset seconds
    min_size=1, max_size=60, unique=True))
def test_sessionize_lag_matches_sequential(spark, rows):
    """Lag+cumsum sessionization must agree with a sequential sweep:
    same 30-min gap rule, same per-session event counts."""
    import datetime as dt

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    base = dt.datetime(2024, 1, 1)
    data = [(i, u, base + dt.timedelta(seconds=s))
            for i, (u, s) in enumerate(sorted(rows))]
    df = spark.createDataFrame(data, "event_id long, user_id long, ts timestamp")

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = (F.unix_micros("ts")
             - F.unix_micros(F.lag("ts").over(w))) / 1000000
    marked = df.withColumn(
        "is_start",
        F.when(F.lag("ts").over(w).isNull()
               | (gap_s.cast("long") > 1800), 1).otherwise(0))
    wsum = (Window.partitionBy("user_id").orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0))
    sess = marked.withColumn("session_no", F.sum("is_start").over(wsum))
    got = {
        (r["user_id"], r["session_no"]): r["n"]
        for r in sess.groupBy("user_id", "session_no")
        .agg(F.count(F.lit(1)).alias("n")).collect()
    }

    expect: dict[tuple[int, int], int] = {}
    by_user: dict[int, list[dt.datetime]] = {}
    for _, u, ts in data:
        by_user.setdefault(u, []).append(ts)
    for u, tss in by_user.items():
        tss.sort()
        sno, prev = 0, None
        for ts in tss:
            if prev is None or (ts - prev).total_seconds() > 1800:
                sno += 1
            expect[(u, sno)] = expect.get((u, sno), 0) + 1
            prev = ts
    assert got == expect
