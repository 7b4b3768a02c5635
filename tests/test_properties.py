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
