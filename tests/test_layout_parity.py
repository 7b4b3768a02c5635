"""Layout-parity harness pin (round 9): the full sf0.1 run lives in
scripts/check_layout_parity.py (193/193 recorded in ROUND9_NOTES);
this is its fast regression lane at sf0.001 — the manifest routing,
partition-column drop, bucketed catalog reads, and a representative
query slice must stay hash-identical to the flat corpus, and the
plan evidence must keep its shape.
"""

from __future__ import annotations

import importlib.util
import os
import re

import pytest

from hearthstats_spark.io import load_table
from hearthstats_spark.oracle import compare
from hearthstats_spark.plans import explain_str
from tests.conftest import SF_SMALL

_SPEC = importlib.util.spec_from_file_location(
    "check_layout_parity",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "scripts", "check_layout_parity.py"))
_MOD = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(_MOD)

#: one query per plan family that the layout must not disturb:
#: bucketed-key agg+join (q123), dim join (q05), window (q25),
#: partitioned-events time window (q41), text/dedup (q83)
SLICE = ("q123_mom_growth", "q05_join_inner", "q25_win_topk",
         "q41_win_tumbling", "q83_dedup_jaccard_exact")


@pytest.fixture(scope="module")
def layout_sf(spark, tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("layout_sf0001"))
    _MOD.build_layout(spark, SF_SMALL, dst)
    _MOD.create_bucketed_tables(spark, SF_SMALL)
    yield dst
    for name in _MOD.BUCKETED:
        spark.sql(f"DROP TABLE IF EXISTS layout_{name}_b")


def test_layout_schema_identical(spark, layout_sf):
    """Every table served from the layout has the flat corpus's exact
    schema (partition helper columns dropped, bucketed tables routed
    through the catalog)."""
    from hearthstats_spark.io import TABLES

    for t in TABLES:
        flat = load_table(spark, SF_SMALL, t)
        lay = load_table(spark, layout_sf, t)
        assert lay.schema == flat.schema, t
        assert lay.count() == flat.count(), t


@pytest.mark.parametrize("qid", SLICE)
def test_layout_parity_slice(spark, registry, layout_sf, qid,
                             monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_ANN_CACHE", "0")
    q = registry[qid]
    res = compare(qid, q.fn(spark, SF_SMALL).toPandas(),
                  q.fn(spark, layout_sf).toPandas())
    assert res.ok, str(res)


def test_layout_plan_evidence(spark, registry, layout_sf):
    """q123 on the bucketed layout: both facts read bucket-locally
    and no orderkey-level Exchange survives (the pre-agg key == the
    bucket key == the join key)."""
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p = explain_str(registry["q123_mom_growth"].fn(spark, layout_sf))
        n = _MOD.N_BUCKETS
        assert len(re.findall(
            rf"SelectedBucketsCount: {n} out of {n}", p)) >= 2
        assert "hashpartitioning(l_orderkey" not in p
        assert "hashpartitioning(o_orderkey" not in p
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
