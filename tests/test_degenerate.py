"""Degenerate-corpus equivalence pins (scripts/audit_degenerate.py).

The empty corpus is the universal degenerate input: every slice,
filter, and batch predicate produces 0 rows at once, so the latent
engine/oracle asymmetries the sf corpora can never reach (ADVICE r6
item 4's class) all fire together. The round-7 audit over all 193
oracle-checked queries found 9; the 5 in round-7-editable files were
fixed then, and round 8 landed the remaining window-frozen patches
(q18/q19/q20 rollup-family grand-total row, q122's width-0 histogram
lane, q89's zero-filled prefix measure, the multimodal NULL-payload
guards, q50/q51/q77's null-vector/null-key declarations, q177's
empty-sketch guard) — ALL degenerate findings across every audit
mode are now fixed and pinned here. q68's fix landed via the
untracked operators/expectations.py.
"""

from __future__ import annotations

import importlib.util
import os

import pytest

FIXED = [
    "q171_share_of_parent",   # oracle HAVING: no SQL grand-total row
    "q173_token_drift_tv",    # engine: vocab scalar survives empty c
    "q176_ks_two_sample",     # oracle COALESCE: totals are 0 not NULL
    "q193_vocab_coverage",    # engine: no all-null ladder on empty
    "q200_budget_curation",   # engine: no zero-selection row
    "q68_data_audit",         # operators/expectations: count(when),
                              # not sum(when) — 0 not NULL on empty
    # round-8 batch (the window-frozen r7 findings):
    "q18_agg_rollup",         # oracle HAVING COUNT(*)>0: Spark rollup
    "q19_agg_cube",           # / cube / grouping-sets emit no grand-
    "q20_agg_groupingsets",   # total row on empty input, SQL does
    "q122_histogram_price",   # width=0 CASE declared on both sides
    "q89_shard_pack",         # zero-filled prefix measure (n_tok0)
    "q50_sim_topk",           # null vector/key excluded both engines
    "q51_sim_threshold",      # (declared family policy, see llm.py
    "q77_dedup_embedding",    # _COS_ORACLE_CTE note)
]


@pytest.fixture(scope="module", params=[0, 1],
                ids=["empty", "one-row"])
def degenerate_sf(request, tmp_path_factory):
    """rows=0: every lane empty at once. rows=1: the ONE-SIDED class
    (a group/half with zero rows, zero denominators) that empty
    tables cannot reach — the --rows 1 audit found ANSI
    divide-by-zero crashes the empty audit missed."""
    spec = importlib.util.spec_from_file_location(
        "audit_degenerate",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scripts", "audit_degenerate.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    dst = str(tmp_path_factory.mktemp(f"degen_sf_{request.param}"))
    mod.make_empty_sf(dst, rows=request.param)
    return dst


@pytest.mark.parametrize("qid", FIXED)
def test_degenerate_corpus_matches_oracle(spark, registry, degenerate_sf,
                                          qid, monkeypatch):
    from hearthstats_spark.oracle import compare, duck_connect

    # hermetic: the persisted store must not serve artifacts built
    # from another corpus (fingerprints differ per tmp dir anyway)
    monkeypatch.setenv("SPARK_GRAFT_ANN_CACHE", "0")
    q = registry[qid]
    con = duck_connect(degenerate_sf)
    res = compare(qid, q.fn(spark, degenerate_sf).toPandas(),
                  con.execute(q.oracle).fetchdf())
    assert res.ok, str(res)


#: rows-only ops whose empty-source crashes were fixed this round —
#: the smoke pins exist so a revert of any of the three fixes (s09's
#: max-key fallback, s10's explicit read schema, s19's sentinel
#: epoch) fails a test instead of silently restoring the crash
FIXED_ROWS_ONLY = [
    "s09_merge_upsert",
    "s10_partitioned_layout",
    "s19_stream_stream_left_outer",
    "q177_ks_sketch_drift",   # r8: empty GK sketch is NULL, not a
                              # list — degrade to "no cuts", don't
                              # crash sorting None
]


@pytest.mark.parametrize("sid", FIXED_ROWS_ONLY)
def test_rows_only_survives_degenerate_corpus(spark, registry,
                                              degenerate_sf, sid,
                                              monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_ANN_CACHE", "0")
    # must not raise; row COUNT is the op's own self-verifying
    # business (rows-only contract), only crash-freedom is pinned
    registry[sid].fn(spark, degenerate_sf).count()


def _audit_mod():
    spec = importlib.util.spec_from_file_location(
        "audit_degenerate",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scripts", "audit_degenerate.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


#: All-null-column class (audit --rows -1 --null-text): NULL payloads
#: into Pandas UDF kernels, null-vs-empty-digest merges, offsets over
#: null measures. q59 (r7): a NULL text must yield a NULL fingerprint
#: on both engines — Spark's concat_ws used to SKIP the null shingle
#: array, md5-ing the empty string and merging null docs with
#: genuinely empty-shingle docs while SQL's md5(NULL) kept them
#: apart. Round 8 adds q89 (zero-filled prefix measure) and the
#: multimodal four (kernels emit NULL stats for a NULL payload;
#: oracles CASE the payload-derived columns instead of falling back
#: to metadata).
FIXED_NULL_TEXT = [
    "q59_fingerprint",
    "q89_shard_pack",
    "q62_multimodal_decode",
    "q65_multimodal_frames",
    "q71_multimodal_features",
    "q72_multimodal_resize",
]

#: Vector-table axis (audit --rows -1 --null-embedding): the declared
#: q50/q51/q77 policy — a NULL embedding is not an indexable vector
#: and a NULL vec_id is not a joinable key; excluded at the engine's
#: load edge (llm._indexable) and in the shared oracle CTE.
FIXED_NULL_EMBEDDING = [
    "q50_sim_topk",
    "q51_sim_threshold",
    "q77_dedup_embedding",
]


@pytest.fixture(scope="module")
def null_text_sf(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("nulltext_sf"))
    _audit_mod().make_empty_sf(dst, rows=-1, null_text=True)
    return dst


@pytest.fixture(scope="module")
def null_embedding_sf(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("nullemb_sf"))
    _audit_mod().make_empty_sf(dst, rows=-1, null_embedding=True)
    return dst


@pytest.mark.parametrize("qid", FIXED_NULL_TEXT)
def test_null_text_matches_oracle(spark, registry, null_text_sf, qid,
                                  monkeypatch):
    from hearthstats_spark.oracle import compare, duck_connect

    monkeypatch.setenv("SPARK_GRAFT_ANN_CACHE", "0")
    q = registry[qid]
    res = compare(qid, q.fn(spark, null_text_sf).toPandas(),
                  duck_connect(null_text_sf).execute(q.oracle).fetchdf())
    assert res.ok, str(res)


@pytest.mark.parametrize("qid", FIXED_NULL_EMBEDDING)
def test_null_embedding_matches_oracle(spark, registry,
                                       null_embedding_sf, qid,
                                       monkeypatch):
    from hearthstats_spark.oracle import compare, duck_connect

    monkeypatch.setenv("SPARK_GRAFT_ANN_CACHE", "0")
    q = registry[qid]
    res = compare(
        qid, q.fn(spark, null_embedding_sf).toPandas(),
        duck_connect(null_embedding_sf).execute(q.oracle).fetchdf())
    assert res.ok, str(res)


#: Zero-variance axis (audit --rows -1 --constant-measures, new in
#: round 8). q47: pandas' two-pass std is a tiny NONZERO on a
#: constant group (one-ulp mean error) so every z-score was ±0.9975
#: garbage while SQL's exactly-zero Welford stddev NULLed them — the
#: kernel now declares "≤1 distinct value → no z-scores". q63:
#: Spark's built-in corr/regr_slope/regr_intercept CRASH under ANSI
#: on a zero-variance group; recomposed from crash-free moment
#: aggregates with a lazy zero-denominator CASE.
FIXED_CONSTANT_MEASURES = [
    "q47_udtf_grouped_map",
    "q63_agg_regression",
]


@pytest.fixture(scope="module")
def constant_measures_sf(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("constmeas_sf"))
    _audit_mod().make_empty_sf(dst, rows=-1, constant_measures=True)
    return dst


@pytest.mark.parametrize("qid", FIXED_CONSTANT_MEASURES)
def test_constant_measures_matches_oracle(spark, registry,
                                          constant_measures_sf, qid,
                                          monkeypatch):
    from hearthstats_spark.oracle import compare, duck_connect

    monkeypatch.setenv("SPARK_GRAFT_ANN_CACHE", "0")
    q = registry[qid]
    res = compare(
        qid, q.fn(spark, constant_measures_sf).toPandas(),
        duck_connect(constant_measures_sf).execute(q.oracle).fetchdf())
    assert res.ok, str(res)


#: Multi-byte UTF-8 axis (audit --rows -1 --unicode-text, new in
#: round 8). The multimodal family treats the payload as UTF-8 BYTES
#: (string→binary cast; len/indexing/bincount over bytes) but its
#: oracles approximated bytes with CHARACTER functions (n_chars,
#: unicode(first char), per-char histogram) — identical on the
#: all-ASCII shipped corpora, divergent on any multi-byte text. The
#: oracles are now genuinely byte-level (hex(encode(text)) pairs),
#: pinned here on the unicode corpus. Everything else in the text
#: family came back clean on first run (189/193 PASS).
FIXED_UNICODE_TEXT = [
    "q62_multimodal_decode",
    "q65_multimodal_frames",
    "q71_multimodal_features",
    "q72_multimodal_resize",
]


@pytest.fixture(scope="module")
def unicode_text_sf(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("unicode_sf"))
    _audit_mod().make_empty_sf(dst, rows=-1, unicode_text=True)
    return dst


@pytest.mark.parametrize("qid", FIXED_UNICODE_TEXT)
def test_unicode_text_matches_oracle(spark, registry, unicode_text_sf,
                                     qid, monkeypatch):
    from hearthstats_spark.oracle import compare, duck_connect

    monkeypatch.setenv("SPARK_GRAFT_ANN_CACHE", "0")
    q = registry[qid]
    res = compare(
        qid, q.fn(spark, unicode_text_sf).toPandas(),
        duck_connect(unicode_text_sf).execute(q.oracle).fetchdf())
    assert res.ok, str(res)


#: Mixed-sign axis (audit --rows -1 --negated-measures, new in round
#: 8 — the refunds/returns-day corpus). q133: leading-digit
#: extraction hit the '-' sign (ANSI cast abort) — Benford now
#: screens magnitudes (ABS both sides). q36: sqrt/ln/log10 of a
#: negative price was Spark-NaN vs DuckDB-ABORT — domains declared
#: (NULL on both engines). q97 (and latently every davg/favg_sql
#: user, q15 included): the unsigned mean kernel paired Spark's
#: floor + positive remainder with DuckDB's truncating HUGEINT
#: //-% — off by one rounding ulp on EVERY negative non-divisible
#: group sum; davg/favg_sql now delegate to the signed kernel,
#: bit-identical for the non-negative sums of every green corpus.
FIXED_NEGATED_MEASURES = [
    "q15_agg_pricing",
    "q36_math_funcs",
    "q97_gap_fill",
    "q133_benford_digits",
]


@pytest.fixture(scope="module")
def negated_measures_sf(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("negmeas_sf"))
    _audit_mod().make_empty_sf(dst, rows=-1, negated_measures=True)
    return dst


@pytest.mark.parametrize("qid", FIXED_NEGATED_MEASURES)
def test_negated_measures_matches_oracle(spark, registry,
                                         negated_measures_sf, qid,
                                         monkeypatch):
    from hearthstats_spark.oracle import compare, duck_connect

    monkeypatch.setenv("SPARK_GRAFT_ANN_CACHE", "0")
    q = registry[qid]
    res = compare(
        qid, q.fn(spark, negated_measures_sf).toPandas(),
        duck_connect(negated_measures_sf).execute(q.oracle).fetchdf())
    assert res.ok, str(res)


# the missing-data axis (--null-measures, round 8): every 3rd measure
# value NULL. Found the two NULL-ordering divergence families on
# first run — the rank kernel's NULLS FIRST vs DuckDB's bare-ASC
# NULLS LAST (q29/q116, fixed by DECLARING the order in the oracle)
# and statistical kernels silently ranking NULLs into quantile/ECDF/
# weight/interval positions (q150/q152/q158/q167/q176, fixed by the
# declared "a NULL measure is not a sample point" filter on BOTH
# engines). All seven are provable real-data no-ops (the shipped
# corpora have zero NULL measures — asserted by check_oracle ALL
# GREEN at sf0.01 after the change).
FIXED_NULL_MEASURES = [
    "q29_win_ntile",
    "q116_decile_lift",
    "q150_gini_concentration",
    "q152_interval_coverage",
    "q158_sample_pps",
    "q167_iqr_outliers",
    "q176_ks_two_sample",
]


@pytest.fixture(scope="module")
def null_measures_sf(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("nullmeas_sf"))
    _audit_mod().make_empty_sf(dst, rows=-1, null_measures=True)
    return dst


@pytest.mark.parametrize("qid", FIXED_NULL_MEASURES)
def test_null_measures_matches_oracle(spark, registry,
                                      null_measures_sf, qid,
                                      monkeypatch):
    from hearthstats_spark.oracle import compare, duck_connect

    monkeypatch.setenv("SPARK_GRAFT_ANN_CACHE", "0")
    q = registry[qid]
    res = compare(
        qid, q.fn(spark, null_measures_sf).toPandas(),
        duck_connect(null_measures_sf).execute(q.oracle).fetchdf())
    assert res.ok, str(res)


# the dirty-FK axis (--null-keys, round 8): every 3rd foreign-key
# value NULL (l_partkey / o_custkey / user_id; primary keys stay
# intact). Found one bug class on first run: Spark's window/groupBy
# treats NULL as ONE key (partition/group) while SQL equality
# predicates match NULL to NOTHING — so the union+window as-of
# kernel served NULL-user reference rows to NULL-user probes
# (q13/q109 via operators/asof.py, q138/q162 inline), DuckDB's
# CONCAT-ignores-NULL turned an unassignable user into a crashing
# '0x' cast (q175), and a phantom NULL CDC key NaN-poisoned the
# pandas int column (q181). Declared policy on BOTH engines: a NULL
# key is not an entity — reference rows with NULL keys match
# nothing, NULL-keyed users/records are excluded at the load edge.
# All provable real-data no-ops (zero NULL keys in the shipped
# corpora, checked by query; ALL GREEN at all three SFs after).
FIXED_NULL_KEYS = [
    "q13_join_asof",
    "q109_join_asof_tolerance",
    "q138_join_asof_forward",
    "q162_join_asof_nearest",
    "q175_srm_check",
    "q181_cdc_apply",
]


@pytest.fixture(scope="module")
def null_keys_sf(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("nullkeys_sf"))
    _audit_mod().make_empty_sf(dst, rows=-1, null_keys=True)
    return dst


@pytest.mark.parametrize("qid", FIXED_NULL_KEYS)
def test_null_keys_matches_oracle(spark, registry, null_keys_sf, qid,
                                  monkeypatch):
    from hearthstats_spark.oracle import compare, duck_connect

    monkeypatch.setenv("SPARK_GRAFT_ANN_CACHE", "0")
    q = registry[qid]
    res = compare(
        qid, q.fn(spark, null_keys_sf).toPandas(),
        duck_connect(null_keys_sf).execute(q.oracle).fetchdf())
    assert res.ok, str(res)


# the ''-vs-NULL axis (--empty-text, round 8): every 3rd document's
# text becomes the EMPTY STRING (n_chars kept true at 0). One find
# on first run, a latent production crash: Spark's sequence(1, 0)
# runs DESCENDING where DuckDB's generate_series(1, 0) is empty, so
# q91's unguarded shingle bound fed slice() an illegal start on any
# document shorter than the gram width — one 2-word doc killed the
# whole contamination screen. Fixed with the q172/q153 size-filter
# guard style; the rest of the 35-op text family was ''-clean.
FIXED_EMPTY_TEXT = [
    "q91_contamination",
]


@pytest.fixture(scope="module")
def empty_text_sf(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("emptytext_sf"))
    _audit_mod().make_empty_sf(dst, rows=-1, empty_text=True)
    return dst


@pytest.mark.parametrize("qid", FIXED_EMPTY_TEXT)
def test_empty_text_matches_oracle(spark, registry, empty_text_sf,
                                   qid, monkeypatch):
    from hearthstats_spark.oracle import compare, duck_connect

    monkeypatch.setenv("SPARK_GRAFT_ANN_CACHE", "0")
    q = registry[qid]
    res = compare(
        qid, q.fn(spark, empty_text_sf).toPandas(),
        duck_connect(empty_text_sf).execute(q.oracle).fetchdf())
    assert res.ok, str(res)


# ---- extreme-measures axis (round 9): 1e12-scale magnitudes --------
#
# q171/q180 were ANSI ABORTS (BIGINT/DECIMAL(12,2) intermediates) and
# now match the oracle exactly at 1e12 scale; q15 was an abort and
# now COMPUTES exactly in decimal — its two >2^53-unscaled output
# columns are the documented 1-ulp double-spelling domain
# (scripts/audit_degenerate.EXTREME_EXPECTED), so its pin asserts
# crash-freedom + the exact columns, not the full hash.

FIXED_EXTREME_MEASURES = [
    "q171_share_of_parent",
    "q180_dim_quantile_bucketing",
]


@pytest.fixture(scope="module")
def extreme_sf(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("extreme_sf"))
    _audit_mod().make_empty_sf(dst, rows=-1, extreme_measures=True)
    return dst


@pytest.mark.parametrize("qid", FIXED_EXTREME_MEASURES)
def test_extreme_measures_matches_oracle(spark, registry, extreme_sf,
                                         qid, monkeypatch):
    from hearthstats_spark.oracle import compare, duck_connect

    monkeypatch.setenv("SPARK_GRAFT_ANN_CACHE", "0")
    q = registry[qid]
    res = compare(
        qid, q.fn(spark, extreme_sf).toPandas(),
        duck_connect(extreme_sf).execute(q.oracle).fetchdf())
    assert res.ok, str(res)


def test_extreme_measures_q15_computes_exactly(spark, registry,
                                               extreme_sf):
    """q15 at 1e12-scale prices: no ANSI abort (the DECIMAL(12,2)
    regression), and every column OUTSIDE the documented double-
    output domain matches the oracle bit-exactly."""
    from hearthstats_spark.oracle import compare, duck_connect

    q = registry["q15_agg_pricing"]
    spark_pdf = q.fn(spark, extreme_sf).toPandas()
    duck_pdf = duck_connect(extreme_sf).execute(q.oracle).fetchdf()
    drop = ["sum_disc_price", "sum_charge"]  # the 1-ulp domain
    res = compare("q15_minus_domain_cols",
                  spark_pdf.drop(columns=drop),
                  duck_pdf.drop(columns=drop))
    assert res.ok, str(res)
