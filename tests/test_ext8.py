"""Round-5 operators: the sketch-vs-exact agreement contracts behind
q177. Since round 10 the registered query hashes q176's exact twin +
sandwich verdicts against DuckDB; the raw GK-placed bounds (values
DuckDB can't reproduce) stay pinned here via the sketch-lane
helper."""

from __future__ import annotations

from tests.conftest import SF_MED, SF_SMALL


def test_q177_bounds_bracket_exact_ks(spark, registry):
    """The sketch lane's [d_est, d_upper] must BRACKET q176's exact
    two-sample D at both small SFs — d_est is a max over a subset of
    the sup's candidate points (never above), d_upper adds each
    bucket's larger side-mass (never below) — and the bracket must
    be tight enough to be useful (width ≤ 2·2/B + slack; B=64
    cuts). The declared query's hashed verdicts must agree."""
    from hearthstats_spark.queries.analytics_ext8 import \
        _ks_sketch_bounds

    for sf in (SF_SMALL, SF_MED):
        exact = registry["q176_ks_two_sample"].fn(spark, sf).head()
        approx = _ks_sketch_bounds(spark, sf).head()
        d = exact["ks_d"]
        assert approx["ks_d_est"] <= d + 1e-12, (sf, approx, d)
        assert d <= approx["ks_d_upper"] + 1e-12, (sf, approx, d)
        assert approx["ks_d_upper"] - approx["ks_d_est"] <= 0.1
        # sanity: same populations on both sides
        assert approx["n_urgent"] == exact["n_urgent"]
        assert approx["n_other"] == exact["n_other"]
        declared = registry["q177_ks_sketch_drift"].fn(spark, sf).head()
        assert declared["est_le_exact"] and declared["exact_le_upper"]
        assert declared["d_numerator"] == exact["d_numerator"]
