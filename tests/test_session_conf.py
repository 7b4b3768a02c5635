"""Driver-session defensiveness: the driver invokes queries()[name]
on a session IT built. Every registered query must repair the
runtime-settable conf (UTC timezone above all — a non-UTC session
shifts every date_format/window boundary off the DuckDB oracle)."""

from __future__ import annotations

from tests.conftest import SF_SMALL


def test_registered_query_restores_utc(spark, registry):
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        df = registry["q35_date_funcs"].fn(spark, SF_SMALL)
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        # and the values are UTC-correct: 1995-01-01 is day 0
        row = (df.filter("days_since_epoch95 = 0").limit(1).collect())
        assert row, "no epoch-day-0 orders found"
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def test_wrapped_fn_keeps_metadata(registry):
    q = registry["q15_agg_pricing"]
    assert q.fn.__name__ == "q15_agg_pricing"  # functools.wraps applied
    assert q.fn.__doc__