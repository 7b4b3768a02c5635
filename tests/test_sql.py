"""SQL-lane parity: spark.sql over registered views must return the
same rows as the DataFrame-built queries (same logical-plan IR —
SURVEY.md §3.2)."""

from __future__ import annotations

from hearthstats_spark.sql import run_sql
from tests.conftest import SF_SMALL


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_sql_q15_shape_matches_dataframe(spark, registry):
    sql = """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE)
                   AS sum_qty,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """
    got = {(r["l_returnflag"], r["l_linestatus"]): (r["sum_qty"],
                                                    r["count_order"])
           for r in run_sql(spark, SF_SMALL, sql).collect()}
    want = {(r["l_returnflag"], r["l_linestatus"]): (r["sum_qty"],
                                                     r["count_order"])
            for r in registry["q15_agg_pricing"].fn(spark, SF_SMALL).collect()}
    for k, (qty, cnt) in want.items():
        assert got[k][1] == cnt
        assert abs(got[k][0] - qty) < 1e-9


def test_sql_join_matches_dataframe(spark, registry):
    sql = """
        SELECT r.r_name, n.n_name
        FROM region r JOIN nation n ON r.r_regionkey = n.n_regionkey
    """
    df_sql = run_sql(spark, SF_SMALL, sql)
    assert df_sql.count() == 25
    assert len(_rows(df_sql)) == 25


def test_sql_sees_normalized_events_ts(spark):
    """The view must expose the loader-normalized timestamp (not the
    raw bigint nanoseconds the Parquet file stores)."""
    df = run_sql(spark, SF_SMALL,
                 "SELECT MIN(ts) AS lo, MAX(ts) AS hi FROM events")
    row = df.collect()[0]
    assert str(row["lo"]).startswith("2024-01-01")
    assert dict(df.dtypes)["lo"] == "timestamp"


def test_s15_schema_evolution(spark, registry):
    """mergeSchema must surface the union schema, NULL-fill the old
    files, and keep every row."""
    from tests.conftest import SF_SMALL

    row = registry["s15_schema_evolution"].fn(spark, SF_SMALL).collect()[0]
    assert row["evolved_col_present"]
    assert row["n_rows"] == 50          # 25 nations × 2 versions
    assert row["n_old_schema_rows"] == 25
    assert row["n_new_schema_rows"] == 25
