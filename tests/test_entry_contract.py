"""Driver-contract invariants for __spark_entry__.py."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_entry_smoke_stable_schema(spark):
    df1 = entry_mod.entry(spark)
    df2 = entry_mod.entry(spark)
    assert df1.schema == df2.schema
    assert len(df1.columns) > 0
    assert df1.count() > 0


def test_registry_consistency(spark):
    qs = entry_mod.queries()
    os_ = entry_mod.oracle_sql()
    # every oracle belongs to a declared query
    assert set(os_) <= set(qs)
    # names are unique, callable, and non-trivially many
    assert len(qs) >= 60
    assert all(callable(f) for f in qs.values())
    # every query is oracle-backed except the inherently approximate
    # HLL++/quantile probe (error-bound-tested in pytest instead)
    rows_only = set(qs) - set(os_)
    assert rows_only == {"a_approx_distinct_users"}, (
        f"unexpected rows-only queries: {rows_only}"
    )


def test_compat_self_heals_foreign_timezone(spark):
    """The driver owns its SparkSession and may carry any session tz;
    ensure_compat (called by every load_table) must pin UTC back so
    timestamp queries still match the DuckDB oracle."""
    from .oracle import compare_query

    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        ok, detail = compare_query(
            spark, "st_tumbling_window", "/root/testdata/sf0.001", qs, os_
        )
        assert ok, detail
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def test_every_query_runs_at_smoke_scale(spark):
    """The driver's t1 gate: every declared query must at least execute
    at sf0.001 (cheap versions of the sf0.01 correctness runs)."""
    qs = entry_mod.queries()
    for name, fn in sorted(qs.items()):
        n = fn(spark, "/root/testdata/sf0.001").count()
        assert n >= 0, name
