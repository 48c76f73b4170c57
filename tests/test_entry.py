"""Smoke tests for the driver contract surface."""

from __future__ import annotations


def test_entry_returns_rows(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"l_returnflag", "l_linestatus", "revenue", "avg_qty", "cnt"}


def test_queries_oracle_keys_align():
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    assert qs, "no queries registered"
    # every oracle key must have a query impl
    assert set(oracles) <= set(qs)


def test_all_queries_run_sf0001(spark, sf_dir):
    import __spark_entry__ as e

    for name, fn in e.queries().items():
        df = fn(spark, sf_dir)
        # force execution; smoke-level assertion only
        assert df.count() >= 0, name
