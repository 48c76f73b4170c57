"""End-to-end: Engine facade + CLI + an executed JDBC round-trip.

The JDBC sink is not mocked — Spark ships Apache Derby's embedded driver
(for its Hive metastore), so `to_jdbc` writes a real database and
`from_database` reads it back: the reference tool's whole pipeline
(xlsx → typed rows → CREATE TABLE + batched INSERT) executed for real.
"""

from __future__ import annotations

from datetime import datetime

import pytest

from xlsx_to_database_spark.sources.xlsx_io import write_workbook


@pytest.fixture()
def workbook(tmp_path):
    path = str(tmp_path / "sales data.xlsx")
    write_workbook(
        path,
        {
            "Sheet1": (
                ["Order ID", "Amount!", "When", "Done?"],
                [
                    (1, 12.5, datetime(2024, 1, 2), True),
                    (2, 99.0, datetime(2024, 2, 3), False),
                    (3, 7.25, datetime(2024, 3, 4), True),
                ],
            )
        },
    )
    return path


def test_engine_load_xlsx_types_and_naming(spark, workbook):
    from xlsx_to_database_spark.api import Engine

    eng = Engine(spark=spark)
    t = eng.load_xlsx(workbook)
    assert t.name == "sales_data"
    assert t.df.columns == ["order_id", "amount", "when", "done"]
    types = dict(t.df.dtypes)
    assert types == {
        "order_id": "bigint",
        "amount": "double",
        "when": "timestamp",
        "done": "boolean",
    }
    assert t.count() == 3


def test_jdbc_round_trip_via_derby(spark, workbook, tmp_path):
    from xlsx_to_database_spark.api import Engine
    from xlsx_to_database_spark.sources.sinks import from_database

    url = f"jdbc:derby:{tmp_path}/db;create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    eng = Engine(spark=spark)
    t = eng.load_xlsx(workbook)
    t.to_jdbc(url, mode="create", driver=driver)
    back = from_database(spark, url, t.name, driver=driver)
    assert back.count() == 3
    assert sorted(r.order_id for r in back.collect()) == [1, 2, 3]

    # append mode doubles the rows; truncate resets.
    t.to_jdbc(url, mode="append", driver=driver)
    assert from_database(spark, url, t.name, driver=driver).count() == 6
    t.to_jdbc(url, mode="truncate", driver=driver)
    assert from_database(spark, url, t.name, driver=driver).count() == 3

    # create mode on an existing table must refuse (reference semantics).
    with pytest.raises(Exception):
        t.to_jdbc(url, mode="create", driver=driver)


def test_cli_parquet_sink(spark, workbook, tmp_path, capsys):
    from xlsx_to_database_spark.__main__ import main

    out = str(tmp_path / "out_parquet")
    assert main([workbook, "--parquet-out", out]) == 0
    df = spark.read.parquet(out)
    assert df.count() == 3
    assert "order_id" in df.columns


def test_cli_requires_a_sink(workbook):
    from xlsx_to_database_spark.__main__ import main

    assert main([workbook]) == 2


def test_cli_txn_table_sink_versions(spark, workbook, tmp_path, capsys):
    """--txn-out creates the table on first load and appends on the
    next; the versioned reads see cumulative state (CLI → api → txn
    table end to end)."""
    from xlsx_to_database_spark.__main__ import main
    from xlsx_to_database_spark.operators.txn_table import TxnTable

    out = str(tmp_path / "ttbl")
    assert main([workbook, "--txn-out", out]) == 0
    assert main([workbook, "--txn-out", out]) == 0
    t = TxnTable(spark, out, "id")
    assert t.versions() == [0, 1]
    assert t.read(1).count() == 2 * t.read(0).count()
