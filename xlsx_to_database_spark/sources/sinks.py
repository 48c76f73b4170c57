"""Database + file sinks (SURVEY.md §2.1 jdbc_sink / parquet_sink).

The reference's output surface: CREATE TABLE + batched INSERT with
create/append/truncate modes. In Spark this is ``df.write.format("jdbc")``
— each partition opens its own connection and writes batched inserts
from the executors (driver never materializes the data), which is the
scalable shape: N partitions → N parallel insert streams.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame

#: reference-tool mode names → Spark writer modes
MODE_MAP = {
    "create": "errorifexists",
    "append": "append",
    "truncate": "overwrite",
    "overwrite": "overwrite",
}


def to_database(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "create",
    batch_size: int = 10_000,
    driver: Optional[str] = None,
    **options: str,
) -> None:
    """Write a DataFrame to a relational database over JDBC.

    `mode` uses the reference tool's vocabulary (create/append/truncate).
    `batch_size` maps to the JDBC batch insert size; at cluster scale,
    `df.repartition(n)` upstream controls insert parallelism (one
    connection per partition — size n to what the database can absorb).
    """
    if mode not in MODE_MAP:
        raise ValueError(f"mode must be one of {sorted(MODE_MAP)}, got {mode!r}")
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .mode(MODE_MAP[mode])
    )
    if mode == "truncate":
        # Reference semantics: TRUNCATE + INSERT, keeping the table's own
        # DDL/indexes/grants. Without this option Spark's overwrite DROPs
        # and recreates the table from the DataFrame schema.
        writer = writer.option("truncate", "true")
    if driver:
        writer = writer.option("driver", driver)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save()


def from_database(spark, url: str, table: str, **options: str) -> DataFrame:
    """Read a database table back (partitioned reads via the standard
    partitionColumn/lowerBound/upperBound/numPartitions options)."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def to_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Optional[list[str]] = None,
) -> None:
    """Columnar sink; `partition_by` produces hive-style directories so
    downstream scans get static + dynamic partition pruning."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
