"""Testdata catalog: load the driver-generated parquet tables.

Tables (SURVEY.md §1.4): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file per table under
``/root/testdata/sf{0.001,0.01,0.1}/``.

Scans stay fully declarative (``spark.read.parquet``) so Catalyst gets
predicate pushdown + column pruning for free; at 100 TB these would be
partitioned/bucketed parquet directories and the same code holds.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables small enough to broadcast at any scale factor —
#: region/nation are bounded by geography (25 nations) even at 100 TB.
BROADCAST_DIMS = frozenset({"region", "nation"})


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table as a DataFrame (lazy columnar scan)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # ts is TIMESTAMP(NANOS) in the file, surfaced as nanos-long via
        # spark.sql.legacy.parquet.nanosAsLong (session.py). Truncate to
        # microseconds with integer division (ns longs ~1.7e18 overflow
        # double precision, so no float math here) — exactly DuckDB's
        # ns→µs truncation, keeping oracle timestamps value-identical.
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType, TimestampNTZType

        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(df.schema["ts"].dataType, TimestampNTZType):
            # Defensive mirror of spark.sql.parquet.inferTimestampNTZ
            # (session.py): a session that read the file before our confs
            # applied surfaces TIMESTAMP_NTZ; with the session tz pinned
            # UTC the cast is a pure type relabel, value-identical.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    """Read several tables at once: ``li, ord = tables(spark, d, 'lineitem', 'orders')``."""
    return tuple(table(spark, sf_dir, n) for n in names)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for ``spark.sql`` paths."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
