"""SparkSession construction and per-session tuning.

Scale posture (SURVEY.md §6): at bench scale (sf0.1) fixed overheads
dominate, so we keep shuffle partitions low locally; at 100 TB the same
code runs with cluster-sized ``spark.sql.shuffle.partitions`` — AQE
coalescing makes the static number a ceiling, not a commitment.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Runtime-settable confs applied to *any* session we are handed (the
#: driver owns the session for smoke/correctness runs). Only confs that
#: Spark allows to change at runtime belong here.
RUNTIME_CONFS: dict[str, str] = {
    # Deterministic timestamp semantics: DuckDB reads parquet TIMESTAMP
    # as naive/UTC; pin Spark to UTC so values and year()/date_trunc()
    # results hash-match the oracle.
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # Bench data is tiny (sf0.1); huge shuffle fan-out would be pure
    # overhead. On a real cluster this would be sized to data volume.
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_SHUFFLE", "32"),
    # Arrow for any pandas interchange (UDF batches, toPandas).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Allow our xlsx Python data source to receive pushed filters.
    "spark.sql.python.filterPushdown.enabled": "true",
    # events.parquet stores TIMESTAMP(NANOS), which Spark's reader rejects;
    # read as raw nanos-since-epoch longs and truncate to micros in the
    # catalog (matching DuckDB's ns→µs truncation on the oracle side).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Newer testdata stores ts as TIMESTAMP(MICROS) with isAdjustedToUTC
    # unset; Spark 4 infers that as TIMESTAMP_NTZ by default, which
    # unix_micros()/watermarks reject. Read it as plain TIMESTAMP — the
    # session timezone is pinned UTC above, so wall-clock values match
    # DuckDB's naive reading exactly.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    # Write timestamps as INT64 micros, not deprecated INT96: INT96
    # columns carry no min/max statistics, which silently disables
    # footer-only file/row-group pruning on every timestamp predicate —
    # the whole point of clustered sinks.
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
}


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to an existing session (driver-owned or ours)."""
    for key, value in RUNTIME_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            # Some confs may be fixed by the session owner; never fail a
            # query over a tuning knob.
            pass
    return spark


def get_spark(app_name: str = "xlsx-to-database-spark") -> SparkSession:
    """Build (or reuse) a local session sized for this container."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.sql.shuffle.partitions", RUNTIME_CONFS["spark.sql.shuffle.partitions"])
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    return tune_session(builder.getOrCreate())
