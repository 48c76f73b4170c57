"""RocksDB state store parity (SCALE.md §2.9).

The HDFS-backed default state store holds state on the JVM heap — fine
for tests, fatal for 100 TB-day state volumes. Production streaming
deployments run RocksDBStateStoreProvider (off-heap, spill-to-disk,
changelog-checkpointed). `stream_tws` pins it but is import-gated on
google.protobuf, so this test exercises the RocksDB provider through a
plain stateful streaming aggregation: same availableNow drain, provider
swapped, result must equal the batch aggregate exactly — proving the
engine's stateful ops are provider-agnostic in this build.
"""

from __future__ import annotations

from pyspark.sql import functions as F

_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"
_ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def test_rocksdb_state_store_matches_batch(spark, sf_dir):
    from xlsx_to_database_spark.streaming.engine import (
        events_stream,
        run_to_memory,
    )

    prev = spark.conf.get(_PROVIDER_KEY, None)
    spark.conf.set(_PROVIDER_KEY, _ROCKSDB)
    try:
        ev = events_stream(spark, sf_dir)
        agg = ev.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4).alias("total"),
        )
        got = {
            r["event_type"]: (r["n"], r["total"])
            for r in run_to_memory(agg, "complete").collect()
        }
    finally:
        if prev is None:
            spark.conf.unset(_PROVIDER_KEY)
        else:
            spark.conf.set(_PROVIDER_KEY, prev)

    from xlsx_to_database_spark.catalog import table

    want = {
        r["event_type"]: (r["n"], r["total"])
        for r in table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4).alias("total"),
        )
        .collect()
    }
    assert got == want and got


def test_state_sized_shuffle_reentrant(spark):
    """Round-6 advice: _state_sized_shuffle mutates the session-global
    shuffle-partition conf; overlapping drains on one session must not
    leave it pinned at the stream setting. Simulates the bad interleave
    (enter A, enter B, exit A, exit B) and plain nesting."""
    from xlsx_to_database_spark.streaming.engine import (
        STREAM_STATE_PARTITIONS,
        _state_sized_shuffle,
    )

    key = "spark.sql.shuffle.partitions"
    orig = spark.conf.get(key)
    try:
        spark.conf.set(key, "32")
        a, b = _state_sized_shuffle(spark), _state_sized_shuffle(spark)
        a.__enter__()
        assert spark.conf.get(key) == str(STREAM_STATE_PARTITIONS)
        b.__enter__()
        a.__exit__(None, None, None)
        # still one drain active: override must hold
        assert spark.conf.get(key) == str(STREAM_STATE_PARTITIONS)
        b.__exit__(None, None, None)
        assert spark.conf.get(key) == "32", "session left pinned"
        # plain nesting restores too
        with _state_sized_shuffle(spark):
            with _state_sized_shuffle(spark):
                assert spark.conf.get(key) == str(STREAM_STATE_PARTITIONS)
        assert spark.conf.get(key) == "32"
    finally:
        spark.conf.set(key, orig)
