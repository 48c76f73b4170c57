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


def test_stream_restart_resumes_state_and_sink_exactly_once(
    spark, sf_dir, tmp_path
):
    """Restart continuity — the production failure mode the availableNow
    drains never cross: a stateful stream is stopped at a DURABLE
    checkpoint, new source data arrives, and the SAME pipeline restarts
    from that checkpoint. Three properties must hold end to end:

    1. **State carries over.** The update-mode aggregation emits the
       TOTAL per-key aggregate from the restored state store; if restart
       lost state, phase-2 emissions would count only phase-2 rows and
       the final table would undercount every bucket touched in phase 1.
    2. **Source offsets carry over.** Phase 2 must not re-read the
       phase-1 file (the file-source log lives in the checkpoint); a
       re-read would double-count into the stateful aggregate.
    3. **The transactional sink stays exactly-once.** Each update-mode
       micro-batch lands as one MERGE into a TxnTable; a third restart
       with NO new data must commit nothing (no empty micro-batch
       versions, no replayed merge).

    Final read-back is hash-equal to the batch aggregate over BOTH
    halves — undercount (lost state), overcount (re-read), and replay
    (sink) all break that equality.
    """
    import shutil as _shutil

    from pyspark.sql import functions as F

    from xlsx_to_database_spark.catalog import table
    from xlsx_to_database_spark.operators.txn_table import TxnTable
    from xlsx_to_database_spark.streaming.engine import (
        _state_sized_shuffle,
        events_raw_schema,
        with_event_time,
    )

    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    root = str(tmp_path / "table")

    raw_schema = events_raw_schema(sf_dir)
    raw = spark.read.schema(raw_schema).parquet(f"{sf_dir}/events.parquet")

    def stage_half(pred, name: str) -> None:
        tmp_out = str(tmp_path / f"stage_{name}")
        raw.filter(pred).coalesce(1).write.mode("overwrite").parquet(tmp_out)
        import glob as _glob

        (part,) = _glob.glob(f"{tmp_out}/part-*.parquet")
        _shutil.move(part, str(src / f"{name}.parquet"))
        _shutil.rmtree(tmp_out, ignore_errors=True)

    halves = F.col("event_id") % 2

    tt = TxnTable(spark, root, "bucket")

    def drain() -> None:
        """(Re)build the identical pipeline and drain availableNow —
        state, offsets, and the last uncommitted batch all come from
        ``ckpt``, exactly like a job redeploy."""
        stream_raw = spark.readStream.schema(raw_schema).parquet(str(src))
        agg = (
            with_event_time(stream_raw, sf_dir)
            .groupBy((F.col("user_id") % 10).cast("long").alias("bucket"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.round(
                    F.sum(F.col("value").cast("decimal(18,6)")).cast(
                        "double"
                    ),
                    4,
                ).alias("total"),
            )
        )

        def sink(batch_df, batch_id: int) -> None:
            # Update mode emits only keys whose state changed; an empty
            # emission (e.g. a stateful no-data batch) commits nothing,
            # so the phase-3 version check isolates REPLAYED data.
            if batch_df.isEmpty():
                return
            if not tt.versions():
                tt.create(batch_df)
            else:
                tt.merge(batch_df, "bucket")

        with _state_sized_shuffle(spark):
            q = (
                agg.writeStream.foreachBatch(sink)
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

    # Phase 1: first half only.
    stage_half(halves == 0, "a")
    drain()
    v_after_1 = tt.latest_version()

    # Phase 2: second half arrives; restart from the same checkpoint.
    stage_half(halves == 1, "b")
    drain()
    v_after_2 = tt.latest_version()
    assert v_after_2 > v_after_1, "phase-2 drain committed nothing"

    # Phase 3: restart with no new data — nothing may commit.
    drain()
    assert tt.latest_version() == v_after_2, (
        "empty restart replayed a batch into the sink"
    )

    got = {
        r["bucket"]: (r["n"], r["total"])
        for r in tt.read().collect()
    }
    want = {
        r["bucket"]: (r["n"], r["total"])
        for r in table(spark, sf_dir, "events")
        .groupBy((F.col("user_id") % 10).cast("long").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double"),
                4,
            ).alias("total"),
        )
        .collect()
    }
    assert got == want and got, (
        "restart broke state carry-over / offsets / sink idempotence"
    )
