"""Round-7 ops: txn-log checkpoint protocol surfaced as a queryable,
oracle-checked operator.

Imported LAST by the registry loader so these ids queue behind the
existing never-attested backlog instead of displacing the driver
window (same placement discipline as the round4/5 modules).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xlsx_to_database_spark.catalog import table
from xlsx_to_database_spark.registry import query


@query(
    "table_txn_checkpoint",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                      AS DOUBLE), 2) AS total_price,
           7 AS n_versions,
           1 AS n_checkpoints,
           2 AS n_replays_skipped
    FROM orders
    """,
)
def table_txn_checkpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once ingestion THROUGH a txn-log checkpoint, end to end:
    six producers `append_once` disjoint orders slices (o_orderkey % 6)
    at checkpoint_interval=5, so a ckpt-v5 checkpoint lands mid-stream;
    two tokens are then REPLAYED — one from behind the checkpoint's
    coverage, one at its boundary — and both must no-op via the
    checkpoint+tail scan (operators/txn_table.py::_txn_ids_before). The
    op returns the read-back aggregate of the final table, hash-matched
    against the orders table itself (exactly-once ⇒ every order row
    exactly once), plus the protocol counters, all deterministic:
    7 versions (create + 6 appends — replays add none), 1 checkpoint,
    2 skipped replays.

    Scale: the checkpoint keeps a streaming sink's idempotence scan
    O(interval) instead of O(commits) — measured 370 → 21 ms per commit
    at 800 versions (SCALE.md round-7). The read-back aggregate is one
    shuffle over the files Spark wrote; everything else is manifest
    metadata."""
    from xlsx_to_database_spark.operators.txn_table import TxnTable

    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    tag = os.path.basename(os.path.normpath(sf_dir))
    root = f"/tmp/spark_stage/{tag}_txn_ckpt"
    shutil.rmtree(root, ignore_errors=True)
    t = TxnTable(spark, root, "o_orderkey", checkpoint_interval=5)
    t.create(orders.limit(0))
    for i in range(6):
        t.append_once(
            orders.filter(F.col("o_orderkey") % 6 == i), f"slice-{i}"
        )
    ck = t._latest_checkpoint()
    n_ckpts = 1 if (ck is not None and ck["version"] == 5) else 0
    skipped = sum(
        t.append_once(
            orders.filter(F.col("o_orderkey") % 6 == i), f"slice-{i}"
        ) is None
        for i in (2, 5)
    )
    return (
        t.read()
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("double"), 2
            ).alias("total_price"),
        )
        .withColumn("n_versions", F.lit(t.latest_version() + 1))
        .withColumn("n_checkpoints", F.lit(n_ckpts))
        .withColumn("n_replays_skipped", F.lit(skipped))
    )


@query(
    "table_delete_vectors",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                      AS DOUBLE), 2) AS total_price,
           (SELECT CAST(count(*) AS BIGINT) FROM orders
            WHERE o_orderkey % 7 = 3) AS rows_deleted_1,
           (SELECT CAST(count(*) AS BIGINT) FROM orders
            WHERE o_orderkey % 11 = 5 AND o_orderkey % 7 <> 3)
             AS rows_deleted_2,
           4 AS files_marked_1,
           4 AS files_marked_2,
           0 AS data_files_changed
    FROM orders
    WHERE NOT (o_orderkey % 7 = 3 OR o_orderkey % 11 = 5)
    """,
)
def table_delete_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read DELETE via deletion vectors, end to end: orders
    lands as 4 range-clustered files, then two scattered deletes
    (o_orderkey % 7 = 3, then % 11 = 5 — every file is hit BOTH times)
    run as ``delete_where_dv``: each writes one tiny sidecar of
    (file key, row ordinal) pairs and rewrites ZERO data files
    (``data_files_changed`` compares the v0 and final manifests' data
    file sets — must be 0). The second delete exercises DV merging
    (already-deleted rows are not re-counted: rows_deleted_2 excludes
    the %7 overlap) and the read-back aggregate over the live view
    must hash-match batch SQL WHERE NOT (p1 OR p2) — a resurrected or
    over-deleted row anywhere changes it.

    Scale: this is THE DELETE that survives 100 TB ergonomics (GDPR
    erasure, bad-record purge): O(matches) sidecar bytes + one
    broadcast anti-join at read, vs copy-on-write's rewrite of every
    hit file — measured at 20M rows/64 files, a 200-row scattered
    delete writes a 2.8 KB sidecar where CoW rewrites 83.5 MB
    (~30,000× write amplification), at a ~3× full-scan read tax until
    the next compaction materializes the vectors away (SCALE.md
    round-7).

    Parity: Delta deletion vectors / Iceberg positional deletes
    (merge-on-read row-level operations).

    Fixture discipline (round-7 verdict #2/#4): the 4-file base table
    is staged ONCE per process (txn_fixtures.staged_copy) and each
    invocation works on a fresh OS-level copy, so the op's wall-clock
    is the two DV commits + the merge-on-read aggregate — the thing
    the headline number claims — not repeated Spark fixture writes."""
    from xlsx_to_database_spark.operators.txn_table import TxnTable
    from xlsx_to_database_spark.queries.txn_fixtures import staged_copy

    def _build(root: str) -> None:
        orders = table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_totalprice"
        )
        TxnTable(spark, root, "o_orderkey").create(
            orders.repartitionByRange(4, "o_orderkey")
        )

    root = staged_copy("txn_dv_v2", sf_dir, _build)
    t = TxnTable(spark, root, "o_orderkey")
    key = F.col("o_orderkey")
    _, marked1, deleted1 = t.delete_where_dv(key % 7 == 3)
    _, marked2, deleted2 = t.delete_where_dv(key % 11 == 5)
    data_v0 = {e["path"] for e in t.manifest(0)["files"]}
    data_now = {e["path"] for e in t.manifest()["files"]}
    changed = len(data_v0 ^ data_now)
    return (
        t.read()
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("double"), 2
            ).alias("total_price"),
        )
        .withColumn("rows_deleted_1", F.lit(deleted1).cast("long"))
        .withColumn("rows_deleted_2", F.lit(deleted2).cast("long"))
        .withColumn("files_marked_1", F.lit(marked1).cast("int"))
        .withColumn("files_marked_2", F.lit(marked2).cast("int"))
        .withColumn("data_files_changed", F.lit(changed).cast("int"))
    )


@query(
    "table_update_vectors",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           round(CAST(sum(CASE WHEN o_orderkey % 7 = 3
                     THEN 2 * CAST(o_totalprice AS DECIMAL(18,2))
                     ELSE CAST(o_totalprice AS DECIMAL(18,2)) END)
                 AS DOUBLE), 2) AS total_price,
           (SELECT CAST(count(*) AS BIGINT) FROM orders
            WHERE o_orderkey % 7 = 3) AS rows_updated,
           4 AS files_marked,
           0 AS data_files_removed
    FROM orders
    """,
)
def table_update_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read UPDATE via deletion vectors: orders lands as 4
    range-clustered files, then a scattered UPDATE (o_orderkey % 7 = 3
    → price doubled — every file is hit) runs as ``update_where_dv``:
    old row positions go into a KB sidecar, updated copies append as
    ONE new file, and all 4 original data files survive untouched
    (``data_files_removed`` diffs the manifests — must be 0). The
    read-back aggregate over the live view must hash-match batch SQL
    with the equivalent CASE — a double-applied update, a resurrected
    pre-image, or a dropped non-match anywhere changes it.

    Scale: updating 0.001% of a 100 TB table costs O(matches) I/O
    (sidecar + one appended file) where copy-on-write rewrites every
    hit file; one table scan feeds both outputs. CDC reports each
    updated row as exact pre-image delete + post-image insert.
    Parity: Delta deletion-vector UPDATE / Iceberg merge-on-read row
    updates.

    Fixture discipline: shares table_delete_vectors' staged base (same
    4-file orders layout) via txn_fixtures.staged_copy — the timed
    region is the UPDATE commit + read-back, not the repeated create."""
    from xlsx_to_database_spark.operators.txn_table import TxnTable
    from xlsx_to_database_spark.queries.txn_fixtures import staged_copy

    def _build(root: str) -> None:
        orders = table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_totalprice"
        )
        TxnTable(spark, root, "o_orderkey").create(
            orders.repartitionByRange(4, "o_orderkey")
        )

    root = staged_copy("txn_dv_v2", sf_dir, _build, work_tag="txn_updv_v2")
    t = TxnTable(spark, root, "o_orderkey")
    _, marked, updated = t.update_where_dv(
        F.col("o_orderkey") % 7 == 3,
        {"o_totalprice": F.col("o_totalprice") * 2},
    )
    data_v0 = {e["path"] for e in t.manifest(0)["files"]}
    data_now = {e["path"] for e in t.manifest()["files"]}
    removed = len(data_v0 - data_now)
    return (
        t.read()
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("double"), 2
            ).alias("total_price"),
        )
        .withColumn("rows_updated", F.lit(updated).cast("long"))
        .withColumn("files_marked", F.lit(marked).cast("int"))
        .withColumn("data_files_removed", F.lit(removed).cast("int"))
    )


@query(
    "table_rename_column",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                 AS DOUBLE), 2) AS total,
           0 AS rename_files_touched,
           1 AS v0_schema_original
    FROM orders WHERE o_orderkey % 9 <> 2
    """,
)
def table_rename_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-rewrite RENAME COLUMN via column mapping (Delta's device):
    orders lands minus its %4 slice, ``o_totalprice`` is renamed to
    ``price`` as a metadata-only commit (``rename_files_touched``
    diffs the file sets across the rename — must be 0), the %4 slice
    is APPENDED under the NEW name (it writes the frozen physical
    name, so pre- and post-rename files stay mutually readable), and a
    DV delete filters on the new name. The read-back aggregate over
    the mixed-provenance live view must hash-match batch SQL over all
    of orders minus the deleted slice; ``v0_schema_original`` pins
    time travel presenting the PRE-rename schema.

    Scale: a rename on a 100 TB table is one manifest commit —
    O(metadata), zero data I/O — and every historical snapshot stays
    readable under its own schema. Parity: Delta column mapping
    (RENAME/DROP COLUMN), Iceberg schema evolution by field id."""
    from xlsx_to_database_spark.operators.txn_table import TxnTable

    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    tag = os.path.basename(os.path.normpath(sf_dir))
    root = f"/tmp/spark_stage/{tag}_txn_rename"
    shutil.rmtree(root, ignore_errors=True)
    t = TxnTable(spark, root, "o_orderkey")
    key = F.col("o_orderkey")
    t.create(
        orders.filter(key % 4 != 0).repartitionByRange(4, "o_orderkey")
    )
    t.rename_column("o_totalprice", "price")
    files_v0 = {e["path"] for e in t.manifest(0)["files"]}
    files_v1 = {e["path"] for e in t.manifest(1)["files"]}
    touched = len(files_v0 ^ files_v1)
    v0_original = int(t.read(0).columns == ["o_orderkey", "o_totalprice"])
    t.append(
        orders.filter(key % 4 == 0)
        .withColumnRenamed("o_totalprice", "price")
        .coalesce(1)
    )
    t.delete_where_dv(key % 9 == 2)
    return (
        t.read()
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.round(
                F.sum(F.col("price").cast("decimal(18,2)"))
                .cast("double"), 2
            ).alias("total"),
        )
        .withColumn("rename_files_touched", F.lit(touched).cast("int"))
        .withColumn("v0_schema_original", F.lit(v0_original).cast("int"))
    )


@query(
    "table_reorg_purge",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                 AS DOUBLE), 2) AS total_price,
           1 AS files_purged,
           3 AS files_carried
    FROM orders, (SELECT CAST(floor(max(o_orderkey) / 4) AS BIGINT) AS cut
                  FROM orders) lim
    WHERE NOT ((o_orderkey % 3 = 0 AND o_orderkey <= lim.cut)
               OR o_orderkey % 1000 = 7)
    """,
)
def table_reorg_purge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REORG … APPLY (PURGE) — the deletion-vector maintenance loop:
    orders lands as 4 key-range files, one DV delete marks a HEAVY
    slice (every third key in the first quarter of the key domain →
    ~33% of file 0) plus a LIGHT scatter (o_orderkey % 1000 = 7 →
    ~0.1% everywhere), and ``reorg_purge(0.2)`` rewrites ONLY the hot
    file to its live rows — the lightly-vectored files keep their
    cheap vectors and carry by reference (counters pinned: 1 purged /
    3 carried). The read-back aggregate must hash-match batch SQL with
    the same predicate: purge is content-preserving, so a row lost or
    resurrected in the rewrite changes the hash.

    Determinism note: the arithmetic cut (max/4) approximates file 0's
    sampled range boundary; a straddle puts at most a few % of the
    heavy slice into file 1 — far below the 20% threshold — so the
    purged/carried counters are stable while BOTH engines compute the
    row set from the same pure predicate, never from file boundaries.

    Scale: purge I/O is proportional to the files whose deleted-ratio
    crossed the threshold — the knob that bounds the merge-on-read
    read tax under continuous GDPR-style erasure without compact()'s
    O(table) rewrite. Parity: Delta REORG TABLE … APPLY (PURGE)."""
    from xlsx_to_database_spark.operators.txn_table import TxnTable

    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    tag = os.path.basename(os.path.normpath(sf_dir))
    root = f"/tmp/spark_stage/{tag}_txn_purge"
    shutil.rmtree(root, ignore_errors=True)
    t = TxnTable(spark, root, "o_orderkey")
    t.create(orders.repartitionByRange(4, "o_orderkey"))
    cut = int(orders.agg(F.max("o_orderkey")).collect()[0][0]) // 4
    key = F.col("o_orderkey")
    t.delete_where_dv(
        ((key % 3 == 0) & (key <= cut)) | (key % 1000 == 7)
    )
    _, purged, carried = t.reorg_purge(max_deleted_ratio=0.2)
    return (
        t.read()
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("double"), 2
            ).alias("total_price"),
        )
        .withColumn("files_purged", F.lit(purged).cast("int"))
        .withColumn("files_carried", F.lit(carried).cast("int"))
    )


@query(
    "table_cdc_rows",
    """
    SELECT * FROM (
      SELECT 'insert' AS _change_type,
             CAST(count(*) AS BIGINT) AS n,
             round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                        AS DOUBLE), 2) AS total
      FROM orders WHERE o_orderkey % 5 = 0
      UNION ALL
      SELECT 'delete' AS _change_type,
             CAST(count(*) AS BIGINT) AS n,
             round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                        AS DOUBLE), 2) AS total
      FROM orders WHERE o_orderkey % 9 = 2
    )
    """,
)
def table_cdc_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level change data capture from the txn log: the table is
    created from orders minus the %5 slice, the slice is APPENDED
    (v1), a scattered DV DELETE lands (v2, o_orderkey % 9 = 2), and a
    compaction rewrites the layout (v3). ``read_changes_rows(0, 3)``
    must emit the appended rows as exact ``insert``s, the DV-deleted
    rows as exact per-row ``delete``s WITH their column values (the
    deletion-vector payoff — a copy-on-write delete loses row
    identity), and NOTHING for the layout-only compaction. The op
    aggregates the change feed per type; both legs hash-match batch
    SQL over orders.

    Scale: each commit's changes come from scans of only that commit's
    touched files plus KB-scale sidecar diffs — a day of CDC on a
    100 TB table reads the day's files, never the table. Parity:
    Delta Change Data Feed / Iceberg changelog scans."""
    from xlsx_to_database_spark.operators.txn_table import TxnTable
    from xlsx_to_database_spark.queries.txn_fixtures import staged_copy

    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    key = F.col("o_orderkey")

    def _build(root: str) -> None:
        TxnTable(spark, root, "o_orderkey").create(
            orders.filter(key % 5 != 0).repartitionByRange(4, "o_orderkey")
        )

    root = staged_copy("txn_cdc_v2", sf_dir, _build)
    t = TxnTable(spark, root, "o_orderkey")
    t.append(orders.filter(key % 5 == 0).coalesce(1))
    t.delete_where_dv(key % 9 == 2)
    t.compact(target_files=4)
    return (
        t.read_changes_rows(0, 3)
        .groupBy("_change_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("double"), 2
            ).alias("total"),
        )
    )


@query(
    "stream_restart_resume",
    """
    SELECT CAST(user_id % 10 AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4)
             AS total,
           2 AS n_commits,
           0 AS empty_restart_commits
    FROM events
    GROUP BY 1
    """,
)
def stream_restart_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpoint-restart continuity as an oracled query — the
    production redeploy path the availableNow drains never cross. The
    events table is split in half by event_id parity; the SAME stateful
    update-mode pipeline (per-bucket count/sum, foreachBatch MERGE into
    a TxnTable) is started THREE times against one durable checkpoint:

    1. half A staged → drain (create + first merge commit),
    2. half B staged → RESTART from the checkpoint → drain,
    3. no new data    → restart again → must commit NOTHING.

    The read-back must hash-match the batch aggregate over ALL events:
    lost state undercounts every phase-1 bucket (update mode re-emits
    the restored total, not the phase-2 delta), a re-read of half A
    double-counts, and a replayed merge on the empty restart bumps the
    version counter. n_commits (2: phase-1 create + phase-2 merge —
    each availableNow file-source drain plans its staged file as one
    micro-batch) and empty_restart_commits (0) pin the txn-log shape.

    Scale: restart cost is O(state + new files) — offsets and state
    live in the checkpoint, never rescanned from the source; the MERGE
    sink prunes to files overlapping the 10-bucket key range."""
    from xlsx_to_database_spark.operators.txn_table import TxnTable
    from xlsx_to_database_spark.streaming.engine import (
        _state_sized_shuffle,
        events_raw_schema,
        with_event_time,
    )

    tag = os.path.basename(os.path.normpath(sf_dir))
    base = f"/tmp/spark_stage/{tag}_restart_resume"
    shutil.rmtree(base, ignore_errors=True)
    src, ckpt, root = f"{base}/src", f"{base}/ckpt", f"{base}/table"
    os.makedirs(src)

    raw_schema = events_raw_schema(sf_dir)
    raw = spark.read.schema(raw_schema).parquet(f"{sf_dir}/events.parquet")

    def stage_half(parity: int, name: str) -> None:
        tmp_out = f"{base}/stage_{name}"
        raw.filter(F.col("event_id") % 2 == parity).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp_out)
        import glob as _glob

        (part,) = _glob.glob(f"{tmp_out}/part-*.parquet")
        shutil.move(part, f"{src}/{name}.parquet")
        shutil.rmtree(tmp_out, ignore_errors=True)

    tt = TxnTable(spark, root, "bucket")

    def drain() -> None:
        # Rebuilt from scratch each phase — state, source offsets, and
        # any uncommitted batch come only from ``ckpt``, like a redeploy.
        stream_raw = spark.readStream.schema(raw_schema).parquet(src)
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

        def sink(batch_df: DataFrame, batch_id: int) -> None:
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

    stage_half(0, "a")
    drain()
    stage_half(1, "b")
    drain()
    commits = tt.latest_version() + 1
    drain()  # empty restart
    empty_commits = tt.latest_version() + 1 - commits
    return (
        tt.read()
        .select("bucket", "n", "total")
        .withColumn("n_commits", F.lit(commits).cast("int"))
        .withColumn(
            "empty_restart_commits", F.lit(empty_commits).cast("int")
        )
    )


@query(
    "table_auto_optimize",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                      AS DOUBLE), 2) AS total_price,
           3 AS files_compacted,
           4 AS files_carried
    FROM orders
    """,
)
def table_auto_optimize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental OPTIMIZE after micro-batched ingest: the table is
    created as 4 range-clustered files (the compacted steady state),
    then three SMALL appends land (o_orderkey % 1000 ∈ {1,2,3} — the
    streaming-ingest tail), and ``compact_small`` rewrites ONLY the
    small tail into one clustered file, carrying the 4 big files by
    reference (operators/txn_table.py::compact_small). Counters are
    deterministic — 3 compacted, 4 carried — and the read-back must
    hash-match the full orders aggregate (compaction is content-
    preserving).

    Scale: this is the maintenance loop that keeps file counts bounded
    under continuous ingest without full-table rewrites — O(small tail)
    I/O per pass where ``compact`` is O(table); selection is manifest
    metadata (per-file row counts), no data scan."""
    from xlsx_to_database_spark.operators.txn_table import TxnTable

    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    tag = os.path.basename(os.path.normpath(sf_dir))
    root = f"/tmp/spark_stage/{tag}_txn_autoopt"
    shutil.rmtree(root, ignore_errors=True)
    t = TxnTable(spark, root, "o_orderkey")
    tail = F.col("o_orderkey") % 1000
    t.create(
        orders.filter(~tail.isin(1, 2, 3)).repartitionByRange(
            4, "o_orderkey"
        )
    )
    for i in (1, 2, 3):
        # coalesce(1): one file per micro-append regardless of the
        # scan's split count, so the counters are scale-invariant.
        t.append(orders.filter(tail == i).coalesce(1))
    _, compacted, carried = t.compact_small(max_rows=1000)
    return (
        t.read()
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("double"), 2
            ).alias("total_price"),
        )
        .withColumn("files_compacted", F.lit(compacted))
        .withColumn("files_carried", F.lit(carried))
    )
