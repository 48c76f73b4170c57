"""Crash-shaped txn states (round-12 verdict #6).

The multi-writer battery (test_txn_table_multiwriter.py) exercises
RACES between live writers; this layer exercises DEATHS — a writer
killed at each seam of the commit protocol, then a cold process (a
fresh TxnTable over the same path) reconstructing and the NEXT writer
proceeding. The protocol's crash story rests on three facts, each
pinned here against the specific torn state that would break it:

1. STAGE→LINK: staged data files and the written-but-unlinked
   ``.tmp`` manifest are both INVISIBLE — no manifest references the
   files, no reader globs ``.tmp`` — so the crashed writer's version
   number is still unclaimed (the next writer takes it), reads are
   byte-identical, and the orphans are GC-able (vacuum collects the
   staged files immediately and the stale ``.tmp`` once unambiguously
   old), never adoptable-by-accident.

2. LINK→POST-COMMIT: the ``os.link`` IS the commit. A writer dying
   immediately after (before its checkpoint write, before its caches
   update, before it even learns the link succeeded) has fully
   committed: cold readers see the version, an idempotent retry of
   the same txn_id is a no-op (the tail scan covers versions no
   checkpoint reached), and the next checkpoint-due commit heals the
   checkpoint chain.

3. MID-VACUUM: vacuum only ever deletes UNREFERENCED files, so dying
   between any two deletions leaves a state where every retained read
   still works and a re-run finishes the GC — partial vacuum is just
   less vacuum.
"""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from xlsx_to_database_spark.operators.txn_table import (
    TxnTable,
    _log_dir,
    _manifest_path,
)


def _mk(spark, path, rows=100):
    t = TxnTable(spark, path, "k")
    t.create(
        spark.createDataFrame(
            [(k, 2 * k) for k in range(1, rows + 1)], "k long, v long"
        ).repartitionByRange(2, "k")
    )
    return t


def _parquet_on_disk(root: str) -> set[str]:
    out = set()
    for sub in ("data", "dv"):
        base = os.path.join(root, sub)
        for dirpath, _, names in os.walk(base):
            for n in names:
                if n.endswith(".parquet"):
                    out.add(
                        os.path.relpath(os.path.join(dirpath, n), root)
                    )
    return out


def test_crash_between_stage_and_link(spark, tmp_path):
    """Writer dies AFTER staging files and writing the tmp manifest,
    BEFORE the atomic link: nothing is committed, the version stays
    unclaimed, reads are unchanged, and both orphan classes are
    GC-able on the documented schedule."""
    t = _mk(spark, str(tmp_path / "torn1"))
    before_rows = t.read().count()
    man = t.manifest()
    dead_v = man["version"] + 1

    # The real staging path (immutable files land under data/), then
    # the tmp manifest exactly as _commit writes it — and death. A
    # kill -9 runs no finally:, so the .tmp survives; simulate that
    # state directly rather than monkeypatching an exception through
    # _commit (whose finally WOULD clean up — a different, softer
    # failure than the one under test).
    staged = t._stage_files(
        spark.createDataFrame([(500, 1)], "k long, v long"), dead_v
    )
    tmp = f"{_manifest_path(t.path, dead_v)}.deadbeefcafe.tmp"
    with open(tmp, "w") as f:
        json.dump(
            {
                "version": dead_v,
                "op": "append",
                "stats_col": "k",
                "files": man["files"] + staged,
            },
            f,
        )

    # Cold reconstruction: a fresh instance neither sees the torn
    # version nor the staged rows.
    cold = TxnTable(spark, t.path, "k")
    assert cold.latest_version() == man["version"]
    assert cold.read().count() == before_rows

    # The next writer claims the SAME version number the dead writer
    # was aiming at — the name was never linked, so it is free.
    v2 = cold.append(spark.createDataFrame([(600, 2)], "k long, v long"))
    assert v2 == dead_v
    assert cold.read().count() == before_rows + 1
    got = {r.k for r in cold.read().collect()}
    assert 600 in got and 500 not in got, (
        "a torn commit's staged rows must never surface"
    )

    # Orphaned staged files: unreferenced by any manifest -> vacuum
    # collects them immediately (no age guard needed in single-writer
    # tests). The stale .tmp is swept only once >= 300 s old.
    orphan_rels = {e["path"] for e in staged}
    assert orphan_rels <= _parquet_on_disk(t.path)
    deleted, _kept = cold.vacuum()
    assert orphan_rels & _parquet_on_disk(t.path) == set()
    assert deleted >= len(orphan_rels)
    assert os.path.exists(tmp), (
        ".tmp younger than 300s must survive (a LIVE writer's "
        "write->link window must not be swept out from under it)"
    )
    os.utime(tmp, (time.time() - 400, time.time() - 400))
    cold.vacuum()
    assert not os.path.exists(tmp), "stale .tmp not swept"
    # and the table still reads correctly after both sweeps
    assert cold.read().count() == before_rows + 1


def test_crash_after_link_is_a_full_commit(spark, tmp_path):
    """Writer dies right after os.link succeeds — before writing its
    due checkpoint, before observing the result. The commit is
    complete: cold readers see it, the same txn_id retries as a
    no-op (scanned from the un-checkpointed tail), and the checkpoint
    chain heals at the next checkpoint-due commit."""
    t = TxnTable(spark, str(tmp_path / "torn2"), "k",
                 checkpoint_interval=2)
    t.create(spark.createDataFrame([(1, 1)], "k long, v long"))

    # Death injected at the narrowest possible point: the commit's
    # post-link checkpoint write. (The code treats checkpoints as
    # best-effort already; a crash is the harshest version of that.)
    orig_ckpt = TxnTable._write_checkpoint
    TxnTable._write_checkpoint = lambda self, version: None
    try:
        v = t.append_once(
            spark.createDataFrame([(2, 2)], "k long, v long"),
            txn_id="batch-7",
        )
        assert v == 1
    finally:
        TxnTable._write_checkpoint = orig_ckpt
    # v=1 was checkpoint-due (interval 2 -> v2? v1: 1 % 2 != 0; make
    # sure SOME version below is due) — regardless, no ckpt exists yet.
    log = _log_dir(t.path)
    assert not [n for n in os.listdir(log) if n.startswith("ckpt-")]

    # Cold process: the commit is visible...
    cold = TxnTable(spark, t.path, "k", checkpoint_interval=2)
    assert cold.latest_version() == 1
    assert cold.read().count() == 2
    # ...and the producer's retry of the same batch is a no-op even
    # though no checkpoint covers v1 (the tail scan does).
    again = cold.append_once(
        spark.createDataFrame([(2, 2)], "k long, v long"),
        txn_id="batch-7",
    )
    assert again is None
    assert cold.read().count() == 2

    # The next checkpoint-due commit writes a checkpoint that covers
    # the crashed writer's txn_id too — the chain self-heals.
    v2 = cold.append_once(
        spark.createDataFrame([(3, 3)], "k long, v long"),
        txn_id="batch-8",
    )
    assert v2 == 2
    cks = [n for n in os.listdir(log) if n.startswith("ckpt-")]
    assert cks, "checkpoint-due commit must write the checkpoint"
    ck = json.load(open(os.path.join(log, sorted(cks)[-1])))
    assert "batch-7" in ck["txn_ids"] and "batch-8" in ck["txn_ids"]
    # and duplicate detection now served FROM the checkpoint still works
    assert cold.append_once(
        spark.createDataFrame([(2, 2)], "k long, v long"),
        txn_id="batch-7",
    ) is None


def test_crash_mid_vacuum_is_resumable(spark, tmp_path):
    """Vacuum dies after deleting SOME unreferenced files: every
    retained read still works (only unreferenced files were touched)
    and a re-run completes the GC."""
    t = _mk(spark, str(tmp_path / "torn3"))
    t.append(spark.createDataFrame([(500, 1)], "k long, v long"))
    t.compact(target_files=1)  # orphans every pre-compact file
    live_rows = t.read().count()
    live_files = {e["path"] for e in t.manifest()["files"]}
    orphans = _parquet_on_disk(t.path) - live_files
    assert len(orphans) >= 3, "need several orphans to tear between"

    # Inject death after the FIRST successful deletion.
    real_remove = os.remove
    state = {"n": 0}

    def dying_remove(p):
        real_remove(p)
        state["n"] += 1
        if state["n"] == 1:
            raise KeyboardInterrupt("vacuum killed mid-GC")

    os.remove = dying_remove
    try:
        with pytest.raises(KeyboardInterrupt):
            t.vacuum()
    finally:
        os.remove = real_remove

    on_disk = _parquet_on_disk(t.path)
    assert live_files <= on_disk, "vacuum touched a live file"
    assert len(on_disk) == len(live_files) + len(orphans) - 1

    # Cold reconstruction + reads unaffected; a re-run finishes.
    cold = TxnTable(spark, t.path, "k")
    assert cold.read().count() == live_rows
    cold.vacuum()
    assert _parquet_on_disk(t.path) == live_files
    assert cold.read().count() == live_rows
    # time travel to pre-compact versions is the documented casualty
    # of vacuum (retention horizon) — not of the crash.


def test_crash_mid_checkpoint_write_leaves_no_poison(spark, tmp_path):
    """Writer dies DURING the checkpoint tmp write (after json began,
    before the link): the torn ``ckpt-*.json.*.tmp`` — even one
    containing truncated, unparseable JSON — must be invisible to
    ``_latest_checkpoint`` (the name filter requires the ``.json``
    suffix, which only the atomic link produces), duplicate detection
    must keep working from the tail scan, the NEXT checkpoint-due
    commit must write a real checkpoint, and vacuum must sweep the
    stale tmp on the same ≥300 s schedule as manifest tmps."""
    from xlsx_to_database_spark.operators.txn_table import _ckpt_path

    t = TxnTable(spark, str(tmp_path / "torn4"), "k",
                 checkpoint_interval=2)
    t.create(spark.createDataFrame([(1, 1)], "k long, v long"))
    v1 = t.append_once(
        spark.createDataFrame([(2, 2)], "k long, v long"),
        txn_id="cdc-1",
    )
    # Torn tmp: truncated JSON, the exact artifact of a mid-dump death.
    torn = f"{_ckpt_path(t.path, v1)}.deadbeef.tmp"
    with open(torn, "w") as f:
        f.write('{"version": 1, "txn_ids": ["cdc-1"')  # no close, no ]

    cold = TxnTable(spark, t.path, "k", checkpoint_interval=2)
    assert cold._latest_checkpoint() is None, (
        "a .tmp checkpoint must never be read"
    )
    assert cold.read().count() == 2
    # Dedup still served from the tail scan.
    assert cold.append_once(
        spark.createDataFrame([(2, 2)], "k long, v long"),
        txn_id="cdc-1",
    ) is None
    # Next checkpoint-due commit writes a REAL checkpoint beside the
    # torn tmp, and it parses.
    v2 = cold.append_once(
        spark.createDataFrame([(3, 3)], "k long, v long"),
        txn_id="cdc-2",
    )
    assert v2 == 2
    ck = cold._latest_checkpoint()
    assert ck is not None and "cdc-1" in ck["txn_ids"]
    # The torn tmp survives a young vacuum, then is swept once stale.
    cold.vacuum()
    assert os.path.exists(torn)
    os.utime(torn, (time.time() - 400, time.time() - 400))
    cold.vacuum()
    assert not os.path.exists(torn), "stale torn ckpt tmp not swept"
    assert cold.read().count() == 3


def test_crash_between_dv_write_and_commit_orphans_the_sidecar(
    spark, tmp_path
):
    """delete_where_dv dies between writing its deletion-vector
    sidecar and linking the manifest: the sidecar is UNREFERENCED —
    reads must be byte-identical (no row disappears), vacuum must
    collect the orphan, and a LIVE sidecar (from a committed DV
    delete) must never be collected — collecting it would silently
    RESURRECT deleted rows."""
    t = _mk(spark, str(tmp_path / "torn5"))
    # A committed DV delete first: its sidecar is live.
    t.delete_where_dv(F.col("k") % 10 == 3)
    rows_after_delete = t.read().count()
    live_dvs = {
        e["dv"]["path"] for e in t.manifest()["files"] if e.get("dv")
    }
    assert live_dvs, "scenario needs a committed DV sidecar"

    # The torn state: a second writer's sidecar written, never
    # referenced (death before _commit). Simulate with a stray
    # parquet under dv/ — content is irrelevant, reachability is the
    # contract.
    import shutil

    some_live = os.path.join(t.path, next(iter(live_dvs)))
    orphan_rel = os.path.join(
        "dv", "orphan-deadbeef.parquet"
    )
    orphan = os.path.join(t.path, orphan_rel)
    shutil.copyfile(some_live, orphan)

    cold = TxnTable(spark, t.path, "k")
    assert cold.read().count() == rows_after_delete, (
        "an unreferenced DV sidecar must not affect reads"
    )
    cold.vacuum()
    assert not os.path.exists(orphan), "orphan DV sidecar not GC'd"
    assert live_dvs <= _parquet_on_disk(t.path), (
        "vacuum collected a LIVE DV sidecar — deleted rows would "
        "resurrect"
    )
    assert cold.read().count() == rows_after_delete


def test_crash_mid_compact_preserves_old_layout(spark, tmp_path):
    """Compaction dies at the stage→link seam (rewritten file staged,
    manifest never linked): the OLD layout remains the committed
    truth — reads byte-identical, file list unchanged — the staged
    rewrite is vacuum-collectable, and a re-run compaction succeeds
    at the version the dead one was aiming for."""
    t = _mk(spark, str(tmp_path / "torn6"))
    t.append(spark.createDataFrame([(500, 1)], "k long, v long"))
    man = t.manifest()
    files_before = {e["path"] for e in man["files"]}
    rows_before = t.read().count()
    dead_v = man["version"] + 1

    # The compact rewrite staged, then death before the link (same
    # simulate-the-torn-state approach as test_crash_between_stage_
    # and_link: a kill -9 runs no finally, so both artifacts survive).
    staged = t._stage_files(t.read().coalesce(1), dead_v)
    tmp = f"{_manifest_path(t.path, dead_v)}.cafebabe.tmp"
    with open(tmp, "w") as f:
        json.dump(
            {
                "version": dead_v,
                "op": "compact",
                "stats_col": "k",
                "files": staged,
            },
            f,
        )

    cold = TxnTable(spark, t.path, "k")
    assert cold.latest_version() == man["version"]
    assert {e["path"] for e in cold.manifest()["files"]} == files_before
    assert cold.read().count() == rows_before

    # Re-run compaction: claims the dead writer's version, commits.
    cold.compact(target_files=1)
    assert cold.latest_version() == dead_v
    assert cold.read().count() == rows_before
    # The dead compact's staged file is an orphan; vacuum collects it
    # (and the pre-compact layout past retention), reads unaffected.
    orphan_rels = {e["path"] for e in staged}
    live_now = {e["path"] for e in cold.manifest()["files"]}
    assert orphan_rels.isdisjoint(live_now), (
        "the torn compact's staged file must not be adopted"
    )
    cold.vacuum()
    assert orphan_rels & _parquet_on_disk(t.path) == set()
    assert cold.read().count() == rows_before
