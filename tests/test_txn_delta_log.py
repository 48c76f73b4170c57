"""Delta-encoded manifests (round 11): off-snapshot versions store
only the commit's (add, remove) file delta vs version-1 — O(changed)
JSON per commit — while every ``snapshot_interval``-th version stores
the full list. This is the action-log half of Delta's checkpoint
design; without it a 10M-file table writes ~1 GB of manifest PER
COMMIT. These tests pin the on-disk encoding, the reconstruction
equivalence, and that every consumer surface (time travel, restore,
CDC, vacuum, append_once token scans) is encoding-transparent.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from xlsx_to_database_spark.operators.txn_table import (
    TxnTable,
    _manifest_path,
)


def _mk(spark, path, interval=3):
    t = TxnTable(spark, path, "k", snapshot_interval=interval)
    t.create(
        spark.createDataFrame(
            [(k, 2 * k) for k in range(1, 31)], "k long, v long"
        ).repartitionByRange(3, "k")
    )
    return t


def _raw(t, v):
    return json.load(open(_manifest_path(t.path, v)))


def test_on_disk_encoding_alternates_delta_and_snapshot(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "enc"), interval=3)
    for i in range(7):
        t.append(spark.createDataFrame([(100 + i, i)], "k long, v long"))
    for v in range(t.latest_version() + 1):
        raw = _raw(t, v)
        if v % 3 == 0:
            assert "files" in raw, f"v{v} should be a full snapshot"
            assert "delta_base" not in raw
        else:
            assert "files" not in raw, f"v{v} should be a delta"
            assert raw["delta_base"] == v - 1
            # an append's delta is O(changed): 1 added file, 0 removed
            assert len(raw["add"]) == 1 and raw["remove"] == []
        # metadata rides FULL in every manifest, delta or not
        assert raw["schema"]["k"] == "bigint"
        assert ["k", "bigint"] in raw["read_schema"]


def test_reconstruction_matches_fresh_instance_and_content(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "rec"), interval=4)
    t.append(spark.createDataFrame([(101, 1)], "k long, v long"))
    t.merge(spark.createDataFrame([(5, -5), (102, -1)], "k long, v long"), "k")
    t.delete_where_dv(F.col("k") % 7 == 0)
    t.update_where_dv(F.col("k") % 11 == 3, {"v": F.lit(0)})
    t.compact(target_files=2)
    latest = t.latest_version()
    assert latest >= 5
    fresh = TxnTable(spark, t.path, "k", snapshot_interval=4)
    for v in range(latest + 1):
        a, b = t.manifest(v), fresh.manifest(v)
        assert a == b, f"v{v}: cached vs fresh reconstruction diverged"
        assert a["version"] == v
    # content through every reconstructed snapshot
    assert t.read(0).count() == 30
    assert t.read(1).count() == 31
    assert {r.k: r.v for r in t.read(2).collect()}[5] == -5
    n_after_del = t.read(3).count()
    assert n_after_del == 32 - len([k for k in list(range(1, 31)) + [101, 102] if k % 7 == 0])
    assert {r.k: r.v for r in t.read(4).collect()}[3] == 0
    assert t.read(latest).count() == n_after_del  # compact is content-preserving


def test_restore_vacuum_cdc_are_encoding_transparent(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "ops"), interval=3)
    t.append(spark.createDataFrame([(200, 9)], "k long, v long"))
    t.delete_where(F.col("k") <= 10)
    v = t.restore(0)
    assert t.read().count() == 30
    # CDC across delta-encoded commits folds to the end state
    changes = t.read_changes_rows(0, 2)
    assert changes.filter(F.col("_change_type") == "insert").count() > 0
    # vacuum walks RECONSTRUCTED manifests for liveness: the retained
    # restore manifest pins both its own files (v0's) and its rollback
    # target's (v2's), so only unreferenced empty staging parts are
    # collectible — the invariant is that no live file is ever
    # collected and every pinned snapshot stays readable after.
    deleted, kept = t.vacuum(retain_versions=1)
    assert kept > 0
    assert t.read().count() == 30
    assert t.read(2).count() == 21  # pinned history stays readable
    assert t.manifest(v)["op"] == "restore(0)"


def test_append_once_tokens_survive_delta_encoding(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "tok"), interval=3)
    one = spark.createDataFrame([(500, 1)], "k long, v long")
    assert t.append_once(one, "tok-a") is not None
    assert t.append_once(one, "tok-a") is None  # replay across a delta
    t.append(spark.createDataFrame([(501, 1)], "k long, v long"))
    assert t.append_once(one, "tok-a") is None  # and across more commits
    assert t.read().filter(F.col("k") == 500).count() == 1


def test_cold_cache_reconstruction_at_every_version(spark, tmp_path):
    # Crash-shaped replay (round-11 verdict #5): a reader that starts
    # from NOTHING (fresh instance, empty memo cache) at every single
    # version must reconstruct the same manifest and content a warm
    # instance serves — snapshot_interval=2 forces the deepest chains
    # the encoder produces (every odd version is a delta).
    t = TxnTable(spark, str(tmp_path / "cold"), "k", snapshot_interval=2)
    t.create(
        spark.createDataFrame(
            [(k, 2 * k) for k in range(1, 31)], "k long, v long"
        ).repartitionByRange(3, "k")
    )
    t.append(spark.createDataFrame([(101, 1)], "k long, v long"))
    t.merge(spark.createDataFrame([(5, -5)], "k long, v long"), "k")
    t.delete_where_dv(F.col("k") % 7 == 0)
    t.update_where_dv(F.col("k") % 11 == 3, {"v": F.lit(0)})
    t.append(spark.createDataFrame([(102, 2)], "k long, v long"))
    t.compact(target_files=2)
    t.restore(2)
    latest = t.latest_version()
    assert latest >= 7
    warm_counts = [t.read(v).count() for v in range(latest + 1)]
    for v in range(latest + 1):
        cold = TxnTable(spark, t.path, "k", snapshot_interval=2)
        assert cold._man_cache == {}, "instance must start cache-cold"
        assert cold.manifest(v) == t.manifest(v), f"v{v} manifests"
        assert cold.read(v).count() == warm_counts[v], f"v{v} content"


def test_vacuum_liveness_walk_across_delta_chains(spark, tmp_path):
    # Vacuum's liveness set is computed from RECONSTRUCTED manifests;
    # with snapshot_interval=2 every retained version is (or chains
    # through) a delta. After collecting history, every retained
    # version must stay readable and the live read must be untouched.
    t = TxnTable(spark, str(tmp_path / "vwalk"), "k", snapshot_interval=2)
    t.create(
        spark.createDataFrame(
            [(k, k) for k in range(1, 41)], "k long, v long"
        ).repartitionByRange(4, "k")
    )
    for i in range(4):
        t.append(spark.createDataFrame([(200 + i, i)], "k long, v long"))
    t.delete_where(F.col("k") <= 5)  # rewrite: makes old files orphanable
    t.compact(target_files=2)
    latest = t.latest_version()
    n_live = t.read().count()
    deleted, kept = t.vacuum(retain_versions=2)
    assert deleted > 0, "rewrite history must yield collectible files"
    assert t.read().count() == n_live
    for v in (latest - 1, latest):  # the retained window
        fresh = TxnTable(spark, t.path, "k", snapshot_interval=2)
        assert fresh.read(v).count() > 0
    # manifests BEFORE the retained window remain reconstructable as
    # metadata (vacuum collects data files, never the log), even cold
    fresh = TxnTable(spark, t.path, "k", snapshot_interval=2)
    assert fresh.manifest(0)["version"] == 0


def test_mass_rewrite_full_fallback_racing_append(spark, tmp_path, monkeypatch):
    # A compact rewrites (almost) every file, so the delta encoder's
    # "only when smaller" guard falls back to a FULL snapshot even at
    # an off-snapshot version. Race a blind append into exactly that
    # commit window: the compact must retry, adopt the racer's file by
    # reference, and the published manifest — whatever its encoding —
    # must reconstruct identically for a cold reader.
    t = TxnTable(spark, str(tmp_path / "mrw"), "k", snapshot_interval=5)
    t.create(
        spark.createDataFrame(
            [(k, k) for k in range(1, 41)], "k long, v long"
        ).repartitionByRange(8, "k")
    )
    orig = t._commit
    raced = {"done": False}

    def patched(version, op, files, txn_id=None, **kw):
        if op == "compact" and not raced["done"]:
            raced["done"] = True
            racer = TxnTable(spark, t.path, "k", snapshot_interval=5)
            racer.append(
                spark.createDataFrame([(999, 999)], "k long, v long")
                .coalesce(1)
            )
        return orig(version, op, files, txn_id=txn_id, **kw)

    monkeypatch.setattr(t, "_commit", patched)
    v, n_before = t.compact(target_files=2)
    assert v == 2 and n_before == 8
    got = {r.k: r.v for r in t.read().collect()}
    assert got.get(999) == 999 and len(got) == 41
    # v1 (the racer) is a delta; v2 (the mass rewrite) fell back to a
    # full snapshot because its delta would not have been smaller.
    assert "delta_base" in _raw(t, 1)
    assert "files" in _raw(t, 2)
    cold = TxnTable(spark, t.path, "k", snapshot_interval=5)
    for ver in range(t.latest_version() + 1):
        assert cold.manifest(ver) == t.manifest(ver)


def test_restore_commit_racing_append_stays_reconstructable(
    spark, tmp_path, monkeypatch
):
    # Restore republishes an old version's file list — another
    # not-delta-shaped commit. Let a blind append steal restore's
    # version: restore must refuse cleanly (no phantom manifest), and
    # a retried restore over the deeper log lands with every version
    # still cold-reconstructable.
    t = TxnTable(spark, str(tmp_path / "rra"), "k", snapshot_interval=2)
    t.create(
        spark.createDataFrame(
            [(k, k) for k in range(1, 21)], "k long, v long"
        ).repartitionByRange(2, "k")
    )
    t.append(spark.createDataFrame([(100, 1)], "k long, v long"))
    t.append(spark.createDataFrame([(101, 2)], "k long, v long"))
    orig = t._commit
    raced = {"done": False}

    def patched(version, op, files, txn_id=None, **kw):
        if op.startswith("restore(") and not raced["done"]:
            raced["done"] = True
            racer = TxnTable(spark, t.path, "k", snapshot_interval=2)
            racer.append(
                spark.createDataFrame([(999, 9)], "k long, v long")
                .coalesce(1)
            )
        return orig(version, op, files, txn_id=txn_id, **kw)

    monkeypatch.setattr(t, "_commit", patched)
    import pytest as _pytest

    from xlsx_to_database_spark.operators.txn_table import (
        ConcurrentWriteError,
    )

    with _pytest.raises(ConcurrentWriteError):
        t.restore(0)
    v = t.restore(0)  # retry wins on the deeper log
    assert t.read().count() == 20  # rolled back; racer's row restored away
    assert t.manifest(v)["op"] == "restore(0)"
    cold = TxnTable(spark, t.path, "k", snapshot_interval=2)
    for ver in range(t.latest_version() + 1):
        assert cold.manifest(ver) == t.manifest(ver)


def test_delta_bytes_are_o_changed_not_o_files(spark, tmp_path):
    # The design claim, measured: an append to a many-file table must
    # write a manifest an order of magnitude smaller than the full
    # snapshot it would previously have written.
    t = TxnTable(spark, str(tmp_path / "sz"), "k", snapshot_interval=100)
    t.create(
        spark.createDataFrame(
            [(k, k) for k in range(1, 65)], "k long, v long"
        ).repartitionByRange(32, "k")  # 32 files
    )
    t.append(spark.createDataFrame([(1000, 1)], "k long, v long"))
    full = len(open(_manifest_path(t.path, 0), "rb").read())
    delta = len(open(_manifest_path(t.path, 1), "rb").read())
    assert delta * 5 < full, (full, delta)
