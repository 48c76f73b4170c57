"""Multi-writer model-based testing (round-10 verdict #3).

The single-writer model (test_txn_table_model.py) checks COMPOSED op
semantics against a Python model; the directed races pin KNOWN
interleavings. This layer closes the remaining gap: several REAL
threads compose seeded op mixes against ONE table concurrently, and
the result is checked against a serializable reference.

Serializability argument: each thread owns a DISJOINT key range (the
base table's keys are split among threads, inserts stay in-range and
predicates are range-scoped), so every committed op's CONTENT effect
is independent of cross-thread commit order — the reference is simply
the composition of each thread's single-writer model over its own
ops that reported success. What the concurrency then actually
exercises is the PROTOCOL: version races and rebasing, file adoption
across interleaved commits, hit-file conflict refusals (the base
files hold every thread's keys, so DV ops collide at file granularity
even with disjoint keys), type-registry folds from racing staging,
divergent-type new-column races (ConcurrentSchemaError), and the
read-schema pin staying coherent under all of it.

Ledger invariant: every success records the version its commit
returned; across threads those versions must be EXACTLY 1..latest
with no gaps or duplicates (create=0) — a duplicate would mean a
shadowed commit, a gap a phantom manifest.

Refused ops (ConcurrentWriteError after internal retries) must be
no-ops: the thread records nothing and the model skips them — any
partial effect shows up as content divergence.

Seeds default to 3 in CI (env SPARK_GRAFT_MW_SEEDS for batteries);
threads per seed: 3.
"""

from __future__ import annotations

import copy
import os
import random
import threading

from pyspark.sql import functions as F

from xlsx_to_database_spark.operators.txn_table import (
    CheckViolation,
    ConcurrentWriteError,
    TxnTable,
)


def _df(spark, cols, rows, types=None):
    schema = ", ".join(f"{c} {(types or {}).get(c, 'long')}" for c in cols)
    return spark.createDataFrame(
        [tuple(r.get(c) for c in cols) for r in rows], schema
    )


N_THREADS = 3
BASE_PER_THREAD = 12  # base keys per thread-owned range


def _run_writer(
    spark, t_path: str, tid: int, seed: int, ledger: list, errs: list,
    snapshot_interval: int = 10, clones: list | None = None,
) -> None:
    """One writer thread: a seeded mix over its own key range.

    Appends to ``ledger`` tuples (version, kind, payload) for every op
    whose commit SUCCEEDED; content effects are replayed from the
    ledger afterwards. All data columns are long; the deliberate
    'clash' column is long for even tids and double for odd ones, so
    racing first-introductions exercise the divergent-type refusal.

    Round-12 extensions (round-11 verdict #6): CHECK-constraint
    appends (violators must be clean no-ops, conformers must land),
    shallow CLONES (recorded in ``clones`` with the pinned source
    version; verified against the reference snapshot afterwards), and
    RESTOREs (the reference replays the ledger in GLOBAL commit-
    version order and resets to the per-version snapshot — restore is
    the one op whose effect does NOT commute across threads, so the
    version order, which IS the serialization order, is the only
    correct replay). ``snapshot_interval=2`` seeds force every other
    manifest to be delta-encoded, so reconstruction chains sit under
    every concurrent read/commit (round-11 verdict #5).
    """
    rng = random.Random(10_000 * seed + tid)
    t = TxnTable(spark, t_path, "k", snapshot_interval=snapshot_interval)
    lo = 1_000_000 * (tid + 1)  # thread-owned insert space
    base_lo = 1 + BASE_PER_THREAD * tid  # thread-owned base keys
    next_key = lo
    # The thread's OWN evolving column: introduced by append_col,
    # renamed/dropped/re-added only by this thread (names are
    # tid-scoped), so metadata ops stay serializable per thread while
    # their MAP allocations race globally against every other writer.
    my_cur: str | None = None
    my_dropped: list[str] = []
    try:
        for step in range(rng.randint(5, 7)):
            op = rng.choices(
                ["append", "append_col", "merge", "dv_delete",
                 "dv_update", "compact_small", "once", "clash_col",
                 "rename_own", "drop_own", "vacuum", "check_append",
                 "clone", "restore"],
                weights=[16, 9, 13, 9, 9, 5, 5, 5, 7, 5, 3, 6, 3, 2],
            )[0]
            try:
                if op in ("append", "append_col", "clash_col"):
                    cols = ["k", "v"]
                    extra, types = {}, None
                    if op == "append_col":
                        if my_cur is None:
                            # fresh name, or RE-ADD a dropped one (the
                            # fresh-physical-slot allocation path)
                            my_cur = (
                                rng.choice(my_dropped)
                                if my_dropped and rng.random() < 0.5
                                else f"t{tid}c{step}"
                            )
                        cols.append(my_cur)
                        extra[my_cur] = 70_000 + step
                    elif op == "clash_col":
                        # Divergent first-introduction: odd threads
                        # stage 'clash' as double, even as long — the
                        # fold lets exactly one type win; losers refuse
                        # (ConcurrentSchemaError or pre-stage drift).
                        cols.append("clash")
                        if tid % 2:
                            extra["clash"] = float(tid) + 0.5
                            types = {"clash": "double"}
                        else:
                            extra["clash"] = 10 + tid
                    n = rng.randint(1, 3)
                    rows = [
                        {"k": next_key + i, "v": rng.randint(0, 99),
                         **extra}
                        for i in range(n)
                    ]
                    next_key += n
                    v = t.append(_df(spark, cols, rows, types))
                    ledger.append((v, "upsert", rows))
                elif op == "merge":
                    ks = [
                        rng.randint(base_lo, base_lo + BASE_PER_THREAD - 1)
                        for _ in range(rng.randint(1, 2))
                    ] + [next_key]
                    next_key += 1
                    rows = [
                        {"k": k, "v": 1_000 * tid + step} for k in set(ks)
                    ]
                    v, _, _ = t.merge(_df(spark, ["k", "v"], rows), "k")
                    ledger.append((v, "upsert", rows))
                elif op == "dv_delete":
                    m, r0 = rng.choice([5, 7]), rng.randint(0, 3)
                    pred = (
                        (F.col("k") % m == r0)
                        & (F.col("k") >= base_lo)
                        & (
                            (F.col("k") < base_lo + BASE_PER_THREAD)
                            | ((F.col("k") >= lo) & (F.col("k") < lo + 10**6))
                        )
                    )
                    v, marked, _ = t.delete_where_dv(pred)
                    if marked:  # no-match deletes commit nothing
                        ledger.append((v, "delete", (m, r0, tid)))
                elif op == "dv_update":
                    m, r0 = rng.choice([4, 6]), rng.randint(0, 2)
                    val = -(100 * tid + step + 1)
                    pred = (
                        (F.col("k") % m == r0)
                        & (F.col("k") >= base_lo)
                        & (F.col("k") < base_lo + BASE_PER_THREAD)
                    )
                    v, marked, _ = t.update_where_dv(
                        pred, {"v": F.lit(val)}
                    )
                    if marked:
                        ledger.append((v, "update", (m, r0, tid, val)))
                elif op == "compact_small":
                    v, n_comp, _ = t.compact_small(max_rows=500)
                    if n_comp:
                        ledger.append((v, "layout", None))
                elif op == "rename_own":
                    if my_cur is None:
                        continue
                    new = f"t{tid}c{step}"
                    v = t.rename_column(my_cur, new)
                    ledger.append((v, "rename", (my_cur, new)))
                    my_cur = new
                elif op == "drop_own":
                    if my_cur is None:
                        continue
                    v = t.drop_column(my_cur)
                    ledger.append((v, "drop", (my_cur,)))
                    my_dropped.append(my_cur)
                    my_cur = None
                elif op == "vacuum":
                    # Age-guarded per the documented multi-writer
                    # contract (a racer's staged-uncommitted files must
                    # survive): collects nothing here, but exercises
                    # the liveness walk concurrently with commits.
                    t.vacuum(retain_versions=3, min_age_seconds=120)
                elif op == "check_append":
                    bad = rng.random() < 0.5
                    row = {
                        "k": next_key,
                        "v": -1 if bad else rng.randint(0, 99),
                    }
                    next_key += 1
                    df = _df(spark, ["k", "v"], [row])
                    if bad:
                        try:
                            t.append(df, check=F.col("v") >= 0)
                            raise AssertionError(
                                "CHECK-violating append landed"
                            )
                        except CheckViolation:
                            pass  # clean refusal — nothing recorded
                    else:
                        v = t.append(df, check=F.col("v") >= 0)
                        ledger.append((v, "upsert", [row]))
                elif op == "clone":
                    # Pin the source version explicitly so the clone
                    # is verifiable against that version's reference
                    # snapshot regardless of racing commits.
                    src_v = t.latest_version()
                    cpath = f"{t_path}_clone_{tid}_{step}"
                    t.clone_to(cpath, version=src_v)
                    if clones is not None:
                        clones.append((src_v, cpath))
                elif op == "restore":
                    tgt = rng.randint(0, t.latest_version())
                    v = t.restore(tgt)
                    ledger.append((v, "restore", tgt))
                elif op == "once":
                    tok = f"mw-{seed}-{tid}-{step}"
                    row = {"k": next_key, "v": 777}
                    next_key += 1
                    df = _df(spark, ["k", "v"], [row])
                    v = t.append_once(df, tok)
                    replay = t.append_once(df, tok)
                    assert replay is None, "append_once replay landed"
                    if v is not None:
                        ledger.append((v, "upsert", [row]))
            except (ConcurrentWriteError, ValueError):
                # Refused op: must be a clean no-op (checked by the
                # final content compare). ValueError covers the
                # clash-column loser whose drift is visible pre-stage.
                continue
    except Exception as e:  # noqa: BLE001 — surface in the main thread
        errs.append((tid, e))


def test_multiwriter_schedules_match_serializable_model(spark, tmp_path):
    n_seeds = int(os.environ.get("SPARK_GRAFT_MW_SEEDS", "3"))
    base = int(os.environ.get("SPARK_GRAFT_MW_SEED_BASE", "51000")) - 51_000
    for seed in range(base, base + n_seeds):
        # Odd seeds force snapshot_interval=2: every other manifest is
        # delta-encoded, so the whole mix — concurrent commits, DV
        # reads, vacuum liveness walks, restore targets, clone sources
        # — runs over reconstruction chains (round-11 verdict #5).
        _run_seed(
            spark, tmp_path, 51_000 + seed,
            snapshot_interval=2 if seed % 2 else 10,
        )


def _run_seed(
    spark, tmp_path, seed: int, snapshot_interval: int = 10
) -> None:
    root = str(tmp_path / f"mw{seed}")
    t = TxnTable(spark, root, "k", snapshot_interval=snapshot_interval)
    n_base = BASE_PER_THREAD * N_THREADS
    base = {k: {"k": k, "v": 2 * k} for k in range(1, n_base + 1)}
    t.create(
        _df(spark, ["k", "v"], list(base.values()))
        .repartitionByRange(3, "k")
    )

    ledgers: list[list] = [[] for _ in range(N_THREADS)]
    clones: list[tuple[int, str]] = []
    errs: list = []
    th = [
        threading.Thread(
            target=_run_writer,
            args=(spark, root, tid, seed, ledgers[tid], errs,
                  snapshot_interval, clones),
        )
        for tid in range(N_THREADS)
    ]
    for x in th:
        x.start()
    for x in th:
        x.join(timeout=600)
    assert not errs, f"seed {seed}: writer thread(s) died: {errs}"

    # Ledger invariant: recorded versions are exactly 1..latest.
    recorded = sorted(v for led in ledgers for (v, _, _) in led)
    latest = t.latest_version()
    assert recorded == list(range(1, latest + 1)), (
        f"seed {seed}: committed-version ledger {recorded} != "
        f"1..{latest} (shadowed or phantom commit)"
    )

    # Serializable reference, replayed in GLOBAL commit-version order
    # (the versions ARE the serialization order — the gapless ledger
    # invariant above proves every success has exactly one). Disjoint
    # key ranges make the content ops commute, so this is equivalent
    # to the old per-thread composition — but RESTORE does not
    # commute: it resets the whole table to an earlier version's
    # state, which only the version-ordered replay (with a snapshot
    # kept per version, restore targets included) models correctly.
    def owner(k: int) -> int:
        if k >= 1_000_000:
            return k // 1_000_000 - 1
        return (k - 1) // BASE_PER_THREAD

    model = {k: dict(r) for k, r in base.items()}
    cols = {"k", "v"}
    snaps: dict[int, tuple[dict, set]] = {
        0: (copy.deepcopy(model), set(cols))
    }
    entries = sorted(
        (v, kind, payload)
        for led in ledgers
        for (v, kind, payload) in led
    )
    for v, kind, payload in entries:
        if kind == "upsert":
            for r in payload:
                cols.update(r)
                cur = model.get(r["k"], {})
                cur.update(r)
                model[r["k"]] = cur
        elif kind == "delete":
            m, r0, owner_tid = payload
            model = {
                k: r for k, r in model.items()
                if not (k % m == r0 and owner(k) == owner_tid)
            }
        elif kind == "update":
            # dv_update predicates are scoped to BASE keys only
            m, r0, owner_tid, val = payload
            for k, r in model.items():
                if (
                    k < 1_000_000
                    and k % m == r0
                    and owner(k) == owner_tid
                ):
                    r["v"] = val
        elif kind == "rename":
            # thread-owned column: only this thread's rows carry it
            old, new = payload
            cols.discard(old)
            cols.add(new)
            for r in model.values():
                if old in r:
                    r[new] = r.pop(old)
        elif kind == "drop":
            (name,) = payload
            cols.discard(name)
            for r in model.values():
                r.pop(name, None)
        elif kind == "restore":
            model, cols = snaps[payload]
            model, cols = copy.deepcopy(model), set(cols)
        snaps[v] = (copy.deepcopy(model), set(cols))

    def check_content(df, want_model, want_cols, what):
        assert set(df.columns) == want_cols, (
            f"seed {seed} {what}: schema {sorted(df.columns)} != "
            f"{sorted(want_cols)}"
        )
        got = {r["k"]: {c: r[c] for c in want_cols if r[c] is not None}
               for r in df.collect()}
        want = {k: {c: x for c, x in r.items() if x is not None}
                for k, r in want_model.items()}
        assert got == want, (
            f"seed {seed} {what}: content diverged "
            f"(got {len(got)} rows, want {len(want)})"
        )

    df = t.read()
    check_content(df, model, cols, "final")

    # Every clone is an immutable pin of its source version: its
    # content must equal the reference snapshot at that version even
    # though racers kept committing (and restoring) around the clone.
    for src_v, cpath in clones:
        cm, cc = snaps[src_v]
        check_content(
            TxnTable(spark, cpath, "k").read(), cm, cc,
            f"clone@v{src_v}",
        )

    # The clash column, when present, holds exactly one registered type
    # (the race loser refused) and the registry agrees with the data.
    if "clash" in cols:
        man = t.manifest()
        reg_t = man["schema"]["clash"]
        assert reg_t in ("bigint", "double")
        assert dict(df.dtypes)["clash"] == reg_t
