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

import os
import random
import threading

from pyspark.sql import functions as F

from xlsx_to_database_spark.operators.txn_table import (
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
    spark, t_path: str, tid: int, seed: int, ledger: list, errs: list
) -> None:
    """One writer thread: a seeded mix over its own key range.

    Appends to ``ledger`` tuples (version, kind, payload) for every op
    whose commit SUCCEEDED; content effects are replayed from the
    ledger afterwards. All data columns are long; the deliberate
    'clash' column is long for even tids and double for odd ones, so
    racing first-introductions exercise the divergent-type refusal.
    """
    rng = random.Random(10_000 * seed + tid)
    t = TxnTable(spark, t_path, "k")
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
                 "rename_own", "drop_own", "vacuum"],
                weights=[18, 9, 14, 9, 9, 5, 5, 5, 7, 5, 3],
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
    for seed in range(n_seeds):
        _run_seed(spark, tmp_path, 51_000 + seed)


def _run_seed(spark, tmp_path, seed: int) -> None:
    root = str(tmp_path / f"mw{seed}")
    t = TxnTable(spark, root, "k")
    n_base = BASE_PER_THREAD * N_THREADS
    base = {k: {"k": k, "v": 2 * k} for k in range(1, n_base + 1)}
    t.create(
        _df(spark, ["k", "v"], list(base.values()))
        .repartitionByRange(3, "k")
    )

    ledgers: list[list] = [[] for _ in range(N_THREADS)]
    errs: list = []
    th = [
        threading.Thread(
            target=_run_writer,
            args=(spark, root, tid, seed, ledgers[tid], errs),
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

    # Serializable reference: compose each thread's model over its own
    # key range (disjoint by construction), in that thread's ledger
    # order. Base keys are partitioned among threads the same way the
    # writers scope their predicates.
    def owner(k: int) -> int:
        if k >= 1_000_000:
            return k // 1_000_000 - 1
        return (k - 1) // BASE_PER_THREAD

    model = {k: dict(r) for k, r in base.items()}
    cols = {"k", "v"}
    for tid in range(N_THREADS):
        for _, kind, payload in sorted(ledgers[tid]):
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

    df = t.read()
    assert set(df.columns) == cols, (
        f"seed {seed}: schema {sorted(df.columns)} != {sorted(cols)}"
    )
    got = {r["k"]: {c: r[c] for c in cols if r[c] is not None}
           for r in df.collect()}
    want = {k: {c: x for c, x in r.items() if x is not None}
            for k, r in model.items()}
    assert got == want, (
        f"seed {seed}: content diverged "
        f"(got {len(got)} rows, want {len(want)})"
    )

    # The clash column, when present, holds exactly one registered type
    # (the race loser refused) and the registry agrees with the data.
    if "clash" in cols:
        man = t.manifest()
        reg_t = man["schema"]["clash"]
        assert reg_t in ("bigint", "double")
        assert dict(df.dtypes)["clash"] == reg_t
