"""Model-based lifecycle test over the FULL single-writer op surface.

``test_random_op_sequences_match_model`` (test_txn_table.py) composes
append/merge/delete only; the seeded schedule stresses check structural
invariants (chain contiguity, exactly-once, map consistency) but not
content. This test closes the gap between them: a seeded random
sequence over the ENTIRE single-writer surface — appends (with schema
evolution, including re-adding a dropped name), full/narrow/additive
MERGE, deletion-vector DELETE and UPDATE, RENAME (key column included)
and DROP COLUMN, RESTORE (across renames, drops, and DV commits),
compact / compact_small / reorg_purge, vacuum, and append_once replay —
with the table compared for FULL content + schema equality against a
plain-Python model after every op, and time-travel reads compared
against per-version model snapshots at the end.

Interactions this composes that no directed test covers: restore to a
pre-drop version resurrecting a retired-slot column and then appending
a new column on top of it; a DV update through a renamed key; compact
over a mixed pre/post-rename file set followed by restore across the
compaction; vacuum bounding which snapshots restore may target.

Scale note: the model is O(rows) Python on a 20..~100-row table — the
point is op-graph coverage, not volume; volume is the mirrors' job.
Seeds default to 8 in CI (env SPARK_GRAFT_MODEL_SEEDS for batteries).
"""

from __future__ import annotations

import copy
import os
import random

import pytest
from pyspark.sql import functions as F

from xlsx_to_database_spark.operators.txn_table import TxnTable


def _df(spark, cols: list[str], rows: list[dict]):
    schema = ", ".join(f"{c} long" for c in cols)
    data = [tuple(r.get(c) for c in cols) for r in rows]
    return spark.createDataFrame(data, schema)


def _read_state(t: TxnTable, key: str, version=None):
    df = t.read(version)
    cols = set(df.columns)
    rows = {r[key]: r.asDict() for r in df.collect()}
    return cols, rows


def test_full_surface_random_lifecycle_matches_model(spark, tmp_path):
    from tests.conftest import battery_n

    # Default tier 2 seeds / full tier 8 (r14 verify-budget split).
    n_seeds = int(
        os.environ.get("SPARK_GRAFT_MODEL_SEEDS", str(battery_n(2, 8)))
    )
    for seed in range(n_seeds):
        _run_seed(spark, tmp_path, 31_000 + seed)


def _run_seed(spark, tmp_path, seed: int) -> None:
    rng = random.Random(seed)
    root = str(tmp_path / f"model{seed}")
    t = TxnTable(spark, root, "k")

    key = "k"
    cols = ["k", "v"]
    rows = {k: {"k": k, "v": 2 * k} for k in range(1, 21)}
    t.create(_df(spark, cols, list(rows.values())).repartitionByRange(3, "k"))

    # version -> (key_name, cols, rows) snapshots; `readable` gates the
    # end-of-seed time-travel checks (vacuum retains only latest).
    hist = {0: (key, list(cols), copy.deepcopy(rows))}
    readable = {0}
    dropped_names: list[str] = []
    next_key, next_col, next_tok = 1000, 0, 0
    ops_run = []

    def snap():
        v = t.latest_version()
        hist[v] = (key, list(cols), copy.deepcopy(rows))
        readable.add(v)

    def fresh_col():
        nonlocal next_col
        next_col += 1
        return f"c{next_col}"

    lo_hi = os.environ.get("SPARK_GRAFT_MODEL_STEPS", "6-10").split("-")
    for step in range(rng.randint(int(lo_hi[0]), int(lo_hi[-1]))):
        op = rng.choices(
            ["append", "merge", "dv_delete", "dv_update", "rename",
             "drop", "restore", "layout", "vacuum", "once",
             "cow_delete", "check_append", "clone"],
            weights=[18, 13, 10, 10, 9, 7, 8, 6, 4, 4, 6, 3, 2],
        )[0]

        if op == "append":
            n = rng.randint(1, 5)
            new_col = None
            if rng.random() < 0.4:
                # 50/50: a brand-new name vs RE-ADDING a dropped name —
                # the re-add must land in a fresh physical slot and old
                # values must NOT resurrect.
                if dropped_names and rng.random() < 0.5:
                    new_col = rng.choice(
                        [c for c in dropped_names if c not in cols]
                        or [fresh_col()]
                    )
                else:
                    new_col = fresh_col()
            batch_cols = cols + ([new_col] if new_col else [])
            batch = [
                {**{c: None for c in batch_cols},
                 key: next_key + i,
                 **({new_col: 9000 + step} if new_col else {}),
                 **{c: rng.randint(0, 99) for c in cols if c != key}}
                for i in range(n)
            ]
            next_key += n
            t.append(_df(spark, batch_cols, batch))
            if new_col:
                for r in rows.values():
                    r[new_col] = None
                cols.append(new_col)
            for b in batch:
                rows[b[key]] = {c: b.get(c) for c in cols}

        elif op == "merge":
            variant = rng.choice(["full", "narrow", "additive"])
            ks = rng.sample(sorted(rows), min(len(rows), rng.randint(1, 4)))
            if not ks or rng.random() < 0.5:
                ks.append(next_key)
                next_key += 1
            if variant == "narrow" and len(cols) > 1:
                non_key = [c for c in cols if c != key]
                m_cols = [key] + rng.sample(
                    non_key, rng.randint(1, len(non_key))
                )
            elif variant == "additive":
                m_cols = list(cols) + [fresh_col()]
            else:
                m_cols = list(cols)
            src = [
                {c: (k if c == key else 500 + step) for c in m_cols}
                for k in ks
            ]
            t.merge(_df(spark, m_cols, src), key)
            if variant == "additive":
                new_c = m_cols[-1]
                for r in rows.values():
                    r[new_c] = None
                cols.append(new_c)
            for s in src:
                k = s[key]
                if k in rows:  # matched: unmentioned columns survive
                    rows[k].update({c: s[c] for c in m_cols})
                else:  # inserted: unmentioned columns read NULL
                    rows[k] = {
                        c: s.get(c) for c in cols
                    }

        elif op == "dv_delete":
            m, r0 = rng.choice([2, 3, 5, 7]), rng.randint(0, 4)
            t.delete_where_dv(F.col(key) % m == r0)
            rows = {k: v for k, v in rows.items() if k % m != r0}

        elif op == "dv_update":
            non_key = [c for c in cols if c != key]
            if not non_key:
                continue
            c = rng.choice(non_key)
            m, r0, val = rng.choice([2, 3, 5]), rng.randint(0, 2), -step - 1
            t.update_where_dv(F.col(key) % m == r0, {c: F.lit(val)})
            for k, r in rows.items():
                if k % m == r0:
                    r[c] = val

        elif op == "rename":
            old = (
                key if rng.random() < 0.2
                else rng.choice(cols)
            )
            new = fresh_col()
            t.rename_column(old, new)
            cols[cols.index(old)] = new
            for r in rows.values():
                r[new] = r.pop(old)
            if old == key:
                key = new

        elif op == "drop":
            non_key = [c for c in cols if c != key]
            if not non_key:
                continue
            c = rng.choice(non_key)
            t.drop_column(c)
            cols.remove(c)
            dropped_names.append(c)
            for r in rows.values():
                r.pop(c)

        elif op == "restore":
            targets = [v for v in hist if v < t.latest_version()]
            if not targets:
                continue
            tv = rng.choice(targets)
            try:
                t.restore(tv)
            except (FileNotFoundError, ValueError):
                pass  # vacuumed target refused; state must be unchanged
            else:
                key, c_snap, r_snap = hist[tv]
                cols = list(c_snap)
                rows = copy.deepcopy(r_snap)

        elif op == "layout":
            kind = rng.choice(["compact", "small", "purge"])
            if kind == "compact":
                t.compact(target_files=2)
            elif kind == "small":
                t.compact_small(max_rows=50)
            else:
                t.reorg_purge(max_deleted_ratio=0.2)

        elif op == "vacuum":
            t.vacuum()
            readable.intersection_update({t.latest_version()})

        elif op == "once":
            next_tok += 1
            tok = f"model-{seed}-t{next_tok}"
            row = {c: 777 for c in cols}
            row[key] = next_key
            next_key += 1
            df = _df(spark, cols, [row])
            first = t.append_once(df, tok)
            replay = t.append_once(df, tok)
            assert first is not None and replay is None, (
                f"seed {seed} step {step}: append_once replay landed"
            )
            rows[row[key]] = dict(row)

        elif op == "cow_delete":
            # Copy-on-write delete: matching files rewritten without
            # the rows — content semantics identical to the DV path,
            # composed here against DV/rename/restore interleavings.
            m, r0 = rng.choice([3, 5, 7]), rng.randint(0, 2)
            t.delete_where(F.col(key) % m == r0)
            rows = {k: v for k, v in rows.items() if k % m != r0}

        elif op == "check_append":
            # A CHECK-violating append must reject WITHOUT committing
            # and leave the table exactly as it was (staged files are
            # swept); a passing CHECK commits normally.
            from xlsx_to_database_spark.operators.txn_table import (
                CheckViolation,
            )

            good = rng.random() < 0.5
            batch = [{c: (1 if good else -1) for c in cols}]
            batch[0][key] = next_key
            next_key += 1
            try:
                t.append(
                    _df(spark, cols, batch),
                    check=(F.col(key) > 0) if good
                    else F.col(key) < -(10 ** 9),
                )
            except CheckViolation:
                assert not good
            else:
                assert good
                rows[batch[0][key]] = dict(batch[0])

        elif op == "clone":
            # Shallow clone is zero-copy and ISOLATED: a write into the
            # clone must never leak into the source's content.
            cpath = str(tmp_path / f"model{seed}-clone{step}")
            c = t.clone_to(cpath)
            c.append(_df(spark, cols, [
                {**{x: 123 for x in cols}, key: 900_000 + step}
            ]))
            c_cols, c_rows = _read_state(c, key)
            assert c_cols == set(cols)
            assert 900_000 + step in c_rows
            assert set(c_rows) - {900_000 + step} == set(rows), (
                f"seed {seed} step {step}: clone content != source"
            )

        ops_run.append(op)
        got_cols, got_rows = _read_state(t, key)
        assert got_cols == set(cols), (
            f"seed {seed} step {step} ({' '.join(ops_run)}): schema "
            f"{sorted(got_cols)} != model {sorted(cols)}"
        )
        assert got_rows == rows, (
            f"seed {seed} step {step} ({' '.join(ops_run)}): content "
            f"diverged from model"
        )
        snap()

    # Time-travel: every still-readable recorded version must present
    # ITS schema (pre-rename names, pre-evolution width) and ITS rows.
    check = [v for v in sorted(readable) if v in hist]
    for v in rng.sample(check, min(3, len(check))):
        k_v, c_v, r_v = hist[v]
        got_cols, got_rows = _read_state(t, k_v, v)
        assert got_cols == set(c_v), f"seed {seed} v{v}: schema drift"
        assert got_rows == r_v, f"seed {seed} v{v}: time travel drift"
