"""Partition-invariance audit: every ORACLED op's Spark result must be
identical under different shuffle-partition counts.

Why: an op whose output depends on physical partitioning (a window
ordered by a non-total key, a first()/collect_list over an ambiguous
order, a tie-broken rank) can pass the DuckDB oracle by luck on one run
and fail the next — exactly how the round-6 sf0.1 sweep caught
win_bollinger (the synthetic lineitem has ~118k duplicated
(l_orderkey, l_linenumber) groups with materially different rows, so
"orderkey, linenumber" is NOT a row id on this data). Changing
``spark.sql.shuffle.partitions`` perturbs tie resolution; an op that
hashes identically across counts is partition-invariant in practice.

Only oracled ops are audited: rows-only ops (seeded rand sampling,
streaming drains, media) may be legitimately partition-dependent and
are covered by their replay-pinned unit tests instead.

Usage: python tools/determinism_audit.py [sf_dir] [op ...]
Env:   DET_PARTS="32,17"  shuffle-partition counts to compare.
       DET_OUT=path       also write a committed JSON artifact (same
                          spirit as MIRROR_OUT — round-8 verdict #6:
                          the sweep was narrated in SCALE.md but not
                          tracked/diffable round-over-round).
Exit 0 iff every audited op hashes identically across counts.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_correctness import value_hash  # noqa: E402


def main() -> int:
    sf_dir = (
        sys.argv[1]
        if len(sys.argv) > 1 and "/" in sys.argv[1]
        else "/root/testdata/sf0.1"
    )
    only = {a for a in sys.argv[1:] if "/" not in a}
    parts = [
        p.strip() for p in os.environ.get("DET_PARTS", "32,17").split(",")
    ]

    import __spark_entry__ as entry_mod
    from xlsx_to_database_spark.session import get_spark

    spark = get_spark("determinism-audit")
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()

    bad, n = [], 0
    results: dict[str, str] = {}
    for name in sorted(oracles):
        if only and name not in only:
            continue
        n += 1
        hashes = []
        try:
            for p in parts:
                # The registry wrapper calls tune_session() inside
                # every query, which re-applies RUNTIME_CONFS and would
                # clobber a bare spark.conf.set here (a first version of
                # this tool did exactly that, making both runs execute
                # at the default count and the audit vacuous — caught in
                # review). Patch the RUNTIME_CONFS source of truth so
                # the wrapper itself applies the audited count.
                from xlsx_to_database_spark import session as _sess

                _sess.RUNTIME_CONFS["spark.sql.shuffle.partitions"] = p
                spark.conf.set("spark.sql.shuffle.partitions", p)
                df = qs[name](spark, sf_dir)
                assert (
                    spark.conf.get("spark.sql.shuffle.partitions") == p
                ), "tune_session clobbered the audited partition count"
                rows = df.collect()
                hashes.append(value_hash([tuple(r) for r in rows], df.columns))
        except Exception as e:  # noqa: BLE001
            bad.append(name)
            results[name] = f"error: {str(e)[:200]}"
            print(f"✗ {name}: error: {str(e)[:200]}")
            continue
        finally:
            from xlsx_to_database_spark import session as _sess

            _sess.RUNTIME_CONFS["spark.sql.shuffle.partitions"] = parts[0]
            spark.conf.set("spark.sql.shuffle.partitions", parts[0])
        if len(set(hashes)) != 1:
            bad.append(name)
            results[name] = "partition_dependent"
            print(f"✗ {name}: partition-DEPENDENT result "
                  f"(hashes differ across shuffle={parts})")
        else:
            results[name] = "invariant"
            print(f"✓ {name}")
    out_path = os.environ.get("DET_OUT")
    if out_path:
        import json

        with open(out_path, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "shuffle_partitions": parts,
                    "n_audited": n,
                    # derived from results, NOT len(bad): bad also holds
                    # ops that ERRORED, a distinct failure class the
                    # artifact must not conflate (round-9 ADVICE)
                    "n_partition_dependent": sum(
                        1 for v in results.values()
                        if v == "partition_dependent"
                    ),
                    "n_errors": sum(
                        1 for v in results.values()
                        if v.startswith("error:")
                    ),
                    "results": results,
                },
                f,
                indent=1,
                sort_keys=True,
            )
        print(f"wrote {out_path}")
    n_dep = sum(1 for v in results.values() if v == "partition_dependent")
    n_err = sum(1 for v in results.values() if v.startswith("error:"))
    print(f"\n{n} audited, {n_dep} partition-dependent, "
          f"{n_err} errored: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
