"""Stage-once / copy-per-call fixtures for txn-table query ops.

The txn-table headliners' timed region used to include BUILDING their
base table (a Spark parquet write of a whole input table) on every
invocation — ~2 s of tmpfs churn per call that drowned the operation
actually being measured (round-7 verdict: table_delete_vectors' 2.59 s
was "mostly fixture"). The fix: the base table is created ONCE per
(process, sf_dir, fixture-name) under a ``__base`` root, and each
invocation gets a fresh private copy via ``shutil.copytree`` — pure
OS-level file copy of a few MB (no Spark job, single-digit ms), so the
op's wall-clock tracks the commit protocol + read-back, not repeated
fixture staging. TxnTable manifests reference data files by RELATIVE
path, so a copied tree is a fully self-contained, writable table.

The ``__base`` root is content-addressed by a fixture VERSION SALT in
its name: change the build closure → bump the salt → stale bases from
older code can never leak into a newer op's run (the /tmp cache
survives across processes on purpose — the driver's correctness runs
and bench's pre-stage pass share it).
"""

from __future__ import annotations

import os
import shutil


def staged_copy(name: str, sf_dir: str, build, work_tag: str | None = None) -> str:
    """Return a fresh working copy of the base fixture ``name``.

    ``build(root)`` must create the base table at ``root`` on first
    use. The base is built into a pid-unique temp dir and atomically
    ``os.rename``d into place, so a concurrent first caller either
    wins the rename or discards its duplicate — never observes a
    half-built base.

    ``work_tag`` names the WORKING copy when several ops share one base
    (round-8 ADVICE: table_delete_vectors and table_update_vectors both
    stage from ``txn_dv_v1``; deriving the scratch root from the base
    name alone made concurrent invocations rmtree/copytree over each
    other's live table). Defaults to ``name`` for single-consumer
    fixtures.
    """
    tag = os.path.basename(os.path.normpath(sf_dir))
    base = f"/tmp/spark_stage/{tag}_{name}__base"
    if not os.path.isdir(base):
        tmp = f"{base}.build-{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        build(tmp)
        try:
            os.rename(tmp, base)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)  # a racer built it
    work = f"/tmp/spark_stage/{tag}_{work_tag or name}"
    shutil.rmtree(work, ignore_errors=True)
    shutil.copytree(base, work)
    return work
