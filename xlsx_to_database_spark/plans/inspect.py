"""Physical-plan introspection helpers (SURVEY.md §4).

The engine's scale posture is *declared* (DataFrame/SQL) and *verified*
here: these helpers read ``df.explain``-style formatted plans so tests can
assert the plan properties that matter at 100 TB — filters pushed into the
parquet scan, columns pruned from ReadSchema, small dims broadcast instead
of shuffled, expressions inside whole-stage codegen.

Pure string inspection of the formatted plan keeps this on public API only
(``df._jdf.queryExecution()`` internals are avoided except the stable
``explainString`` entry point PySpark itself uses).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The text ``df.explain(mode)`` would print, as a string."""
    # Public-API route: DataFrame.explain prints to stdout; PySpark builds
    # the text via sc._jvm PythonSQLUtils.explainString. Same call here.
    jdf = df._jdf
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(jdf.queryExecution(), mode)


def has_pushed_filters(df: DataFrame, *needles: str) -> bool:
    """True if the scan's PushedFilters clause mentions every needle.

    With no needles: True if any non-empty PushedFilters list exists.
    """
    plan = explain_str(df)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    nonempty = [p for p in pushed if p.strip()]
    if not needles:
        return bool(nonempty)
    blob = " ".join(nonempty)
    return all(n in blob for n in needles)


def pruned_read_schema(df: DataFrame, table_hint: str | None = None) -> list[list[str]]:
    """Column names of each scan's ReadSchema (one list per scan).

    Tests assert a projection query reads only the columns it uses —
    at 100 TB an unpruned scan is the difference between reading 2 columns
    and reading 40.
    """
    plan = explain_str(df)
    out: list[list[str]] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        out.append(cols)
    return out


def has_broadcast_hash_join(df: DataFrame) -> bool:
    """True if the physical plan contains a BroadcastHashJoin (pre-AQE plan;
    AQE can only further improve it at runtime)."""
    return "BroadcastHashJoin" in explain_str(df)


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen subtrees in the plan. More fused
    operators per span = fewer virtual calls; zero spans means every
    operator fell out of codegen (e.g. a Python UDF in the hot path).

    Executes the DataFrame first (collect): under AQE the physical stages —
    and their codegen subtrees — only exist once the adaptive plan is final,
    so pre-execution introspection always reports zero. Intended for tests
    on small scale factors, not production paths.
    """
    df.collect()
    plan = explain_str(df, mode="codegen")
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", plan)
    return int(m.group(1)) if m else 0
