"""Schema inference + identifier sanitization for the xlsx source
(SURVEY.md §1.3, §2.1 xlsx_infer / ident_sanitize).

Promotion lattice (least → most general), mirroring what xlsx-ETL
tools infer from untyped cells:

    boolean → long → double → timestamp → string

A column whose observed cell types don't fit a single lattice chain
degrades to string (the top). Nulls are type-transparent.
"""

from __future__ import annotations

import re
from datetime import datetime
from typing import Any, Iterable

from pyspark.sql.types import (
    BooleanType,
    DataType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: lattice rank — max() of observed ranks wins; incompatible pairs
#: (e.g. boolean + double) jump to string.
_RANK = {"boolean": 0, "long": 1, "double": 2, "timestamp": 3, "string": 4}
_NUMERIC = {"long", "double"}
_SPARK_TYPE: dict[str, DataType] = {
    "boolean": BooleanType(),
    "long": LongType(),
    "double": DoubleType(),
    "timestamp": TimestampType(),
    "string": StringType(),
}


def _cell_kind(v: Any) -> str | None:
    if v is None:
        return None
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, int):
        return "long"
    if isinstance(v, float):
        return "double"
    if isinstance(v, datetime):
        return "timestamp"
    return "string"


def _merge(a: str | None, b: str | None) -> str | None:
    if a is None:
        return b
    if b is None or a == b:
        return a
    if {a, b} <= _NUMERIC:
        return "double"
    return "string"  # any other mix is incompatible → top


def infer_column_kinds(rows: Iterable[list[Any]], n_cols: int) -> list[str]:
    kinds: list[str | None] = [None] * n_cols
    for row in rows:
        for i in range(n_cols):
            v = row[i] if i < len(row) else None
            kinds[i] = _merge(kinds[i], _cell_kind(v))
    return [k or "string" for k in kinds]


def kinds_to_schema(names: list[str], kinds: list[str]) -> StructType:
    return StructType(
        [StructField(n, _SPARK_TYPE[k], nullable=True) for n, k in zip(names, kinds)]
    )


def coerce(v: Any, kind: str) -> Any:
    """Coerce a decoded cell to the column's inferred/declared kind
    (handles mixed columns that degraded to string, and int-typed
    cells in double columns).

    A cell that cannot fit the kind becomes None rather than passing
    through: inference may have sampled only a prefix of the sheet
    (``sampleRows``), and an off-sample misfit (e.g. 'N/A' in a numeric
    column) must degrade to null, not crash the executor's Arrow
    conversion."""
    if v is None:
        return None
    if kind == "string":
        if isinstance(v, bool):
            return "true" if v else "false"
        return v if isinstance(v, str) else str(v)
    if kind == "boolean":
        return v if isinstance(v, bool) else None
    if kind == "long":
        if isinstance(v, bool):
            return None
        if isinstance(v, int):
            return v
        if isinstance(v, float) and v.is_integer():
            return int(v)
        return None
    if kind == "double":
        if isinstance(v, bool):
            return None
        if isinstance(v, (int, float)):
            return float(v)
        return None
    if kind == "timestamp":
        return v if isinstance(v, datetime) else None
    return v


# ---------------------------------------------------------------------------
# Identifier sanitization (§2.1 ident_sanitize)
# ---------------------------------------------------------------------------

_IDENT_BAD = re.compile(r"[^a-z0-9_]+")


def sanitize_identifier(name: str) -> str:
    """Header text → SQL identifier: lowercase, non-alphanumerics → _,
    collapse/trim underscores, prefix digits, never empty."""
    out = _IDENT_BAD.sub("_", name.strip().lower()).strip("_")
    out = re.sub(r"_+", "_", out)
    if not out:
        out = "col"
    if out[0].isdigit():
        out = "c_" + out
    return out


def sanitize_headers(headers: list[Any]) -> list[str]:
    """Sanitize a header row and deduplicate collisions with _2, _3…

    Collision handling probes against *all* names assigned so far — a
    naive per-base counter can collide a suffixed name with a positional
    fallback (e.g. headers [None, None, '', ''] → col_2 twice).
    """
    used: set[str] = set()
    out: list[str] = []
    for i, h in enumerate(headers):
        base = sanitize_identifier(str(h)) if h is not None else f"col_{i + 1}"
        name, n = base, 1
        while name in used:
            n += 1
            name = f"{base}_{n}"
        used.add(name)
        out.append(name)
    return out


def align_to_schema(df, target: StructType, prefix: str = ""):
    """Map a messily-headed staging DataFrame onto a target table schema —
    the load-time column mapping every spreadsheet→database pipeline
    performs: source headers match target fields by NORMALIZED name
    (lowercase, separators stripped, the target's table prefix like
    ``n_`` optional in the source), matched columns cast to the target
    type, unmatched source columns dropped, missing target columns
    filled with typed NULLs. Pure projection — zero shuffles; the
    mapping is resolved at plan time from schema metadata only.
    Ambiguous matches (two source columns normalizing onto one target)
    raise rather than silently picking one."""
    from pyspark.sql import functions as F

    def norm(name: str) -> str:
        return re.sub(r"[^a-z0-9]", "", name.lower())

    by_norm: dict[str, list[str]] = {}
    for c in df.columns:
        by_norm.setdefault(norm(c), []).append(c)
    cols = []
    for field in target.fields:
        keys = [norm(field.name)]
        if prefix and field.name.startswith(prefix):
            keys.append(norm(field.name[len(prefix):]))
        matches = [c for k in keys for c in by_norm.get(k, [])]
        if len(set(matches)) > 1:
            raise ValueError(
                f"ambiguous mapping for {field.name!r}: {sorted(set(matches))}"
            )
        if matches:
            cols.append(F.col(matches[0]).cast(field.dataType).alias(field.name))
        else:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    return df.select(*cols)
