"""The xlsx PySpark Python Data Source (SURVEY.md §2.1 xlsx_scan /
xlsx_infer / xlsx_multisheet; §3.1 lifecycle).

Spark-first design: the workbook is exposed through the public
``pyspark.sql.datasource`` API so it composes with the whole engine —
``spark.read.format("xlsx").load(path)`` yields a normal DataFrame that
Catalyst optimizes like any other scan.

Parallelism: ``partitions()`` returns one InputPartition per selected
worksheet, so an N-sheet workbook decodes on N executor Python workers
concurrently (xlsx sheets are independently-compressed zip members —
per-sheet is the natural parallel grain; a single huge sheet streams
within one task in O(row) memory).

Pushdown: Python data sources get no automatic predicate pushdown, so
``pushFilters`` accepts simple comparison filters and applies them
during decode — rows are dropped *before* crossing the Python→JVM
Arrow boundary, which is the expensive edge of this source.

Options: ``sheet`` (name, or omitted = first sheet), ``header``
(default true), ``sanitize`` (default true: headers → SQL identifiers),
``sampleRows`` (inference sample size, default 200).
"""

from __future__ import annotations

import itertools
from typing import Any, Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    Filter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from xlsx_to_database_spark.sources import infer as I
from xlsx_to_database_spark.sources import xlsx_io


class SheetPartition(InputPartition):
    def __init__(self, path: str, sheet: str, range_name: str | None = None):
        self.path = path
        self.sheet = sheet
        self.range_name = range_name


def _range_opt(options: dict) -> str | None:
    """.option("range", "MyTable") scans a workbook-level defined name
    (named range) instead of whole sheets — how spreadsheet authors mark
    the data rectangle on a sheet of titles and notes."""
    return options.get("range") or None


def _selected_sheets(path: str, options: dict) -> list[str]:
    wb = xlsx_io.read_workbook(path)
    try:
        names = list(wb.sheets)
        hidden = wb.hidden_sheets
    finally:
        wb.close()
    # visibleOnly (default true) drops state="hidden"/"veryHidden"
    # sheets from DEFAULT and WILDCARD selection — scratch sheets don't
    # silently pollute a union read. Explicitly-named sheets are always
    # honored: asking for a sheet by name IS the override.
    if str(options.get("visibleOnly", options.get("visibleonly", "true"))
           ).lower() != "false":
        visible = [n for n in names if n not in hidden]
    else:
        visible = names
    sheet_opt = options.get("sheet")
    if sheet_opt in (None, ""):
        return (visible or names)[:1]
    if sheet_opt == "*":
        return visible or names
    if sheet_opt in names:
        # An exact match wins before comma-splitting, so a single sheet
        # whose own name contains a comma (legal in Excel) is selectable;
        # only multi-select lists with such names remain unsupported.
        return [sheet_opt]
    missing = [s for s in sheet_opt.split(",") if s not in names]
    if missing:
        raise ValueError(f"sheet(s) {missing} not in workbook {path} (has {names})")
    return sheet_opt.split(",")


def _fill_merged(options: dict) -> bool:
    """option("mergedCells", "fill") propagates each merged range's
    top-left value across the range (report-layout unpivot); the default
    leaves non-anchor cells None, byte-identical to the pre-option
    reader. Spark lower-cases Python DataSource option keys, so both
    spellings are accepted."""
    v = options.get("mergedCells", options.get("mergedcells", ""))
    return str(v).lower() == "fill"


def _header_and_kinds(path: str, sheet: str, options: dict) -> tuple[list[str], list[str]]:
    """One streaming pass over the first sampleRows rows → sanitized
    names + inferred column kinds."""
    has_header = str(options.get("header", "true")).lower() != "false"
    sample_n = int(options.get("sampleRows", "200"))
    wb = xlsx_io.read_workbook(path)
    try:
        rng = _range_opt(options)
        rows = (
            wb.iter_range(rng)
            if rng
            else wb.iter_rows(sheet, fill_merged=_fill_merged(options))
        )
        first = next(rows, None)
        if first is None:
            return [], []
        if has_header:
            headers: list[Any] = first
            sample = list(itertools.islice(rows, sample_n))
        else:
            headers = [f"col_{i + 1}" for i in range(len(first))]
            sample = [first] + list(itertools.islice(rows, sample_n - 1))
        n_cols = max([len(headers)] + [len(r) for r in sample])
        while len(headers) < n_cols:
            headers.append(f"col_{len(headers) + 1}")
        if str(options.get("sanitize", "true")).lower() != "false":
            names = I.sanitize_headers(headers)
        else:
            names = [str(h) for h in headers]
        return names, I.infer_column_kinds(sample, n_cols)
    finally:
        wb.close()


class XlsxDataSource(DataSource):
    """spark.read.format("xlsx").option("sheet", "...").load(path)"""

    @classmethod
    def name(cls) -> str:
        return "xlsx"

    def schema(self) -> StructType:
        path = self.options.get("path")
        if not path:
            raise ValueError("xlsx source requires a path")
        sheets = _selected_sheets(path, self.options)
        if not sheets:
            raise ValueError(f"workbook {path} has no sheets")
        # Schema from the first selected sheet; multi-sheet reads union
        # by position under that schema (sheets must be homogeneous,
        # as in sharded-export workbooks).
        names, kinds = _header_and_kinds(path, sheets[0], self.options)
        return I.kinds_to_schema(names, kinds)

    def reader(self, schema: StructType) -> "XlsxReader":
        return XlsxReader(schema, dict(self.options))

    def writer(self, schema: StructType, overwrite: bool) -> "XlsxWriter":
        return XlsxWriter(schema, dict(self.options), overwrite)


class XlsxReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.options = options
        self.path = options.get("path")
        self._filters: list[Filter] = []

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Accept EqualTo filters on scan columns (applied during
        decode, pre-Arrow); everything else stays with Spark."""
        names = {f.name for f in self.schema.fields}
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute[0] in names:
                self._filters.append(f)
            else:
                yield f  # unsupported → Spark re-applies

    def partitions(self) -> list[SheetPartition]:
        rng = _range_opt(self.options)
        if rng:  # a named range is one rectangle: one partition
            return [SheetPartition(self.path, "", range_name=rng)]
        return [SheetPartition(self.path, s) for s in _selected_sheets(self.path, self.options)]

    def read(self, partition: SheetPartition) -> Iterator[tuple]:
        has_header = str(self.options.get("header", "true")).lower() != "false"
        kinds = []
        for f in self.schema.fields:
            t = f.dataType.simpleString()
            kinds.append(t if t in ("boolean", "double", "timestamp", "string") else "long" if t in ("bigint", "long") else t)
        n_cols = len(kinds)
        eq_checks = [
            (i, f.value)
            for f in self._filters
            for i, fld in enumerate(self.schema.fields)
            if isinstance(f, EqualTo) and fld.name == f.attribute[0]
        ]
        wb = xlsx_io.read_workbook(partition.path)
        try:
            rows = (
                wb.iter_range(partition.range_name)
                if partition.range_name
                else wb.iter_rows(
                    partition.sheet, fill_merged=_fill_merged(self.options)
                )
            )
            if has_header:
                next(rows, None)
            for row in rows:
                vals = tuple(
                    I.coerce(row[i] if i < len(row) else None, kinds[i]) for i in range(n_cols)
                )
                if any(vals[i] != v for i, v in eq_checks):
                    continue
                yield vals
        finally:
            wb.close()


def register_xlsx_source(spark) -> None:
    """Idempotently register the xlsx format on a session."""
    spark.dataSource.register(XlsxDataSource)


class XlsxWriter(DataSourceWriter):
    """``df.write.format("xlsx").save(dir)`` — parquet-style directory
    semantics: each partition writes its own ``part-*.xlsx`` (xlsx is a
    zip, not appendable — one file per task is the only write shape
    that scales horizontally), ``commit`` drops ``_SUCCESS``. Sheet
    name via ``.option("sheet", ...)``; a single combined workbook is a
    driver-side concern (collect + write_workbook) for small results.
    """

    def __init__(self, schema: StructType, options: dict, overwrite: bool):
        self.schema = schema
        self.options = options
        self.path = options.get("path")
        if not self.path:
            raise ValueError("xlsx writer requires a path")
        self.sheet = options.get("sheet") or "Sheet1"
        self.overwrite = overwrite
        import os
        import uuid

        # Tasks write into a staging dir that only commit() promotes —
        # destroying the old output in __init__ would make a failed job
        # lose it with abort() unable to restore (overwrite must be
        # failure-atomic: old data survives until the new data is whole).
        self.staging = os.path.join(
            os.path.dirname(os.path.abspath(self.path)) or ".",
            f"._staging-{os.path.basename(self.path)}-{uuid.uuid4().hex}",
        )
        os.makedirs(self.staging, exist_ok=True)

    def write(self, iterator) -> WriterCommitMessage:
        import os
        import uuid

        rows = [tuple(r) for r in iterator]
        part = f"part-{uuid.uuid4().hex}.xlsx"
        if rows:  # empty partitions write nothing (parquet convention)
            xlsx_io.write_workbook(
                os.path.join(self.staging, part),
                {self.sheet: ([f.name for f in self.schema.fields], rows)},
            )
        return WriterCommitMessage()

    def commit(self, messages) -> None:
        import os
        import shutil

        with open(os.path.join(self.staging, "_SUCCESS"), "w"):
            pass
        if self.overwrite:
            shutil.rmtree(self.path, ignore_errors=True)
            os.rename(self.staging, self.path)  # atomic promote
        else:  # append: adopt staged parts into the existing directory
            os.makedirs(self.path, exist_ok=True)
            for name in os.listdir(self.staging):
                os.replace(
                    os.path.join(self.staging, name), os.path.join(self.path, name)
                )
            shutil.rmtree(self.staging, ignore_errors=True)

    def abort(self, messages) -> None:
        import shutil

        shutil.rmtree(self.staging, ignore_errors=True)
