"""Minimal stdlib xlsx (ECMA-376 / OOXML) reader + writer.

No openpyxl in this environment (SURVEY.md §5.4), and the reference
class of tools parses the format directly, so this module implements
the needed subset over ``zipfile`` + ``xml.etree``:

reader: workbook/sheet enumeration, shared strings, inline strings,
cell type codes (s/b/str/inlineStr/e, default numeric), style-driven
date detection (builtin + custom number formats), Excel date serials
including the 1900 leap-year quirk, ragged rows.

writer: multi-sheet workbooks with shared strings, typed cells
(bool/number/string/datetime with a date style) — used for round-trip
tests and for staging oracle-checkable workbooks from the testdata.

Both sides stream row-by-row (iterparse / incremental write); memory is
O(row + shared strings), never O(sheet) — the property that lets one
Spark task decode one big sheet.
"""

from __future__ import annotations

import re
import zipfile
from datetime import datetime, timedelta
from typing import Any, Iterator
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape, quoteattr

NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
REL_NS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"

#: Excel built-in number-format ids that render as dates/times.
_DATE_BUILTIN_FMTS = set(range(14, 23)) | set(range(45, 48))

# OOXML string escaping (ECMA-376 §18.4): characters illegal in XML 1.0
# (C0 controls except \t \n \r, and U+FFFE/FFFF) are stored as _xHHHH_;
# a literal substring that *looks* like such an escape gets its leading
# underscore escaped as _x005F_. \r is legal XML but escaped anyway
# (as Excel does): XML parsers normalize \r → \n in text content, so a
# literal \r cannot round-trip unescaped.
_OOX_SEQ = re.compile(r"_x([0-9A-Fa-f]{4})_")
_XML_ILLEGAL = re.compile(r"[\x00-\x08\x0b-\x0c\x0d\x0e-\x1f￾￿]")


def escape_oox(s: str) -> str:
    """Escape a Python string for storage in an OOXML ``<t>`` element."""
    s = _OOX_SEQ.sub(lambda m: f"_x005F_x{m.group(1)}_", s)
    return _XML_ILLEGAL.sub(lambda m: f"_x{ord(m.group(0)):04X}_", s)


def unescape_oox(s: str) -> str:
    """Inverse of :func:`escape_oox` (also decodes files Excel wrote)."""
    return _OOX_SEQ.sub(lambda m: chr(int(m.group(1), 16)), s)


def _rich_text(el) -> str:
    """Visible text of an ``<si>`` or ``<is>`` element: the direct
    ``<t>`` plus rich-text run ``<r><t>`` children — NOT a blanket
    ``iter('t')``, which would also pick up phonetic ``<rPh>`` furigana
    runs and corrupt values from IME-authored files."""
    parts = []
    t = el.find(f"{NS}t")
    if t is not None:
        parts.append(t.text or "")
    for r in el.findall(f"{NS}r"):
        rt = r.find(f"{NS}t")
        if rt is not None:
            parts.append(rt.text or "")
    return "".join(parts)

# Epochs for Excel's 1900 date system. Serials ≥ 61 are relative to
# 1899-12-30 (absorbing the phantom 1900-02-29); serials ≤ 59 to
# 1899-12-31. Serial 60 *is* the phantom leap day — mapped to Feb 28.
_EPOCH_POST = datetime(1899, 12, 30)
_EPOCH_PRE = datetime(1899, 12, 31)


def excel_serial_to_datetime(serial: float, date1904: bool = False) -> datetime:
    """Excel date serial → datetime (SURVEY.md §5.4: the 1900-leap-year
    quirk is handled, not ignored). Result is rounded to the
    millisecond — a float64 day-serial only carries ~µs precision
    around modern dates, and sub-ms noise from the round-trip would
    otherwise leak into timestamps.

    ``date1904``: workbooks written with ``<workbookPr date1904="1"/>``
    (classic Mac Excel) count days from 1904-01-01 and have NO phantom
    1900-02-29 — ignoring the flag reads every date 4 years + 1 day
    early, silently."""
    if date1904:
        return datetime(1904, 1, 1) + timedelta(
            milliseconds=round(serial * 86400e3)
        )
    if serial >= 61:
        epoch, days = _EPOCH_POST, serial
    elif serial >= 60:  # the phantom 1900-02-29 → clamp to Feb 28
        epoch, days = datetime(1900, 2, 28), serial - 60
    else:
        epoch, days = _EPOCH_PRE, serial
    return epoch + timedelta(milliseconds=round(days * 86400e3))


def datetime_to_excel_serial(dt: datetime) -> float:
    delta = dt - _EPOCH_POST
    serial = delta.days + delta.seconds / 86400 + delta.microseconds / 86400e6
    if serial < 61:  # dates before 1900-03-01 sit on the pre-bug epoch
        serial -= 1
    return serial


def _col_index(cell_ref: str) -> int:
    """'A1' → 0, 'AB3' → 27 (0-based column index from a cell ref).

    Refs are uppercased first: some third-party writers emit lowercase
    refs, and 'a1' would otherwise map to column 32 and silently pad the
    row with Nones. Anything non-alphabetic before the digits is a
    malformed ref and raises rather than mis-indexing."""
    idx = 0
    for ch in cell_ref.upper():
        if ch.isdigit():
            break
        if not "A" <= ch <= "Z":
            raise ValueError(f"malformed cell ref {cell_ref!r}")
        idx = idx * 26 + (ord(ch) - 64)
    return idx - 1


_DATE_TOKEN_RE = re.compile(r"[ymdhs]", re.IGNORECASE)
_STRIP_RE = re.compile(r'\[[^\]]*\]|"[^"]*"|\\.')


def _is_date_format(fmt_code: str) -> bool:
    """Heuristic per OOXML practice: a format is a date format if it
    contains y/m/d/h/s tokens outside brackets/quotes/escapes."""
    return bool(_DATE_TOKEN_RE.search(_STRIP_RE.sub("", fmt_code)))


class Workbook:
    """Lazily-parsed xlsx workbook."""

    def __init__(self, path: str):
        self.path = path
        self._zf = zipfile.ZipFile(path)
        self._shared: list[str] | None = None
        self._date_styles: set[int] | None = None
        self.sheets = self._sheet_map()

    def _sheet_map(self) -> dict[str, str]:
        """sheet name → zip member path, in workbook order."""
        rels = {}
        rel_path = "xl/_rels/workbook.xml.rels"
        if rel_path in self._zf.namelist():
            root = ET.fromstring(self._zf.read(rel_path))
            for rel in root:
                target = rel.get("Target").lstrip("/")
                if not target.startswith("xl/"):
                    target = "xl/" + target
                rels[rel.get("Id")] = target
        out: dict[str, str] = {}
        wb = ET.fromstring(self._zf.read("xl/workbook.xml"))
        pr = wb.find(f"{NS}workbookPr")
        self.date1904 = pr is not None and pr.get("date1904") in (
            "1", "true",
        )
        self.hidden_sheets: set[str] = set()
        for sheet in wb.find(f"{NS}sheets"):
            rid = sheet.get(f"{REL_NS}id")
            out[sheet.get("name")] = rels.get(rid, f"xl/worksheets/sheet{sheet.get('sheetId')}.xml")
            # state="hidden"/"veryHidden": authors park scratch sheets
            # there; they stay readable by name but are excluded from
            # wildcard selection under visibleOnly (xlsx data source).
            if sheet.get("state") in ("hidden", "veryHidden"):
                self.hidden_sheets.add(sheet.get("name"))
        return out

    @property
    def shared_strings(self) -> list[str]:
        if self._shared is None:
            self._shared = []
            name = "xl/sharedStrings.xml"
            if name in self._zf.namelist():
                for _, el in ET.iterparse(self._zf.open(name)):
                    if el.tag == f"{NS}si":
                        self._shared.append(unescape_oox(_rich_text(el)))
                        el.clear()
        return self._shared

    @property
    def date_styles(self) -> set[int]:
        """Indices into cellXfs whose number format is a date format."""
        if self._date_styles is None:
            self._date_styles = set()
            name = "xl/styles.xml"
            if name in self._zf.namelist():
                root = ET.fromstring(self._zf.read(name))
                custom = {}
                num_fmts = root.find(f"{NS}numFmts")
                if num_fmts is not None:
                    for nf in num_fmts:
                        custom[int(nf.get("numFmtId"))] = nf.get("formatCode", "")
                cell_xfs = root.find(f"{NS}cellXfs")
                if cell_xfs is not None:
                    for i, xf in enumerate(cell_xfs):
                        fid = int(xf.get("numFmtId", "0"))
                        if fid in _DATE_BUILTIN_FMTS or (
                            fid in custom and _is_date_format(custom[fid])
                        ):
                            self._date_styles.add(i)
        return self._date_styles

    @property
    def defined_names(self) -> dict[str, tuple[str, int, int, int, int]]:
        """Workbook-level defined names (named ranges): name →
        (sheet, row1, col1, row2, col2), 0-based inclusive. Parses
        ``<definedNames><definedName name="X">Sheet1!$A$2:$C$10``
        (quoted sheet names and single-cell refs included); names whose
        refersTo is not a simple rectangular ref (formulas, unions,
        #REF! errors) are skipped — scan semantics only exist for
        rectangles."""
        out: dict[str, tuple[str, int, int, int, int]] = {}
        wb = ET.fromstring(self._zf.read("xl/workbook.xml"))
        dns = wb.find(f"{NS}definedNames")
        if dns is None:
            return out
        for dn in dns:
            name, ref = dn.get("name"), (dn.text or "").strip()
            if not name or "!" not in ref:
                continue
            sheet, _, cells = ref.rpartition("!")
            if sheet.startswith("'") and sheet.endswith("'"):
                sheet = sheet[1:-1].replace("''", "'")
            cells = cells.replace("$", "")
            a, _, b = cells.partition(":")
            b = b or a
            try:
                r1 = int("".join(ch for ch in a if ch.isdigit())) - 1
                r2 = int("".join(ch for ch in b if ch.isdigit())) - 1
                c1, c2 = _col_index(a), _col_index(b)
            except ValueError:
                continue
            if sheet in self.sheets and 0 <= r1 <= r2 and 0 <= c1 <= c2:
                out[name] = (sheet, r1, c1, r2, c2)
        return out

    def iter_range(self, name: str) -> Iterator[list[Any]]:
        """Yield the rows of defined name ``name``, column-sliced to the
        range's rectangle and padded to its full width — the
        read-a-named-table surface (ranges are how spreadsheet authors
        mark the DATA region of a sheet full of titles and notes)."""
        try:
            sheet, r1, c1, r2, c2 = self.defined_names[name]
        except KeyError:
            raise KeyError(
                f"defined name {name!r} not in workbook {self.path} "
                f"(has {sorted(self.defined_names)})"
            ) from None
        width = c2 - c1 + 1
        for rn, row in self.iter_rows(sheet, numbered=True):
            if rn < r1:
                continue
            if rn > r2:
                break
            sliced = row[c1: c2 + 1]
            while len(sliced) < width:
                sliced.append(None)
            yield sliced

    def merged_ranges(self, sheet_name: str) -> list[tuple[int, int, int, int]]:
        """(row1, col1, row2, col2) 0-based inclusive bounds of each
        ``<mergeCell ref="A2:B4"/>`` on the sheet. One cheap streaming
        pre-pass; sheets without merges return []."""
        out: list[tuple[int, int, int, int]] = []
        for _, el in ET.iterparse(self._zf.open(self.sheets[sheet_name])):
            if el.tag == f"{NS}mergeCell":
                ref = el.get("ref", "")
                if ":" in ref:
                    a, b = ref.split(":", 1)
                    r1 = int("".join(ch for ch in a if ch.isdigit())) - 1
                    r2 = int("".join(ch for ch in b if ch.isdigit())) - 1
                    out.append((r1, _col_index(a), r2, _col_index(b)))
            el.clear()
        return out

    def iter_rows(
        self, sheet_name: str, fill_merged: bool = False,
        numbered: bool = False,
    ) -> Iterator[Any]:
        """Yield rows as lists of decoded python values (None for empty
        cells; ragged rows padded on read by the caller).
        ``numbered=True`` yields ``(row_number, row)`` with the sheet's
        TRUE 0-based row number (sparse sheets omit blank ``<row>``
        elements, so positional counting would drift) — the contract
        ``iter_range`` slices against.

        ``fill_merged=True`` propagates each merged range's top-left
        value to every cell of the range — the report-layout unpivot
        every spreadsheet ETL needs (a region label merged down its
        group's rows becomes a proper column). Costs one extra streaming
        pass to collect ``<mergeCells>`` (they live AFTER sheetData);
        row-major order guarantees the top-left value is seen before any
        cell it must fill, so the fill is one dict of active ranges."""
        member = self.sheets[sheet_name]
        shared, date_styles = self.shared_strings, self.date_styles
        ranges = self.merged_ranges(sheet_name) if fill_merged else []
        fills: dict[int, Any] = {}  # range index -> top-left value
        rn = -1
        for _, el in ET.iterparse(self._zf.open(member)):
            if el.tag != f"{NS}row":
                continue
            rn = int(el.get("r", rn + 2)) - 1
            row: list[Any] = []
            for c in el.iter(f"{NS}c"):
                idx = _col_index(c.get("r", "")) if c.get("r") else len(row)
                while len(row) < idx:
                    row.append(None)
                row.append(self._decode_cell(c, shared, date_styles))
            if ranges:
                for k, (r1, c1, r2, c2) in enumerate(ranges):
                    if rn == r1 and len(row) > c1 and row[c1] is not None:
                        fills[k] = row[c1]
                    if r1 <= rn <= r2 and k in fills:
                        while len(row) <= c2:
                            row.append(None)
                        for cc in range(c1, c2 + 1):
                            if row[cc] is None:
                                row[cc] = fills[k]
            yield (rn, row) if numbered else row
            el.clear()

    def _decode_cell(self, c, shared: list[str], date_styles: set[int]) -> Any:
        t = c.get("t", "n")
        if t == "inlineStr":
            is_el = c.find(f"{NS}is")
            return unescape_oox(_rich_text(is_el)) if is_el is not None else None
        v = c.find(f"{NS}v")
        if v is None or v.text is None:
            return None
        raw = v.text
        if t == "s":
            return shared[int(raw)]
        if t == "str":
            return unescape_oox(raw)
        if t == "b":
            return raw == "1"
        if t == "e":
            return None
        # numeric; date if the cell style carries a date number format
        num = float(raw)
        if int(c.get("s", "-1")) in date_styles:
            return excel_serial_to_datetime(num, self.date1904)
        return int(num) if num.is_integer() and "e" not in raw.lower() and "." not in raw else num

    def close(self) -> None:
        self._zf.close()


def read_workbook(path: str) -> Workbook:
    return Workbook(path)


# ---------------------------------------------------------------------------
# Writer
# ---------------------------------------------------------------------------

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
{sheet_overrides}
<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

#: style index 1 = datetime format (builtin 22: m/d/yy h:mm)
_STYLES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<fonts count="1"><font/></fonts><fills count="1"><fill/></fills>
<borders count="1"><border/></borders>
<cellStyleXfs count="1"><xf/></cellStyleXfs>
<cellXfs count="2"><xf numFmtId="0"/><xf numFmtId="22" applyNumberFormat="1"/></cellXfs>
</styleSheet>"""


def _col_letter(idx: int) -> str:
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(65 + rem) + out
    return out


def write_workbook(
    path: str,
    sheets: dict[str, tuple[list[str], list[tuple]]],
    defined_names: dict[str, str] | None = None,
) -> None:
    """Write a multi-sheet xlsx: {sheet_name: (header, rows)}.

    Strings go through the shared-string table (exercising the reader's
    main path); bool/int/float are native cells; datetimes become date
    serials with a date style. xlsx is a small-data format — callers
    stage dimensions/samples, never fact tables.

    ``defined_names``: name → A1-style ref (``"Sheet1!$A$2:$C$10"``),
    emitted as workbook-level ``<definedNames>`` — the named-range
    surface ``Workbook.iter_range`` reads back.
    """
    shared: dict[str, int] = {}

    def sref(s: str) -> int:
        return shared.setdefault(s, len(shared))

    sheet_xmls: list[str] = []
    for _, (header, rows) in sheets.items():
        lines = ["<sheetData>"]
        for r, row in enumerate([tuple(header)] + list(rows), start=1):
            cells = []
            for ci, val in enumerate(row):
                ref = f"{_col_letter(ci)}{r}"
                if val is None:
                    continue
                if r == 1 or isinstance(val, str):
                    cells.append(f'<c r="{ref}" t="s"><v>{sref(str(val))}</v></c>')
                elif isinstance(val, bool):
                    cells.append(f'<c r="{ref}" t="b"><v>{int(val)}</v></c>')
                elif isinstance(val, datetime):
                    cells.append(
                        f'<c r="{ref}" s="1"><v>{datetime_to_excel_serial(val)!r}</v></c>'
                    )
                elif isinstance(val, (int, float)):
                    cells.append(f'<c r="{ref}"><v>{val!r}</v></c>')
                else:
                    cells.append(f'<c r="{ref}" t="s"><v>{sref(str(val))}</v></c>')
            lines.append(f'<row r="{r}">' + "".join(cells) + "</row>")
        lines.append("</sheetData>")
        sheet_xmls.append(
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
            + "".join(lines)
            + "</worksheet>"
        )

    sheet_entries = "".join(
        # quoteattr, not escape: attribute context must escape quotes too.
        f'<sheet name={quoteattr(name)} sheetId="{i + 1}" r:id="rId{i + 1}"/>'
        for i, name in enumerate(sheets)
    )
    dn_xml = ""
    if defined_names:
        dn_xml = "<definedNames>" + "".join(
            f"<definedName name={quoteattr(n)}>{escape(ref)}</definedName>"
            for n, ref in defined_names.items()
        ) + "</definedNames>"
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f"<sheets>{sheet_entries}</sheets>{dn_xml}</workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" '
            'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(sheets))
        )
        + f'<Relationship Id="rId{len(sheets) + 1}" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" '
        'Target="sharedStrings.xml"/>'
        + f'<Relationship Id="rId{len(sheets) + 2}" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" '
        'Target="styles.xml"/>'
        "</Relationships>"
    )
    ordered = sorted(shared, key=shared.get)
    sst = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="{len(ordered)}" uniqueCount="{len(ordered)}">'
        + "".join(f'<si><t xml:space="preserve">{escape(escape_oox(s))}</t></si>' for s in ordered)
        + "</sst>"
    )
    overrides = "".join(
        f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
        'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        for i in range(len(sheets))
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _CONTENT_TYPES.format(sheet_overrides=overrides))
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        zf.writestr("xl/styles.xml", _STYLES)
        zf.writestr("xl/sharedStrings.xml", sst)
        for i, xml in enumerate(sheet_xmls):
            zf.writestr(f"xl/worksheets/sheet{i + 1}.xml", xml)
