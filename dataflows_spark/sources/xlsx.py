"""Minimal XLSX reader/writer on the Python stdlib (zipfile + ElementTree).

Parity target: the reference's xlsx support comes from tabulator's
openpyxl-backed parser (reference ``processors/load.py:130-137`` format
dispatch; exercised by ``tests/test_lib.py`` load matrix). This
container has no openpyxl, and an .xlsx is just a zip of XML parts, so
the reader below parses the OOXML spreadsheet structure directly:
``xl/workbook.xml`` (sheet registry) → ``xl/_rels/workbook.xml.rels``
(sheet part paths) → ``xl/worksheets/sheetN.xml`` (cells) +
``xl/sharedStrings.xml``.

SCALE NOTE: xlsx is a driver-side format by construction — the zip
container is not splittable and real-world sheets are ≤1M rows. The
reader materializes rows on the driver and hands Spark a parallelized
DataFrame; anything bigger belongs in csv/parquet.
"""

from __future__ import annotations

import re
import zipfile
import xml.etree.ElementTree as ET

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"
_RID_NS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"


def _col_index(ref: str) -> int:
    """'B7' → 1 (0-based column)."""
    letters = re.match(r"[A-Z]+", ref).group(0)
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def _cell_value(cell, shared: list[str]):
    t = cell.get("t", "n")
    v = cell.find(f"{_NS}v")
    if t == "inlineStr":
        is_el = cell.find(f"{_NS}is")
        return "".join(x.text or "" for x in is_el.iter(f"{_NS}t")) if is_el is not None else None
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "b":
        return v.text == "1"
    if t == "str":
        return v.text
    # numeric: integral values come back as int (tabulator/openpyxl parity)
    f = float(v.text)
    return int(f) if f.is_integer() and abs(f) < 2**53 else f


def read_xlsx(path: str, sheet: int | str = 1) -> tuple[list[str], list[list]]:
    """Parse one sheet → (header, data rows). ``sheet`` is a 1-based
    index or a sheet name. First row is the header (reference tabulator
    default ``headers=1``)."""
    with zipfile.ZipFile(path) as zf:
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        rel_map = {r.get("Id"): r.get("Target") for r in rels.iter(f"{_REL_NS}Relationship")}
        sheets = []
        for s in wb.iter(f"{_NS}sheet"):
            target = rel_map[s.get(f"{_RID_NS}id")]
            if not target.startswith("xl/"):
                target = "xl/" + target.lstrip("/")
            sheets.append((s.get("name"), target))
        if isinstance(sheet, str):
            part = dict(sheets)[sheet]
        else:
            part = sheets[sheet - 1][1]
        shared: list[str] = []
        if "xl/sharedStrings.xml" in zf.namelist():
            ss = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            for si in ss.iter(f"{_NS}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
        ws = ET.fromstring(zf.read(part))
        rows: list[list] = []
        width = 0
        for row in ws.iter(f"{_NS}row"):
            out: dict[int, object] = {}
            for j, cell in enumerate(row.findall(f"{_NS}c")):
                ref = cell.get("r")
                ci = _col_index(ref) if ref else j
                out[ci] = _cell_value(cell, shared)
            if out:
                width = max(width, max(out) + 1)
            rows.append([out.get(i) for i in range(max(out, default=-1) + 1)])
    rows = [r + [None] * (width - len(r)) for r in rows]
    if not rows:
        return [], []
    header = [str(h) if h is not None else f"col{i}" for i, h in enumerate(rows[0])]
    return header, rows[1:]


def write_xlsx(path: str, header: list[str], rows: list[list], sheet_name: str = "Sheet1") -> None:
    """Write a minimal standards-compliant .xlsx (fixture/export helper;
    inline strings, no shared-string table)."""

    def esc(s: str) -> str:
        return (
            str(s)
            .replace("&", "&amp;")
            .replace("<", "&lt;")
            .replace(">", "&gt;")
            .replace('"', "&quot;")
        )

    def col_letter(i: int) -> str:
        out = ""
        i += 1
        while i:
            i, r = divmod(i - 1, 26)
            out = chr(ord("A") + r) + out
        return out

    def cell_xml(ref: str, v) -> str:
        if v is None:
            return ""
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>'
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"><v>{v}</v></c>'
        return f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{esc(v)}</t></is></c>'

    all_rows = [header] + rows
    row_xml = []
    for ri, r in enumerate(all_rows, start=1):
        cells = "".join(cell_xml(f"{col_letter(ci)}{ri}", v) for ci, v in enumerate(r))
        row_xml.append(f'<row r="{ri}">{cells}</row>')
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f"<sheetData>{''.join(row_xml)}</sheetData></worksheet>"
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f'<sheets><sheet name="{esc(sheet_name)}" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
        'Target="worksheets/sheet1.xml"/></Relationships>'
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" '
        'Target="xl/workbook.xml"/></Relationships>'
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" '
        'ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/></Types>'
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", content_types)
        zf.writestr("_rels/.rels", root_rels)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)


def xlsx_to_dataframe(spark, path: str, sheet: int | str = 1):
    """read_xlsx → typed Spark DataFrame: per-column type resolution
    (bool → boolean, all-int → bigint, numeric → double, else string)."""
    header, rows = read_xlsx(path, sheet)
    return _typed_dataframe(spark, header, rows)


def _typed_dataframe(spark, header: list[str], rows: list[list]):
    """Driver-side (header, rows) → typed Spark DataFrame — shared by
    the xlsx and ods readers."""
    n = len(header)

    def col_type(i: int) -> str:
        vals = [r[i] for r in rows if i < len(r) and r[i] is not None]
        if vals and all(isinstance(v, bool) for v in vals):
            return "boolean"
        if vals and all(isinstance(v, int) and not isinstance(v, bool) for v in vals):
            return "bigint"
        if vals and all(isinstance(v, (int, float)) and not isinstance(v, bool) for v in vals):
            return "double"
        return "string"

    types = [col_type(i) for i in range(n)]

    def coerce(v, t):
        if v is None:
            return None
        if t == "double":
            return float(v)
        if t == "string" and not isinstance(v, str):
            return str(v)
        return v

    data = [tuple(coerce(r[i] if i < len(r) else None, types[i]) for i in range(n)) for r in rows]
    schema = ", ".join(f"`{h}` {t}" for h, t in zip(header, types))
    return spark.createDataFrame(data, schema=schema)
