"""Minimal ODS (OpenDocument Spreadsheet) reader/writer on the Python
stdlib (zipfile + ElementTree).

Parity target: the reference loads ``.ods`` transparently via
tabulator's ezodf-backed parser (reference ``cli.py:12`` format list;
loader dispatch ``processors/load.py:40-137``). This container has no
ods library, and an .ods is just a zip holding ``content.xml``, so the
reader parses the OpenDocument table model directly:
``office:spreadsheet`` → ``table:table`` (sheet registry) →
``table:table-row`` / ``table:table-cell`` with
``office:value-type``-typed values and the ODF repeat-count
compression (``number-rows-repeated`` / ``number-columns-repeated``)
expanded.

SCALE NOTE: like xlsx, ods is a driver-side interchange format by
construction — the zip container is not splittable and real sheets are
≤1M rows. The reader materializes rows on the driver and hands Spark a
parallelized DataFrame; anything bigger belongs in csv/parquet.
"""

from __future__ import annotations

import zipfile
import xml.etree.ElementTree as ET

_OFFICE = "{urn:oasis:names:tc:opendocument:xmlns:office:1.0}"
_TABLE = "{urn:oasis:names:tc:opendocument:xmlns:table:1.0}"
_TEXT = "{urn:oasis:names:tc:opendocument:xmlns:text:1.0}"

# a guard against the ODF repeat-count compression: trailing filler
# rows/columns carry huge repeat counts (whole-sheet defaults) that
# must not expand into memory. VALUED rows over the bound raise rather
# than truncate (see read_ods); blank interior runs are bounded by the
# ODS sheet row maximum instead (positions must stay exact).
_MAX_REPEAT = 10_000
_ODS_MAX_ROWS = 1_048_576  # the ODS 1.2 sheet row limit
# driver-side materialization ceiling (rows × width cells after
# padding): interior blank runs and repeats expand EXACTLY for
# positional correctness, so the memory guard lives on the product —
# a crafted 1M-blank-run × 16384-wide sheet must fail loud, not OOM
_MAX_CELLS = 20_000_000


def _cell_value(cell):
    vt = cell.get(f"{_OFFICE}value-type")
    if vt is None:
        # covered (merged) or empty cell
        text = "".join("".join(p.itertext()) for p in cell.findall(f"{_TEXT}p"))
        return text or None
    if vt == "boolean":
        return cell.get(f"{_OFFICE}boolean-value") == "true"
    if vt in ("float", "percentage", "currency"):
        f = float(cell.get(f"{_OFFICE}value"))
        return int(f) if f.is_integer() and abs(f) < 2**53 else f
    if vt == "date":
        return cell.get(f"{_OFFICE}date-value")
    # 'string' and anything else: the rendered text content
    return "".join("".join(p.itertext()) for p in cell.findall(f"{_TEXT}p")) or None


def read_ods(path: str, sheet: int | str = 1) -> tuple[list[str], list[list]]:
    """Parse one sheet → (header, data rows). ``sheet`` is a 1-based
    index or a sheet name; first row is the header (reference tabulator
    default ``headers=1``)."""
    with zipfile.ZipFile(path) as zf:
        content = ET.fromstring(zf.read("content.xml"))
    tables = list(content.iter(f"{_TABLE}table"))
    if not tables:
        return [], []
    if isinstance(sheet, str):
        by_name = {t.get(f"{_TABLE}name"): t for t in tables}
        table = by_name[sheet]
    else:
        table = tables[sheet - 1]
    rows: list[list] = []
    pending_rows = 0  # interior blank-row runs replicate; trailing never materialize
    for row in table.iter(f"{_TABLE}table-row"):
        out: list = []
        pending = 0  # run of empty cells awaiting a later non-empty cell
        for cell in row:
            if cell.tag not in (f"{_TABLE}table-cell", f"{_TABLE}covered-table-cell"):
                continue
            v = _cell_value(cell)
            # cell repeats bound at the ODS COLUMN maximum (16384) so
            # interior runs — valued or empty — keep exact positions;
            # _MAX_REPEAT only bounds ROW repeats
            rep = min(int(cell.get(f"{_TABLE}number-columns-repeated", 1)), 16384)
            if v is None:
                # MID-ROW repeated empty cells must expand with full
                # multiplicity (column positions shift otherwise);
                # TRAILING filler (LibreOffice pads every row to the
                # sheet width with one repeated empty) must not — defer
                # the run and materialize only if a value follows.
                # Deferred runs never expand for trailing filler, so
                # the bound here is the ODS column maximum, not
                # _MAX_REPEAT (a >10k interior gap must keep positions)
                pending += rep
            else:
                out.extend([None] * pending)
                pending = 0
                out.extend([v] * rep)
        rrep = int(row.get(f"{_TABLE}number-rows-repeated", 1))
        if out:
            # LibreOffice legitimately compresses identical consecutive
            # DATA rows this way — truncating would silently lose rows,
            # so the cap on VALUED rows fails loud instead (trailing
            # blank filler, the usual >10k case, never materializes)
            if rrep > _MAX_REPEAT:
                raise ValueError(
                    f"ODS row with number-rows-repeated={rrep} exceeds the "
                    f"materialization bound ({_MAX_REPEAT}) and carries values — "
                    "refusing to silently truncate; split the repeated rows or "
                    "raise dataflows_spark.sources.ods._MAX_REPEAT"
                )
            for _ in range(pending_rows):
                rows.append([])
            pending_rows = 0
            rows.extend([list(out)] * rrep)
        else:
            # blank row(s): replicate only if a non-blank row follows —
            # deferred (an int, no memory), so trailing filler of any
            # size costs nothing; interior runs expand as cheap empty
            # lists, and the total rows × width product is guarded by
            # the _MAX_CELLS ceiling before padding
            pending_rows = min(pending_rows + rrep, _ODS_MAX_ROWS)
    if not rows:
        return [], []
    width = max(len(r) for r in rows)
    if len(rows) * max(width, 1) > _MAX_CELLS:
        raise ValueError(
            f"ODS sheet materializes {len(rows)} rows x {width} columns = "
            f"{len(rows) * width} cells, over the driver-side ceiling "
            f"({_MAX_CELLS}) — .ods is an interchange format; use csv/parquet "
            "for data this large (or raise dataflows_spark.sources.ods._MAX_CELLS)"
        )
    rows = [r + [None] * (width - len(r)) for r in rows]
    header = [str(h) if h is not None else f"col{i}" for i, h in enumerate(rows[0])]
    return header, rows[1:]


def write_ods(path: str, header: list[str], rows: list[list], sheet_name: str = "Sheet1") -> None:
    """Write a minimal standards-compliant .ods (fixture/export helper)."""

    def esc(s: str) -> str:
        return (
            str(s)
            .replace("&", "&amp;")
            .replace("<", "&lt;")
            .replace(">", "&gt;")
            .replace('"', "&quot;")
        )

    def cell_xml(v) -> str:
        if v is None:
            return "<table:table-cell/>"
        if isinstance(v, bool):
            b = "true" if v else "false"
            return (
                f'<table:table-cell office:value-type="boolean" office:boolean-value="{b}">'
                f"<text:p>{b}</text:p></table:table-cell>"
            )
        if isinstance(v, (int, float)):
            return (
                f'<table:table-cell office:value-type="float" office:value="{v}">'
                f"<text:p>{v}</text:p></table:table-cell>"
            )
        return (
            '<table:table-cell office:value-type="string">'
            f"<text:p>{esc(v)}</text:p></table:table-cell>"
        )

    body_rows = "".join(
        "<table:table-row>" + "".join(cell_xml(v) for v in r) + "</table:table-row>"
        for r in [header] + rows
    )
    content = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<office:document-content '
        'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
        'xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0" '
        'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0" '
        'office:version="1.2"><office:body><office:spreadsheet>'
        f'<table:table table:name="{esc(sheet_name)}">{body_rows}</table:table>'
        "</office:spreadsheet></office:body></office:document-content>"
    )
    manifest = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<manifest:manifest xmlns:manifest="urn:oasis:names:tc:opendocument:xmlns:manifest:1.0" '
        'manifest:version="1.2">'
        '<manifest:file-entry manifest:full-path="/" '
        'manifest:media-type="application/vnd.oasis.opendocument.spreadsheet"/>'
        '<manifest:file-entry manifest:full-path="content.xml" manifest:media-type="text/xml"/>'
        "</manifest:manifest>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        # the mimetype member must be first and STORED per the ODF spec
        zf.writestr(
            zipfile.ZipInfo("mimetype"),
            "application/vnd.oasis.opendocument.spreadsheet",
            compress_type=zipfile.ZIP_STORED,
        )
        zf.writestr("content.xml", content)
        zf.writestr("META-INF/manifest.xml", manifest)


def ods_to_dataframe(spark, path: str, sheet: int | str = 1):
    """read_ods → typed Spark DataFrame via the same per-column type
    resolution as the xlsx reader."""
    from .xlsx import _typed_dataframe

    header, rows = read_ods(path, sheet)
    return _typed_dataframe(spark, header, rows)
