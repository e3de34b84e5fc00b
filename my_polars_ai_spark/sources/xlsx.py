"""Minimal .xlsx reader/writer on the stdlib (zipfile + ElementTree).

An .xlsx file is a ZIP of OOXML parts (ECMA-376, a public format). This
module implements just enough of SpreadsheetML for the engine's Excel
ingestion path to have a real-data test without openpyxl in the
container: single-grid sheets, shared/inline/formula-cached strings,
numbers, and booleans. ``from_excel`` (sources/readers.py) prefers
pandas+openpyxl when installed and falls back to this reader.

Not supported (use openpyxl for these): dates as styled numbers are
returned as their raw serial numbers; merged cells, formulas (only their
cached values are read), charts.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_CELL_REF = re.compile(r"([A-Z]+)(\d+)")


def _col_index(ref: str) -> int:
    """'A' -> 0, 'Z' -> 25, 'AA' -> 26."""
    idx = 0
    for ch in ref:
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def _cell_value(cell: ElementTree.Element, shared: list[str]):
    kind = cell.get("t", "n")
    if kind == "inlineStr":
        t = cell.find(f"{_NS}is/{_NS}t")
        return t.text if t is not None else ""
    v = cell.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    if kind == "s":
        return shared[int(v.text)]
    if kind in ("str",):  # formula cached string
        return v.text
    if kind == "b":
        return v.text == "1"
    # numeric: int when integral
    num = float(v.text)
    return int(num) if num.is_integer() and "e" not in v.text.lower() else num


def read_xlsx(path: str, sheet_name: str | int = 0) -> tuple[list[str], list[list]]:
    """(header_row, data_rows) from one sheet. Rows are padded/truncated to
    the header width; missing cells are None."""
    with zipfile.ZipFile(path) as zf:
        # sheet name -> relationship id -> part name
        wb = ElementTree.fromstring(zf.read("xl/workbook.xml"))
        rels = ElementTree.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        rel_target = {
            r.get("Id"): r.get("Target").lstrip("/")
            for r in rels
            if r.get("Target", "").endswith(".xml")
        }
        sheets = [
            (s.get("name"), rel_target[s.get(f"{_REL_NS}id")])
            for s in wb.find(f"{_NS}sheets")
        ]
        if isinstance(sheet_name, int):
            target = sheets[sheet_name][1]
        else:
            target = dict(sheets)[sheet_name]
        if not target.startswith("xl/"):
            target = "xl/" + target

        shared: list[str] = []
        if "xl/sharedStrings.xml" in zf.namelist():
            sst = ElementTree.fromstring(zf.read("xl/sharedStrings.xml"))
            for si in sst.findall(f"{_NS}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))

        grid: list[list] = []
        sheet = ElementTree.fromstring(zf.read(target))
        for row in sheet.find(f"{_NS}sheetData") or ():
            cells: list = []
            for cell in row.findall(f"{_NS}c"):
                ref = cell.get("r", "")
                m = _CELL_REF.match(ref)
                col = _col_index(m.group(1)) if m else len(cells)
                while len(cells) < col:
                    cells.append(None)
                cells.append(_cell_value(cell, shared))
            grid.append(cells)

    if not grid:
        return [], []
    header = [str(h) if h is not None else f"col{i}" for i, h in enumerate(grid[0])]
    width = len(header)
    rows = [(r + [None] * width)[:width] for r in grid[1:]]
    return header, rows


def _xml_escape(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;").replace('"', "&quot;")
    )


def _col_letter(idx: int) -> str:
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def write_xlsx(path: str, columns: list[str], rows: list[list]) -> None:
    """Write a single-sheet .xlsx (inline strings — no sharedStrings part
    needed). Test-fixture scale; not a bulk writer."""
    def cell_xml(ref: str, value) -> str:
        if value is None:
            return ""
        if isinstance(value, bool):
            return f'<c r="{ref}" t="b"><v>{int(value)}</v></c>'
        if isinstance(value, (int, float)):
            return f'<c r="{ref}"><v>{value}</v></c>'
        return f'<c r="{ref}" t="inlineStr"><is><t>{_xml_escape(str(value))}</t></is></c>'

    lines = ['<?xml version="1.0" encoding="UTF-8" standalone="yes"?>']
    lines.append(
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<sheetData>"
    )
    for rnum, row in enumerate([columns, *rows], start=1):
        cells = "".join(
            cell_xml(f"{_col_letter(c)}{rnum}", v) for c, v in enumerate(row)
        )
        lines.append(f'<row r="{rnum}">{cells}</row>')
    lines.append("</sheetData></worksheet>")
    sheet_xml = "".join(lines)

    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        "</Types>"
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
        "</Relationships>"
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        '<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
        "</Relationships>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", content_types)
        zf.writestr("_rels/.rels", root_rels)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        zf.writestr("xl/worksheets/sheet1.xml", sheet_xml)
