"""Minimal native XLSX reader/writer (stdlib zipfile + xml.etree).

An .xlsx file is a ZIP of OOXML parts (ECMA-376); for the flat
header-plus-rows tables the reference exchanges (S2/S8:
filter.py:7-13,22,48), a worksheet parser and generator need ~100
lines and no third-party engine. ``io.readers.read_any`` /
``io.writers.write_excel`` prefer pandas+openpyxl when installed and
fall back here, so Excel ingest/egress works — and is tested — in
images without openpyxl.

Scope: sheet 1, inline or shared strings, numeric/boolean cells,
header row + data rows. Not supported: formulas (cached values are
read), dates-as-styles (come back as serial numbers), legacy .xls.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

import pandas as pd

_NS = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}


def _col_index(cell_ref: str) -> int:
    """'A1' -> 0, 'AB12' -> 27."""
    letters = re.match(r"([A-Z]+)", cell_ref).group(1)
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - 64)
    return idx - 1


def _col_letters(idx: int) -> str:
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(65 + rem) + out
    return out


def read_xlsx(path: str) -> pd.DataFrame:
    """First worksheet -> DataFrame (row 1 = header). Numeric columns
    come back numeric (all-parseable columns are cast), matching what
    ``pd.read_excel`` infers on the same flat table."""
    with zipfile.ZipFile(path) as zf:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in zf.namelist():
            root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            for si in root.findall("m:si", _NS):
                shared.append("".join(t.text or "" for t in si.iter(
                    "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}t")))
        sheet_names = sorted(
            n for n in zf.namelist()
            if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)
        )
        if not sheet_names:
            raise ValueError(f"{path}: no worksheet part found")
        root = ET.fromstring(zf.read(sheet_names[0]))

    rows: list[dict[int, object]] = []
    max_col = -1
    for row_el in root.find("m:sheetData", _NS).findall("m:row", _NS):
        row: dict[int, object] = {}
        for c in row_el.findall("m:c", _NS):
            ci = _col_index(c.get("r", "A1"))
            ctype = c.get("t", "n")
            if ctype == "inlineStr":
                is_el = c.find("m:is", _NS)
                val = "".join(t.text or "" for t in is_el.iter(
                    "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}t"
                )) if is_el is not None else None
            else:
                v_el = c.find("m:v", _NS)
                raw = v_el.text if v_el is not None else None
                if raw is None:
                    val = None
                elif ctype == "s":
                    val = shared[int(raw)]
                elif ctype == "b":
                    val = bool(int(raw))
                elif ctype == "str":
                    val = raw
                else:  # "n"
                    f = float(raw)
                    val = int(f) if f.is_integer() else f
            row[ci] = val
            max_col = max(max_col, ci)
        rows.append(row)
    if not rows:
        return pd.DataFrame()
    header = [rows[0].get(i, f"col{i}") for i in range(max_col + 1)]
    data = [[r.get(i) for i in range(max_col + 1)] for r in rows[1:]]
    return pd.DataFrame(data, columns=header)


def write_xlsx(pdf: pd.DataFrame, path: str, sheet_name: str = "Sheet1") -> None:
    """DataFrame -> single-sheet .xlsx with inline strings (no
    sharedStrings part needed; every consumer, openpyxl included,
    reads inline strings fine)."""

    def cell_xml(ref: str, v) -> str:
        if v is None or (isinstance(v, float) and v != v):
            return ""
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{int(v)}</v></c>'
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"><v>{v!r}</v></c>'
        return f'<c r="{ref}" t="inlineStr"><is><t>{escape(str(v))}</t></is></c>'

    lines = []
    all_rows = [list(pdf.columns)] + pdf.values.tolist()
    for ri, row in enumerate(all_rows, start=1):
        cells = "".join(
            cell_xml(f"{_col_letters(ci)}{ri}", v) for ci, v in enumerate(row)
        )
        lines.append(f'<row r="{ri}">{cells}</row>')
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f"<sheetData>{''.join(lines)}</sheetData></worksheet>"
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        "</Types>"
    )
    rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
        "</Relationships>"
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f'<sheets><sheet name="{escape(sheet_name)}" sheetId="1" r:id="rId1"/></sheets>'
        "</workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
        "</Relationships>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", content_types)
        zf.writestr("_rels/.rels", rels)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
