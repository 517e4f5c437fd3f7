"""Minimal XLSX (SpreadsheetML) reader + fixture writer — from scratch.

The reference reads the AdminiBoundary_CD.xlsx crosswalk with the calamine
crate (/root/reference/src/loader/admini_boundary.rs:28-63): open the
sheet named 行政区域コード, skip rows until the first cell equals the
header sentinel 行政区域コード (P9), then NFKC-normalize every cell,
map empty strings to NULL, and drop all-NULL rows. This module gives the
engine that capability on actual .xlsx bytes with no dependency: XLSX is
a ZIP of XML parts ([Content_Types].xml, xl/workbook.xml + its .rels,
xl/sharedStrings.xml, xl/worksheets/sheetN.xml), parsed here with stdlib
zipfile + xml.etree.

Supported cell types: shared strings (t="s"), inline strings
(t="inlineStr"), plain strings (t="str"), numbers (default). Column gaps
(missing cells inside a row) are preserved as None via the cell
reference's column letters.

``write_xlsx`` exists to generate test fixtures/goldens; tests also
assert spec'd part names and XML shapes so the reader is validated
against the format, not just our writer.
"""

from __future__ import annotations

import io
import unicodedata
import zipfile
import xml.etree.ElementTree as ET

_NS = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
_REL_NS = {"r": "http://schemas.openxmlformats.org/package/2006/relationships"}
_R_ATTR = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"


def _col_index(cell_ref: str) -> int:
    """'A1' -> 0, 'AB7' -> 27."""
    idx = 0
    for ch in cell_ref:
        if not ch.isalpha():
            break
        idx = idx * 26 + (ord(ch.upper()) - ord("A") + 1)
    return idx - 1


def _sheet_path(zf: zipfile.ZipFile, sheet_name: str | None) -> str:
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    rid_to_target = {
        rel.get("Id"): rel.get("Target") for rel in rels.findall("r:Relationship", _REL_NS)
    }
    for sheet in wb.findall("m:sheets/m:sheet", _NS):
        if sheet_name is None or sheet.get("name") == sheet_name:
            target = rid_to_target[sheet.get(_R_ATTR)]
            return target if target.startswith("xl/") else f"xl/{target}"
    raise KeyError(f"sheet {sheet_name!r} not found in workbook")


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
    except KeyError:
        return []
    out = []
    for si in root.findall("m:si", _NS):
        out.append("".join(t.text or "" for t in si.iter(f"{{{_NS['m']}}}t")))
    return out


def parse_xlsx(buf: bytes, sheet_name: str | None = None) -> list[list[str | None]]:
    """Parse one worksheet into rows of cell strings (None for gaps).
    Numbers come back as their raw stored text (calamine's
    data_to_string parity: integers stored as '1101' stay '1101')."""
    with zipfile.ZipFile(io.BytesIO(buf)) as zf:
        path = _sheet_path(zf, sheet_name)
        strings = _shared_strings(zf)
        sheet = ET.fromstring(zf.read(path))
        rows: list[list[str | None]] = []
        for row in sheet.findall("m:sheetData/m:row", _NS):
            cells: list[str | None] = []
            for c in row.findall("m:c", _NS):
                ci = _col_index(c.get("r", ""))
                while len(cells) < ci:
                    cells.append(None)
                t = c.get("t", "n")
                if t == "s":
                    v = c.find("m:v", _NS)
                    cells.append(strings[int(v.text)] if v is not None else None)
                elif t == "inlineStr":
                    is_el = c.find("m:is", _NS)
                    cells.append(
                        "".join(tt.text or "" for tt in is_el.iter(f"{{{_NS['m']}}}t"))
                        if is_el is not None
                        else None
                    )
                else:  # "str" (formula result) and "n" both carry <v>
                    v = c.find("m:v", _NS)
                    cells.append(v.text if v is not None else None)
            rows.append(cells)
        return rows


def crosswalk_rows(
    buf: bytes, sheet_name: str = "行政区域コード", sentinel: str = "行政区域コード"
) -> list[list[str | None]]:
    """The reference's crosswalk scan (admini_boundary.rs:29-63): find the
    header row whose first cell equals the sentinel (P9), then NFKC every
    cell (F1), empty -> None, drop all-None rows (P8). Rows are padded to
    the header's width (trailing blank cells are omitted at rest)."""
    raw = parse_xlsx(buf, sheet_name)
    out: list[list[str | None]] = []
    width = None
    started = False
    for row in raw:
        if not started:
            if row and row[0] == sentinel:
                started = True
                width = len(row)
            continue
        cells = [
            (unicodedata.normalize("NFKC", c) if c else None) for c in row
        ]
        if width is not None:
            cells = (cells + [None] * width)[:width]
        if all(c is None for c in cells):
            continue
        out.append(cells)
    return out


# ------------------------------------------------------------------ writer

def _esc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _col_letter(i: int) -> str:
    out = ""
    i += 1
    while i:
        i, r = divmod(i - 1, 26)
        out = chr(ord("A") + r) + out
    return out


def write_xlsx(rows: list[list[str | float | int | None]], sheet_name: str = "Sheet1") -> bytes:
    """Fixture writer: rows of str/number/None -> minimal valid .xlsx
    (strings via sharedStrings, numbers inline, None cells omitted)."""
    strings: list[str] = []
    sindex: dict[str, int] = {}

    def sref(s: str) -> int:
        if s not in sindex:
            sindex[s] = len(strings)
            strings.append(s)
        return sindex[s]

    row_xml = []
    for ri, row in enumerate(rows, start=1):
        cells = []
        for ci, val in enumerate(row):
            if val is None or (isinstance(val, str) and val == ""):
                continue
            ref = f"{_col_letter(ci)}{ri}"
            if isinstance(val, str):
                cells.append(f'<c r="{ref}" t="s"><v>{sref(val)}</v></c>')
            else:
                cells.append(f'<c r="{ref}"><v>{val}</v></c>')
        row_xml.append(f'<row r="{ri}">{"".join(cells)}</row>')
    m = _NS["m"]
    sheet_xml = (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<worksheet xmlns="{m}"><sheetData>{"".join(row_xml)}</sheetData></worksheet>'
    )
    sst_xml = (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<sst xmlns="{m}" count="{len(strings)}" uniqueCount="{len(strings)}">'
        + "".join(f"<si><t>{_esc(s)}</t></si>" for s in strings)
        + "</sst>"
    )
    workbook_xml = (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{m}" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f'<sheets><sheet name="{_esc(sheet_name)}" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
        'Target="worksheets/sheet1.xml"/>'
        '<Relationship Id="rId2" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" '
        'Target="sharedStrings.xml"/>'
        "</Relationships>"
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" '
        'Target="xl/workbook.xml"/>'
        "</Relationships>"
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" '
        'ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-'
        'officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.'
        'openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        '<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.'
        'openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>'
        "</Types>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", content_types)
        zf.writestr("_rels/.rels", root_rels)
        zf.writestr("xl/workbook.xml", workbook_xml)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        zf.writestr("xl/sharedStrings.xml", sst_xml)
        zf.writestr("xl/worksheets/sheet1.xml", sheet_xml)
    return buf.getvalue()
