"""Minimal XLSX codec — stdlib only (zipfile + xml.etree), no Excel
engine required.

XLSX is a ZIP of SpreadsheetML XML parts (ECMA-376 / ISO 29500, the
public OOXML spec). The subset here covers what the reference's
spreadsheet modules actually do (spreadsheetread
scripts/dbitool.pl:2696-2784, spreadsheetwrite :2786-2870): one
rectangular sheet of scalar values read/written fully in memory, an
(x, y) top-left offset, and an optional header row. Same pattern as
io/bson_io.py's own-spec BSON codec: when the environment lacks a
library for a niche bounded format, implement the published spec
directly rather than stub.

Writer: inline strings only (`t="inlineStr"`) — valid per ECMA-376
§18.3.1.4 and readable by Excel/openpyxl/pandas — which keeps the
package to 5 parts and needs no sharedStrings table.

Reader: handles the cell types real producers emit — inline strings,
sharedStrings references (`t="s"`, what openpyxl/Excel write),
formula-cached strings (`t="str"`), booleans (`t="b"`) and numbers —
and sparse rows (cells placed by `r="BC12"`-style references with
gaps). All values surface as strings: the reference's data model is
stringly typed (SURVEY §1.3) and typing happens at format boundaries.

Everything is bounded/driver-side by design — the reference buffers
whole sheets in memory too; the distributed path for big tabular data
is CSV/parquet, not xlsx.
"""

from __future__ import annotations

import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape, quoteattr

_MAIN_NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_REL_NS = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
_PKG_REL_NS = "http://schemas.openxmlformats.org/package/2006/relationships"


def col_letters(i: int) -> str:
    """0-based column index -> A1-style letters (0->A, 26->AA)."""
    if i < 0:
        raise ValueError(f"negative column index {i}")
    out = ""
    i += 1
    while i:
        i, rem = divmod(i - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def ref_to_col(ref: str) -> int:
    """A1-style cell reference -> 0-based column index ("BC12" -> 54)."""
    n = 0
    for ch in ref:
        if ch.isdigit():
            break
        n = n * 26 + (ord(ch.upper()) - ord("A") + 1)
    if n == 0:
        raise ValueError(f"cell reference {ref!r} has no column letters")
    return n - 1


# --- writer -----------------------------------------------------------

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
</Types>"""

_ROOT_RELS = f"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="{_PKG_REL_NS}">
<Relationship Id="rId1" Type="{_REL_NS}/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WB_RELS = f"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="{_PKG_REL_NS}">
<Relationship Id="rId1" Type="{_REL_NS}/worksheet" Target="worksheets/sheet1.xml"/>
</Relationships>"""


def _workbook_xml(sheet_name: str) -> str:
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{_MAIN_NS}" xmlns:r="{_REL_NS}">'
        f'<sheets><sheet name={quoteattr(sheet_name)} sheetId="1" r:id="rId1"/></sheets>'
        "</workbook>"
    )


def write_xlsx(
    path: str,
    rows: list[tuple],
    *,
    sheet: str = "Sheet1",
    x: int = 0,
    y: int = 0,
) -> None:
    """Write rows (scalars; None -> empty cell) as one sheet, with the
    block's top-left cell at 0-based (x, y) like the reference's x=/y=
    offsets."""
    parts = ['<sheetData>']
    for ri, row in enumerate(rows):
        r = y + ri + 1
        cells = []
        for ci, v in enumerate(row):
            if v is None:
                continue
            ref = f"{col_letters(x + ci)}{r}"
            cells.append(
                f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
                f"{escape(str(v))}</t></is></c>"
            )
        parts.append(f'<row r="{r}">{"".join(cells)}</row>')
    parts.append("</sheetData>")
    sheet_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<worksheet xmlns="{_MAIN_NS}">{"".join(parts)}</worksheet>'
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", _workbook_xml(sheet))
        z.writestr("xl/_rels/workbook.xml.rels", _WB_RELS)
        z.writestr("xl/worksheets/sheet1.xml", sheet_xml)


# --- reader -----------------------------------------------------------


def _q(tag: str) -> str:
    return f"{{{_MAIN_NS}}}{tag}"


def _cell_text(c: ET.Element, shared: list[str]) -> str:
    t = c.get("t", "n")
    if t == "inlineStr":
        is_el = c.find(_q("is"))
        return "".join(
            (el.text or "") for el in (is_el.iter(_q("t")) if is_el is not None else [])
        )
    v = c.find(_q("v"))
    text = v.text if v is not None and v.text is not None else ""
    if t == "s":
        return shared[int(text)]
    # "str" (formula cache), "b" (0/1), "n"/"e": surface raw text
    return text


def _sheet_target(z: zipfile.ZipFile, sheet: str | int) -> str:
    wb = ET.fromstring(z.read("xl/workbook.xml"))
    sheets = wb.find(_q("sheets"))
    entries = list(sheets) if sheets is not None else []
    if not entries:
        raise ValueError("workbook has no sheets")
    if isinstance(sheet, int):
        if sheet >= len(entries):
            raise ValueError(f"sheet index {sheet} out of range ({len(entries)} sheets)")
        chosen = entries[sheet]
    else:
        by_name = {e.get("name"): e for e in entries}
        if sheet not in by_name:
            raise ValueError(f"sheet {sheet!r} not found; have {sorted(by_name)}")
        chosen = by_name[sheet]
    rid = chosen.get(f"{{{_REL_NS}}}id")
    rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
    for rel in rels:
        if rel.get("Id") == rid:
            target = rel.get("Target")
            return target if target.startswith("xl/") else f"xl/{target}"
    raise ValueError(f"no relationship for sheet id {rid}")


def read_xlsx(path: str, *, sheet: str | int = 0, max_rows: int | None = None) -> list[list[str]]:
    """Read one sheet into a dense list of string rows (ragged rows
    right-padded with "" to the widest row; sparse cells filled by
    their A1 references)."""
    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            sst = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in sst.iter(_q("si")):
                shared.append("".join((t.text or "") for t in si.iter(_q("t"))))
        ws = ET.fromstring(z.read(_sheet_target(z, sheet)))
        data = ws.find(_q("sheetData"))
        out: list[list[str]] = []
        width = 0
        for row in data.iter(_q("row")) if data is not None else []:
            if max_rows is not None and len(out) >= max_rows:
                break
            # honor the row's r index: absent rows are real empty rows
            # (a block written at a y offset starts below row 1)
            r_attr = row.get("r")
            if r_attr is not None:
                while len(out) < int(r_attr) - 1:
                    if max_rows is not None and len(out) >= max_rows:
                        break
                    out.append([])
                if max_rows is not None and len(out) >= max_rows:
                    break
            cells: list[str] = []
            next_col = 0
            for c in row.iter(_q("c")):
                ref = c.get("r")
                col = ref_to_col(ref) if ref else next_col
                while len(cells) < col:
                    cells.append("")
                text = _cell_text(c, shared)
                if len(cells) == col:
                    cells.append(text)
                else:
                    cells[col] = text
                next_col = col + 1
            out.append(cells)
            width = max(width, len(cells))
        for cells in out:
            while len(cells) < width:
                cells.append("")
        return out
