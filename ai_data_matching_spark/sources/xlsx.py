"""S2/S3 — minimal Excel (.xlsx) reader/writer, stdlib only.

The container has no openpyxl, but .xlsx is just a zip of SpreadsheetML
XML — a deterministic subset is enough for the reference's ingest path
(/root/reference/src/data_processor.py:41-58):

* ``read_workbook`` — sheet names in workbook order, cell matrices
  (shared strings, inline strings, numbers, booleans).
* ``load_best_sheet`` — the reference's best-sheet heuristic verbatim:
  most data rows among sheets with > 3 columns and at least one string
  header longer than 2 chars; fallback to the first sheet.
* ``headers_and_rows`` — header probing: first row as headers,
  str.strip() cleanup (data_processor.py:62).
* ``write_xlsx`` — the matching writer (inline strings; used by the K1
  report sink and by tests for round-trip fixtures).

No external parser, so output/ingest never drifts with library versions —
the same pinned-algorithm stance as the HTML extractor.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_NSR = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_CELL_REF = re.compile(r"([A-Z]+)(\d+)")

Cell = str | float | int | bool | None


def _col_index(ref: str) -> int:
    """'A' → 0, 'AB' → 27."""
    n = 0
    for ch in ref:
        n = n * 26 + (ord(ch) - 64)
    return n - 1


def _col_letters(idx: int) -> str:
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(65 + rem) + out
    return out


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------


def read_workbook(path: str) -> dict[str, list[list[Cell]]]:
    """sheet name → rectangular cell matrix (rows padded to max width)."""
    with zipfile.ZipFile(path) as zf:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in zf.namelist():
            root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            for si in root.iter(f"{_NS}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))

        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        rel_target = {
            r.get("Id"): r.get("Target").lstrip("/")
            for r in rels
        }
        sheets: dict[str, list[list[Cell]]] = {}
        for sh in wb.iter(f"{_NS}sheet"):
            name = sh.get("name")
            target = rel_target[sh.get(f"{_NSR}id")]
            if not target.startswith("xl/"):
                target = "xl/" + target
            sheets[name] = _read_sheet_xml(zf.read(target), shared)
        return sheets


def _read_sheet_xml(data: bytes, shared: list[str]) -> list[list[Cell]]:
    root = ET.fromstring(data)
    rows: list[list[Cell]] = []
    width = 0
    for row in root.iter(f"{_NS}row"):
        cells: list[Cell] = []
        for c in row.iter(f"{_NS}c"):
            ref = c.get("r") or ""
            m = _CELL_REF.match(ref)
            idx = _col_index(m.group(1)) if m else len(cells)
            while len(cells) < idx:
                cells.append(None)
            t = c.get("t", "n")
            v = c.find(f"{_NS}v")
            if t == "s":
                val: Cell = shared[int(v.text)] if v is not None else None
            elif t == "inlineStr":
                is_el = c.find(f"{_NS}is")
                val = (
                    "".join(tt.text or "" for tt in is_el.iter(f"{_NS}t"))
                    if is_el is not None
                    else None
                )
            elif t == "b":
                val = v is not None and v.text == "1"
            elif t == "str":
                val = v.text if v is not None else None
            else:  # numeric
                if v is None or v.text is None:
                    val = None
                else:
                    f = float(v.text)
                    val = int(f) if f.is_integer() else f
            cells.append(val)
        width = max(width, len(cells))
        rows.append(cells)
    for r in rows:
        r.extend([None] * (width - len(r)))
    return rows


def headers_and_rows(matrix: list[list[Cell]]) -> tuple[list[str], list[list[Cell]]]:
    """Header probing: first row → stripped string headers (reference
    ``df.columns.astype(str).str.strip()``), rest → data rows."""
    if not matrix:
        return [], []
    headers = [str(h).strip() if h is not None else "" for h in matrix[0]]
    return headers, matrix[1:]


PROBE_SKIPROWS = (0, 5, 10, 15, 20, 25)


def probe_header_row(
    matrix: list[list[Cell]],
    keywords: list[str],
    skiprows: tuple[int, ...] = PROBE_SKIPROWS,
) -> tuple[int, list[str], list[list[Cell]]]:
    """S3 — header-row probing (reference app.py:365-386): try each
    ``skiprows`` offset in order and accept the first whose header row
    contains any keyword (case-insensitive substring). Returns
    (skipped, headers, data_rows); falls back to offset 0."""
    lowered = [k.lower() for k in keywords]
    for skip in skiprows:
        if skip >= len(matrix):
            continue
        headers = [str(h).strip() if h is not None else "" for h in matrix[skip]]
        if any(any(k in h.lower() for k in lowered) for h in headers):
            return skip, headers, matrix[skip + 1 :]
    headers, rows = headers_and_rows(matrix)
    return 0, headers, rows


def load_best_sheet(path: str) -> tuple[str, list[str], list[list[Cell]]]:
    """Reference best-sheet heuristic (data_processor.py:43-58): most data
    rows among sheets with > 3 columns and ≥ 1 string header longer than 2
    chars; fallback = first sheet. Returns (sheet, headers, rows)."""
    sheets = read_workbook(path)
    best: str | None = None
    max_rows = 0
    for name, matrix in sheets.items():
        headers, rows = headers_and_rows(matrix)
        if len(rows) > max_rows and len(headers) > 3:
            if any(isinstance(h, str) and len(h) > 2 for h in headers):
                max_rows = len(rows)
                best = name
    if best is None:
        best = next(iter(sheets))
    headers, rows = headers_and_rows(sheets[best])
    return best, headers, rows


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
{sheet_overrides}</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""


def _cell_xml(ref: str, val: Cell) -> str:
    if val is None:
        return ""
    if isinstance(val, bool):
        return f'<c r="{ref}" t="b"><v>{1 if val else 0}</v></c>'
    if isinstance(val, (int, float)):
        return f'<c r="{ref}"><v>{val}</v></c>'
    return f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{escape(str(val))}</t></is></c>'


def write_xlsx(sheets: dict[str, list[list[Cell]]], path: str) -> str:
    """Write sheet-name → row-matrix as a minimal .xlsx (inline strings).
    Round-trips through :func:`read_workbook` (tested)."""
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        overrides = []
        wb_sheets = []
        wb_rels = []
        for i, (name, matrix) in enumerate(sheets.items(), start=1):
            overrides.append(
                f'<Override PartName="/xl/worksheets/sheet{i}.xml" ContentType='
                '"application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
            )
            wb_sheets.append(
                # attribute context: saxutils.escape leaves double quotes
                # alone by default, which would break the name="..." attr
                f'<sheet name="{escape(name, {chr(34): "&quot;"})}" sheetId="{i}" r:id="rId{i}"/>'
            )
            wb_rels.append(
                f'<Relationship Id="rId{i}" Type="http://schemas.openxmlformats.org/'
                f'officeDocument/2006/relationships/worksheet" Target="worksheets/sheet{i}.xml"/>'
            )
            rows_xml = []
            for r, row in enumerate(matrix, start=1):
                cells = "".join(
                    _cell_xml(f"{_col_letters(ci)}{r}", v) for ci, v in enumerate(row)
                )
                rows_xml.append(f'<row r="{r}">{cells}</row>')
            zf.writestr(
                f"xl/worksheets/sheet{i}.xml",
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
                f"<sheetData>{''.join(rows_xml)}</sheetData></worksheet>",
            )
        zf.writestr(
            "[Content_Types].xml", _CONTENT_TYPES.format(sheet_overrides="".join(overrides))
        )
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr(
            "xl/workbook.xml",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
            'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
            f"<sheets>{''.join(wb_sheets)}</sheets></workbook>",
        )
        zf.writestr(
            "xl/_rels/workbook.xml.rels",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            f"{''.join(wb_rels)}</Relationships>",
        )
    return path
