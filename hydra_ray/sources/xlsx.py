"""Minimal stdlib XLSX reader (+ writer for fixtures/tests).

The reference ingests Excel as a first-class tabular source
(utils/reader.py:19-70 via openpyxl/xlrd; data_formats/csv_like/
__init__.py:161-217). Those wheels are not in this container, but XLSX
is just a zip of XML — this module implements the subset needed for
tabular ingestion with the standard library only:

  - shared strings (t="s"), inline strings (t="inlineStr" / t="str"),
    booleans (t="b") and numbers (default) are decoded;
  - sheet order comes from xl/workbook.xml + its relationships part;
  - cells are addressed by their r="A1" reference, so sparse rows and
    skipped columns land in the right slot;
  - all values surface as STRINGS feeding the same csv-detective-style
    inspection + smart_cast pipeline as CSV (stages/inspection.py), so
    an .xlsx and its CSV twin produce the identical typed table.

Not supported (documented limitation): style-driven serial-number
dates (requires styles.xml numFmt resolution) and formula evaluation —
the cached formula value is used.
"""

from __future__ import annotations

import io
import re
import zipfile
from xml.etree import ElementTree as ET

import pyarrow as pa

_CELL_REF_RE = re.compile(r"^([A-Z]+)(\d+)$")


def _col_index(letters: str) -> int:
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def _text(elem) -> str:
    return "".join(elem.itertext())


def _first_sheet_target(zf: zipfile.ZipFile) -> str:
    """First sheet's worksheet part, resolved through the workbook
    relationships (falls back to the lowest-numbered sheet part)."""
    try:
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        rid_to_target = {
            r.get("Id"): r.get("Target") for r in rels if r.get("Target")
        }
        for sheet in wb.findall(".//{*}sheet"):
            rid = sheet.get(
                "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
            )
            target = rid_to_target.get(rid)
            if target:
                return "xl/" + target.lstrip("/") if not target.startswith("xl/") else target
    except (KeyError, ET.ParseError):
        pass
    sheets = sorted(n for n in zf.namelist() if re.match(r"xl/worksheets/sheet\d+\.xml$", n))
    if not sheets:
        raise ValueError("no worksheet part in xlsx archive")
    return sheets[0]


def _local(tag) -> str:
    """Local name of a (possibly namespace-qualified) element tag."""
    return tag.rsplit("}", 1)[-1] if isinstance(tag, str) else ""


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
    except KeyError:
        return []
    return [_text(si) for si in root if _local(si.tag) == "si"]


def read_xlsx_rows(data: bytes) -> list[list[str]]:
    """XLSX bytes → dense rows of strings (first sheet).

    Hot path for the crawl's workbook route: direct child iteration
    with local-name checks — per-cell ``find("{*}v")`` path lookups
    pay ElementPath machinery per call and dominated the analyse
    stage's profile (~2× on workbook-heavy batches)."""
    zf = zipfile.ZipFile(io.BytesIO(data))
    shared = _shared_strings(zf)
    sheet = ET.fromstring(zf.read(_first_sheet_target(zf)))
    rows: list[list[str]] = []
    max_cols = 0
    row_els = (el for el in sheet.iter() if _local(el.tag) == "row")
    for row_el in row_els:
        cells: dict[int, str] = {}
        auto_col = 0
        for c in row_el:
            if _local(c.tag) != "c":
                continue
            ref = c.get("r")
            if ref and (m := _CELL_REF_RE.match(ref)):
                col = _col_index(m.group(1))
            else:
                col = auto_col
            auto_col = col + 1
            ctype = c.get("t", "n")
            v_el = is_el = None
            for ch in c:
                ln = _local(ch.tag)
                if ln == "v":
                    v_el = ch
                elif ln == "is":
                    is_el = ch
            if ctype == "inlineStr":
                value = _text(is_el) if is_el is not None else ""
            else:
                raw = _text(v_el) if v_el is not None else ""
                if ctype == "s":
                    value = shared[int(raw)] if raw else ""
                elif ctype == "b":
                    value = "true" if raw.strip() == "1" else "false"
                else:  # n (number), str (cached formula string)
                    value = raw
            cells[col] = value
        width = max(cells, default=-1) + 1
        max_cols = max(max_cols, width)
        rows.append([cells.get(i, "") for i in range(width)])
    return [r + [""] * (max_cols - len(r)) for r in rows]


def rows_to_inspection(
    rows: list[list[str]], engine: str, sample_rows: int = 100, output_profile: bool = False
) -> dict:
    """Workbook rows (strings) → inspection report in the exact shape of
    inspect_csv_text (engine marks the source; separator is None for
    workbooks). Shared by the XLSX and XLS (BIFF) readers.

    ``output_profile=True`` produces the same csv-detective profile the
    CSV route emits (per-column min/max/mean/std, top-10 values,
    nb_distinct, nb_missing over the FULL body) — the reference runs
    csv_detective_routine on Excel content too
    (csv_like/__init__.py:161-217), so workbook and CSV twins yield
    identical reports. Geo-format refinement (latlon / geojson cells)
    is applied the same way."""
    from hydra_ray.stages.inspection import (
        _refine_geo_formats,
        column_profile,
        db_col_name,
        detect_types,
    )

    if not rows:
        return {
            "header": [],
            "columns": {},
            "total_lines": 0,
            "encoding": "binary",
            "separator": None,
            "header_row_idx": 0,
            "engine": engine,
        }
    header = [h.strip() for h in rows[0]]
    body = [r for r in rows[1 : sample_rows + 1] if any(c.strip() for c in r)]
    types = detect_types(body, len(header))
    columns = {
        db_col_name(name): {"python_type": t, "format": t, "score": score}
        for name, (t, score) in zip(header, types)
    }
    _refine_geo_formats(body, header, columns)
    report = {
        "header": header,
        "columns": columns,
        "total_lines": sum(1 for r in rows[1:] if any(c.strip() for c in r)),
        "encoding": "binary",
        "separator": None,
        "header_row_idx": 0,
        "engine": engine,
    }
    if output_profile:
        full_body = [r for r in rows[1:] if any(c.strip() for c in r)]
        report["profile"] = {
            db_col_name(name): column_profile(
                [row[c] if c < len(row) else None for row in full_body],
                columns[db_col_name(name)]["python_type"],
            )
            for c, name in enumerate(header)
        }
    return report


def inspect_xlsx(
    data: bytes,
    sample_rows: int = 100,
    rows: list[list[str]] | None = None,
    output_profile: bool = False,
) -> dict:
    """Inspection report for XLSX bytes (see rows_to_inspection).
    Pass ``rows`` (from read_xlsx_rows) to avoid a second XML parse."""
    if rows is None:
        rows = read_xlsx_rows(data)
    return rows_to_inspection(rows, "hydra-ray-xlsx", sample_rows, output_profile=output_profile)


def rows_to_typed_table(rows: list[list[str]], insp: dict) -> pa.Table:
    """Workbook rows + inspection → typed Arrow table via the shared
    smart_cast pipeline. Shared by the XLSX and XLS readers."""
    from hydra_ray.stages.inspection import _PA_TYPE, db_col_name, smart_cast

    if not rows:
        return pa.table({})
    header = insp["header"]
    col_names = [db_col_name(h) for h in header]
    ptypes = [insp["columns"][c]["python_type"] for c in col_names]
    cols: list[list] = [[] for _ in header]
    for r in rows[1:]:
        if not any(c.strip() for c in r):
            continue
        for c in range(len(header)):
            raw = r[c] if c < len(r) else None
            cols[c].append(smart_cast(ptypes[c], raw))
    arrays = [pa.array(col, type=_PA_TYPE[pt]) for col, pt in zip(cols, ptypes)]
    return pa.table(dict(zip(col_names, arrays)))


def xlsx_to_table(
    data: bytes, inspection: dict | None = None, rows: list[list[str]] | None = None
) -> pa.Table:
    """XLSX bytes → typed Arrow table via the shared cast pipeline.
    Pass ``rows`` to reuse an existing read_xlsx_rows result."""
    if rows is None:
        rows = read_xlsx_rows(data)
    insp = inspection or inspect_xlsx(data, rows=rows)
    return rows_to_typed_table(rows, insp)


# ---------------------------------------------------------------------------
# writer (fixtures / tests only — hand-rolled minimal OOXML)
# ---------------------------------------------------------------------------

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
</workbook>"""

_WORKBOOK_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>
</Relationships>"""


def _col_letters(idx: int) -> str:
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _esc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def write_xlsx(rows: list[list[object]]) -> bytes:
    """Rows (str/int/float/bool) → minimal single-sheet XLSX bytes.
    Strings go through sharedStrings (the common layout); numbers and
    bools use native cell types."""
    shared: list[str] = []
    shared_idx: dict[str, int] = {}
    body = []
    for ri, row in enumerate(rows, start=1):
        cells = []
        for ci, val in enumerate(row):
            ref = f"{_col_letters(ci)}{ri}"
            if isinstance(val, bool):
                cells.append(f'<c r="{ref}" t="b"><v>{1 if val else 0}</v></c>')
            elif isinstance(val, (int, float)):
                cells.append(f'<c r="{ref}"><v>{val!r}</v></c>')
            else:
                s = "" if val is None else str(val)
                if s not in shared_idx:
                    shared_idx[s] = len(shared)
                    shared.append(s)
                cells.append(f'<c r="{ref}" t="s"><v>{shared_idx[s]}</v></c>')
        body.append(f'<row r="{ri}">{"".join(cells)}</row>')
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f'<sheetData>{"".join(body)}</sheetData></worksheet>'
    )
    sst = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="{len(shared)}" uniqueCount="{len(shared)}">'
        + "".join(f"<si><t>{_esc(s)}</t></si>" for s in shared)
        + "</sst>"
    )
    buf = io.BytesIO()
    # STORED: this writer only synthesizes sandbox fixtures — skip the
    # deflate cost (readers accept either compression)
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr("[Content_Types].xml", _CONTENT_TYPES)
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/workbook.xml", _WORKBOOK)
        zf.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS)
        zf.writestr("xl/sharedStrings.xml", sst)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
    return buf.getvalue()
