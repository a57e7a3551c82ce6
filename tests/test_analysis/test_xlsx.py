"""Stdlib XLSX reader: round-trip, CSV-twin parity, OOXML edge cases.

Reference behavior: utils/reader.py:19-70 + csv_like/__init__.py:161-217
(Excel resources feed the same inspection/cast pipeline as CSV).
"""

import io
import zipfile

import pyarrow as pa

from hydra_ray.sources.xlsx import (
    inspect_xlsx,
    read_xlsx_rows,
    write_xlsx,
    xlsx_to_table,
)
from hydra_ray.stages.inspection import csv_text_to_table


def test_roundtrip_types():
    rows = [
        ["id", "name", "score", "flag", "day"],
        [1, "alpha", 1.5, True, "2024-01-02"],
        [2, "beta", 2.0, False, "2024-02-03"],
    ]
    t = xlsx_to_table(write_xlsx(rows))
    assert t["id"].type == pa.int64()
    assert t["name"].type == pa.string()
    assert t["score"].type == pa.float64()
    assert t["flag"].type == pa.bool_()
    assert t["day"].type == pa.date32()
    assert t["score"].to_pylist() == [1.5, 2.0]
    assert t["flag"].to_pylist() == [True, False]


def test_xlsx_equals_csv_twin():
    """The same logical table via .xlsx and via CSV text must produce
    the identical typed Arrow table (shared inspection + cast path)."""
    header = ["id", "label", "value"]
    body = [[7, "x", 0.25], [8, "y z", 4.0], [9, "", 1.75]]
    xlsx_tbl = xlsx_to_table(write_xlsx([header] + body))
    csv_text = "id;label;value\n" + "\n".join(
        ";".join("" if c == "" else str(c) for c in r) for r in body
    )
    csv_tbl = csv_text_to_table(csv_text)
    assert xlsx_tbl.schema == csv_tbl.schema
    assert xlsx_tbl.equals(csv_tbl)


def test_sparse_cells_and_missing_refs():
    """Cells land by their A1 reference; gaps become empty strings."""
    sheet = (
        '<?xml version="1.0"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<sheetData>"
        '<row r="1"><c r="A1" t="inlineStr"><is><t>a</t></is></c>'
        '<c r="C1" t="inlineStr"><is><t>c</t></is></c></row>'
        '<row r="2"><c r="B2"><v>5</v></c></row>'
        "</sheetData></worksheet>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
    rows = read_xlsx_rows(buf.getvalue())
    assert rows == [["a", "", "c"], ["", "5", ""]]


def test_inspection_shape_matches_csv_report():
    insp = inspect_xlsx(write_xlsx([["a", "b"], [1, "x"], [2, "y"]]))
    assert insp["engine"] == "hydra-ray-xlsx"
    assert insp["header"] == ["a", "b"]
    assert insp["columns"]["a"]["python_type"] == "int"
    assert insp["columns"]["b"]["python_type"] == "string"
    assert insp["total_lines"] == 2
    assert set(insp) == {
        "header",
        "columns",
        "total_lines",
        "encoding",
        "separator",
        "header_row_idx",
        "engine",
    }


def test_reserved_column_rename_applies():
    t = xlsx_to_table(write_xlsx([["select", "v"], ["a", 1]]))
    assert "select__hydra_renamed" in t.column_names


def test_workbook_profile_matches_csv_twin():
    """output_profile parity: a workbook and its CSV twin produce the
    identical csv-detective profile (min/max/mean/std, tops, distinct,
    missing) and the same geo-format refinement."""
    from hydra_ray.sources.xlsx import inspect_xlsx, write_xlsx
    from hydra_ray.stages.inspection import inspect_csv_text

    rows = [
        ["id", "score", "pos", "note"],
        [1, 0.5, "[48.85, 2.35]", "ok"],
        [2, 1.25, "[43.6, 1.44]", ""],
        [3, 2.0, "[45.76, 4.83]", "ok"],
    ]
    def cell(c):
        if c == "":
            return ""
        if isinstance(c, float):
            return repr(c)
        s = str(c)
        return f'"{s}"' if "," in s else s

    csv_text = "\n".join(",".join(cell(c) for c in r) for r in rows)
    wb = inspect_xlsx(write_xlsx(rows), output_profile=True)
    cv = inspect_csv_text(csv_text, output_profile=True)
    assert wb["profile"] == cv["profile"]
    assert {k: v["python_type"] for k, v in wb["columns"].items()} == {
        k: v["python_type"] for k, v in cv["columns"].items()
    }
    assert wb["columns"]["pos"]["format"] == "latlon" == cv["columns"]["pos"]["format"]
