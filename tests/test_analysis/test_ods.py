"""Stdlib ODS reader: round-trip, CSV/XLSX-twin parity, ODF edge cases.

Reference behavior: config_default.toml:63 declares .ods a first-class
size-capped tabular format; it feeds the same inspection/cast pipeline
as CSV and the Excel routes.
"""

import io
import zipfile

import pyarrow as pa

from hydra_ray.sources.ods import (
    ODS_MIMETYPE,
    inspect_ods,
    ods_to_table,
    read_ods_rows,
    write_ods,
)
from hydra_ray.stages.inspection import csv_text_to_table

_OFFICE = "urn:oasis:names:tc:opendocument:xmlns:office:1.0"
_TABLE = "urn:oasis:names:tc:opendocument:xmlns:table:1.0"
_TEXT = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"


def _pack(content_xml: str) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("mimetype", ODS_MIMETYPE)
        zf.writestr("content.xml", content_xml)
    return buf.getvalue()


def _doc(rows_xml: str) -> str:
    return (
        f'<office:document-content xmlns:office="{_OFFICE}" '
        f'xmlns:table="{_TABLE}" xmlns:text="{_TEXT}">'
        "<office:body><office:spreadsheet>"
        f'<table:table table:name="S">{rows_xml}</table:table>'
        "</office:spreadsheet></office:body></office:document-content>"
    )


def test_roundtrip_types():
    rows = [
        ["id", "name", "score", "flag", "day"],
        [1, "alpha", 1.5, True, "2024-01-02"],
        [2, "beta", 2.0, False, "2024-02-03"],
    ]
    t = ods_to_table(write_ods(rows))
    assert t["id"].type == pa.int64()
    assert t["name"].type == pa.string()
    assert t["score"].type == pa.float64()
    assert t["flag"].type == pa.bool_()
    assert t["day"].type == pa.date32()
    assert t["score"].to_pylist() == [1.5, 2.0]
    assert t["flag"].to_pylist() == [True, False]


def test_ods_equals_csv_twin():
    """The same logical table via .ods and via CSV text must produce
    the identical typed Arrow table (shared inspection + cast path)."""
    header = ["id", "label", "value"]
    body = [[7, "x", 0.25], [8, "y z", 4.0], [9, "", 1.75]]
    ods_tbl = ods_to_table(write_ods([header] + body))
    csv_text = "id;label;value\n" + "\n".join(
        ";".join("" if c == "" else str(c) for c in r) for r in body
    )
    csv_tbl = csv_text_to_table(csv_text)
    assert ods_tbl.schema == csv_tbl.schema
    assert ods_tbl.equals(csv_tbl)


def test_column_and_row_repeats_expand():
    xml = _doc(
        "<table:table-row>"
        '<table:table-cell office:value-type="float" office:value="3" '
        'table:number-columns-repeated="2"><text:p>3</text:p></table:table-cell>'
        '<table:table-cell office:value-type="string"><text:p>z</text:p></table:table-cell>'
        "</table:table-row>"
        '<table:table-row table:number-rows-repeated="2">'
        '<table:table-cell office:value-type="string"><text:p>r</text:p></table:table-cell>'
        "</table:table-row>"
    )
    rows = read_ods_rows(_pack(xml))
    assert rows == [["3", "3", "z"], ["r", "", ""], ["r", "", ""]]


def test_trailing_filler_runs_trimmed():
    """LibreOffice pads rows with a 16384-wide empty repeated cell and
    the sheet with ~1M repeated empty rows; both must not explode."""
    xml = _doc(
        "<table:table-row>"
        '<table:table-cell office:value-type="string"><text:p>a</text:p></table:table-cell>'
        '<table:table-cell table:number-columns-repeated="16383"/>'
        "</table:table-row>"
        '<table:table-row table:number-rows-repeated="1048575">'
        "<table:table-cell/></table:table-row>"
    )
    rows = read_ods_rows(_pack(xml))
    assert rows == [["a"]]


def test_interior_blank_row_run_expands():
    """An interior number-rows-repeated blank run must expand (it
    shifts all subsequent rows in the source sheet); only trailing
    filler is trimmed."""
    xml = _doc(
        "<table:table-row>"
        '<table:table-cell office:value-type="string"><text:p>top</text:p></table:table-cell>'
        "</table:table-row>"
        '<table:table-row table:number-rows-repeated="3"><table:table-cell/></table:table-row>'
        "<table:table-row>"
        '<table:table-cell office:value-type="string"><text:p>bottom</text:p></table:table-cell>'
        "</table:table-row>"
    )
    rows = read_ods_rows(_pack(xml))
    assert rows == [["top"], [""], [""], [""], ["bottom"]]


def test_covered_cells_and_space_expansion():
    xml = _doc(
        "<table:table-row>"
        '<table:table-cell office:value-type="string">'
        '<text:p>a<text:s text:c="3"/>b</text:p></table:table-cell>'
        "<table:covered-table-cell/>"
        '<table:table-cell office:value-type="boolean" office:boolean-value="true">'
        "<text:p>TRUE</text:p></table:table-cell>"
        "</table:table-row>"
    )
    rows = read_ods_rows(_pack(xml))
    assert rows == [["a   b", "", "true"]]


def test_inspection_shape_matches_csv_report():
    insp = inspect_ods(write_ods([["a", "b"], [1, "x"], [2, "y"]]))
    assert insp["engine"] == "hydra-ray-ods"
    assert insp["header"] == ["a", "b"]
    assert insp["columns"]["a"]["python_type"] == "int"
    assert insp["columns"]["b"]["python_type"] == "string"
    assert insp["total_lines"] == 2


def test_sniff_mime_detects_ods():
    from hydra_ray.functions.detect import detect_format, sniff_mime

    blob = write_ods([["a"], [1]])
    assert sniff_mime(blob) == ODS_MIMETYPE
    assert detect_format(ODS_MIMETYPE, None, None) == "ods"
    assert detect_format(None, None, "ods") == "ods"


def test_profile_matches_csv_twin():
    from hydra_ray.stages.inspection import inspect_csv_text

    rows = [["id", "score"], [1, 0.5], [2, 1.25], [3, 2.0]]
    csv_text = "\n".join(
        ",".join(repr(c) if isinstance(c, float) else str(c) for c in r) for r in rows
    )
    od = inspect_ods(write_ods(rows), output_profile=True)
    cv = inspect_csv_text(csv_text, output_profile=True)
    assert od["profile"] == cv["profile"]
