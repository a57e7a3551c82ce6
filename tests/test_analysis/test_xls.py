"""Stdlib legacy .xls (BIFF8) reader: CFB container, record decoding,
SST CONTINUE splitting, and typed-twin parity with CSV/XLSX.

Reference behavior: utils/reader.py:19-70 (engine="xlrd") +
csv_like/__init__.py:161-217 (Excel resources feed the same
inspection/cast pipeline as CSV).
"""

import struct

import pyarrow as pa

from hydra_ray.sources.xls import (
    _Cfb,
    _rk_value,
    inspect_xls,
    read_xls_rows,
    write_xls,
    xls_to_table,
)
from hydra_ray.sources.xlsx import write_xlsx, xlsx_to_table
from hydra_ray.stages.inspection import csv_text_to_table


def test_roundtrip_types():
    rows = [
        ["id", "name", "score", "flag", "day"],
        [1, "alpha", 1.5, True, "2024-01-02"],
        [2, "beta", 2.0, False, "2024-02-03"],
    ]
    t = xls_to_table(write_xls(rows))
    assert t["id"].type == pa.int64()
    assert t["name"].type == pa.string()
    assert t["score"].type == pa.float64()
    assert t["flag"].type == pa.bool_()
    assert t["day"].type == pa.date32()
    assert t["score"].to_pylist() == [1.5, 2.0]
    assert t["flag"].to_pylist() == [True, False]


def test_xls_equals_csv_and_xlsx_twins():
    """The same logical table via .xls, .xlsx and CSV text must produce
    the identical typed Arrow table (shared inspection + cast path)."""
    header = ["id", "label", "value"]
    body = [[7, "x", 0.25], [8, "y z", 4.0], [9, "", 1.75]]
    xls_tbl = xls_to_table(write_xls([header] + body))
    xlsx_tbl = xlsx_to_table(write_xlsx([header] + body))
    csv_text = "id;label;value\n" + "\n".join(
        ";".join("" if c == "" else str(c) for c in r) for r in body
    )
    csv_tbl = csv_text_to_table(csv_text)
    assert xls_tbl.schema == csv_tbl.schema
    assert xls_tbl.equals(csv_tbl)
    assert xls_tbl.equals(xlsx_tbl)


def test_ministream_and_regular_stream_containers():
    """Small workbooks live in the CFB mini-stream (miniFAT chains);
    large ones in regular 512-byte sectors — both must read back."""
    small = write_xls([["a"], [1]])
    cfb = _Cfb(small)
    wb = next(e for e in cfb.entries if e["name"] == "Workbook")
    assert wb["size"] < 4096  # exercised the miniFAT path
    assert read_xls_rows(small) == [["a"], ["1"]]

    big_rows = [["a", "b"]] + [[i, "x" * 60 + str(i)] for i in range(2000)]
    big = write_xls(big_rows)
    cfb2 = _Cfb(big)
    wb2 = next(e for e in cfb2.entries if e["name"] == "Workbook")
    assert wb2["size"] >= 4096  # regular FAT sectors
    out = read_xls_rows(big)
    assert len(out) == 2001
    assert out[2000] == ["1999", "x" * 60 + "1999"]


def test_sst_continue_split_unicode():
    """Strings longer than one record force CONTINUE records with
    re-emitted option bytes; utf-16 and latin-1 payloads both survive."""
    rows = [["t"]] + [["é" * 3000 + f"#{i}"] for i in range(10)] + [["plain" * 2000]]
    out = read_xls_rows(write_xls(rows))
    assert out[3][0] == "é" * 3000 + "#2"
    assert out[11][0] == "plain" * 2000


def test_rk_decoding():
    # integer RK, integer/100, float RK, float/100
    assert _rk_value((5 << 2) | 0x02) == 5.0
    assert _rk_value((525 << 2) | 0x03) == 5.25
    high = struct.unpack("<I", struct.pack("<d", 2.5)[4:])[0] & 0xFFFFFFFC
    assert _rk_value(high) == 2.5
    assert _rk_value(high | 0x01) == 0.025
    # negative integer RK survives the writer's two's-complement packing
    out = read_xls_rows(write_xls([["n"], [-42]]))
    assert out[1] == ["-42"]


def test_sparse_cells_become_empty_strings():
    rows = [["a", "b", "c"], ["x", None, "z"]]
    out = read_xls_rows(write_xls(rows))
    assert out[1] == ["x", "", "z"]


def test_inspection_shape_matches_csv_report():
    insp = inspect_xls(write_xls([["a", "b"], [1, "x"], [2, "y"]]))
    assert insp["engine"] == "hydra-ray-xls"
    assert insp["header"] == ["a", "b"]
    assert insp["columns"]["a"]["python_type"] == "int"
    assert insp["total_lines"] == 2


def test_not_a_cfb_file_raises():
    import pytest

    with pytest.raises(ValueError):
        read_xls_rows(b"PK\x03\x04 this is a zip, not CFB")


def test_biff5_book_stream():
    """Legacy BIFF5 workbooks ('Book' stream, byte strings instead of
    unicode/SST): LABEL and NUMBER/RK cells decode through the BIFF5
    branch."""
    from hydra_ray.sources.xls import _rec, _write_cfb

    bof_g = _rec(0x0809, struct.pack("<HHHH", 0x0500, 0x0005, 0, 0))
    bof_s = _rec(0x0809, struct.pack("<HHHH", 0x0500, 0x0010, 0, 0))
    name = b"Feuil1"
    # globals: BOF + BOUNDSHEET + EOF; BIFF5 boundsheet name is a byte string
    globals_len = len(bof_g) + (4 + 4 + 2 + 1 + len(name)) + 4
    boundsheet = _rec(0x0085, struct.pack("<IH", globals_len, 0) + bytes([len(name)]) + name)
    cells = (
        _rec(0x0204, struct.pack("<HHHH", 0, 0, 0, 3) + b"abc")  # LABEL r0c0
        + _rec(0x0203, struct.pack("<HHHd", 0, 1, 0, 2.5))  # NUMBER r0c1
        + _rec(0x027E, struct.pack("<HHHI", 1, 0, 0, (7 << 2) | 0x02))  # RK r1c0
        + _rec(0x0205, struct.pack("<HHHBB", 1, 1, 0, 1, 0))  # BOOLERR r1c1
    )
    stream = bof_g + boundsheet + _rec(0x000A, b"") + bof_s + cells + _rec(0x000A, b"")
    blob = _write_cfb("Book", stream)
    assert read_xls_rows(blob) == [["abc", "2.5"], ["7", "true"]]


def _wrap_biff8(cell_recs: bytes) -> bytes:
    """Minimal BIFF8 workbook around hand-crafted worksheet records."""
    import struct

    from hydra_ray.sources.xls import _BOF, _BOUNDSHEET, _EOF, _rec, _write_cfb

    bof_globals = _rec(_BOF, struct.pack("<HHHHII", 0x0600, 0x0005, 0, 0, 0, 0))
    bof_sheet = _rec(_BOF, struct.pack("<HHHHII", 0x0600, 0x0010, 0, 0, 0, 0))
    sheet = bof_sheet + cell_recs + _rec(_EOF, b"")
    name = b"S"
    globals_len = len(bof_globals) + 4 + (4 + 2 + 2 + len(name)) + 4
    boundsheet = _rec(
        _BOUNDSHEET, struct.pack("<IH", globals_len, 0) + bytes([len(name), 0]) + name
    )
    return _write_cfb("Workbook", bof_globals + boundsheet + _rec(_EOF, b"") + sheet)


def test_formula_cached_results_all_kinds():
    """FORMULA records with every cached-result kind: number, string
    (value in the following STRING record), boolean, blank, error."""
    import struct

    from hydra_ray.sources.xls import _FORMULA, _STRING, _rec

    recs = b""
    # (0,0) number result 2.5 — plain double in the cached field
    recs += _rec(_FORMULA, struct.pack("<HHHd", 0, 0, 0, 2.5) + b"\x00\x00\x00\x00\x00\x00")
    # (0,1) string result, text follows in a STRING record
    recs += _rec(_FORMULA, struct.pack("<HHH", 0, 1, 0) + bytes([0, 0, 0, 0, 0, 0, 255, 255]))
    recs += _rec(_STRING, struct.pack("<HB", 5, 0) + b"hello")
    # (0,2) boolean TRUE
    recs += _rec(_FORMULA, struct.pack("<HHH", 0, 2, 0) + bytes([1, 0, 1, 0, 0, 0, 255, 255]))
    # (0,3) blank
    recs += _rec(_FORMULA, struct.pack("<HHH", 0, 3, 0) + bytes([3, 0, 0, 0, 0, 0, 255, 255]))
    # (0,4) error (#DIV/0!) → blank cell
    recs += _rec(_FORMULA, struct.pack("<HHH", 0, 4, 0) + bytes([2, 0, 7, 0, 0, 0, 255, 255]))
    # (1,0) anchor cell so the error column stays in the dense grid
    recs += _rec(_FORMULA, struct.pack("<HHHd", 1, 4, 0, 9.0) + b"\x00" * 6)
    rows = read_xls_rows(_wrap_biff8(recs))
    assert rows == [["2.5", "hello", "true", "", ""], ["", "", "", "", "9"]]


def test_formula_string_result_biff5():
    """BIFF5 STRING records use a 16-bit cch + latin-1 chars (no
    unicode option byte) — the biff8=False branch."""
    import struct

    from hydra_ray.sources.xls import (
        _BOF,
        _BOUNDSHEET,
        _EOF,
        _FORMULA,
        _STRING,
        _rec,
        _write_cfb,
    )

    recs = _rec(_FORMULA, struct.pack("<HHH", 0, 0, 0) + bytes([0, 0, 0, 0, 0, 0, 255, 255]))
    recs += _rec(_STRING, struct.pack("<H", 4) + b"caf\xe9")
    bof_globals = _rec(_BOF, struct.pack("<HHHH", 0x0500, 0x0005, 0, 0))
    bof_sheet = _rec(_BOF, struct.pack("<HHHH", 0x0500, 0x0010, 0, 0))
    sheet = bof_sheet + recs + _rec(_EOF, b"")
    name = b"S"
    globals_len = len(bof_globals) + 4 + (4 + 2 + 1 + len(name)) + 4
    boundsheet = _rec(
        _BOUNDSHEET, struct.pack("<IH", globals_len, 0) + bytes([len(name)]) + name
    )
    blob = _write_cfb("Book", bof_globals + boundsheet + _rec(_EOF, b"") + sheet)
    assert read_xls_rows(blob) == [["café"]]


def test_date1904_record_tolerated():
    """A workbook carrying the 1904-date-mode record still parses;
    numbers pass through unconverted (this reader emits raw serials —
    date interpretation is the typed-cast layer's job, documented)."""
    import struct

    from hydra_ray.sources.xls import _NUMBER, _rec

    # DATE1904 (0x0022) belongs in globals, but the reader must simply
    # skip it wherever it appears
    recs = _rec(0x0022, struct.pack("<H", 1))
    recs += _rec(_NUMBER, struct.pack("<HHHd", 0, 0, 0, 366.0))
    assert read_xls_rows(_wrap_biff8(recs)) == [["366"]]
