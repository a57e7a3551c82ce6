"""Inspection / casting parity (reference csv-detective integration,
utils/casting.py, db/__init__.py, parquet inspect)."""

from datetime import date, datetime

import pyarrow as pa
import pytest

from hydra_ray.stages.inspection import (
    cell_type,
    csv_text_to_table,
    db_col_name,
    detect_separator,
    inspect_csv_text,
    inspect_parquet,
    smart_cast,
    validate_then_detect,
)

CSV = """id;name;price;active;created;location
1;alpha;1.5;true;2024-01-01;"[48.85, 2.35]"
2;beta;2.25;false;2024-02-03;"[43.6, 1.44]"
3;gamma;10;true;2024-03-04;"[45.76, 4.83]"
"""


def test_separator_detection():
    assert detect_separator(CSV.splitlines()) == ";"
    assert detect_separator(["a,b,c", "1,2,3"]) == ","
    assert detect_separator(["a\tb", "1\t2"]) == "\t"


@pytest.mark.parametrize(
    "value,expected",
    [
        ("12", "int"),
        ("-3", "int"),
        ("1.5", "float"),
        ("1,5", "float"),
        ("true", "bool"),
        ("oui", "bool"),
        ("2024-01-02", "date"),
        ("01/02/2024", "date"),
        ("2024-01-02T10:00:00", "datetime"),
        ('{"a": 1}', "json"),
        ("[1, 2]", "json"),
        ("hello", "string"),
        ("", "empty"),
    ],
)
def test_cell_type(value, expected):
    assert cell_type(value) == expected


def test_inspection_report():
    insp = inspect_csv_text(CSV)
    assert insp["separator"] == ";"
    assert insp["total_lines"] == 3
    assert insp["header"] == ["id", "name", "price", "active", "created", "location"]
    cols = insp["columns"]
    assert cols["id"]["python_type"] == "int"
    assert cols["name"]["python_type"] == "string"
    assert cols["price"]["python_type"] == "float"  # int widened to float
    assert cols["active"]["python_type"] == "bool"
    assert cols["created"]["python_type"] == "date"
    assert cols["location"]["format"] == "latlon"  # geo refinement


def test_reserved_column_rename():
    assert db_col_name("select") == "select__hydra_renamed"
    assert db_col_name("normal") == "normal"
    assert len(db_col_name("x" * 100)) == 63


@pytest.mark.parametrize(
    "ptype,value,expected",
    [
        ("int", "42", 42),
        ("int", "", None),
        ("int", "abc", None),
        ("float", "1,5", 1.5),
        ("bool", "oui", True),
        ("bool", "non", False),
        ("date", "2024-01-02", date(2024, 1, 2)),
        ("date", "02/01/2024", date(2024, 1, 2)),
        ("datetime", "2024-01-02T10:30:00", datetime(2024, 1, 2, 10, 30)),
        ("json", '{"a": 1}', '{"a": 1}'),
        ("string", " keep spaces ", " keep spaces "),
    ],
)
def test_smart_cast(ptype, value, expected):
    assert smart_cast(ptype, value) == expected


def test_csv_to_typed_table():
    t = csv_text_to_table(CSV)
    assert t.num_rows == 3
    assert t["id"].type == pa.int64()
    assert t["price"].type == pa.float64()
    assert t["active"].type == pa.bool_()
    assert t["price"].to_pylist() == [1.5, 2.25, 10.0]


def test_validate_then_detect_fast_path():
    insp, reused = validate_then_detect(CSV, None)
    assert not reused
    insp2, reused2 = validate_then_detect(CSV, insp)
    assert reused2 and insp2 is insp
    changed = CSV.replace("id;name", "key;name")
    _, reused3 = validate_then_detect(changed, insp)
    assert not reused3


def test_inspect_parquet(tmp_path):
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "a": pa.array([1], type=pa.int32()),
            "b": pa.array([{"x": 1}], type=pa.struct([("x", pa.int64())])),
            "c": pa.array([datetime(2024, 1, 1)], type=pa.timestamp("us", tz="UTC")),
            "d": pa.array([[1.0]], type=pa.list_(pa.float64())),
        }
    )
    path = str(tmp_path / "t.parquet")
    pq.write_table(t, path)
    insp = inspect_parquet(path)
    assert insp["columns"]["a"]["python_type"] == "int"
    assert insp["columns"]["b"]["python_type"] == "json"
    assert insp["columns"]["c"]["python_type"] == "datetime_aware"
    assert insp["columns"]["d"]["python_type"] == "json"
    assert insp["total_lines"] == 1


def test_profile_output():
    """csv-detective output_profile parity: numeric stats, tops,
    distinct/missing counts over the full body."""
    from hydra_ray.stages.inspection import inspect_csv_text

    text = "a;b\n1;x\n2;y\n3;x\n;x\n3;z\n"
    rep = inspect_csv_text(text, output_profile=True)
    assert rep["columns"]["a"]["python_type"] == "int"
    pa_ = rep["profile"]["a"]
    assert pa_["min"] == 1.0 and pa_["max"] == 3.0
    assert pa_["mean"] == 2.25 and pa_["std"] > 0
    assert pa_["nb_missing_values"] == 1  # the empty cell
    assert pa_["nb_distinct"] == 3
    pb = rep["profile"]["b"]
    assert pb["nb_distinct"] == 3 and pb["nb_missing_values"] == 0
    assert pb["tops"][0] == {"value": "x", "count": 3}
    assert "min" not in pb  # numeric stats only for numeric columns


def test_encoding_detection():
    from hydra_ray.stages.inspection import detect_encoding, inspect_csv_bytes

    assert detect_encoding("a;b\n1;é\n".encode("utf-8")) == "utf-8"
    assert detect_encoding(b"\xef\xbb\xbfa;b\n") == "utf-8-sig"
    assert detect_encoding("a;b\n1;é\n".encode("latin-1")) == "latin-1"
    rep = inspect_csv_bytes("x;y\n1;caf\xe9\n2;th\xe9\n".encode("latin-1"))
    assert rep["encoding"] == "latin-1"
    assert rep["columns"]["x"]["python_type"] == "int"


def test_inspect_csv_bytes_gunzips():
    """.csv.gz bytes inspect identically to their plain twin (reference
    utils/file.py gzip handling)."""
    import gzip

    from hydra_ray.stages.inspection import inspect_csv_bytes

    raw = "a;b\n1;x\n2;y\n".encode("utf-8")
    plain = inspect_csv_bytes(raw)
    gz = inspect_csv_bytes(gzip.compress(raw))
    assert gz["header"] == plain["header"] == ["a", "b"]
    assert gz["columns"] == plain["columns"]
    assert gz["total_lines"] == plain["total_lines"] == 2
