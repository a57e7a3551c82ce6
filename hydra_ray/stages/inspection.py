"""Tabular inspection: csv-detective-style schema inference + casting.

Produces the reference's "inspection" report shape
(udata_hydra/data_formats/csv_like/__init__.py:35-58):
    {header, columns: {name: {python_type, format, score}}, total_lines,
     encoding, separator, header_row_idx, engine}
with the same python-type vocabulary (conversion/schema.py:26-64):
    string float int bool json date datetime

Components:
  - ``detect_separator``  : most consistent of ; , \\t | over sample rows
  - ``detect_types``      : per-column vote over sampled cells
  - ``inspect_csv_text``  : the full report
  - ``smart_cast``        : per-cell cast with ''→None failsafe
                            (utils/casting.py:12-25)
  - ``db_col_name``       : reserved-column rename + NAMEDATALEN truncation
                            (db/__init__.py:10-15; to_db.py:48-58)
  - ``csv_text_to_table`` : typed Arrow table via the inspection
  - ``inspect_parquet``   : Arrow schema → python-type report
                            (data_formats/parquet/__init__.py:35-62,
                            PYARROW_TYPE_TO_PYTHON semantics)

XLSX ingestion is first-class via the stdlib zip+XML reader in
``hydra_ray.sources.xlsx`` (no openpyxl needed) and legacy binary .xls
via the stdlib BIFF reader in ``hydra_ray.sources.xls`` (no xlrd);
workbook rows feed the same detect_types + smart_cast +
``column_profile`` pipeline, so an .xls, its .xlsx twin and its CSV
twin produce identical typed tables AND identical csv-detective
profile reports.
"""

from __future__ import annotations

import json
import re
from datetime import date, datetime

import pyarrow as pa

SEPARATORS = [";", ",", "\t", "|"]

# PostgreSQL reserved words the reference renames (db/__init__.py:10-15)
RESERVED_COLS = {"do", "select", "from", "where", "table", "order", "group", "user", "check"}
NAMEDATALEN = 64

_INT_RE = re.compile(r"^[+-]?\d+$")
_FLOAT_RE = re.compile(r"^[+-]?(\d+[.,]\d*|\d*[.,]\d+|\d+)([eE][+-]?\d+)?$")
_BOOL_SET = {"true", "false", "vrai", "faux", "oui", "non", "yes", "no"}
_DATE_RE = re.compile(r"^\d{4}-\d{2}-\d{2}$|^\d{2}/\d{2}/\d{4}$")
_DATETIME_RE = re.compile(r"^\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}(:\d{2})?")


def db_col_name(name: str) -> str:
    """Reserved-name rename + identifier-length budget (parity M10)."""
    if name.lower() in RESERVED_COLS:
        name = f"{name}__hydra_renamed"
    return name[: NAMEDATALEN - 1]


def detect_separator(lines: list[str]) -> str:
    """The separator with the highest consistent per-line count > 0."""
    best, best_score = ",", -1.0
    for sep in SEPARATORS:
        counts = [line.count(sep) for line in lines if line.strip()]
        if not counts or min(counts) == 0:
            continue
        consistency = 1.0 if len(set(counts)) == 1 else 1.0 / len(set(counts))
        score = consistency * (counts[0] + 1)
        if score > best_score:
            best, best_score = sep, score
    return best


def cell_type(value: str) -> str:
    v = value.strip()
    if not v:
        return "empty"
    if _INT_RE.match(v):
        return "int"
    if _FLOAT_RE.match(v):
        return "float"
    if v.lower() in _BOOL_SET:
        return "bool"
    if _DATETIME_RE.match(v):
        return "datetime"
    if _DATE_RE.match(v):
        return "date"
    if (v.startswith("{") and v.endswith("}")) or (v.startswith("[") and v.endswith("]")):
        try:
            json.loads(v)
            return "json"
        except ValueError:
            pass
    return "string"


_WIDEN = {
    ("int", "float"): "float",
    ("float", "int"): "float",
    ("date", "datetime"): "datetime",
    ("datetime", "date"): "datetime",
}


def detect_types(rows: list[list[str]], n_cols: int) -> list[tuple[str, float]]:
    """(python_type, score) per column — majority vote with int→float and
    date→datetime widening; any irreconcilable mix → string."""
    out = []
    for c in range(n_cols):
        seen: dict[str, int] = {}
        total = 0
        for row in rows:
            if c >= len(row):
                continue
            t = cell_type(row[c])
            if t == "empty":
                continue
            seen[t] = seen.get(t, 0) + 1
            total += 1
        if not total:
            out.append(("string", 0.0))
            continue
        agreed: str | None = None
        for t in seen:
            if agreed is None:
                agreed = t
            elif (agreed, t) in _WIDEN:
                agreed = _WIDEN[(agreed, t)]
            elif agreed != t:
                agreed = "string"
                break
        dominant = max(seen.values()) / total
        out.append((agreed or "string", round(dominant, 3)))
    return out


def _parse_csv_line(line: str, sep: str) -> list[str]:
    """Minimal quoted-field split (double-quote CSV convention)."""
    if '"' not in line:
        return line.split(sep)
    out, cur, quoted = [], [], False
    i = 0
    while i < len(line):
        ch = line[i]
        if ch == '"':
            if quoted and i + 1 < len(line) and line[i + 1] == '"':
                cur.append('"')
                i += 1
            else:
                quoted = not quoted
        elif ch == sep and not quoted:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
        i += 1
    out.append("".join(cur))
    return out


def inspect_csv_text(text: str, sample_rows: int = 100, output_profile: bool = False) -> dict:
    """Full inspection report for CSV text content.

    ``output_profile=True`` mirrors csv-detective's profile output
    (``csv_detective_routine(output_profile=True, num_rows=-1)``,
    reference csv_like/__init__.py:35-58): per-column min/max/mean/std
    (numerics), top-10 values, nb_distinct, nb_missing_values computed
    over the FULL body (not the type-detection sample)."""
    lines = text.splitlines()
    sep = detect_separator(lines[: sample_rows + 1])
    if not lines:
        return {
            "header": [],
            "columns": {},
            "total_lines": 0,
            "encoding": "utf-8",
            "separator": sep,
            "header_row_idx": 0,
            "engine": "hydra-ray-inspect",
        }
    header = [h.strip() for h in _parse_csv_line(lines[0], sep)]
    body = [_parse_csv_line(line, sep) for line in lines[1 : sample_rows + 1] if line.strip()]
    types = detect_types(body, len(header))
    columns = {
        db_col_name(name): {"python_type": t, "format": t, "score": score}
        for name, (t, score) in zip(header, types)
    }
    _refine_geo_formats(body, header, columns)
    report = {
        "header": header,
        "columns": columns,
        "total_lines": sum(1 for line in lines[1:] if line.strip()),
        "encoding": "utf-8",
        "separator": sep,
        "header_row_idx": 0,
        "engine": "hydra-ray-inspect",
    }
    if output_profile:
        full_body = [_parse_csv_line(line, sep) for line in lines[1:] if line.strip()]
        report["profile"] = {
            db_col_name(name): column_profile(
                [row[c] if c < len(row) else None for row in full_body],
                columns[db_col_name(name)]["python_type"],
            )
            for c, name in enumerate(header)
        }
    return report


def column_profile(values: list, ptype: str) -> dict:
    """csv-detective-style per-column profile: numeric min/max/mean/std,
    top-10 values, nb_distinct, nb_missing_values (casting failures and
    empties count as missing, like the reference's failsafe cast)."""
    import numpy as np
    from collections import Counter

    cast = [smart_cast(ptype, v) for v in values]
    present = [c for c in cast if c is not None]
    prof = {
        "nb_distinct": len({str(c) for c in present}),
        "nb_missing_values": len(cast) - len(present),
    }
    if ptype in ("int", "float") and present:
        arr = np.asarray(present, dtype=np.float64)
        prof.update(
            {
                "min": float(arr.min()),
                "max": float(arr.max()),
                "mean": round(float(arr.mean()), 6),
                "std": round(float(arr.std()), 6),  # population std (ddof=0)
            }
        )
    prof["tops"] = [
        {"value": v, "count": n} for v, n in Counter(str(c) for c in present).most_common(10)
    ]
    return prof


# -- encoding detection (reference: chardet via csv-detective) ---------------

_BOMS = [
    (b"\xef\xbb\xbf", "utf-8-sig"),
    (b"\xff\xfe", "utf-16-le"),
    (b"\xfe\xff", "utf-16-be"),
]


def detect_encoding(data: bytes) -> str:
    """BOM sniff → strict utf-8 try → latin-1 fallback (chardet isn't in
    this container; this covers the encodings data.gouv resources
    actually use — utf-8 variants and legacy latin-1/cp1252)."""
    for bom, name in _BOMS:
        if data.startswith(bom):
            return name
    try:
        data.decode("utf-8")
        return "utf-8"
    except UnicodeDecodeError:
        return "latin-1"


def inspect_csv_bytes(data: bytes, sample_rows: int = 100, output_profile: bool = False) -> dict:
    """Bytes entry point: gunzip if compressed (.csv.gz resources,
    reference utils/file.py gzip handling), detect encoding, decode,
    inspect."""
    if data[:2] == b"\x1f\x8b":
        import gzip

        data = gzip.decompress(data)
    enc = detect_encoding(data)
    text = data.decode(enc)
    report = inspect_csv_text(text, sample_rows=sample_rows, output_profile=output_profile)
    report["encoding"] = enc
    return report


_LATLON_CELL_RE = re.compile(r"^\s*\[?\s*([+-]?\d+(?:\.\d+)?)\s*,\s*([+-]?\d+(?:\.\d+)?)\s*\]?\s*$")
_GEOM_TYPES = {"Point", "LineString", "Polygon", "MultiPoint", "MultiLineString", "MultiPolygon"}


def _refine_geo_formats(rows: list[list[str]], header: list[str], columns: dict) -> None:
    """csv-detective-style geo format refinement: string columns whose
    sampled cells are '[lat, lon]' pairs → format 'latlon'; embedded
    GeoJSON geometry objects → format 'geojson' (feeds M11 detection)."""
    for c, name in enumerate(header):
        key = db_col_name(name)
        meta = columns.get(key)
        if not meta or meta["python_type"] not in ("string", "json"):
            continue
        values = [row[c] for row in rows if c < len(row) and row[c].strip()]
        if not values:
            continue
        latlon_hits = geojson_hits = 0
        for v in values:
            m = _LATLON_CELL_RE.match(v)
            if m and abs(float(m.group(1))) <= 90 and abs(float(m.group(2))) <= 180:
                latlon_hits += 1
                continue
            if v.lstrip().startswith("{"):
                try:
                    obj = json.loads(v)
                    if isinstance(obj, dict) and obj.get("type") in _GEOM_TYPES:
                        geojson_hits += 1
                except ValueError:
                    pass
        if geojson_hits == len(values):
            meta["format"] = "geojson"
        elif latlon_hits == len(values):
            meta["format"] = "latlon"


def smart_cast(python_type: str, value: str | None):
    """Per-cell failsafe cast ('' → None; failure → None), the M9 parity."""
    if value is None:
        return None
    v = value.strip()
    if v == "":
        return None
    try:
        if python_type == "int":
            return int(v)
        if python_type == "float":
            return float(v.replace(",", "."))
        if python_type == "bool":
            return v.lower() in {"true", "vrai", "oui", "yes", "1"}
        if python_type == "date":
            if "/" in v:
                d, m, y = v.split("/")
                return date(int(y), int(m), int(d))
            return date.fromisoformat(v)
        if python_type == "datetime":
            return datetime.fromisoformat(v.replace("T", " ").split("+")[0])
        if python_type == "json":
            json.loads(v)  # validated, stored as text (reference stores JSONB)
            return v
        return value
    except (ValueError, TypeError):
        return None


_PA_TYPE = {
    "string": pa.string(),
    "int": pa.int64(),
    "float": pa.float64(),
    "bool": pa.bool_(),
    "date": pa.date32(),
    "datetime": pa.timestamp("us"),
    "json": pa.string(),
}


def csv_text_to_table(text: str, inspection: dict | None = None) -> pa.Table:
    """CSV text → typed Arrow table using (or computing) the inspection."""
    insp = inspection or inspect_csv_text(text)
    sep = insp["separator"]
    lines = [line for line in text.splitlines() if line.strip()]
    if not lines:
        return pa.table({})
    header = insp["header"]
    col_names = [db_col_name(h) for h in header]
    ptypes = [insp["columns"][c]["python_type"] for c in col_names]
    cols: list[list] = [[] for _ in header]
    for line in lines[1:]:
        cells = _parse_csv_line(line, sep)
        for c in range(len(header)):
            raw = cells[c] if c < len(cells) else None
            cols[c].append(smart_cast(ptypes[c], raw))
    arrays = [pa.array(col, type=_PA_TYPE[pt]) for col, pt in zip(cols, ptypes)]
    return pa.table(dict(zip(col_names, arrays)))


# -- parquet inspection (S5) -------------------------------------------------

def _arrow_to_python_type(t: pa.DataType) -> str:
    """PYARROW_TYPE_TO_PYTHON semantics (conversion/schema.py:38-53):
    struct/list → json, decimal → float, timestamp+tz → datetime_aware,
    dictionary unwrapped."""
    if pa.types.is_dictionary(t):
        return _arrow_to_python_type(t.value_type)
    if pa.types.is_struct(t) or pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_map(t):
        return "json"
    if pa.types.is_decimal(t) or pa.types.is_floating(t):
        return "float"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_timestamp(t):
        return "datetime_aware" if t.tz is not None else "datetime"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    return "string"


def inspect_parquet(path: str) -> dict:
    """Parquet metadata → the same inspection shape (no data read)."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    schema = pf.schema_arrow
    columns = {
        db_col_name(f.name): {"python_type": _arrow_to_python_type(f.type), "format": str(f.type), "score": 1.0}
        for f in schema
    }
    return {
        "header": list(schema.names),
        "columns": columns,
        "total_lines": pf.metadata.num_rows,
        "encoding": "binary",
        "separator": None,
        "header_row_idx": None,
        "engine": "pyarrow-metadata",
    }


def validate_then_detect(text: str, previous: dict | None) -> tuple[dict, bool]:
    """T4 parity: try the previous inspection first; if the header and
    separator still match, keep it (fast path) — else re-detect."""
    if previous:
        sep = previous.get("separator")
        first = text.splitlines()[0] if text else ""
        header = [h.strip() for h in _parse_csv_line(first, sep)] if sep else None
        if header == previous.get("header"):
            return previous, True
    return inspect_csv_text(text), False
