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

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

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
    nz = [line for line in lines if line.strip()]
    return _detect_separator_nz(nz)


def _detect_separator_nz(nz: list[str]) -> str:
    """detect_separator over pre-filtered non-blank lines (the analyse
    hot path strips once and shares the list with the body parse)."""
    best, best_score = ",", -1.0
    for sep in SEPARATORS:
        # a separator absent from the first non-blank line always has
        # min(counts) == 0 and is skipped — gate before the full scan
        if not nz or sep not in nz[0]:
            continue
        counts = [line.count(sep) for line in nz]
        if min(counts) == 0:
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

# RE2 (Arrow kernel) twins of the Python patterns above. RE2's [0-9] is
# deliberate where Python's \d would match Unicode digits — any cell
# containing a non-printable-ASCII character takes the exact-parity
# Python cell_type fallback instead.
_ASCII_RE2 = r"^[ -~]*$"
_INT_RE2 = r"^[+-]?[0-9]+$"
_FLOAT_RE2 = r"^[+-]?([0-9]+[.,][0-9]*|[0-9]*[.,][0-9]+|[0-9]+)([eE][+-]?[0-9]+)?$"
_DATETIME_RE2 = r"^[0-9]{4}-[0-9]{2}-[0-9]{2}[T ][0-9]{2}:[0-9]{2}(:[0-9]{2})?"
_DATE_RE2 = r"^([0-9]{4}-[0-9]{2}-[0-9]{2}|[0-9]{2}/[0-9]{2}/[0-9]{4})$"

_T_EMPTY, _T_INT, _T_FLOAT, _T_BOOL, _T_DATETIME, _T_DATE, _T_JSON, _T_STRING = range(8)
_TYPE_NAMES = ["empty", "int", "float", "bool", "datetime", "date", "json", "string"]
_CODE_OF = {n: i for i, n in enumerate(_TYPE_NAMES)}
_BOOL_ARR = pa.array(sorted(_BOOL_SET))


def _classify_cells(arr: pa.Array) -> np.ndarray:
    """Vectorized cell_type over a flat string array → int8 type codes.
    One Arrow RE2 kernel per TYPE over the whole array (the round-3
    verdict fix for the per-cell Python type-vote loop); cells outside
    printable ASCII fall back to cell_type per cell, so Unicode-digit /
    exotic-whitespace semantics stay bit-identical to the Python path."""
    s = pc.utf8_trim(arr, " ")
    masks = [
        pc.equal(s, ""),
        pc.match_substring_regex(s, _INT_RE2),
        pc.match_substring_regex(s, _FLOAT_RE2),
        pc.is_in(pc.utf8_lower(s), value_set=_BOOL_ARR),
        pc.match_substring_regex(s, _DATETIME_RE2),
        pc.match_substring_regex(s, _DATE_RE2),
    ]
    np_masks = [m.to_numpy(zero_copy_only=False) for m in masks]
    codes = np.select(
        np_masks,
        [_T_EMPTY, _T_INT, _T_FLOAT, _T_BOOL, _T_DATETIME, _T_DATE],
        default=_T_STRING,
    ).astype(np.int8)
    # json: bracketed string-coded cells that actually parse
    jsonish = pc.or_(
        pc.and_(pc.starts_with(s, "{"), pc.ends_with(s, "}")),
        pc.and_(pc.starts_with(s, "["), pc.ends_with(s, "]")),
    ).to_numpy(zero_copy_only=False)
    cand = np.nonzero(jsonish & (codes == _T_STRING))[0]
    if cand.size:
        vals = s.take(pa.array(cand)).to_pylist()
        for i, v in zip(cand, vals):
            try:
                json.loads(v)
                codes[i] = _T_JSON
            except ValueError:
                pass
    bad = np.nonzero(
        ~pc.match_substring_regex(arr, _ASCII_RE2).to_numpy(zero_copy_only=False)
    )[0]
    if bad.size:
        vals = arr.take(pa.array(bad)).to_pylist()
        for i, v in zip(bad, vals):
            codes[i] = _CODE_OF[cell_type(v)]
    return codes


def _fold_column(row: np.ndarray) -> tuple[str, float]:
    """Fold one column's 8-slot type-count vector into (type, score).
    The widening fold is order-independent (both directions of each
    widening pair are in _WIDEN), so this set-based fold is exactly the
    original first-seen-order fold."""
    total = int(row.sum())
    if not total:
        return ("string", 0.0)
    present = {_TYPE_NAMES[t] for t in np.nonzero(row)[0]}
    if len(present) == 1:
        agreed = next(iter(present))
    elif present == {"int", "float"}:
        agreed = "float"
    elif present == {"date", "datetime"}:
        agreed = "datetime"
    else:
        agreed = "string"
    return (agreed, round(int(row.max()) / total, 3))


# Below this many sampled cells the per-cell Python fold is faster than
# Arrow kernel dispatch (~40 µs/kernel × ~12 kernels); one resource's
# 100-row sample sits well under it. Batch calls amortize the kernels.
_VECTOR_MIN_CELLS = 2048


def detect_types(rows: list[list[str]], n_cols: int) -> list[tuple[str, float]]:
    """(python_type, score) per column — majority vote with int→float and
    date→datetime widening; any irreconcilable mix → string. Single-
    resource entry point; the crawl analyse stage batches resources
    through detect_types_many instead (one kernel pass per batch)."""
    if not rows or not n_cols:
        return [("string", 0.0)] * n_cols
    total_cells = sum(min(len(r), n_cols) for r in rows)
    if total_cells < _VECTOR_MIN_CELLS:
        return _detect_types_py(rows, n_cols)
    return detect_types_many([(rows, n_cols)])[0]


def detect_types_many(
    items: list[tuple[list[list[str]], int]]
) -> list[list[tuple[str, float]]]:
    """detect_types over MANY resources in one vectorized pass: flatten
    every sampled cell into a single Arrow array, classify once
    (_classify_cells — one RE2 kernel per TYPE total), fold votes with
    one global bincount keyed by (resource-column slot, type)."""
    if not items:
        return []
    cells: list = []
    lens: list[int] = []  # clipped length per row, across all resources
    row_bases: list[int] = []  # resource's global column base per row
    bases: list[int] = []
    base = 0
    for rows, n_cols in items:
        bases.append(base)
        for r in rows:
            m = len(r) if len(r) < n_cols else n_cols
            lens.append(m)
            row_bases.append(base)
            cells.extend(r[:m])
        base += n_cols
    if not cells:
        return [[("string", 0.0)] * nc for _, nc in items]
    try:
        arr = pa.array(cells, type=pa.string())
    except (pa.ArrowInvalid, pa.ArrowTypeError):
        return [_detect_types_py(rows, nc) for rows, nc in items]
    codes = _classify_cells(arr)
    lens_np = np.asarray(lens, dtype=np.int64)
    starts = np.cumsum(lens_np) - lens_np
    slots = (
        np.arange(len(cells), dtype=np.int64)
        - np.repeat(starts, lens_np)
        + np.repeat(np.asarray(row_bases, dtype=np.int64), lens_np)
    )
    ne = codes != _T_EMPTY
    counts = np.bincount(slots[ne] * 8 + codes[ne], minlength=base * 8).reshape(base, 8)
    return [
        [_fold_column(counts[b + c]) for c in range(nc)]
        for (_, nc), b in zip(items, bases)
    ]


def _detect_types_py(rows: list[list[str]], n_cols: int) -> list[tuple[str, float]]:
    """Original per-cell fold — fallback for non-string cells."""
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


def _csv_prepare(text: str, sample_rows: int) -> tuple[list[str], str, list[str], list[list[str]]]:
    """(lines, separator, header, sampled body rows) for CSV text."""
    lines = text.splitlines()
    sample = lines[: sample_rows + 1]
    # one strip pass shared by separator detection and the body parse
    nz = [line for line in sample if line.strip()]
    sep = _detect_separator_nz(nz)
    if not lines:
        return lines, sep, [], []
    header = [h.strip() for h in _parse_csv_line(lines[0], sep)]
    body_nz = nz[1:] if (nz and nz[0] is lines[0]) else [ln for ln in sample[1:] if ln.strip()]
    body = [_parse_csv_line(line, sep) for line in body_nz]
    return lines, sep, header, body


def _csv_report(
    lines: list[str],
    sep: str,
    header: list[str],
    body: list[list[str]],
    types: list[tuple[str, float]],
    output_profile: bool,
) -> dict:
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


def inspect_csv_text(text: str, sample_rows: int = 100, output_profile: bool = False) -> dict:
    """Full inspection report for CSV text content.

    ``output_profile=True`` mirrors csv-detective's profile output
    (``csv_detective_routine(output_profile=True, num_rows=-1)``,
    reference csv_like/__init__.py:35-58): per-column min/max/mean/std
    (numerics), top-10 values, nb_distinct, nb_missing_values computed
    over the FULL body (not the type-detection sample)."""
    lines, sep, header, body = _csv_prepare(text, sample_rows)
    types = detect_types(body, len(header))
    return _csv_report(lines, sep, header, body, types, output_profile)


def find_ragged_row(text: str, sep: str, n_cols: int) -> tuple[int, int] | None:
    """First body row whose cell count differs from the header's —
    ``(1-based line number, cell count)`` or None. This is the failure
    the reference hits at the copy-to-DB step (ParseException
    step="copy_records_to_table", data_formats/csv_like/to_db.py:95).
    Quoted texts are skipped: the per-cell fallback parser handles them
    tolerantly, like the reference's csv module."""
    if '"' in text:
        return None
    lines = [line for line in text.splitlines() if line.strip()]
    for idx, line in enumerate(lines[1:], start=2):
        c = line.count(sep) + 1
        if c != n_cols:
            return idx, c
    return None


def inspect_csv_texts_batch(texts: list[str], sample_rows: int = 100) -> list[dict]:
    """inspect_csv_text over MANY resources in ONE Arrow pass — the
    crawl analyse stage's entry point. Unquoted texts (the common case)
    never split rows in Python: sampled body lines are flattened per
    separator group, cell-split with one ``split_pattern`` kernel,
    classified once (`_classify_cells`), and votes fold with one global
    bincount; geo-format refinement touches only columns whose every
    non-empty cell passes a vectorized candidate gate. Quoted texts take
    the per-resource `inspect_csv_text` path with identical semantics."""
    out: list[dict | None] = [None] * len(texts)
    metas = []  # (out index, lines, sep, header, sampled body lines)
    for i, text in enumerate(texts):
        if '"' in text:
            out[i] = inspect_csv_text(text, sample_rows)
            continue
        lines = text.splitlines()
        sample = lines[: sample_rows + 1]
        nz = [ln for ln in sample if ln.strip()]
        sep = _detect_separator_nz(nz)
        if not lines:
            out[i] = _csv_report(lines, sep, [], [], [], False)
            continue
        header = [h.strip() for h in lines[0].split(sep)]
        body_lines = (
            nz[1:] if (nz and nz[0] is lines[0]) else [ln for ln in sample[1:] if ln.strip()]
        )
        metas.append((i, lines, sep, header, body_lines))
    _inspect_metas_arrow(metas, out)
    return out


# RE2 twins of the geo-refinement predicates (_LATLON_CELL_RE and
# ``v.lstrip().startswith("{")``); cells outside printable ASCII pass
# the gate conservatively and are re-judged by the exact Python loop,
# so unicode-whitespace semantics stay bit-identical.
_LATLON_RE2 = (
    r"^\s*\[?\s*[+-]?[0-9]+(\.[0-9]+)?\s*,\s*[+-]?[0-9]+(\.[0-9]+)?\s*\]?\s*$"
)
_CURLY_RE2 = r"^\s*\{"


def _inspect_metas_arrow(metas: list, out: list) -> None:
    """The vectorized body of `inspect_csv_texts_batch`: one
    split/classify/bincount sweep per separator group, then per-resource
    reports with gate-targeted geo refinement."""
    by_sep: dict[str, list[int]] = {}
    for k, m in enumerate(metas):
        by_sep.setdefault(m[2], []).append(k)
    for sep, ks in by_sep.items():
        all_lines: list[str] = []
        rows_per: list[int] = []
        ncols_per: list[int] = []
        for k in ks:
            _i, _lines, _sep, header, body_lines = metas[k]
            all_lines.extend(body_lines)
            rows_per.append(len(body_lines))
            ncols_per.append(len(header))
        ncols_np = np.asarray(ncols_per, dtype=np.int64)
        bases = np.concatenate([[0], np.cumsum(ncols_np)[:-1]]) if ncols_per else ncols_np
        base_total = int(ncols_np.sum())
        if not all_lines or base_total == 0:
            for k, nc in zip(ks, ncols_per):
                i, lines, sep_, header, _b = metas[k]
                out[i] = _csv_report(lines, sep_, header, [], [("string", 0.0)] * nc, False)
            continue
        arr = pa.array(all_lines, type=pa.string())
        cells_list = pc.split_pattern(arr, sep)
        flat = pc.list_flatten(cells_list)
        lens = pc.list_value_length(cells_list).to_numpy(zero_copy_only=False).astype(np.int64)
        rows_per_np = np.asarray(rows_per, dtype=np.int64)
        # per-cell (resource-column) slot, clipped to the header width
        # exactly like detect_types_many's r[:m]
        row_base = np.repeat(np.repeat(bases, rows_per_np), lens)
        starts = np.cumsum(lens) - lens
        col_idx = np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(starts, lens)
        valid = col_idx < np.repeat(np.repeat(ncols_np, rows_per_np), lens)
        slots = row_base + col_idx
        codes = _classify_cells(flat)
        ne = (codes != _T_EMPTY) & valid
        counts = np.bincount(
            slots[ne] * 8 + codes[ne], minlength=base_total * 8
        ).reshape(base_total, 8)
        nonempty = counts.sum(axis=1)
        geo_cand: np.ndarray | None = None  # lazy: per-slot candidate counts
        for k, b in zip(ks, bases):
            i, lines, sep_, header, _b = metas[k]
            b = int(b)
            types = [_fold_column(counts[b + c]) for c in range(len(header))]
            report = _csv_report(lines, sep_, header, [], types, False)
            columns = report["columns"]
            for c, name in enumerate(header):
                meta_col = columns.get(db_col_name(name))
                if not meta_col or meta_col["python_type"] not in ("string", "json"):
                    continue
                slot = b + c
                if not nonempty[slot]:
                    continue
                if geo_cand is None:
                    cand = (
                        pc.match_substring_regex(flat, _LATLON_RE2).to_numpy(zero_copy_only=False)
                        | pc.match_substring_regex(flat, _CURLY_RE2).to_numpy(zero_copy_only=False)
                        | ~pc.match_substring_regex(flat, _ASCII_RE2).to_numpy(zero_copy_only=False)
                    )
                    geo_cand = np.bincount(slots[ne & cand], minlength=base_total)
                if geo_cand[slot] != nonempty[slot]:
                    continue  # some cell hits neither predicate: no format
                idxs = np.nonzero(ne & (slots == slot))[0]
                fmt = _geo_format_of(flat.take(pa.array(idxs)).to_pylist())
                if fmt is not None:
                    meta_col["format"] = fmt
            out[i] = report


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
        fmt = _geo_format_of(values)
        if fmt is not None:
            meta["format"] = fmt


def _geo_format_of(values: list[str]) -> str | None:
    """'geojson' when every value is an embedded geometry object,
    'latlon' when every value is a '[lat, lon]' pair, else None."""
    latlon_hits = geojson_hits = 0
    for v in values:
        m = _LATLON_CELL_RE.match(v)
        if m and abs(float(m.group(1))) <= 90 and abs(float(m.group(2))) <= 180:
            latlon_hits += 1
        elif v.lstrip().startswith("{"):
            try:
                obj = json.loads(v)
                if isinstance(obj, dict) and obj.get("type") in _GEOM_TYPES:
                    geojson_hits += 1
                else:
                    return None  # miss: neither count can reach len(values)
            except ValueError:
                return None
        else:
            return None  # miss: neither count can reach len(values)
        if latlon_hits and geojson_hits:
            return None  # mixed: neither count can reach len(values)
    if geojson_hits == len(values):
        return "geojson"
    if latlon_hits == len(values):
        return "latlon"
    return None


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


class _VectorFallback(Exception):
    """Raised when the vectorized CSV path can't guarantee exact
    smart_cast parity (quoted fields, ragged rows, kernel cast error) —
    the caller retries on the per-cell Python path."""


_TRUE_ARR = pa.array(sorted({"true", "vrai", "oui", "yes", "1"}))
_CTRL_WS_RE2 = r"[\x1c-\x1f]"  # Python str.strip() strips these; Arrow doesn't


def _cast_column_vector(col: pa.Array, pt: str) -> pa.Array:
    """smart_cast over a whole string column with Arrow kernels; cells
    the kernels can't reproduce bit-identically (non-printable-ASCII,
    non-canonical-but-Python-castable like '1_0' or extended ISO forms)
    are overridden per cell with smart_cast itself."""
    if pt == "json":  # validate-by-parse: inherently per cell
        return pa.array([smart_cast(pt, v) for v in col.to_pylist()], type=_PA_TYPE[pt])
    s = pc.utf8_trim(col, " ")
    empty = pc.equal(s, "")
    empty_np = empty.to_numpy(zero_copy_only=False)
    ascii_ok = pc.match_substring_regex(col, _ASCII_RE2).to_numpy(zero_copy_only=False)
    if pt == "string":
        res = pc.if_else(
            pc.equal(pc.utf8_trim_whitespace(col), ""), pa.scalar(None, pa.string()), col
        )
        # Unicode-whitespace emptiness matches str.strip() except \x1c-\x1f
        need_py = pc.match_substring_regex(col, _CTRL_WS_RE2).to_numpy(zero_copy_only=False)
    elif pt == "bool":
        # any non-empty cell yields a bool (never None) — same as smart_cast
        res = pc.if_else(
            empty, pa.scalar(None, pa.bool_()), pc.is_in(pc.utf8_lower(s), value_set=_TRUE_ARR)
        )
        need_py = ~ascii_ok
    elif pt == "int":
        valid = pc.match_substring_regex(s, _INT_RE2)
        sv = pc.replace_substring_regex(
            pc.if_else(valid, s, pa.scalar(None, pa.string())), r"^\+", ""
        )
        res = pc.cast(sv, pa.int64())
        need_py = (~valid.to_numpy(zero_copy_only=False) & ~empty_np) | ~ascii_ok
    elif pt == "float":
        valid = pc.match_substring_regex(s, _FLOAT_RE2)
        sv = pc.replace_substring(
            pc.if_else(valid, s, pa.scalar(None, pa.string())), ",", "."
        )
        res = pc.cast(sv, pa.float64())
        need_py = (~valid.to_numpy(zero_copy_only=False) & ~empty_np) | ~ascii_ok
    elif pt == "date":
        # strptime ROLLS OVER invalid days (31/04 → 01/05) where Python
        # date() raises → None, so every parse is strftime-round-tripped
        m_iso = pc.match_substring_regex(s, r"^[0-9]{4}-[0-9]{2}-[0-9]{2}$")
        m_fr = pc.match_substring_regex(s, r"^[0-9]{2}/[0-9]{2}/[0-9]{4}$")
        null_s = pa.scalar(None, pa.string())
        iso_ts = pc.strptime(pc.if_else(m_iso, s, null_s), format="%Y-%m-%d", unit="s", error_is_null=True)
        iso_ok = pc.fill_null(pc.equal(pc.strftime(iso_ts, format="%Y-%m-%d"), s), False)
        fr_ts = pc.strptime(pc.if_else(m_fr, s, null_s), format="%d/%m/%Y", unit="s", error_is_null=True)
        fr_ok = pc.fill_null(pc.equal(pc.strftime(fr_ts, format="%d/%m/%Y"), s), False)
        ts = pc.if_else(iso_ok, iso_ts, pc.if_else(fr_ok, fr_ts, pa.scalar(None, pa.timestamp("s"))))
        res = pc.cast(ts, pa.date32())
        matched = pc.or_(m_iso, m_fr).to_numpy(zero_copy_only=False)
        need_py = (~matched & ~empty_np) | ~ascii_ok
    elif pt == "datetime":
        s2 = pc.replace_substring_regex(pc.replace_substring(s, "T", " "), r"\+.*$", "")
        m1 = pc.match_substring_regex(s2, r"^[0-9]{4}-[0-9]{2}-[0-9]{2} [0-9]{2}:[0-9]{2}:[0-9]{2}$")
        m2 = pc.match_substring_regex(s2, r"^[0-9]{4}-[0-9]{2}-[0-9]{2} [0-9]{2}:[0-9]{2}$")
        null_s = pa.scalar(None, pa.string())
        # unit="s" for the round-trip check: Arrow strftime %S appends
        # the unit's fractional digits (".000000" at us), breaking it
        t1 = pc.strptime(pc.if_else(m1, s2, null_s), format="%Y-%m-%d %H:%M:%S", unit="s", error_is_null=True)
        ok1 = pc.fill_null(pc.equal(pc.strftime(t1, format="%Y-%m-%d %H:%M:%S"), s2), False)
        t2 = pc.strptime(pc.if_else(m2, s2, null_s), format="%Y-%m-%d %H:%M", unit="s", error_is_null=True)
        ok2 = pc.fill_null(pc.equal(pc.strftime(t2, format="%Y-%m-%d %H:%M"), s2), False)
        res = pc.cast(
            pc.if_else(ok1, t1, pc.if_else(ok2, t2, pa.scalar(None, pa.timestamp("s")))),
            pa.timestamp("us"),
        )
        matched = pc.or_(m1, m2).to_numpy(zero_copy_only=False)
        need_py = (~matched & ~empty_np) | ~ascii_ok
    else:
        raise _VectorFallback
    idx = np.nonzero(need_py)[0]
    if idx.size:
        vals = res.to_pylist()
        orig = col.take(pa.array(idx)).to_pylist()
        for i, v in zip(idx, orig):
            vals[int(i)] = smart_cast(pt, v)
        res = pa.array(vals, type=_PA_TYPE[pt])
    return res


def _csv_table_vector(text: str, insp: dict) -> pa.Table:
    sep = insp["separator"]
    lines = [line for line in text.splitlines() if line.strip()]
    if not lines:
        return pa.table({})
    header = insp["header"]
    col_names = [db_col_name(h) for h in header]
    ptypes = [insp["columns"][c]["python_type"] for c in col_names]
    body = pa.array(lines[1:], type=pa.string())
    cells = pc.split_pattern(body, sep)
    lens = pc.list_value_length(cells).to_numpy(zero_copy_only=False)
    if len(lens) and (lens != len(header)).any():
        raise _VectorFallback  # ragged rows: Python path pads with None
    try:
        arrays = [
            _cast_column_vector(
                pc.list_element(cells, c) if len(lens) else pa.array([], pa.string()), pt
            )
            for c, pt in enumerate(ptypes)
        ]
    except (pa.ArrowInvalid, pa.ArrowTypeError) as e:  # e.g. int64 overflow
        raise _VectorFallback from e
    return pa.table(dict(zip(col_names, arrays)))


def csv_texts_to_tables(texts: list[str], insps: list[dict]) -> list[pa.Table]:
    """csv_text_to_table over MANY resources: group by (separator,
    columns, types) signature, concatenate the bodies, run each column
    cast kernel ONCE per group, then hand each resource a zero-copy
    slice. Quoted / ragged / kernel-rejected resources fall back to the
    per-resource path with identical semantics."""
    out: list = [None] * len(texts)
    groups: dict[tuple, list[int]] = {}
    grp_rows: dict[int, list[str]] = {}
    for i, (text, insp) in enumerate(zip(texts, insps)):
        if '"' in text:
            out[i] = csv_text_to_table(text, insp)
            continue
        lines = [line for line in text.splitlines() if line.strip()]
        if not lines:
            out[i] = pa.table({})
            continue
        grp_rows[i] = lines[1:]
        names = tuple(db_col_name(h) for h in insp["header"])
        key = (
            insp["separator"],
            names,
            tuple(insp["columns"][c]["python_type"] for c in names),
        )
        groups.setdefault(key, []).append(i)
    for (sep, names, ptypes), idxs in groups.items():
        all_rows = [r for i in idxs for r in grp_rows[i]]
        body_arr = pa.array(all_rows, type=pa.string())
        cells = pc.split_pattern(body_arr, sep)
        lens = pc.list_value_length(cells).to_numpy(zero_copy_only=False)
        ok = not (len(lens) and (lens != len(names)).any())
        if ok:
            try:
                arrays = [
                    _cast_column_vector(
                        pc.list_element(cells, c) if len(lens) else pa.array([], pa.string()),
                        pt,
                    )
                    for c, pt in enumerate(ptypes)
                ]
            except (pa.ArrowInvalid, pa.ArrowTypeError):
                ok = False
        if not ok:  # ragged or kernel-rejected somewhere in the group
            for i in idxs:
                out[i] = csv_text_to_table(texts[i], insps[i])
            continue
        off = 0
        for i in idxs:
            cnt = len(grp_rows[i])
            out[i] = pa.table(dict(zip(names, [a.slice(off, cnt) for a in arrays])))
            off += cnt
    return out


def csv_text_to_table(text: str, inspection: dict | None = None) -> pa.Table:
    """CSV text → typed Arrow table using (or computing) the inspection.
    Unquoted, rectangular CSV takes the all-Arrow vector path (split →
    per-column kernel casts); quoted or ragged content falls back to the
    per-cell Python path with identical semantics."""
    insp = inspection or inspect_csv_text(text)
    if '"' not in text:
        try:
            return _csv_table_vector(text, insp)
        except _VectorFallback:
            pass
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
