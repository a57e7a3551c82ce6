"""Geo conversion: geo-column detection + table→GeoJSON features.

Reference semantics:
  - ``detect_geo_columns``  (csv_like/to_geojson.py:25-52): pick the
    highest-scoring column per geo format; priority
    geojson > latlon > lonlat > separate lat+lon columns
  - ``cast_latlon``         (csv_like/to_geojson.py:18-22): the string
    "[lat, lon]" becomes [lon, lat] floats (GeoJSON axis order)
  - feature building        (table/to_geojson.py:29-152): one GeoJSON
    Feature per row, geometry from the detected column(s), all other
    columns as properties; streamed as line-batched JSON

The Ray mapping is a ``map_batches`` stage emitting a ``feature``
string column plus a file sink that writes one FeatureCollection per
partition (resumable layout). GeoJSON→PMTiles requires the external
tippecanoe binary — gated stub (``to_pmtiles``).
"""

from __future__ import annotations

import json
import re

import pyarrow as pa

GEO_FORMATS = ("geojson", "latlon", "lonlat")
_LAT_NAMES = {"lat", "latitude", "y"}
_LON_NAMES = {"lon", "lng", "longitude", "x"}
_LATLON_RE = re.compile(r"^\s*\[?\s*([+-]?\d+(?:\.\d+)?)\s*,\s*([+-]?\d+(?:\.\d+)?)\s*\]?\s*$")


def detect_geo_columns(inspection: dict) -> dict | None:
    """Inspection → {'kind': ..., 'columns': [...]} or None.

    Scans the per-column formats for geo hints; separate lat+lon columns
    are matched by name. Priority: geojson > latlon > lonlat > lat+lon.
    """
    cols = inspection.get("columns", {})
    best: dict[str, tuple[str, float]] = {}
    for name, meta in cols.items():
        fmt = meta.get("format")
        if fmt in GEO_FORMATS:
            if fmt not in best or meta.get("score", 0) > best[fmt][1]:
                best[fmt] = (name, meta.get("score", 0))
    for fmt in GEO_FORMATS:
        if fmt in best:
            return {"kind": fmt, "columns": [best[fmt][0]]}
    lat = next((n for n in cols if n.lower() in _LAT_NAMES), None)
    lon = next((n for n in cols if n.lower() in _LON_NAMES), None)
    if lat and lon:
        return {"kind": "latlon_pair", "columns": [lat, lon]}
    return None


def cast_latlon(value: str) -> list[float] | None:
    """'[lat, lon]' string → [lon, lat] floats (axis swap, M12)."""
    if not value:
        return None
    m = _LATLON_RE.match(value)
    if not m:
        return None
    lat, lon = float(m.group(1)), float(m.group(2))
    return [lon, lat]


def features_batch(batch: pa.Table, geo: dict) -> pa.Table:
    """Rows → GeoJSON Feature strings (properties = all non-geo columns)."""
    kind, cols = geo["kind"], geo["columns"]
    prop_cols = [c for c in batch.column_names if c not in cols]
    props = {c: batch[c].to_pylist() for c in prop_cols}
    features = []
    n = len(batch)
    if kind == "geojson":
        geoms = batch[cols[0]].to_pylist()
        get_geom = lambda i: json.loads(geoms[i]) if geoms[i] else None  # noqa: E731
    elif kind in ("latlon", "lonlat"):
        vals = batch[cols[0]].to_pylist()

        def get_geom(i):
            v = vals[i]
            if v is None:
                return None
            coords = cast_latlon(v) if kind == "latlon" else _lonlat(v)
            return {"type": "Point", "coordinates": coords} if coords else None

    else:  # latlon_pair
        lats = batch[cols[0]].to_pylist()
        lons = batch[cols[1]].to_pylist()

        def get_geom(i):
            if lats[i] is None or lons[i] is None:
                return None
            return {"type": "Point", "coordinates": [float(lons[i]), float(lats[i])]}

    for i in range(n):
        feature = {
            "type": "Feature",
            "geometry": get_geom(i),
            "properties": {c: props[c][i] for c in prop_cols},
        }
        features.append(json.dumps(feature, sort_keys=True, default=str))
    return pa.table({"feature": pa.array(features, type=pa.string())})


def _lonlat(value: str) -> list[float] | None:
    m = _LATLON_RE.match(value or "")
    if not m:
        return None
    return [float(m.group(1)), float(m.group(2))]


def write_feature_collections(ds, out_dir: str) -> list[str]:
    """Sink: one FeatureCollection file per block (resumable layout).
    ``ds`` must have the single ``feature`` string column."""
    import os

    from hydra_ray.sources.store import ds_to_tables

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i, t in enumerate(ds_to_tables(ds)):
        if not t.num_rows:
            continue
        path = os.path.join(out_dir, f"part-{i:05d}.geojson")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write('{"type": "FeatureCollection", "features": [\n')
            feats = t["feature"].to_pylist()
            f.write(",\n".join(feats))
            f.write("\n]}\n")
        os.replace(tmp, path)
        paths.append(path)
    return paths


def to_pmtiles(geojson_path: str, out_path: str) -> str:
    """GeoJSON → PMTiles via tippecanoe (reference geojson/to_pmtiles.py:16-47).
    The binary is not in this container — raises unless present."""
    import shutil
    import subprocess

    if shutil.which("tippecanoe") is None:
        raise NotImplementedError("tippecanoe binary not available in this environment")
    subprocess.run(
        ["tippecanoe", "--maximum-zoom=g", "--coalesce-densest-as-needed", "-o", out_path, geojson_path],
        check=True,
    )
    return out_path
