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
partition (resumable layout). GeoJSON→PMTiles is REAL (no tippecanoe):
``to_pmtiles`` (driver, single file) and ``features_to_pmtiles``
(distributed) both use the stdlib PMTiles v3 + MVT codec in
sources/pmtiles.py.
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


def lonlat_to_tile(lon, lat, zoom: int, extent: int = 4096):
    """Vectorized web-mercator tiling: arrays of lon/lat → (tile_x,
    tile_y, px, py) at ``zoom`` (px/py are tile-local MVT pixel coords
    in [0, extent))."""
    import numpy as np

    n = 1 << zoom
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.clip(np.asarray(lat, dtype=np.float64), -85.0511, 85.0511)
    xt = (lon + 180.0) / 360.0 * n
    lat_r = np.radians(lat)
    yt = (1.0 - np.log(np.tan(lat_r) + 1.0 / np.cos(lat_r)) / np.pi) / 2.0 * n
    tx = np.clip(np.floor(xt).astype(np.int64), 0, n - 1)
    ty = np.clip(np.floor(yt).astype(np.int64), 0, n - 1)
    px = np.clip(np.floor((xt - tx) * extent).astype(np.int64), 0, extent - 1)
    py = np.clip(np.floor((yt - ty) * extent).astype(np.int64), 0, extent - 1)
    return tx, ty, px, py


def features_to_pmtiles(ds, out_path: str, zoom: int = 6, layer: str = "features") -> str:
    """Distributed GeoJSON-features → PMTiles archive (replaces the
    reference's tippecanoe shell-out, geojson/to_pmtiles.py:16-47, with
    the stdlib codec in sources/pmtiles.py).

    ``ds`` carries one GeoJSON Feature string per row (the
    features_batch output). Point features are tile-assigned with one
    vectorized map_batches, per-tile MVT layers are encoded under a
    hash-partitioned shuffle (all features of a tile co-located), and
    only the finished per-tile blobs — small by construction — reach
    the driver for the final archive concat. Non-point / null
    geometries are skipped (tippecanoe's point behavior for this
    pipeline's input)."""
    import numpy as np
    import pandas as pd

    from hydra_ray.sources.pmtiles import encode_mvt_layer, write_pmtiles
    from hydra_ray.stages.keyed import keyed_map_partitions

    def assign(t: pa.Table) -> pa.Table:
        lons, lats, props = [], [], []
        for feat in t["feature"].to_pylist():
            try:
                obj = json.loads(feat)
            except (TypeError, ValueError):
                continue
            geom = obj.get("geometry") or {}
            if geom.get("type") != "Point":
                continue
            lon, lat = geom["coordinates"][:2]
            lons.append(float(lon))
            lats.append(float(lat))
            props.append(json.dumps(obj.get("properties") or {}, sort_keys=True))
        if not lons:
            return pa.table(
                {
                    "tile_x": pa.array([], type=pa.int64()),
                    "tile_y": pa.array([], type=pa.int64()),
                    "px": pa.array([], type=pa.int64()),
                    "py": pa.array([], type=pa.int64()),
                    "props": pa.array([], type=pa.string()),
                }
            )
        tx, ty, px, py = lonlat_to_tile(np.array(lons), np.array(lats), zoom)
        return pa.table(
            {
                "tile_x": pa.array(tx),
                "tile_y": pa.array(ty),
                "px": pa.array(px),
                "py": pa.array(py),
                "props": pa.array(props, type=pa.string()),
            }
        )

    assigned = ds.map_batches(assign, batch_format="pyarrow")

    def encode_tiles(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for (tx, ty), g in df.groupby(["tile_x", "tile_y"], sort=True):
            g = g.sort_values(["px", "py", "props"], kind="mergesort")
            feats = [
                (i + 1, int(r.px), int(r.py), json.loads(r.props))
                for i, r in enumerate(g.itertuples(index=False))
            ]
            rows.append((int(tx), int(ty), encode_mvt_layer(layer, feats)))
        return pd.DataFrame(rows, columns=["tile_x", "tile_y", "mvt"])

    blobs = keyed_map_partitions(assigned, ["tile_x", "tile_y"], encode_tiles)

    # streaming archive assembly: directories come from a blob-free
    # (tile_id, length) pull; tile DATA streams to the writer in
    # Hilbert order via a distributed sort — driver memory is one
    # batch, never the whole tile set
    from hydra_ray.sources.pmtiles import hilbert_tile_id, write_pmtiles_streaming

    def add_tid(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["tid"] = [
            hilbert_tile_id(zoom, int(x), int(y)) for x, y in zip(df["tile_x"], df["tile_y"])
        ]
        df["ln"] = [len(b) for b in df["mvt"]]
        return df

    tagged = blobs.map_batches(add_tid, batch_format="pandas").materialize()
    tile_meta = [
        (int(r["tid"]), int(r["ln"]), zoom)
        for r in tagged.select_columns(["tid", "ln"]).iter_rows()
    ]
    ordered = tagged.sort("tid")

    def blob_stream():
        for b in ordered.iter_batches(batch_size=256, batch_format="pandas"):
            for tid, mvt in zip(b["tid"], b["mvt"]):
                yield int(tid), bytes(mvt)

    return write_pmtiles_streaming(tile_meta, blob_stream(), out_path)


def to_pmtiles(geojson_path: str, out_path: str, zoom: int = 6) -> str:
    """Single-file GeoJSON → PMTiles (reference geojson/to_pmtiles.py
    per-resource conversion; driver-side — distributed variant:
    features_to_pmtiles)."""
    from hydra_ray.sources.pmtiles import encode_mvt_layer, write_pmtiles

    with open(geojson_path) as f:
        fc = json.load(f)
    import numpy as np

    pts = [
        f
        for f in fc.get("features", [])
        if (f.get("geometry") or {}).get("type") == "Point"
    ]
    if not pts:
        raise ValueError("no point features to tile")
    lons = np.array([f["geometry"]["coordinates"][0] for f in pts])
    lats = np.array([f["geometry"]["coordinates"][1] for f in pts])
    tx, ty, px, py = lonlat_to_tile(lons, lats, zoom)
    buckets: dict[tuple[int, int], list] = {}
    for i, f in enumerate(pts):
        buckets.setdefault((int(tx[i]), int(ty[i])), []).append(
            (int(px[i]), int(py[i]), f.get("properties") or {})
        )
    tiles = {}
    for (x, y), feats in buckets.items():
        feats.sort(key=lambda t: (t[0], t[1], json.dumps(t[2], sort_keys=True, default=str)))
        tiles[(zoom, x, y)] = encode_mvt_layer(
            "features", [(i + 1, fx, fy, pr) for i, (fx, fy, pr) in enumerate(feats)]
        )
    return write_pmtiles(tiles, out_path)
