"""Geo detection and GeoJSON conversion (reference csv_like/to_geojson.py,
table/to_geojson.py)."""

import json

import pyarrow as pa
import pytest
import ray.data as rd

from hydra_ray.stages.geo import (
    cast_latlon,
    detect_geo_columns,
    features_batch,
    to_pmtiles,
    write_feature_collections,
)
from hydra_ray.stages.inspection import inspect_csv_text

CSV = """name;location
alpha;"[48.85, 2.35]"
beta;"[43.6, 1.44]"
"""


def test_cast_latlon_swaps_axes():
    assert cast_latlon("[48.85, 2.35]") == [2.35, 48.85]
    assert cast_latlon("48.85, 2.35") == [2.35, 48.85]
    assert cast_latlon("junk") is None
    assert cast_latlon("") is None


def test_detect_priority():
    insp = {
        "columns": {
            "a": {"python_type": "string", "format": "latlon", "score": 0.9},
            "b": {"python_type": "string", "format": "geojson", "score": 0.5},
        }
    }
    got = detect_geo_columns(insp)
    assert got == {"kind": "geojson", "columns": ["b"]}  # geojson wins


def test_detect_latlon_pair_fallback():
    insp = {
        "columns": {
            "lat": {"python_type": "float", "format": "float", "score": 1.0},
            "lon": {"python_type": "float", "format": "float", "score": 1.0},
            "v": {"python_type": "int", "format": "int", "score": 1.0},
        }
    }
    got = detect_geo_columns(insp)
    assert got == {"kind": "latlon_pair", "columns": ["lat", "lon"]}
    assert detect_geo_columns({"columns": {"v": {"format": "int"}}}) is None


def test_features_from_inspected_csv():
    insp = inspect_csv_text(CSV)
    geo = detect_geo_columns(insp)
    assert geo == {"kind": "latlon", "columns": ["location"]}
    batch = pa.table({"name": ["alpha"], "location": ["[48.85, 2.35]"]})
    out = features_batch(batch, geo)
    feat = json.loads(out["feature"].to_pylist()[0])
    assert feat["geometry"] == {"type": "Point", "coordinates": [2.35, 48.85]}
    assert feat["properties"] == {"name": "alpha"}


def test_features_latlon_pair():
    geo = {"kind": "latlon_pair", "columns": ["lat", "lon"]}
    batch = pa.table({"lat": [45.0, None], "lon": [5.0, 6.0], "v": [1, 2]})
    out = features_batch(batch, geo)
    feats = [json.loads(f) for f in out["feature"].to_pylist()]
    assert feats[0]["geometry"]["coordinates"] == [5.0, 45.0]
    assert feats[1]["geometry"] is None


@pytest.mark.usefixtures("ray_session")
def test_feature_collection_sink(tmp_path):
    geo = {"kind": "latlon_pair", "columns": ["lat", "lon"]}
    batch = pa.table({"lat": [45.0, 46.0], "lon": [5.0, 6.0]})
    ds = rd.from_arrow(batch).map_batches(lambda t: features_batch(t, geo), batch_format="pyarrow")
    paths = write_feature_collections(ds, str(tmp_path / "geo"))
    assert paths
    fc = json.loads(open(paths[0]).read())
    assert fc["type"] == "FeatureCollection"
    assert len(fc["features"]) == 2


def test_pmtiles_roundtrip(tmp_path):
    """GeoJSON file -> PMTiles v3 archive -> decode: tile assignment,
    Hilbert-clustered directory, MVT point quantization, properties."""
    import json

    from hydra_ray.sources.pmtiles import decode_mvt_layer, read_pmtiles

    fc = {
        "type": "FeatureCollection",
        "features": [
            {"type": "Feature", "geometry": {"type": "Point", "coordinates": [2.35, 48.85]},
             "properties": {"name": "paris", "pop": 2100000}},
            {"type": "Feature", "geometry": {"type": "Point", "coordinates": [-0.58, 44.84]},
             "properties": {"name": "bordeaux", "pop": 260000}},
            {"type": "Feature", "geometry": {"type": "Point", "coordinates": [2.3501, 48.8501]},
             "properties": {"name": "paris2", "pop": 1}},
            {"type": "Feature", "geometry": None, "properties": {"name": "skipped"}},
        ],
    }
    src_path = tmp_path / "pts.geojson"
    src_path.write_text(json.dumps(fc))
    out = to_pmtiles(str(src_path), str(tmp_path / "pts.pmtiles"), zoom=6)

    arc = read_pmtiles(out)
    assert arc["header"]["tile_type"] == 1 and arc["header"]["clustered"]
    assert arc["header"]["min_zoom"] == 6 and arc["header"]["max_zoom"] == 6
    # Paris (2.35E) and Bordeaux (0.58W) land in different z6 tiles
    assert len(arc["tiles"]) == 2
    names = set()
    for (z, x, y), blob in arc["tiles"].items():
        assert z == 6
        layer = decode_mvt_layer(blob)
        assert layer["name"] == "features" and layer["extent"] == 4096
        for f in layer["features"]:
            names.add(f["props"]["name"])
            assert 0 <= f["xy"][0] < 4096 and 0 <= f["xy"][1] < 4096
            assert isinstance(f["props"]["pop"], int)
    assert names == {"paris", "paris2", "bordeaux"}  # null geometry skipped


def test_hilbert_tile_id_roundtrip():
    from hydra_ray.sources.pmtiles import hilbert_tile_id, tile_id_to_zxy

    seen = set()
    for z in (0, 1, 2, 5):
        for x in range(min(1 << z, 8)):
            for y in range(min(1 << z, 8)):
                tid = hilbert_tile_id(z, x, y)
                assert tid not in seen
                seen.add(tid)
                assert tile_id_to_zxy(tid) == (z, x, y)
    assert hilbert_tile_id(0, 0, 0) == 0
    assert hilbert_tile_id(1, 0, 0) == 1  # zoom offset (4^1-1)/3


def test_directory_delta_encoding_roundtrip():
    from hydra_ray.sources.pmtiles import _deserialize_directory, _serialize_directory

    entries = [(5, 0, 100, 1), (9, 100, 50, 1), (1000, 150, 7, 1), (1001, 400, 3, 1)]
    assert _deserialize_directory(_serialize_directory(entries)) == entries


@pytest.mark.usefixtures("ray_session")
def test_features_to_pmtiles_distributed_matches_driver_path(tmp_path):
    """The distributed tiler (shuffle + per-tile encode) must produce a
    byte-identical archive to the single-file driver path."""
    import json

    import ray.data as rd

    from hydra_ray.stages.geo import features_to_pmtiles

    feats = []
    for i in range(200):
        lon = round((i * 37) % 360 - 180 + 0.25, 4)
        lat = round((i * 53) % 170 - 85 + 0.25, 4)
        feats.append(json.dumps({
            "type": "Feature",
            "geometry": {"type": "Point", "coordinates": [lon, lat]},
            "properties": {"i": i},
        }, sort_keys=True))
    ds = rd.from_items([{"feature": f} for f in feats]).repartition(5)
    out1 = features_to_pmtiles(ds, str(tmp_path / "dist.pmtiles"), zoom=4)

    src_path = tmp_path / "all.geojson"
    src_path.write_text(json.dumps({
        "type": "FeatureCollection",
        "features": [json.loads(f) for f in feats],
    }))
    out2 = to_pmtiles(str(src_path), str(tmp_path / "drv.pmtiles"), zoom=4)
    b1 = open(out1, "rb").read()
    b2 = open(out2, "rb").read()
    assert b1 == b2


def test_pmtiles_leaf_directories_roundtrip(tmp_path):
    """An archive whose root directory would blow the 16 KB spec budget
    spills into leaf directories; every tile still round-trips and small
    archives keep the root-only layout (no leaf bytes)."""
    from hydra_ray.sources.pmtiles import read_pmtiles, write_pmtiles

    # ~12k sparse z10 tiles -> root dir alone would be ~50 KB
    tiles = {}
    for i in range(12_000):
        x, y = i % 1024, (i * 31 // 1024) % 1024
        tiles[(10, x, y)] = b"blob-%d" % i
    assert len(tiles) == 12_000
    out = str(tmp_path / "big.pmtiles")
    write_pmtiles(tiles, out)
    arc = read_pmtiles(out)
    assert arc["header"]["n_leaf_bytes"] > 0
    assert len(arc["tiles"]) == len(tiles)
    assert arc["tiles"] == tiles

    small = {(2, x, y): b"s%d%d" % (x, y) for x in range(4) for y in range(4)}
    outs = str(tmp_path / "small.pmtiles")
    write_pmtiles(small, outs)
    arc2 = read_pmtiles(outs)
    assert arc2["header"]["n_leaf_bytes"] == 0
    assert arc2["tiles"] == small
