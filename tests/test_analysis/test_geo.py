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


def test_pmtiles_stub():
    with pytest.raises(NotImplementedError):
        to_pmtiles("/tmp/x.geojson", "/tmp/x.pmtiles")
