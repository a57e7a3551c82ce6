"""Format detection matrix (reference data_formats/detect.py + per-format
class attributes)."""

import pytest

from hydra_ray.config import config_override
from hydra_ray.functions.detect import detect_format


@pytest.mark.parametrize(
    "ct,url,fmt,expected",
    [
        ("text/csv", "https://a/x", None, "csv"),
        ("text/csv; charset=utf-8", "https://a/x", None, "csv"),  # startswith
        ("application/csv", "https://a/x", None, "csv"),
        ("text/plain", "https://a/x", None, "csv"),
        ("application/gzip", "https://a/x", None, "csvgz"),
        ("application/octet-stream", "https://a/x", None, "csvgz"),
        (None, "https://a/data.csv.gz", None, "csvgz"),           # check_url
        (None, "https://a/x", "csv.gz", "csvgz"),                 # catalog format
        ("application/vnd.ms-excel", "https://a/x", None, "xls"),
        (None, "https://a/x", "xls", "xls"),
        ("application/vnd.openxmlformats-officedocument.spreadsheetml.sheet", "https://a/x", None, "xlsx"),
        ("application/vnd.geo+json", "https://a/x", None, "geojson"),
        (None, "https://a/data.geojson", None, "geojson"),
        (None, "https://a/x", "geojson", "geojson"),
        ("application/vnd.apache.parquet", "https://a/x", None, "parquet"),
        (None, "https://a/data.parquet", None, "parquet"),
        ("application/pdf", "https://a/x", None, None),
        (None, "https://a/x", "pdf", None),
        (None, "https://a/x", None, None),
    ],
)
def test_detect_matrix(ct, url, fmt, expected):
    assert detect_format(ct, url, fmt) == expected


def test_ogc_detection_disabled_by_default():
    assert detect_format(None, "https://a/geoserver/wfs?service=wfs", "wfs") is None


def test_ogc_detection_enabled():
    with config_override(OGC_ANALYSIS_ENABLED=True):
        assert detect_format(None, "https://a/geoserver/wfs", None) == "wfs"
        assert detect_format(None, "https://a/x?SERVICE=WMS", None) == "wms"
        assert detect_format(None, "https://a/x", "ogc:wfs") == "wfs"
        assert detect_format(None, "https://a/x", "wms") == "wms"
        # csv detection still wins (ordered before OGC)
        assert detect_format("text/csv", "https://a/geoserver/wfs", None) == "csv"


def test_sniff_mime_magic_numbers():
    """M15: content-magic MIME detection (libmagic equivalent) — binary
    signatures win over the format hint; text falls back to it."""
    import gzip

    from hydra_ray.functions.detect import sniff_mime
    from hydra_ray.sources.xls import write_xls
    from hydra_ray.sources.xlsx import write_xlsx

    assert sniff_mime(write_xls([["a"], [1]])) == "application/vnd.ms-excel"
    assert sniff_mime(write_xlsx([["a"], [1]])) == (
        "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet"
    )
    assert sniff_mime(gzip.compress(b"a,b\n1,2")) == "application/gzip"
    assert sniff_mime(b"%PDF-1.7 ...") == "application/pdf"
    assert sniff_mime(b"PAR1chunk") == "application/vnd.apache.parquet"
    assert sniff_mime(b'{"type": "FeatureCollection"}') == "application/json"
    # binary magic beats a wrong format hint
    assert sniff_mime(gzip.compress(b"x"), fmt="csv") == "application/gzip"
    # plain text defers to the detected format
    assert sniff_mime(b"a;b;c\n1;2;3", fmt="csv") == "text/csv"
    assert sniff_mime(b"a;b;c\n1;2;3", fmt="xlsx").endswith("spreadsheetml.sheet")
    # no hint: csv/text heuristics
    assert sniff_mime(b"a;b;c\n1;2;3") == "text/csv"
    assert sniff_mime(b"hello world") == "text/plain"
    assert sniff_mime(b"\x00\x01binary\x00") == "application/octet-stream"
