"""UdataPayload category-completion semantics (reference utils/http.py:24-60)."""

from hydra_ray.functions.payload import flatten_payload


def test_touched_category_completed_with_none():
    out = flatten_payload({"check:status": 200})
    assert out["check:status"] == 200
    for f in ("available", "date", "error", "id", "timeout"):
        assert out[f"check:{f}"] is None
    # untouched categories absent
    assert not any(k.startswith("analysis:") for k in out)


def test_nested_category():
    out = flatten_payload({"check:headers:content-type": "text/csv"})
    assert out["check:headers:content-length"] is None
    assert "check:status" not in out  # 'check' category untouched


def test_multiple_categories():
    out = flatten_payload({"analysis:checksum": "x", "check:cors:status": 200})
    assert out["analysis:mime-type"] is None
    assert out["check:cors:allow-origin"] is None
    assert out["analysis:checksum"] == "x"
