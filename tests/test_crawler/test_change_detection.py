"""Change-detection parity matrices (reference
tests/test_analysis/test_change_detections.py and
crawl/preprocess_check_data.py:80-126)."""

from datetime import datetime, timezone

import pytest

from hydra_ray.functions.checks import (
    Change,
    detect_change_from_checksum,
    detect_change_from_content_length,
    detect_change_from_harvest,
    detect_change_from_last_modified_header,
    detect_change_on_early_hints,
    has_check_changed,
)

T0 = datetime(2026, 1, 1, tzinfo=timezone.utc)
T1 = datetime(2026, 1, 2, tzinfo=timezone.utc)


# -- has_check_changed (per-check criteria) --------------------------------


def test_first_check_is_changed():
    assert has_check_changed({"status": 200, "timeout": False}, None) is True


@pytest.mark.parametrize(
    "new,last,expected",
    [
        # identical → unchanged
        ({"status": 200, "timeout": False, "headers": {"content-length": "10"}},
         {"status": 200, "timeout": False, "headers": {"content-length": "10"}}, False),
        # status change
        ({"status": 500, "timeout": False}, {"status": 200, "timeout": False}, True),
        # availability lost (200 → 404)
        ({"status": 404, "timeout": False}, {"status": 200, "timeout": False}, True),
        # timeout flips
        ({"status": 200, "timeout": True}, {"status": 200, "timeout": False}, True),
        # content-length change
        ({"status": 200, "timeout": False, "headers": {"content-length": "11"}},
         {"status": 200, "timeout": False, "headers": {"content-length": "10"}}, True),
        # content-type change
        ({"status": 200, "timeout": False, "headers": {"content-type": "text/csv"}},
         {"status": 200, "timeout": False, "headers": {"content-type": "text/html"}}, True),
        # CORS appears
        ({"status": 200, "timeout": False, "cors_headers": {"status": 200}},
         {"status": 200, "timeout": False}, True),
    ],
)
def test_has_check_changed_matrix(new, last, expected):
    assert has_check_changed(new, last) is expected


# -- harvest detection ------------------------------------------------------


def test_harvest_single_check_no_guess():
    assert detect_change_from_harvest([{"created_at": T1}], T0) == (Change.NO_GUESS, None)


def test_harvest_matches_prev_detection():
    checks2 = [{"created_at": T1}, {"created_at": T0, "detected_last_modified_at": T0}]
    status, payload = detect_change_from_harvest(checks2, T0)
    assert status == Change.HAS_NOT_CHANGED
    assert payload["analysis:last-modified-detection"] == "harvest-resource-metadata"


def test_harvest_newer_than_prev_detection():
    checks2 = [{"created_at": T1}, {"created_at": T0, "detected_last_modified_at": T0}]
    status, payload = detect_change_from_harvest(checks2, T1)
    assert status == Change.HAS_CHANGED
    assert payload["analysis:last-modified-at"] == T1.isoformat()


# -- last-modified header ---------------------------------------------------


def test_last_modified_first_check():
    checks2 = [{"created_at": T1, "last_modified": "Mon, 01 Jan 2024 00:00:00 GMT"}]
    status, payload = detect_change_from_last_modified_header(checks2)
    assert status == Change.HAS_CHANGED
    assert payload["analysis:last-modified-detection"] == "last-modified-header"


def test_last_modified_no_header_no_guess():
    checks2 = [{"created_at": T1, "last_modified": None}, {"created_at": T0}]
    assert detect_change_from_last_modified_header(checks2) == (Change.NO_GUESS, None)


def test_last_modified_same_header_not_changed():
    lm = "Mon, 01 Jan 2024 00:00:00 GMT"
    checks2 = [
        {"created_at": T1, "last_modified": lm},
        {"created_at": T0, "last_modified": lm},
    ]
    status, _ = detect_change_from_last_modified_header(checks2)
    assert status == Change.HAS_NOT_CHANGED


def test_last_modified_different_header_changed():
    checks2 = [
        {"created_at": T1, "last_modified": "Tue, 02 Jan 2024 00:00:00 GMT"},
        {"created_at": T0, "last_modified": "Mon, 01 Jan 2024 00:00:00 GMT"},
    ]
    status, _ = detect_change_from_last_modified_header(checks2)
    assert status == Change.HAS_CHANGED


# -- content-length ---------------------------------------------------------


def test_content_length_changed():
    checks2 = [
        {"created_at": T1, "content_length": "11"},
        {"created_at": T0, "content_length": "10"},
    ]
    status, payload = detect_change_from_content_length(checks2)
    assert status == Change.HAS_CHANGED
    assert payload["analysis:last-modified-at"] == T1.isoformat()
    assert payload["analysis:last-modified-detection"] == "content-length-header"


def test_content_length_same_carries_prev_detection():
    checks2 = [
        {"created_at": T1, "content_length": "10"},
        {"created_at": T0, "content_length": "10", "detected_last_modified_at": T0},
    ]
    status, payload = detect_change_from_content_length(checks2)
    assert status == Change.HAS_NOT_CHANGED
    assert payload["analysis:last-modified-detection"] == "previous-check-detection"


def test_content_length_same_without_prev_detection_no_guess():
    checks2 = [
        {"created_at": T1, "content_length": "10"},
        {"created_at": T0, "content_length": "10"},
    ]
    assert detect_change_from_content_length(checks2) == (Change.NO_GUESS, None)


# -- checksum ---------------------------------------------------------------


def test_checksum_changed():
    status, payload = detect_change_from_checksum("abc", {"checksum": "def"}, now=T1)
    assert status == Change.HAS_CHANGED
    assert payload["analysis:last-modified-detection"] == "computed-checksum"


def test_checksum_same_with_prev_detection():
    status, payload = detect_change_from_checksum(
        "abc", {"checksum": "abc", "detected_last_modified_at": T0}, now=T1
    )
    assert status == Change.HAS_NOT_CHANGED
    assert payload["analysis:last-modified-at"] == T0.isoformat()


def test_checksum_no_prev_no_guess():
    assert detect_change_from_checksum("abc", None) == (Change.NO_GUESS, None)
    assert detect_change_from_checksum("abc", {"checksum": None}) == (Change.NO_GUESS, None)


# -- chain priority ---------------------------------------------------------


def test_chain_harvest_wins_over_headers():
    checks2 = [
        {"created_at": T1, "last_modified": "Tue, 02 Jan 2024 00:00:00 GMT", "content_length": "11"},
        {"created_at": T0, "last_modified": "Mon, 01 Jan 2024 00:00:00 GMT", "content_length": "10",
         "detected_last_modified_at": T0},
    ]
    status, payload = detect_change_on_early_hints(checks2, T1)
    assert payload["analysis:last-modified-detection"] == "harvest-resource-metadata"


def test_chain_empty_no_guess():
    assert detect_change_on_early_hints([], None) == (Change.NO_GUESS, None)
