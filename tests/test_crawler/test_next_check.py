"""next_check_at schedule matrix (reference crawl/calculate_next_check.py,
exercised by tests/test_crawl/test_crawl.py:177-211)."""

from datetime import datetime, timedelta, timezone

import pytest

from hydra_ray.functions.checks import calculate_next_check_date

NOW = datetime(2026, 1, 10, 12, 0, 0, tzinfo=timezone.utc)
DELAYS = [12, 24, 168, 720]


def test_first_check_gets_earliest_delay():
    assert calculate_next_check_date(True, None, None, now=NOW) == NOW + timedelta(hours=12)
    assert calculate_next_check_date(False, None, None, now=NOW) == NOW + timedelta(hours=12)


def test_changed_gets_earliest_delay():
    last = {"created_at": NOW - timedelta(hours=100)}
    assert calculate_next_check_date(True, last, None, now=NOW) == NOW + timedelta(hours=12)


@pytest.mark.parametrize(
    "hours_since_modif,expected_delay",
    [
        (1, 12),
        (12, 12),
        (13, 24),
        (24, 24),
        (25, 168),
        (168, 168),
        (169, 720),
        (720, 720),
        (721, 720),  # beyond max → capped at max
        (10000, 720),
    ],
)
def test_unchanged_picks_smallest_delay_covering_age(hours_since_modif, expected_delay):
    last = {"created_at": NOW - timedelta(hours=5)}
    lm = NOW - timedelta(hours=hours_since_modif)
    got = calculate_next_check_date(False, last, lm, now=NOW)
    assert got == NOW + timedelta(hours=expected_delay)


def test_unchanged_without_modif_uses_last_check_date():
    last = {"created_at": NOW - timedelta(hours=20)}
    got = calculate_next_check_date(False, last, None, now=NOW)
    assert got == NOW + timedelta(hours=24)
