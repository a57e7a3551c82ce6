"""Check construction, change detection and next-check scheduling.

Pure-function ports of the reference semantics (NOT the code):

- ``has_check_changed``        — udata_hydra/crawl/preprocess_check_data.py:80-126
- ``calculate_next_check_date``— udata_hydra/crawl/calculate_next_check.py:6-44
- change-detection chain       — udata_hydra/analysis/resource.py:210-363
  (harvest → last-modified header → content-length → checksum)

All functions take an explicit ``now`` so pipelines and tests are
deterministic (the reference uses wall-clock ``datetime.now``).
"""

from __future__ import annotations

import enum
from datetime import datetime, timedelta, timezone
from typing import Any, Mapping

from hydra_ray.config import config
from hydra_ray.functions.headers import is_valid_status


class Change(enum.Enum):
    HAS_CHANGED = 1
    HAS_NOT_CHANGED = 2
    NO_GUESS = 3


def utcnow() -> datetime:
    return datetime.now(timezone.utc)


def has_check_changed(check_data: Mapping[str, Any], last_check_data: Mapping[str, Any] | None) -> bool:
    """Did this check change vs the previous one?

    any(first check, status changed, availability lost, timeout changed,
    content-length/content-type changed, CORS headers changed).
    """
    if last_check_data is None:
        return True
    status_has_changed = check_data.get("status") != last_check_data.get("status")
    status_no_longer_available = bool(
        is_valid_status(last_check_data.get("status"))
    ) and not is_valid_status(check_data.get("status"))
    timeout_has_changed = check_data.get("timeout") != last_check_data.get("timeout")
    cur_h = check_data.get("headers") or {}
    last_h = last_check_data.get("headers") or {}
    content_has_changed = cur_h.get("content-length") != last_h.get("content-length") or cur_h.get(
        "content-type"
    ) != last_h.get("content-type")
    cors_has_changed = (check_data.get("cors_headers") or None) != (
        last_check_data.get("cors_headers") or None
    )
    return any(
        (
            status_has_changed,
            status_no_longer_available,
            timeout_has_changed,
            content_has_changed,
            cors_has_changed,
        )
    )


def calculate_next_check_date(
    has_changed: bool,
    last_check: Mapping[str, Any] | None,
    last_modified_at: datetime | None,
    now: datetime | None = None,
) -> datetime:
    """Piecewise next-check schedule.

    changed/first check → now + CHECK_DELAYS[0]; otherwise the smallest
    delay >= time since last modification (falling back to the last
    check's created_at), capped at CHECK_DELAYS[-1].
    """
    now = now or utcnow()
    delays = config.CHECK_DELAYS
    if not last_check or has_changed:
        return now + timedelta(hours=delays[0])

    if last_modified_at is not None:
        since_last_modif = now - last_modified_at
    else:
        since_last_modif = now - last_check["created_at"]

    if since_last_modif > timedelta(hours=delays[-1]):
        return now + timedelta(hours=delays[-1])
    for delay in delays:
        if since_last_modif <= timedelta(hours=delay):
            return now + timedelta(hours=delay)
    return now + timedelta(hours=delays[-1])  # unreachable; defensive


# ---------------------------------------------------------------------------
# Analysis-phase change-detection chain (top-2 checks window per resource).
# ``checks2`` is [current, previous] newest-first, each a mapping with keys
# created_at, last_modified (header str|None), content_length (str|int|None),
# detected_last_modified_at (datetime|None).
# ---------------------------------------------------------------------------


def detect_change_from_harvest(
    checks2: list[Mapping[str, Any]], harvest_modified_at: datetime | None
) -> tuple[Change, dict | None]:
    if len(checks2) <= 1:
        return Change.NO_GUESS, None
    last = checks2[1]
    if harvest_modified_at:
        payload = {
            "analysis:last-modified-at": harvest_modified_at.isoformat(),
            "analysis:last-modified-detection": "harvest-resource-metadata",
        }
        if harvest_modified_at == last.get("detected_last_modified_at"):
            return Change.HAS_NOT_CHANGED, payload
        return Change.HAS_CHANGED, payload
    return Change.NO_GUESS, None


def _parse_http_date(value: str) -> datetime | None:
    """Parse an HTTP last-modified-ish date (RFC 1123 / ISO)."""
    from email.utils import parsedate_to_datetime

    try:
        return parsedate_to_datetime(value)
    except (TypeError, ValueError):
        pass
    try:
        return datetime.fromisoformat(value)
    except (TypeError, ValueError):
        return None


def detect_change_from_last_modified_header(
    checks2: list[Mapping[str, Any]],
) -> tuple[Change, dict | None]:
    if len(checks2) == 1 and checks2[0].get("last_modified"):
        dt = _parse_http_date(checks2[0]["last_modified"])
        return Change.HAS_CHANGED, {
            "analysis:last-modified-at": dt.isoformat() if dt else None,
            "analysis:last-modified-detection": "last-modified-header",
        }
    if len(checks2) == 1 or not checks2[0].get("last_modified"):
        return Change.NO_GUESS, None
    dt = _parse_http_date(checks2[0]["last_modified"])
    payload = {
        "analysis:last-modified-at": dt.isoformat() if dt else None,
        "analysis:last-modified-detection": "last-modified-header",
    }
    if checks2[0]["last_modified"] != checks2[1].get("last_modified"):
        return Change.HAS_CHANGED, payload
    return Change.HAS_NOT_CHANGED, payload


def detect_change_from_content_length(
    checks2: list[Mapping[str, Any]],
) -> tuple[Change, dict | None]:
    if len(checks2) <= 1 or not checks2[0].get("content_length"):
        return Change.NO_GUESS, None
    cur, prev = checks2[0], checks2[1]
    if cur.get("content_length") and prev.get("content_length"):
        if cur["content_length"] != prev["content_length"]:
            return Change.HAS_CHANGED, {
                "analysis:last-modified-at": cur["created_at"].isoformat(),
                "analysis:last-modified-detection": "content-length-header",
            }
        if prev.get("detected_last_modified_at"):
            return Change.HAS_NOT_CHANGED, {
                "analysis:last-modified-at": prev["detected_last_modified_at"].isoformat(),
                "analysis:last-modified-detection": "previous-check-detection",
            }
    return Change.NO_GUESS, None


def detect_change_from_checksum(
    new_checksum: str | None, last_check: Mapping[str, Any] | None, now: datetime | None = None
) -> tuple[Change, dict | None]:
    if last_check and last_check.get("checksum"):
        if last_check["checksum"] != new_checksum:
            return Change.HAS_CHANGED, {
                "analysis:last-modified-at": (now or utcnow()).isoformat(),
                "analysis:last-modified-detection": "computed-checksum",
            }
        if last_check.get("detected_last_modified_at"):
            return Change.HAS_NOT_CHANGED, {
                "analysis:last-modified-at": last_check["detected_last_modified_at"].isoformat(),
                "analysis:last-modified-detection": "previous-check-detection",
            }
    return Change.NO_GUESS, None


def detect_change_on_early_hints(
    checks2: list[Mapping[str, Any]], harvest_modified_at: datetime | None
) -> tuple[Change, dict | None]:
    """harvest → last-modified header → content-length, first conclusive wins."""
    if not checks2:
        return Change.NO_GUESS, None
    status, payload = detect_change_from_harvest(checks2, harvest_modified_at)
    if status != Change.NO_GUESS:
        return status, payload
    status, payload = detect_change_from_last_modified_header(checks2)
    if status != Change.NO_GUESS:
        return status, payload
    return detect_change_from_content_length(checks2)
