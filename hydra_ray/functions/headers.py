"""Header normalization + HEAD/status predicates.

Semantics follow reference udata_hydra/crawl/helpers.py:
- ``get_content_type_from_header``  (helpers.py:13-25)
- ``convert_headers``               (helpers.py:28-39)
- ``fix_surrogates``                (helpers.py:42-48)
- ``has_nice_head``                 (helpers.py:51-64)
- ``is_valid_status``               (helpers.py:67-74)
"""

from __future__ import annotations

from typing import Any, Mapping

# WAF block pages often return HTTP 200 on HEAD with text/html and a tiny
# body; treat those as unreliable HEAD responses (reference helpers.py:10).
SUSPICIOUS_HTML_HEAD_MAX_BYTES = 4096


def get_content_type_from_header(headers: Mapping[str, str]) -> str:
    """Strip ``;charset=...`` (and double-``;`` oddities) from content-type."""
    content_type = headers.get("content-type")
    if not content_type or ";" not in content_type:
        return content_type or ""
    return content_type.split(";")[0]


def fix_surrogates(value: Any) -> str:
    """Repair lone surrogates so the value is valid UTF-8."""
    if not isinstance(value, str):
        value = str(value)
    return value.encode("utf-8", "surrogateescape").decode("utf-8", "replace")


def convert_headers(headers: Mapping[str, str] | None) -> dict[str, str]:
    """Lowercase keys, first-value-wins, surrogate-fixed values."""
    if not headers:
        return {}
    out: dict[str, str] = {}
    for k in headers.keys():
        if k.lower() not in out:
            out[k.lower()] = fix_surrogates(headers[k])
    return out


def is_valid_status(status: int | str | None) -> bool | None:
    """200 <= s < 400 → True; 429 → None (unknowable); else False."""
    if not status:
        return False
    status_nb = int(status)
    if status_nb == 429:
        return None
    return 200 <= status_nb < 400


def has_nice_head(status: int | None, headers: Mapping[str, str]) -> bool:
    """Is a HEAD response useful, or should we retry with GET?

    True iff valid status AND (content-length or last-modified present)
    AND not a suspiciously tiny text/html page (WAF heuristic).
    """
    if not is_valid_status(status):
        return False
    if not any(k in headers for k in ("content-length", "last-modified")):
        return False
    content_type = headers.get("content-type", "").lower()
    if content_type.startswith("text/html"):
        try:
            if int(headers.get("content-length", 0)) < SUSPICIOUS_HTML_HEAD_MAX_BYTES:
                return False
        except (TypeError, ValueError):
            return False
    return True
