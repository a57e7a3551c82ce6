"""robots.txt parsing + allow/deny decisions (north-rule component).

Standard robots exclusion semantics (public spec, RFC 9309):
User-agent groups (a group applies if ANY of its consecutive
User-agent lines matches), Disallow/Allow path rules with ``*`` and
trailing ``$`` wildcards, most-specific (longest pattern) match wins,
Allow beats Disallow on equal specificity. Only ``*`` and our own
agent groups are honored; no crawl-delay (politeness owns rate
limits).
"""

from __future__ import annotations

import re
from urllib.parse import urlparse


def _rule_pattern(path_value: str) -> re.Pattern:
    """Path rule → anchored regex: '*' spans anything, trailing '$'
    anchors the end, everything else is literal (RFC 9309 §2.2.3)."""
    pat = re.escape(path_value)
    pat = pat.replace(r"\*", ".*")
    if pat.endswith(r"\$"):
        pat = pat[:-2] + "$"
    return re.compile("^" + pat)


def parse_robots(text: str, user_agent: str = "hydra-ray") -> list[tuple[str, bool]]:
    """robots.txt → [(path_rule, allowed)] rules for our agent.

    Group applicability follows RFC 9309: consecutive ``User-agent``
    lines form one group header, and the group applies if ANY of them
    is ``*`` or a prefix of our agent (case-insensitive) — not just the
    last line.
    """
    rules: list[tuple[str, bool]] = []
    applies = False
    in_ua_run = False
    ua = user_agent.lower()
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            agent = value.lower()
            match = agent == "*" or ua.startswith(agent)
            applies = (applies or match) if in_ua_run else match
            in_ua_run = True
        else:
            in_ua_run = False
            if applies and field in ("disallow", "allow"):
                if value == "" and field == "disallow":
                    continue  # empty Disallow = allow all
                rules.append((value, field == "allow"))
    return rules


def is_allowed(url: str, rules: list[tuple[str, bool]]) -> bool:
    """Most-specific (longest pattern) match; Allow wins ties; no
    match → allowed. Wildcard rules match via their compiled regex
    ('Disallow: /*?' now actually blocks query URLs)."""
    parsed = urlparse(url)
    path = parsed.path or "/"
    if parsed.query:
        path = f"{path}?{parsed.query}"
    best_len = -1
    allowed = True
    for rule, allow in rules:
        if _compiled(rule).match(path):
            if len(rule) > best_len or (len(rule) == best_len and allow):
                best_len = len(rule)
                allowed = allow
    return allowed


_PATTERN_CACHE: dict[str, re.Pattern] = {}


def _compiled(rule: str) -> re.Pattern:
    pat = _PATTERN_CACHE.get(rule)
    if pat is None:
        pat = _rule_pattern(rule)
        if len(_PATTERN_CACHE) < 100_000:
            _PATTERN_CACHE[rule] = pat
    return pat
