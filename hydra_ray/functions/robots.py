"""robots.txt parsing + allow/deny decisions (north-rule component).

Standard robots exclusion semantics (public spec, RFC 9309 subset):
User-agent sections, Disallow/Allow prefix rules, longest-match wins,
Allow beats Disallow on equal length. Only ``*`` and our own agent
sections are honored; no crawl-delay (politeness owns rate limits).
"""

from __future__ import annotations

from urllib.parse import urlparse


def parse_robots(text: str, user_agent: str = "hydra-ray") -> list[tuple[str, bool]]:
    """robots.txt → [(path_prefix, allowed)] rules for our agent.

    Collects rules from ``User-agent: *`` and any section whose agent
    token is a prefix of ours (case-insensitive).
    """
    rules: list[tuple[str, bool]] = []
    applies = False
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
            applies = agent == "*" or ua.startswith(agent)
        elif applies and field in ("disallow", "allow"):
            if value == "" and field == "disallow":
                continue  # empty Disallow = allow all
            rules.append((value, field == "allow"))
    return rules


def is_allowed(url: str, rules: list[tuple[str, bool]]) -> bool:
    """Longest-prefix match; Allow wins ties; no match → allowed."""
    path = urlparse(url).path or "/"
    best_len = -1
    allowed = True
    for prefix, allow in rules:
        if path.startswith(prefix):
            if len(prefix) > best_len or (len(prefix) == best_len and allow):
                best_len = len(prefix)
                allowed = allow
    return allowed
