"""Parity matrices for the pure helper predicates.

Mirrors the semantics exercised by reference tests/test_crawl/test_crawl.py
(HEAD→GET switch, status validity) and crawl/helpers.py directly.
"""

import pytest

from hydra_ray.functions.headers import (
    convert_headers,
    fix_surrogates,
    get_content_type_from_header,
    has_nice_head,
    is_valid_status,
)


@pytest.mark.parametrize(
    "ct,expected",
    [
        (None, ""),
        ("text/csv", "text/csv"),
        ("text/csv; charset=utf-8", "text/csv"),
        ("text/html;h5ai=0.20;charset=UTF-8", "text/html"),
    ],
)
def test_content_type_parse(ct, expected):
    headers = {"content-type": ct} if ct is not None else {}
    assert get_content_type_from_header(headers) == expected


def test_convert_headers_lowercase_first_wins():
    assert convert_headers({"Content-Type": "text/csv", "X-Y": "1"}) == {
        "content-type": "text/csv",
        "x-y": "1",
    }
    assert convert_headers(None) == {}
    assert convert_headers({}) == {}


def test_fix_surrogates():
    bad = "TREMI_2017-R\udce9sultats"
    fixed = fix_surrogates(bad)
    fixed.encode("utf-8")  # must not raise
    assert fix_surrogates(123) == "123"


@pytest.mark.parametrize(
    "status,expected",
    [
        (None, False),
        (0, False),
        (200, True),
        (204, True),
        (301, True),
        (399, True),
        (400, False),
        (404, False),
        (429, None),
        (500, False),
        ("200", True),
        ("429", None),
    ],
)
def test_is_valid_status(status, expected):
    assert is_valid_status(status) is expected


@pytest.mark.parametrize(
    "status,headers,expected",
    [
        # no useful length/modified headers → retry GET
        (200, {}, False),
        (200, {"content-type": "text/csv"}, False),
        # has content-length → fine
        (200, {"content-length": "5000"}, True),
        (200, {"last-modified": "Mon, 01 Jan 2024 00:00:00 GMT"}, True),
        # tiny text/html body → suspicious WAF page
        (200, {"content-type": "text/html", "content-length": "247"}, False),
        (200, {"content-type": "text/html", "content-length": "5000"}, True),
        (200, {"content-type": "text/html", "content-length": "garbage"}, False),
        # invalid statuses never nice
        (404, {"content-length": "5000"}, False),
        (429, {"content-length": "5000"}, False),
        (500, {"content-length": "5000"}, False),
    ],
)
def test_has_nice_head(status, headers, expected):
    assert has_nice_head(status, headers) is expected


# -- robots.txt (north-rule component) --------------------------------------

from hydra_ray.functions.robots import is_allowed, parse_robots  # noqa: E402

ROBOTS = """
# comment
User-agent: other-bot
Disallow: /

User-agent: *
Disallow: /private
Allow: /private/open
Disallow:
"""


def test_parse_robots_sections():
    rules = parse_robots(ROBOTS, user_agent="hydra-ray")
    assert ("/private", False) in rules
    assert ("/private/open", True) in rules
    assert ("/", False) not in rules  # other-bot's section ignored


def test_is_allowed_longest_match():
    rules = parse_robots(ROBOTS)
    assert is_allowed("https://a/x", rules)
    assert not is_allowed("https://a/private/data.csv", rules)
    assert is_allowed("https://a/private/open/data.csv", rules)  # Allow wins


def test_agent_prefix_section():
    text = "User-agent: hydra\nDisallow: /blocked\n"
    rules = parse_robots(text, user_agent="hydra-ray")
    assert not is_allowed("https://a/blocked/x", rules)


def test_robots_wildcards():
    # RFC 9309 '*' and trailing '$' wildcards
    text = "User-agent: *\nDisallow: /*?\nDisallow: /tmp/*.csv$\nAllow: /a*z\n"
    rules = parse_robots(text)
    assert not is_allowed("https://a/page?q=1", rules)  # '/*?' blocks queries
    assert is_allowed("https://a/page", rules)
    assert not is_allowed("https://a/tmp/x.csv", rules)  # '$' anchors the end
    assert is_allowed("https://a/tmp/x.csv.gz", rules)  # not at end → no match
    assert is_allowed("https://a/abcz", rules)


def test_robots_multiple_user_agent_lines():
    # a group applies if ANY of its consecutive User-agent lines matches
    text = "User-agent: hydra\nUser-agent: other-bot\nDisallow: /x\n"
    rules = parse_robots(text, user_agent="hydra-ray")
    assert not is_allowed("https://a/x/y", rules)
    # order-independent: matching line first, non-matching last
    text2 = "User-agent: other-bot\nUser-agent: hydra\nDisallow: /x\n"
    rules2 = parse_robots(text2, user_agent="hydra-ray")
    assert not is_allowed("https://a/x/y", rules2)
    # a rule line ENDS the group header: a later User-agent starts fresh
    text3 = "User-agent: hydra\nDisallow: /x\nUser-agent: other-bot\nDisallow: /y\n"
    rules3 = parse_robots(text3, user_agent="hydra-ray")
    assert not is_allowed("https://a/x/1", rules3)
    assert is_allowed("https://a/y/1", rules3)
