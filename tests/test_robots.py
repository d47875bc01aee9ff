"""robots.txt compliance (functions/robots.py + stages/robots.py):
RFC 9309 group selection, longest-match, wildcards, and the broadcast
actor-pool stage."""

from __future__ import annotations

import pytest

from deduplicatr_ray.functions import robots as R


def test_parse_group_selection_longest_agent_token():
    txt = b"""
# fallback group
User-agent: *
Disallow: /all

User-agent: graft
Disallow: /graft

User-agent: graftbot
Disallow: /bot
Allow: /bot/ok
"""
    assert R.parse_robots(txt, "SomethingElse/1.0") == [(False, "/all")]
    # 'graftbot' (len 8) beats 'graft' (len 5) for agent 'graftbot-news'
    assert R.parse_robots(txt, "graftbot-news") == [
        (False, "/bot"),
        (True, "/bot/ok"),
    ]
    assert R.parse_robots(txt, "graftling") == [(False, "/graft")]


def test_parse_shared_ua_lines_and_empty_disallow():
    txt = b"""
User-agent: a
User-agent: b
Disallow: /x

User-agent: c
Disallow:
"""
    assert R.parse_robots(txt, "a") == [(False, "/x")]
    assert R.parse_robots(txt, "b") == [(False, "/x")]
    # empty Disallow = no rule = everything allowed
    assert R.parse_robots(txt, "c") == []
    # no matching group at all (no * fallback)
    assert R.parse_robots(txt, "zzz") == []


def test_longest_match_and_allow_tie():
    rules = [(False, "/private"), (True, "/private/public"), (False, "/p")]
    assert R.robots_allowed("/private/x", rules) is False
    assert R.robots_allowed("/private/public/doc", rules) is True
    assert R.robots_allowed("/q", rules) is True  # no match -> allowed
    # allow wins an exact length tie
    tie = [(False, "/a/b"), (True, "/a/c")]
    assert R.robots_allowed("/a/b", [(False, "/a/b"), (True, "/a/b")]) is True
    assert R.robots_allowed("/a/b", tie) is False
    # compiled path agrees everywhere
    for path in ("/private/x", "/private/public/doc", "/q", "/a/b"):
        for rl in (rules, tie):
            assert R.robots_allowed_compiled(
                path, R.compile_rules(rl)
            ) == R.robots_allowed(path, rl)


def test_wildcards_and_anchor():
    rules = [(False, "/*.php$"), (False, "/tmp*"), (True, "/tmp/keep")]
    c = R.compile_rules(rules)
    assert R.robots_allowed_compiled("/index.php", c) is False
    assert R.robots_allowed_compiled("/index.php?x=1", c) is True  # $ anchor
    assert R.robots_allowed_compiled("/tmp/anything", c) is False
    assert R.robots_allowed_compiled("/tmp/keep/this", c) is True
    assert R.robots_allowed_compiled("/other", c) is True


def test_url_path_extraction():
    from deduplicatr_ray.stages.robots import url_path

    assert url_path("http://h.example/a/b?q=1#frag") == "/a/b?q=1"
    assert url_path("http://h.example") == "/"
    assert url_path("junk") == "/"


def test_robots_filter_stage_end_to_end(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from deduplicatr_ray.stages.robots import robots_filter_stage

    robots = rd.from_arrow(
        pa.table(
            {
                "host": ["closed.example", "partial.example", "open.example"],
                "robots": [
                    b"User-agent: *\nDisallow: /",
                    b"User-agent: *\nAllow: /\n\n"
                    b"User-agent: graftbot\nDisallow: /d\nAllow: /d/ok",
                    b"User-agent: *\nDisallow:",
                ],
            }
        )
    )
    urls = [
        "http://closed.example/a",
        "http://partial.example/d/x",
        "http://partial.example/d/ok/y",
        "http://partial.example/other",
        "http://open.example/z",
        "http://norobots.example/w",
    ]
    ds = rd.from_arrow(pa.table({"url": urls, "n": list(range(len(urls)))}))
    out = (
        robots_filter_stage(ds, robots, agent="graftbot/2.0")
        .to_pandas()
        .set_index("url")["robots_allowed"]
    )
    assert out["http://closed.example/a"] == False  # noqa: E712
    assert out["http://partial.example/d/x"] == False  # noqa: E712
    assert out["http://partial.example/d/ok/y"] == True  # noqa: E712
    assert out["http://partial.example/other"] == True  # noqa: E712
    assert out["http://open.example/z"] == True  # noqa: E712
    assert out["http://norobots.example/w"] == True  # noqa: E712
    # default agent sees the '*' groups: partial.example allows all
    out2 = (
        robots_filter_stage(ds, robots)
        .to_pandas()
        .set_index("url")["robots_allowed"]
    )
    assert out2["http://partial.example/d/x"] == True  # noqa: E712
    assert out2["http://closed.example/a"] == False  # noqa: E712


def test_robots_sitemaps():
    txt = b"""User-agent: *
Disallow: /x
Sitemap: https://a.example/sitemap.xml
sitemap: http://b.example/s2.xml  # trailing comment
Sitemap: https://a.example/sitemap.xml
Sitemap: ftp://no.example/x
Sitemap:
"""
    assert R.robots_sitemaps(txt) == [
        "https://a.example/sitemap.xml",
        "http://b.example/s2.xml",
    ]
    assert R.robots_sitemaps(b"") == []
