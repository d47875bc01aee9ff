"""robots.txt (RFC 9309) parsing + matching — retroactive crawl-consent
filtering: given robots.txt captures (Common Crawl stores them) and page
urls, decide per url whether the named agent was allowed to fetch it.
Modern training-data pipelines run exactly this pass to honor crawler
opt-outs after the fact.

Pure functions here; the Ray stage lives in ``stages/linkgraph.py``'s
sibling ``robots_filter`` (broadcast rules per host, row-local match).

RFC 9309 semantics implemented:
* group selection — the group(s) whose ``User-agent`` token is the
  LONGEST match for the product token, case-insensitive; ``*`` is the
  fallback; consecutive UA lines share one group
* rule matching — the longest-``pattern`` match wins; ``allow`` wins a
  length tie; no match ⇒ allowed; empty pattern ignored
* wildcards — ``*`` matches any char sequence, ``$`` anchors the end
  (the de-facto Google extension RFC 9309 standardized)
* a missing or unparseable robots.txt ⇒ everything allowed
"""

from __future__ import annotations

import re


def _pattern_regex(pattern: str) -> re.Pattern:
    """robots path pattern -> compiled anchored regex."""
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    parts = [re.escape(p) for p in pattern.split("*")]
    body = "(?:.*)".join(parts)
    return re.compile("^" + body + ("$" if anchored else ""))


def parse_robots(
    text: bytes | str, agent: str = "*"
) -> list[tuple[bool, str]]:
    """robots.txt bytes -> the effective rule list for ``agent``:
    ``[(allow, pattern), ...]`` from the best-matching user-agent
    group(s). Unparseable lines are skipped (crawl posture)."""
    if isinstance(text, bytes):
        text = text.decode("utf-8", "replace")
    agent = agent.lower()
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[bool, str]] = []
    in_rules = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, sep, val = line.partition(":")
        if not sep:
            continue
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if in_rules and cur_agents:
                groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
                in_rules = False
            cur_agents.append(val.lower())
        elif key in ("allow", "disallow"):
            if not cur_agents:
                continue  # rules before any UA line: ignored
            in_rules = True
            if val:  # empty pattern = no rule (RFC: "Disallow:" allows all)
                cur_rules.append((key == "allow", val))
        # crawl-delay / sitemap / unknown keys: not access rules
    if cur_agents:
        groups.append((cur_agents, cur_rules))
    # longest-UA-token match; '*' is fallback with match length -1
    best_len = None
    best_rules: list[tuple[bool, str]] = []
    for agents, rules in groups:
        for a in agents:
            if a == "*":
                mlen = -1
            elif a and a in agent:
                mlen = len(a)
            else:
                continue
            if best_len is None or mlen > best_len:
                best_len, best_rules = mlen, list(rules)
            elif mlen == best_len:
                best_rules.extend(rules)  # equally specific groups merge
    return best_rules


def robots_allowed(path: str, rules: list[tuple[bool, str]]) -> bool:
    """RFC 9309 longest-match decision for one url path ('/'-rooted,
    query included by the caller if desired)."""
    best = None  # (pattern_len, allow)
    for allow, pattern in rules:
        if _pattern_regex(pattern).match(path):
            key = len(pattern)
            if best is None or key > best[0] or (key == best[0] and allow):
                best = (key, allow)
    return True if best is None else best[1]


def compile_rules(
    rules: list[tuple[bool, str]],
) -> list[tuple[bool, int, re.Pattern]]:
    """Pre-compile a rule list for repeated matching: (allow,
    pattern_len, regex), longest-first so the first SET of matches at a
    given length decides."""
    return sorted(
        ((a, len(p), _pattern_regex(p)) for a, p in rules),
        key=lambda t: (-t[1], not t[0]),
    )


def robots_allowed_compiled(
    path: str, compiled: list[tuple[bool, int, re.Pattern]]
) -> bool:
    """Like :func:`robots_allowed` over :func:`compile_rules` output:
    rules are length-sorted with allow-before-disallow at equal length,
    so the FIRST match is the decision."""
    for allow, _plen, rx in compiled:
        if rx.match(path):
            return allow
    return True


def robots_sitemaps(text: bytes | str) -> list[str]:
    """The ``Sitemap:`` directives of a robots.txt (absolute urls,
    cross-host allowed per the sitemaps protocol; duplicates dropped,
    order kept) — the crawl-frontier seed list stored alongside the
    access rules."""
    if isinstance(text, bytes):
        text = text.decode("utf-8", "replace")
    out: list[str] = []
    seen: set[str] = set()
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        key, sep, rest = line.partition(":")
        if not sep or key.strip().lower() != "sitemap":
            continue
        val = rest.strip()  # the url itself contains ':' — keep rest whole
        if val.lower().startswith(("http://", "https://")) and val not in seen:
            seen.add(val)
            out.append(val)
    return out
