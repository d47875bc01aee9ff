"""Retroactive robots.txt compliance (`functions/robots.py` semantics):
mark every url with whether the named agent was allowed to fetch it —
the pass modern training pipelines run to honor crawler opt-outs after
the fact, using the robots captures a crawl already stores.

Scale shape: robots rules are HOST-sized state (one small rule list per
host — the same ~10^8-host budget class as PageRank's rank vector), so
they are parsed once on the driver, broadcast via ``ray.put``, and the
page/url side streams through an ACTOR POOL that compiles each host's
patterns once in ``__init__`` — row work is a dict lookup + anchored
regex match, and page text never moves.
"""

from __future__ import annotations

import re

import pyarrow as pa

_URL_PATH_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^#]*)")


def url_path(u: str) -> str:
    """url -> the path(+query) robots rules match against ('/' when
    absent or unparseable)."""
    m = _URL_PATH_RE.match(u or "")
    if not m or not m.group(1):
        return "/"
    return m.group(1)


class _RobotsActor:
    """Actor-pool callable: compile each host's rules once, then flag
    rows. Hosts without a robots entry are allowed (RFC 9309: a missing
    robots.txt permits everything)."""

    def __init__(self, rules_ref, flag: str, url_col: str):
        import ray

        from ..functions.robots import compile_rules

        self.compiled = {
            h: compile_rules(r) for h, r in ray.get(rules_ref).items()
        }
        self.flag = flag
        self.url_col = url_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.robots import robots_allowed_compiled
        from ..functions.urls import host_of

        hosts = host_of(batch[self.url_col]).to_pylist()
        urls = batch[self.url_col].to_pylist()
        out = []
        for h, u in zip(hosts, urls):
            rules = self.compiled.get(h)
            out.append(
                True
                if not rules
                else robots_allowed_compiled(url_path(u or ""), rules)
            )
        return batch.append_column(self.flag, pa.array(out, pa.bool_()))


def robots_filter_stage(
    ds,
    robots,
    *,
    agent: str = "*",
    flag: str = "robots_allowed",
    url_col: str = "url",
    concurrency: tuple[int, int] | int = (1, 8),
):
    """ADD a ``robots_allowed`` bool to ``ds`` (any Dataset with a url
    column) from a ``robots`` Dataset of (host, robots) rows — robots =
    the raw robots.txt bytes/text captured for that host. Group
    selection, longest-match and wildcard semantics are RFC 9309 via
    ``functions/robots.py``; filtering vs reporting is the caller's
    choice (the flag keeps both populations, like ``mark_membership``)."""
    import ray

    from ..functions.robots import parse_robots

    rules: dict[str, list] = {}
    for b in robots.iter_batches(batch_format="pyarrow", batch_size=4096):
        for h, txt in zip(b["host"].to_pylist(), b["robots"].to_pylist()):
            if h:
                rules[h] = parse_robots(txt or b"", agent)
    rules_ref = ray.put(rules)
    return ds.map_batches(
        _RobotsActor,
        fn_constructor_args=(rules_ref, flag, url_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )
