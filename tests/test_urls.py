"""URL canonicalization + host extraction (functions/urls.py): Arrow
kernel behavior, and bit-exact parity with the generated DuckDB SQL (the
two compile from one spec list — this gate catches any drift)."""

from __future__ import annotations

import duckdb
import pyarrow as pa

from deduplicatr_ray.functions.urls import (
    canonicalize_sql,
    canonicalize_urls,
    host_of,
    host_sql,
)

CASES = [
    # (raw, canonical, host)
    (
        "http://WWW.Site.com:80/p/1?utm_source=feed&id=9#frag",
        "https://site.com/p/1?id=9",
        "site.com",
    ),
    # the module's motivating pair: scheme-variant refetches collapse
    ("http://site.com/p/1?id=9", "https://site.com/p/1?id=9", "site.com"),
    ("https://site.com:443/p/1/?fbclid=xyz", "https://site.com/p/1/", "site.com"),
    ("HTTP://EXAMPLE.ORG/", "https://example.org", "example.org"),
    ("https://example.org", "https://example.org", "example.org"),
    (
        "https://a.b.example.com/path/UPPER?x=1&utm_campaign=c&y=2",
        "https://a.b.example.com/path/UPPER?x=1&y=2",
        "a.b.example.com",
    ),
    # non-http scheme: case-folded, but no www/port/root-slash special-casing
    ("ftp://Files.Example.com:21/x", "ftp://files.example.com:21/x", "files.example.com"),
    # userinfo blocks the port strip (authority isn't a bare host) but not host_of
    (
        "https://user:pw@Host.com:443/a?utm_x=1",
        "https://user:pw@host.com:443/a",
        "host.com",
    ),
    # every param is tracking -> query gone entirely, then bare root slash too
    ("https://www.example.com/?utm_source=a&utm_medium=b", "https://example.com", "example.com"),
    ("https://x.com/a?utm_a=1&utm_b=2", "https://x.com/a", "x.com"),
    ("https://x.com/a?utm_a=1&utm_b=2&keep=3", "https://x.com/a?keep=3", "x.com"),
    # non-URLs pass through canonicalization, host is null
    ("not a url", "not a url", None),
    ("//protocol-relative.com/x", "//protocol-relative.com/x", None),
    ("", "", None),
]


def test_canonicalize_and_host_cases():
    arr = pa.array([c[0] for c in CASES] + [None], pa.string())
    canon = canonicalize_urls(arr).to_pylist()
    hosts = host_of(arr).to_pylist()
    for (raw, want_c, want_h), got_c, got_h in zip(CASES, canon, hosts):
        assert got_c == want_c, (raw, got_c, want_c)
        assert got_h == want_h, (raw, got_h, want_h)
    assert canon[-1] is None and hosts[-1] is None


def test_sql_parity_bit_exact():
    arr = pa.array([c[0] for c in CASES] + [None], pa.string())
    con = duckdb.connect()
    con.register("t", pa.table({"u": arr}))
    sql_c = [r[0] for r in con.sql(f"SELECT {canonicalize_sql('u')} FROM t").fetchall()]
    sql_h = [r[0] for r in con.sql(f"SELECT {host_sql('u')} FROM t").fetchall()]
    assert sql_c == canonicalize_urls(arr).to_pylist()
    assert sql_h == host_of(arr).to_pylist()


def test_canonicalization_is_idempotent():
    arr = pa.array([c[0] for c in CASES], pa.string())
    once = canonicalize_urls(arr)
    twice = canonicalize_urls(once)
    assert once.to_pylist() == twice.to_pylist()
