"""Link graph (stages/linkgraph.py): href extraction, host-level edge
aggregation, PageRank power iteration vs a dense numpy reference."""

from __future__ import annotations

import numpy as np
import pytest

from deduplicatr_ray.stages import linkgraph as lg


def test_links_from_html_resolution_and_filtering():
    html = b"""<html><body>
    <a href="https://other.example/page">x</a>
    <a href='/rel/path'>y</a>
    <a href=//proto.example/z>bare</a>
    <a href="mailto:a@b.c">m</a>
    <a href="#frag">f</a>
    <a href="?query=1">q</a>
    <a href="javascript:void(0)">j</a>
    <a href="data:text/plain,x">d</a>
    <link href="https://cdn.example/style.css">
    </body></html>"""
    out = lg.links_from_html("https://src.example:8080/dir/page", html)
    assert out == [
        "https://other.example/page",
        "https://src.example/rel/path",
        "https://proto.example/z",
        "https://cdn.example/style.css",
    ]
    # no html, junk src, empty
    assert lg.links_from_html("notaurl", b'<a href="/x">') == []
    assert lg.links_from_html("http://a.example/", b"") == []
    # userinfo + port stripping in the host
    assert lg._host_and_root("http://user@HOST.example:81/x") == (
        "host.example",
        "http://host.example",
    )


def test_extract_links_and_host_graph(ray_session):
    import ray.data as rd
    import pyarrow as pa

    rows = []
    for i in range(12):
        targets = "".join(
            f'<a href="http://t{j}.example/p">l</a>'
            for j in range(i % 3 + 1)
        )
        self_link = '<a href="/self">s</a>'  # same-host: dropped
        rows.append(
            {
                "url": f"http://s{i % 2}.example/{i}",
                "html": f"<html>{targets}{self_link}</html>".encode(),
            }
        )
    rows.append({"url": "http://s0.example/none", "html": None})
    pages = rd.from_arrow(
        pa.table(
            {
                "url": [r["url"] for r in rows],
                "html": pa.array(
                    [r["html"] for r in rows], pa.binary()
                ),
            }
        )
    )
    links = lg.extract_links_stage(pages)
    edges = lg.host_graph(links).to_pandas()
    # every doc links t0; docs with i%3>=1 also t1; i%3==2 also t2
    e = {
        (r.src_host, r.dst_host): r.n_links
        for r in edges.itertuples(index=False)
    }
    assert e[("s0.example", "t0.example")] == 6
    assert e[("s1.example", "t0.example")] == 6
    assert e[("s0.example", "t1.example")] == 4
    assert e[("s1.example", "t2.example")] == 2
    # self-loops dropped
    assert not any(s == d for s, d in e)
    # keep_self variant keeps them
    edges2 = lg.host_graph(links, drop_self=False).to_pandas()
    assert ((edges2["src_host"] == edges2["dst_host"]).sum()) == 2


@pytest.mark.parametrize("dense_max", ["4000000", "0"])
def test_host_pagerank_matches_dense_reference(
    ray_session, monkeypatch, dense_max
):
    """dense_max="0" forces the groupby-exchange branch, the default the
    dense-partial branch — both must match the numpy reference."""
    import pandas as pd
    import ray.data as rd

    monkeypatch.setenv("GRAFT_PR_DENSE_MAX", dense_max)
    rng = np.random.Generator(np.random.PCG64(11))
    n_hosts = 40
    rows = []
    for s in range(n_hosts - 5):  # leave 5 dangling hosts (targets only)
        for d in rng.choice(n_hosts, size=rng.integers(1, 6), replace=False):
            if d == s:
                continue
            rows.append(
                {
                    "src_host": f"h{s:03d}",
                    "dst_host": f"h{int(d):03d}",
                    "n_links": int(rng.integers(1, 9)),
                }
            )
    df = pd.DataFrame(rows).groupby(
        ["src_host", "dst_host"], as_index=False
    )["n_links"].sum()
    edges = rd.from_pandas(df).repartition(6)
    got = lg.host_pagerank(edges, n_iter=25).set_index("host")["rank"]
    ref = lg.pagerank_reference(df, n_iter=25)
    assert abs(got.sum() - 1.0) < 1e-9
    for h, r in ref.items():
        assert got[h] == pytest.approx(r, rel=1e-9, abs=1e-12)
    # unweighted variant also agrees with the reference on weight-1 edges
    df1 = df.assign(n_links=1)
    got1 = lg.host_pagerank(
        rd.from_pandas(df1).repartition(4), n_iter=10, weighted=False
    ).set_index("host")["rank"]
    ref1 = lg.pagerank_reference(df1, n_iter=10)
    for h, r in ref1.items():
        assert got1[h] == pytest.approx(r, rel=1e-9, abs=1e-12)


def test_host_pagerank_empty(ray_session):
    import pandas as pd
    import ray.data as rd

    empty = rd.from_pandas(
        pd.DataFrame({"src_host": [], "dst_host": [], "n_links": []})
    )
    assert len(lg.host_pagerank(empty)) == 0


def test_anchors_from_html():
    html = b"""<body>
    <a href="https://t.example/a" class=x>First  link</a>
    <a href='/rel'><b>Bold</b> &amp; nested <img src=i></a>
    <a href="https://t.example/img"><img src="only.png"></a>
    <a href="mailto:x@y">mail text</a>
    </body>"""
    out = lg.anchors_from_html("https://s.example/page", html)
    assert out == [
        ("https://t.example/a", "First link"),
        ("https://s.example/rel", "Bold & nested"),
    ]  # image-only and non-web anchors dropped


def test_anchor_text_stage(ray_session):
    import pyarrow as pa
    import ray.data as rd

    pages = rd.from_arrow(
        pa.table(
            {
                "url": ["http://a.example/1", "http://a.example/2"],
                "html": pa.array(
                    [
                        b'<a href="http://b.example/">to b</a>',
                        b'<a href="http://c.example/">to c</a>'
                        b'<a href="http://b.example/">b again</a>',
                    ],
                    pa.binary(),
                ),
            }
        )
    )
    df = lg.anchor_text_stage(pages).to_pandas()
    assert len(df) == 3
    assert set(zip(df["dst"], df["anchor"])) == {
        ("http://b.example/", "to b"),
        ("http://c.example/", "to c"),
        ("http://b.example/", "b again"),
    }


def test_canonical_of():
    assert (
        lg.canonical_of(
            "http://m.site.example/p?u=1",
            b'<link rel="canonical" href="https://site.example/p">',
        )
        == "https://site.example/p"
    )
    # attribute order reversed, unquoted, root-relative
    assert (
        lg.canonical_of(
            "https://site.example/amp/x",
            b"<link href=/x rel=canonical>",
        )
        == "https://site.example/x"
    )
    # first declaration wins; non-canonical links ignored
    html = (
        b'<link rel="stylesheet" href="/css">'
        b'<link rel="canonical" href="http://a.example/1">'
        b'<link rel="canonical" href="http://a.example/2">'
    )
    assert lg.canonical_of("http://x.example/", html) == "http://a.example/1"
    assert lg.canonical_of("http://x.example/", b"<p>none</p>") is None
    assert lg.canonical_of("http://x.example/", b'<link rel=canonical href="mailto:x">') is None


def test_declared_canonical_stage(ray_session):
    import pyarrow as pa
    import ray.data as rd

    pages = rd.from_arrow(
        pa.table(
            {
                "url": [
                    "http://m.example/a",
                    "http://www.example/a",
                    "http://plain.example/b",
                ],
                "html": pa.array(
                    [
                        b'<link rel="canonical" href="http://example/a">',
                        b'<link rel="canonical" href="http://example/a">',
                        b"<p>no declaration</p>",
                    ],
                    pa.binary(),
                ),
            }
        )
    )
    df = lg.declared_canonical_stage(pages).to_pandas()
    got = dict(zip(df["url"], df["canonical"]))
    assert got["http://m.example/a"] == "http://example/a"
    assert got["http://www.example/a"] == "http://example/a"
    assert got["http://plain.example/b"] == "http://plain.example/b"
