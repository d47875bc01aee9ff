"""J2 distributed n-gram verification join vs a driver-side reference
implementation (the r1 semantics, pinned here as the executable golden)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _driver_reference(pages_tbl: pa.Table, cand: pa.Table, tau: float):
    """The r1 driver-loop semantics: true shingle-set Jaccard per pair."""
    from deduplicatr_ray.config import CANONICAL
    from deduplicatr_ray.functions.hashing import TokenHasher, shingle_hashes
    from deduplicatr_ray.functions.textnorm import tokenize

    th = TokenHasher(CANONICAL.token_hash_seed)
    sh = {
        u: shingle_hashes(th.hash_tokens(tokenize(t or "")), CANONICAL.shingle_w)
        for u, t in zip(
            pages_tbl["url"].to_pylist(), pages_tbl["text"].to_pylist()
        )
    }
    out = {}
    for a, b in zip(cand["url_a"].to_pylist(), cand["url_b"].to_pylist()):
        sa, sb = sh.get(a), sh.get(b)
        if sa is None or sb is None or (len(sa) == 0 and len(sb) == 0):
            continue
        inter = len(np.intersect1d(sa, sb))
        union = len(sa) + len(sb) - inter
        j = inter / union if union else 0.0
        if j >= tau:
            out[(a, b)] = j
    return out


def test_verify_join_matches_driver_reference(ray_session):
    import ray.data as rd

    from deduplicatr_ray.config import CANONICAL
    from deduplicatr_ray.pipelines.flagship import (
        pairs_from_signatures,
        signatures_from_pages,
    )
    from deduplicatr_ray.sources.synthetic import gen_corpus
    from deduplicatr_ray.stages.verify import ngram_verify_join

    pages, _ = gen_corpus("near")
    sigs = signatures_from_pages(rd.from_arrow(pages)).materialize()
    cand = pairs_from_signatures(sigs).materialize()

    got_tbl = ngram_verify_join(rd.from_arrow(pages), cand).to_pandas()
    got = {
        (r.url_a, r.url_b): r.jaccard for r in got_tbl.itertuples()
    }
    cand_tbl = pa.table(
        {
            "url_a": pa.concat_arrays(
                [b["url_a"].combine_chunks() for b in
                 cand.iter_batches(batch_format="pyarrow", batch_size=8192)]
            ),
            "url_b": pa.concat_arrays(
                [b["url_b"].combine_chunks() for b in
                 cand.iter_batches(batch_format="pyarrow", batch_size=8192)]
            ),
        }
    )
    want = _driver_reference(pages, cand_tbl, CANONICAL.jaccard_threshold)
    assert set(got) == set(want)
    for k, j in want.items():
        assert abs(got[k] - j) < 1e-12


def test_verify_join_edge_cases(ray_session):
    """Pairs referencing a url absent from pages are dropped; sub-threshold
    pairs are filtered; identical docs verify at jaccard 1.0."""
    import ray.data as rd

    from deduplicatr_ray.stages.verify import ngram_verify_join

    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "into the deep dark forest tonight while owls watch silently"
    )
    other = (
        "completely different text about databases indexes transactions "
        "and storage engines with write ahead logging for durability"
    )
    pages = pa.table(
        {
            "url": pa.array(["u/a", "u/b", "u/c"]),
            "warc_ts": pa.nulls(3, pa.timestamp("us")),
            "html": pa.nulls(3, pa.binary()),
            "text": pa.array([base, base, other]),
            "lang": pa.array(["en", "en", "en"]),
        }
    )
    cand = pa.table(
        {
            "url_a": pa.array(["u/a", "u/a", "u/a"]),
            "url_b": pa.array(["u/b", "u/c", "u/missing"]),
        }
    )
    out = ngram_verify_join(
        rd.from_arrow(pages), rd.from_arrow(cand), threshold=0.7
    ).to_pandas()
    got = {(r.url_a, r.url_b): r.jaccard for r in out.itertuples()}
    assert got == {("u/a", "u/b"): 1.0}


def test_verify_join_empty_candidates(ray_session):
    import ray.data as rd

    from deduplicatr_ray.stages.verify import ngram_verify_join

    pages = pa.table(
        {
            "url": pa.array(["u/a"]),
            "warc_ts": pa.nulls(1, pa.timestamp("us")),
            "html": pa.nulls(1, pa.binary()),
            "text": pa.array(["hello world"]),
            "lang": pa.array(["en"]),
        }
    )
    cand = pa.table(
        {"url_a": pa.array([], pa.string()), "url_b": pa.array([], pa.string())}
    )
    assert ngram_verify_join(rd.from_arrow(pages), rd.from_arrow(cand)).count() == 0
