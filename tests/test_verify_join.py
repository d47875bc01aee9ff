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


def _brute_jaccard_all(docs: dict[int, str], tau_num: int, tau_den: int):
    """Set-ops reference for ngram_jaccard_all on hand-built docs."""
    from deduplicatr_ray.config import CANONICAL
    from deduplicatr_ray.functions.hashing import TokenHasher, shingle_hashes
    from deduplicatr_ray.functions.textnorm import tokenize

    th = TokenHasher(CANONICAL.token_hash_seed)
    sets = {
        d: set(
            shingle_hashes(th.hash_tokens(tokenize(t)), CANONICAL.shingle_w).tolist()
        )
        for d, t in docs.items()
    }
    out = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union and tau_den * inter >= tau_num * union:
                out[(a, b)] = (inter, union)
    return out


def test_ngram_jaccard_all_matches_set_ops(ray_session):
    """Exact postings-join Jaccard == brute-force set intersection/union."""
    import ray.data as rd

    from deduplicatr_ray.stages.verify import ngram_jaccard_all

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    variant = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau CHANGED"
    )
    unrelated = (
        "one two three four five six seven eight nine ten eleven "
        "twelve thirteen fourteen fifteen sixteen"
    )
    docs = {1: base, 2: variant, 3: unrelated, 4: base}
    tbl = pa.table(
        {
            "doc_id": pa.array(sorted(docs), pa.int64()),
            "text": pa.array([docs[d] for d in sorted(docs)], pa.string()),
        }
    )
    got_df = ngram_jaccard_all(rd.from_arrow(tbl)).to_pandas()
    got = {
        (r.id_a, r.id_b): (r.n_shared, r.n_union) for r in got_df.itertuples()
    }
    want = _brute_jaccard_all(docs, 1, 2)
    assert got == want
    assert (1, 4) in got  # identical docs: full overlap
    ns, nu = got[(1, 4)]
    assert ns == nu


def test_ngram_jaccard_all_short_docs_and_df_cap(ray_session):
    """Docs under shingle_w tokens emit no postings; df_cap drops
    boilerplate shingles shared by more docs than the cap."""
    import ray.data as rd

    from deduplicatr_ray.stages.verify import ngram_jaccard_all

    boiler = "shared boilerplate navigation footer text"  # 5 tokens = 1 shingle
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [boiler, boiler, boiler, "too short"], pa.string()
            ),
        }
    )
    full = ngram_jaccard_all(rd.from_arrow(tbl)).to_pandas()
    assert set(zip(full["id_a"], full["id_b"])) == {(1, 2), (1, 3), (2, 3)}
    capped = ngram_jaccard_all(rd.from_arrow(tbl), df_cap=2).to_pandas()
    assert len(capped) == 0
