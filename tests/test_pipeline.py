"""End-to-end flagship tests (SURVEY.md §5.2.2-3): recall gate + invariances."""

from __future__ import annotations

import pytest

from deduplicatr_ray.sources.synthetic import gen_corpus
from deduplicatr_ray.pipelines.flagship import (
    cluster_summary,
    dedup_pipeline,
    implied_pairs,
)


def _truth_pairs_above_tau(truth, tau: float = 0.7) -> set[tuple[str, str]]:
    return {
        (a, b)
        for a, b, j in zip(
            truth["url_a"].to_pylist(),
            truth["url_b"].to_pylist(),
            truth["jaccard_true"].to_pylist(),
        )
        if j >= tau
    }


def _run(pages):
    import ray.data as rd

    return dedup_pipeline(rd.from_arrow(pages))


@pytest.mark.parametrize(
    "name", ["exact", "near", "boiler", "mixed", "edge", "htmlmix"]
)
def test_recall_gate(ray_session, name):
    """dup-pair recall >= 0.99 against injected ground truth (BASELINE.json:2)."""
    pages, truth = gen_corpus(name)
    res = _run(pages)
    got = implied_pairs(res.mapping)
    want = _truth_pairs_above_tau(truth)
    if not want:
        return
    recall = len(got & want) / len(want)
    assert recall >= 0.99, f"{name}: recall {recall:.4f} < 0.99"


def test_precision_sanity(ray_session):
    """Against FULL truth (any true Jaccard), precision stays high — near-dup
    detections below tau are counted as hits, unrelated links as misses."""
    pages, truth = gen_corpus("boiler")
    res = _run(pages)
    got = implied_pairs(res.mapping)
    full = {
        (a, b)
        for a, b in zip(truth["url_a"].to_pylist(), truth["url_b"].to_pylist())
    }
    tp = len(got & full)
    assert tp / len(got) >= 0.95


def test_permutation_invariance(ray_session):
    """Shuffled input rows => identical clusters (the reference's commutative
    dir-hash property, file.clj:~30-45, generalized; SURVEY.md §5.2.3)."""
    import pyarrow as pa
    import numpy as np

    pages, _ = gen_corpus("near")
    res1 = _run(pages)
    perm = np.random.Generator(np.random.PCG64(7)).permutation(len(pages))
    res2 = _run(pages.take(pa.array(perm)))
    assert res1.mapping == res2.mapping


def test_parallelism_invariance(ray_session):
    """Same clusters with 1 block vs many blocks (SURVEY.md §5.2.3)."""
    import ray.data as rd

    pages, _ = gen_corpus("exact")
    r1 = dedup_pipeline(rd.from_arrow(pages).repartition(1))
    r8 = dedup_pipeline(rd.from_arrow(pages).repartition(8))
    assert r1.mapping == r8.mapping


def test_cluster_outputs_well_formed(ray_session):
    pages, _ = gen_corpus("mixed")
    res = _run(pages)
    tbl = res.clusters.to_pandas()
    assert len(tbl) == len(pages)
    # canonical row is the min url of its cluster; singletons are canonical
    assert (tbl[tbl.is_canonical].url == tbl[tbl.is_canonical].cluster_id).all()
    by_cid = tbl.groupby("cluster_id")["url"].min()
    assert (by_cid.index == by_cid.values).all()
    # cluster_size consistent
    sizes = tbl.groupby("cluster_id").size()
    for cid, sz in sizes.items():
        assert (tbl[tbl.cluster_id == cid].cluster_size == sz).all()
    # summary sorted desc, top cluster is one of the injected hot clusters
    summ = cluster_summary(res.clusters).to_pandas()
    assert summ.members.is_monotonic_decreasing
    assert summ.members.iloc[0] >= 30


def test_wide_exact_key_equivalent_clusters(ray_session):
    """cfg.exact_key_bits=128 (full sha1-128 exact match, ADVICE r1) yields
    the same clusters as the default probabilistic 64+simhash key on a
    corpus with heavy exact duplication."""
    import dataclasses

    import ray.data as rd

    from deduplicatr_ray.config import CANONICAL

    pages, _ = gen_corpus("mixed")
    wide = dataclasses.replace(CANONICAL, exact_key_bits=128)
    r64 = dedup_pipeline(rd.from_arrow(pages))
    r128 = dedup_pipeline(rd.from_arrow(pages), cfg=wide)
    assert r64.mapping == r128.mapping
    assert r64.stats["config_hash"] != r128.stats["config_hash"]


def test_short_and_empty_docs_only_exact(ray_session):
    """M10: docs below shingle width cluster only via exact byte equality."""
    import ray.data as rd
    import pyarrow as pa

    rows = {
        "url": ["u/a", "u/b", "u/c", "u/d"],
        "warc_ts": [None] * 4,
        "html": [None] * 4,
        "text": ["tiny doc", "tiny doc", "tiny dog", ""],
        "lang": ["en"] * 4,
    }
    res = dedup_pipeline(rd.from_arrow(pa.table(rows)))
    assert res.mapping.get("u/a") == res.mapping.get("u/b") == "u/a"
    assert "u/c" not in res.mapping  # 1-token edit on a short doc: not near-dup
    assert "u/d" not in res.mapping


@pytest.mark.parametrize("name", ["exact", "near", "mixed"])
def test_recall_gate_oph_scheme(ray_session, name):
    """The OPH signature scheme (minhash_scheme='oph': one hash pass per
    shingle + rotation densification) holds the same recall >= 0.99 gate
    as the canonical k-perm scheme."""
    import ray.data as rd

    from deduplicatr_ray.config import DedupConfig

    pages, truth = gen_corpus(name)
    res = dedup_pipeline(
        rd.from_arrow(pages), DedupConfig(minhash_scheme="oph")
    )
    got = implied_pairs(res.mapping)
    want = _truth_pairs_above_tau(truth)
    if not want:
        return
    recall = len(got & want) / len(want)
    assert recall >= 0.99, f"{name}/oph: recall {recall:.4f} < 0.99"


def test_oph_short_doc_near_dups_via_minhash(ray_session):
    """Short docs (fewer shingles than num_perm bins) are the rotation-
    densification regime — the broken [pos, pos] doubling collapsed their
    densified lanes and OPH silently missed every short near-dup pair.
    Pairs must be found WITH method='minhash' (distinct ranks minhash
    above simhash, so the attribution proves the OPH estimate passed, not
    just the Hamming fallback)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from deduplicatr_ray.config import DedupConfig

    rng = np.random.default_rng(13)
    vocab = [f"w{i:02d}" for i in range(300)]
    urls, texts = [], []
    for i in range(10):
        base = list(rng.choice(vocab, 60))  # 56 shingles << 128 bins
        mut = list(base)
        mut[int(rng.integers(0, 60))] = str(rng.choice(vocab))
        urls += [f"u/{i:02d}a", f"u/{i:02d}b"]
        texts += [" ".join(base), " ".join(mut)]
    pages = pa.table(
        {
            "url": pa.array(urls),
            "warc_ts": pa.nulls(len(urls), pa.int64()),
            "html": pa.nulls(len(urls), pa.binary()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(urls)),
        }
    )
    res = dedup_pipeline(
        rd.from_arrow(pages), DedupConfig(minhash_scheme="oph")
    )
    pairs = res.pairs.to_pandas()
    by_pair = {
        (a, b): m
        for a, b, m in zip(pairs["url_a"], pairs["url_b"], pairs["method"])
    }
    for i in range(10):
        key = (f"u/{i:02d}a", f"u/{i:02d}b")
        assert key in by_pair, f"missing short-doc near-dup pair {key}"
        assert by_pair[key] == "minhash", (key, by_pair[key])
