"""Round-4 additions: paragraph_dedup (MassiveText sub-doc exact dedup),
dsir_weights (hashed n-gram importance weights), dedup_tiers (the composed
exact -> near -> window cleaning-cascade report)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _docs(texts, *, lang=None, start_id=0):
    cols = {
        "doc_id": pa.array(
            list(range(start_id, start_id + len(texts))), pa.int64()
        ),
        "text": pa.array(texts, pa.string()),
    }
    if lang is not None:
        cols["lang"] = pa.array(lang, pa.string())
    return pa.table(cols)


# ---------------------------------------------------------------------------
# paragraph_dedup
# ---------------------------------------------------------------------------

def _para_reference(texts, min_chars):
    """Pure-Python keep-first reference."""
    seen: set[str] = set()
    out = {}
    for doc_id, t in enumerate(texts):
        paras = (t or "").split("\n")
        kept = chars = 0
        for p in paras:
            if len(p) < min_chars:
                kept += 1
                chars += len(p)
            elif p not in seen:
                seen.add(p)
                kept += 1
                chars += len(p)
        out[doc_id] = (len(paras), kept, chars)
    return out


TEXTS = [
    "alpha beta gamma\nshared paragraph one\nunique tail one",
    "shared paragraph one\ndelta epsilon\nxx",
    "xx\nshared paragraph one\nalpha beta gamma",
    None,
    "",
    "short\nsh\nshared paragraph one\nshort",
]


def test_paragraph_dedup_matches_reference(ray_session):
    import ray

    from deduplicatr_ray.stages.paradedup import paragraph_dedup

    out = (
        paragraph_dedup(ray.data.from_arrow(_docs(TEXTS)), min_chars=3)
        .to_pandas()
        .sort_values("doc_id")
        .set_index("doc_id")
    )
    want = _para_reference(TEXTS, 3)
    assert len(out) == len(TEXTS)
    for doc_id, (n_paras, n_kept, kept_chars) in want.items():
        row = out.loc[doc_id]
        assert (row.n_paras, row.n_kept, row.kept_chars) == (
            n_paras,
            n_kept,
            kept_chars,
        ), doc_id


def test_paragraph_dedup_short_paras_always_kept(ray_session):
    import ray

    from deduplicatr_ray.stages.paradedup import paragraph_dedup

    # "xx" repeats across docs but is below min_chars -> every copy kept
    out = (
        paragraph_dedup(
            ray.data.from_arrow(_docs(["xx\nxx", "xx"])), min_chars=3
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    assert out.n_kept.tolist() == [2, 1]
    assert out.n_paras.tolist() == [2, 1]


def test_paragraph_dedup_partition_invariance(ray_session):
    """Same output under different partition counts / block splits."""
    import ray

    from deduplicatr_ray.stages.paradedup import paragraph_dedup

    texts = [
        "\n".join(f"para {i % 7} body text here" for i in range(j, j + 5))
        for j in range(40)
    ]
    t = _docs(texts)
    a = (
        paragraph_dedup(ray.data.from_arrow(t), num_partitions=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        paragraph_dedup(
            ray.data.from_arrow(t).repartition(13), num_partitions=9
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)
    # cross-check one doc against the reference
    want = _para_reference(texts, 1)
    row = a.set_index("doc_id").loc[39]
    assert (row.n_paras, row.n_kept, row.kept_chars) == want[39]


def test_paragraph_dedup_rejects_oversized(ray_session):
    import ray

    from deduplicatr_ray.stages.paradedup import paragraph_dedup

    big_id = pa.table(
        {
            "doc_id": pa.array([1 << 43], pa.int64()),
            "text": pa.array(["x"], pa.string()),
        }
    )
    with pytest.raises(Exception, match="2\\^43"):
        paragraph_dedup(ray.data.from_arrow(big_id)).to_pandas()


# ---------------------------------------------------------------------------
# dsir_weights
# ---------------------------------------------------------------------------

def _dsir_reference(texts, langs, target, n_buckets):
    """Pure-numpy reference of fit+score (same hashes as the stage)."""
    import re

    from deduplicatr_ray.functions.hashing import hash_columns_u64, splitmix64
    from deduplicatr_ray.stages.dsir import _BIGRAM_SALT

    def feats(t):
        toks = [x for x in re.split("[^a-z0-9]+", (t or "").lower()) if x]
        if not toks:
            return np.empty(0, np.int64)
        th = hash_columns_u64(
            pa.table({"t": pa.array(toks, pa.string())}), ["t"], seed=0
        )
        with np.errstate(over="ignore"):
            bg = splitmix64(th[:-1] * _BIGRAM_SALT ^ th[1:])
        f = np.concatenate([th, bg])
        return (f % np.uint64(n_buckets)).astype(np.int64)

    cnt_all = np.zeros(n_buckets, np.int64)
    cnt_t = np.zeros(n_buckets, np.int64)
    per_doc = []
    for t, lg in zip(texts, langs):
        f = feats(t)
        per_doc.append(f)
        cnt_all += np.bincount(f, minlength=n_buckets)
        if lg == target:
            cnt_t += np.bincount(f, minlength=n_buckets)
    lr = (
        np.log(cnt_t + 0.5)
        - np.log(cnt_t.sum() + 0.5 * n_buckets)
        - np.log(cnt_all + 0.5)
        + np.log(cnt_all.sum() + 0.5 * n_buckets)
    )
    return [
        (len(f), int(np.round(lr[f].mean() * 1e6)) if len(f) else 0)
        for f in per_doc
    ]


def test_dsir_matches_reference_and_prefers_target(ray_session):
    import ray

    from deduplicatr_ray.stages.dsir import dsir_weights

    rng = np.random.default_rng(7)
    en_vocab = [f"en{i}" for i in range(30)]
    zz_vocab = [f"zz{i}" for i in range(30)]
    texts, langs = [], []
    for i in range(24):
        vocab = en_vocab if i % 2 == 0 else zz_vocab
        texts.append(" ".join(rng.choice(vocab, size=40)))
        langs.append("en" if i % 2 == 0 else "zz")
    texts += ["", None]
    langs += ["en", "zz"]

    out = (
        dsir_weights(
            ray.data.from_arrow(_docs(texts, lang=langs)),
            target_col="lang",
            target_value="en",
            n_buckets=1 << 10,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = _dsir_reference(texts, langs, "en", 1 << 10)
    assert out.n_features.tolist() == [w[0] for w in want]
    assert out.dsir_logw_micro.tolist() == [w[1] for w in want]
    # every en doc must outscore every zz doc (disjoint vocabularies)
    en_scores = out.dsir_logw_micro[
        [i for i in range(24) if langs[i] == "en"]
    ]
    zz_scores = out.dsir_logw_micro[
        [i for i in range(24) if langs[i] == "zz"]
    ]
    assert en_scores.min() > zz_scores.max()
    # empty/null docs score 0 with 0 features
    assert out.n_features.tolist()[-2:] == [0, 0]
    assert out.dsir_logw_micro.tolist()[-2:] == [0, 0]


def test_dsir_partition_invariance(ray_session):
    import ray

    from deduplicatr_ray.stages.dsir import dsir_fit, dsir_score

    texts = [f"tok{i % 5} tok{(i + 1) % 5} tok{i % 3}" for i in range(30)]
    langs = ["en" if i % 3 == 0 else "de" for i in range(30)]
    t = _docs(texts, lang=langs)
    lr1 = dsir_fit(ray.data.from_arrow(t), n_buckets=256)
    lr2 = dsir_fit(ray.data.from_arrow(t).repartition(7), n_buckets=256)
    np.testing.assert_array_equal(lr1, lr2)
    a = (
        dsir_score(ray.data.from_arrow(t), lr1)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        dsir_score(ray.data.from_arrow(t).repartition(11), lr1)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)


# ---------------------------------------------------------------------------
# dedup_tiers
# ---------------------------------------------------------------------------

def test_dedup_tiers_cascade_counts(ray_session):
    """Known-structure corpus: one exact dup (tier 1), one near dup
    (tier 2), one window-mosaic doc copying >50% of its spans from two
    earlier docs while staying far below the near-dup threshold (tier 3)."""
    import ray

    from deduplicatr_ray.pipelines.tiers import dedup_tiers

    rng = np.random.default_rng(11)

    def words(n, salt):
        return [f"w{salt}{rng.integers(0, 10**9)}" for _ in range(n)]

    a = words(100, "a")
    e = words(100, "e")
    b = list(a)
    b[10], b[60] = "subst one", "subst two"  # near dup of a (J ~ 0.8+)
    # mosaic: 75 tokens of a + 75 of e + 50 unique -> 6/8 windows dup,
    # Jaccard vs either source ~ 0.33 (below the near-dup margin)
    c = a[:75] + e[:75] + words(50, "c")
    texts = [
        " ".join(a),       # 0
        " ".join(b),       # 1 near dup of 0
        " ".join(e),       # 2
        " ".join(e),       # 3 exact dup of 2
        " ".join(c),       # 4 window mosaic of 0 + 2
        " ".join(words(80, "g")),  # 5 unique
    ]
    langs = ["en"] * len(texts)
    out = (
        dedup_tiers(ray.data.from_arrow(_docs(texts, lang=langs)))
        .to_pandas()
        .set_index("tier")
    )
    assert out.loc["1_exact"].tolist() == [6, 1, 5]
    assert out.loc["2_near"].tolist() == [5, 1, 4]
    assert out.loc["3_window"].tolist() == [4, 1, 3]
    # conservation: docs_out of tier t == docs_in of tier t+1
    assert out.docs_out.tolist()[:2] == out.docs_in.tolist()[1:]


# ---------------------------------------------------------------------------
# dedup_against
# ---------------------------------------------------------------------------

def test_dedup_against_cross_corpus_flags(ray_session):
    """New docs: exact copy of existing -> 1, near copy -> 1, unique -> 0;
    near dups WITHIN the new corpus are NOT flagged (against-only)."""
    import ray

    from deduplicatr_ray.pipelines.against import dedup_against

    rng = np.random.default_rng(3)

    def words(n, salt):
        return [f"w{salt}{rng.integers(0, 10**9)}" for _ in range(n)]

    a = words(100, "a")
    existing = _docs([" ".join(a), " ".join(words(100, "e"))])
    near_a = list(a)
    near_a[5], near_a[50] = "sub one", "sub two"
    fresh = words(90, "f")
    fresh_near = list(fresh)
    fresh_near[7] = "tweak"
    new = _docs(
        [
            " ".join(a),          # 0 exact dup of existing
            " ".join(near_a),     # 1 near dup of existing
            " ".join(fresh),      # 2 unique vs existing...
            " ".join(fresh_near), # 3 ...near dup of 2 (within-new only)
        ]
    )
    out = (
        dedup_against(ray.data.from_arrow(new), ray.data.from_arrow(existing))
        .to_pandas()
        .sort_values("doc_id")
    )
    assert out.doc_id.tolist() == [0, 1, 2, 3]
    assert out.dup_against.tolist() == [1, 1, 0, 0]


def test_paragraph_dedup_randomized_vs_reference(ray_session):
    """Seeded random corpora (shared paragraph pool, empty/short paras,
    null docs) match the pure-Python keep-first reference exactly."""
    import ray

    from deduplicatr_ray.stages.paradedup import paragraph_dedup

    for seed in (0, 1, 2):
        rng = np.random.default_rng(seed)
        pool = [f"shared paragraph {i} with body" for i in range(12)]
        pool += ["", "ab", "x"]  # short / empty candidates
        texts = []
        for _ in range(60):
            if rng.random() < 0.05:
                texts.append(None)
                continue
            k = int(rng.integers(1, 8))
            texts.append(
                "\n".join(pool[int(rng.integers(0, len(pool)))] for _ in range(k))
            )
        out = (
            paragraph_dedup(
                ray.data.from_arrow(_docs(texts)).repartition(
                    int(rng.integers(1, 9))
                ),
                min_chars=3,
            )
            .to_pandas()
            .sort_values("doc_id")
            .set_index("doc_id")
        )
        want = _para_reference(texts, 3)
        assert len(out) == len(texts), seed
        for doc_id, exp in want.items():
            row = out.loc[doc_id]
            assert (row.n_paras, row.n_kept, row.kept_chars) == exp, (
                seed,
                doc_id,
            )


def test_paragraph_scrub_matches_reference_and_idempotent(ray_session):
    """clean_text = kept-first paragraphs rejoined in order; a second
    scrub over the output removes nothing."""
    import ray

    from deduplicatr_ray.stages.paradedup import paragraph_scrub

    def scrub_ref(texts, min_chars):
        seen: set[str] = set()
        out = []
        for t in texts:
            kept, removed = [], 0
            paras = (t or "").split("\n")
            for p in paras:
                if len(p) < min_chars:
                    kept.append(p)
                elif p not in seen:
                    seen.add(p)
                    kept.append(p)
                else:
                    removed += 1
            out.append(("\n".join(kept), len(paras), removed))
        return out

    out = (
        paragraph_scrub(ray.data.from_arrow(_docs(TEXTS)), min_chars=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = scrub_ref(TEXTS, 3)
    assert out.clean_text.tolist() == [w[0] for w in want]
    assert out.n_paras.tolist() == [w[1] for w in want]
    assert out.n_removed.tolist() == [w[2] for w in want]

    again = (
        paragraph_scrub(
            ray.data.from_arrow(
                pa.table(
                    {
                        "doc_id": pa.array(out.doc_id, pa.int64()),
                        "text": pa.array(out.clean_text, pa.string()),
                    }
                )
            ),
            min_chars=3,
        )
        .to_pandas()
    )
    assert int(again.n_removed.sum()) == 0


def test_paragraph_scrub_broadcast_equals_shuffle_tail(ray_session):
    """The two cut tails (broadcast sliver vs union-tag partition join)
    produce identical output; ``broadcast_budget=0`` forces the shuffle
    fallback, the default takes the broadcast path on this corpus."""
    import ray

    from deduplicatr_ray.stages.paradedup import paragraph_scrub

    rng = np.random.Generator(np.random.PCG64(11))
    pool = [f"paragraph number {i} with some body" for i in range(40)]
    texts = [
        "\n".join(
            pool[j] for j in rng.choice(len(pool), size=rng.integers(1, 9))
        )
        for _ in range(120)
    ] + [None, "", "sh\nsh\nsh"]

    def run(budget):
        return (
            paragraph_scrub(
                ray.data.from_arrow(_docs(texts)),
                min_chars=3,
                broadcast_budget=budget,
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    bcast, shuffle = run(None), run(0)
    assert bcast.equals(shuffle)
    assert int(bcast.n_removed.sum()) > 0  # corpus actually has dups
