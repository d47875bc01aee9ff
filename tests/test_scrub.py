"""Span-level duplicate removal (stages/scrub.py): keep-first semantics,
long-span reconstruction, within-doc repeats, idempotence."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _run(ds_tbl, **kw):
    import ray

    from deduplicatr_ray.stages.scrub import scrub_spans

    out = (
        scrub_spans(ray.data.from_arrow(ds_tbl), **kw)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return out


def _mk(texts):
    return pa.table(
        {
            "doc_id": pa.array(list(range(1, len(texts) + 1)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


SHARED = "x" * 21 + "the quick brown fox jumps over the lazy dog again"  # 70 B
UNIQ1 = "A" * 40
UNIQ2 = "B" * 40
UNIQ3 = "every word here is entirely unique and never repeated at all"


def test_scrub_keeps_first_occurrence(ray_session):
    out = _run(_mk([UNIQ1 + SHARED + UNIQ2, UNIQ2 + SHARED + UNIQ1, UNIQ3]))
    # doc 1 is the earlier occurrence: untouched
    assert out.loc[0, "n_spans"] == 0
    assert out.loc[0, "text"] == UNIQ1 + SHARED + UNIQ2
    # doc 2 loses (at least the guarantee-covered core of) the shared run
    assert out.loc[1, "n_spans"] >= 1
    assert out.loc[1, "n_bytes_removed"] >= 50
    assert SHARED not in out.loc[1, "text"]
    # untouched unique doc
    assert out.loc[2, "text"] == UNIQ3
    assert out.loc[2, "n_spans"] == 0


def test_scrub_long_span_reconstructed(ray_session):
    """A 200-byte duplicate region is recovered (within min_len slack at
    the edges) by merging per-suffix run marks."""
    # 200+ bytes with NO internal repeats (distinct numbered words)
    long_shared = " ".join(f"tok{i:03d}word{i*7%97:02d}" for i in range(18))
    assert len(long_shared) >= 200
    out = _run(_mk([long_shared + UNIQ1, UNIQ2 + long_shared]))
    assert out.loc[0, "n_bytes_removed"] == 0
    assert out.loc[1, "n_bytes_removed"] >= len(long_shared) - 50
    assert long_shared not in out.loc[1, "text"]


def test_scrub_within_doc_repeat(ray_session):
    """The second occurrence INSIDE one doc is scrubbed, the first kept."""
    doc = SHARED + UNIQ1 + SHARED
    out = _run(_mk([doc, UNIQ3]))
    t = out.loc[0, "text"]
    assert t.startswith(SHARED)  # first occurrence intact
    assert t.count(SHARED) == 1
    assert out.loc[0, "n_bytes_removed"] >= 50


def test_scrub_idempotent(ray_session):
    """Scrubbing an already-scrubbed corpus changes nothing."""
    import ray

    from deduplicatr_ray.stages.scrub import scrub_spans

    first = _run(_mk([UNIQ1 + SHARED + UNIQ2, UNIQ2 + SHARED + UNIQ1, UNIQ3]))
    again = (
        scrub_spans(
            ray.data.from_arrow(
                pa.table(
                    {
                        "doc_id": pa.array(first["doc_id"], pa.int64()),
                        "text": pa.array(first["text"], pa.string()),
                    }
                )
            )
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert (again["n_spans"] == 0).all()
    assert again["text"].tolist() == first["text"].tolist()


def test_scrub_broadcast_equals_shuffle_tail(ray_session):
    """The broadcast cut (default on small span slivers) and the union-tag
    co-partition join (forced via ``broadcast_budget=0``) are identical on
    a randomized dup-heavy corpus."""
    rng = np.random.Generator(np.random.PCG64(41))
    chunks = [
        "".join(rng.choice(list("abcdefgh "), size=60)) for _ in range(12)
    ]
    texts = [
        "".join(chunks[j] for j in rng.choice(12, size=rng.integers(1, 5)))
        for _ in range(60)
    ]
    tbl = _mk(texts)
    bcast = _run(tbl)
    shuffle = _run(tbl, broadcast_budget=0)
    assert bcast.equals(shuffle)
    assert int(bcast.n_spans.sum()) > 0


def test_scrub_all_identical_corpus(ray_session):
    """60 identical docs: the smallest doc_id keeps its text, every other
    copy is scrubbed down by at least len-min_len bytes (exercises the
    vectorized giant-run path: one run per shared position)."""
    body = "w" + " ".join(f"q{i:02d}" for i in range(40))  # ~160 B, no repeats
    out = _run(_mk([body] * 60))
    assert out.loc[0, "n_bytes_removed"] == 0
    assert out.loc[0, "text"] == body
    rest = out.iloc[1:]
    assert (rest["n_bytes_removed"] >= len(body) - 50).all()
    assert (rest["n_spans"] >= 1).all()


def test_scrub_span_edge_mid_codepoint(ray_session):
    """A byte-level match ending mid-codepoint must snap to a boundary
    and still produce valid text (previously UnicodeDecodeError)."""
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(
                ["k" * 50 + "é" + "111", "qq" + "k" * 50 + "è" + "222"],
                pa.string(),
            ),
        }
    )
    out = _run(docs)
    # doc 1 untouched; doc 2 loses the k-run, keeps its è intact
    assert out.loc[0, "text"] == "k" * 50 + "é" + "111"
    assert out.loc[1, "n_bytes_removed"] >= 50
    assert "è" in out.loc[1, "text"]
    assert "k" * 50 not in out.loc[1, "text"]


def test_prefilter_routing_matches_full_fanout(ray_session):
    """The repeated-fingerprint routing prefilter must not change the
    scrubbed output on a mixed corpus (cross-doc dups, within-doc repeat,
    unique docs, empty doc)."""
    import pyarrow as pa
    import ray

    from deduplicatr_ray.stages.scrub import scrub_spans

    base = (
        "the quick brown fox jumps over the lazy dog while the band plays "
        "a very long tune about rivers and mountains and distant cities"
    )
    texts = [
        base + " tail one",
        "prefix junk " + base,                      # shares >=50B with doc 0
        "self " + base[:60] + " filler " + base[:60],  # within-doc repeat
        "completely unique text with nothing shared at all anywhere here today",
        "",
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    a = (
        scrub_spans(ray.data.from_arrow(tbl), num_partitions=8, prefilter=False)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        scrub_spans(ray.data.from_arrow(tbl), num_partitions=8, prefilter=True)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)
    assert b.loc[1, "n_spans"] >= 1        # cross-doc dup scrubbed
    assert b.loc[2, "n_spans"] >= 1        # within-doc repeat scrubbed
    assert b.loc[3, "n_bytes_removed"] == 0


def test_prefilter_all_unique_routes_nothing(ray_session):
    """A fully unique corpus must route ZERO text into the SA shuffle (the
    prefilter's whole point) and still emit every doc untouched."""
    import pyarrow as pa
    import ray

    from deduplicatr_ray.stages.scrub import scrub_amplification, scrub_spans

    # every token carries the doc index, so no 25-char window repeats
    # anywhere in the corpus (a shared template phrase would legitimately
    # route: repeated fingerprint VALUES below the 50-byte guarantee are a
    # harmless superset the prefilter keeps)
    texts = [
        " ".join(f"word{i}x{j}q" for j in range(12)) for i in range(40)
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(list(range(40)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    amp = scrub_amplification(ray.data.from_arrow(tbl), num_partitions=8)
    assert amp["routed_bytes"] == 0
    assert amp["amplification"] == 0.0
    out = (
        scrub_spans(ray.data.from_arrow(tbl), num_partitions=8)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert len(out) == 40
    assert (out["n_spans"] == 0).all()
    assert out["text"].tolist() == texts


def test_prefilter_periodic_within_doc_repeats(ray_session):
    """Regression (review finding): periodic/adjacent self-repeats
    ('a'*200, 'ab'*100, 'xyz '*60) collapse to ONE windowed-min run, so a
    run-count multiplicity missed them — occurrence counts in the raw
    rolling-hash stream must route them, and the prefiltered scrub must
    match full fanout exactly."""
    import pyarrow as pa
    import ray

    from deduplicatr_ray.stages.scrub import scrub_spans

    texts = [
        "a" * 200,
        "ab" * 100,
        "xyz " * 60,
        "one ordinary unique sentence with no internal repetition at all",
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    full = (
        scrub_spans(ray.data.from_arrow(tbl), num_partitions=4, prefilter=False)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pre = (
        scrub_spans(ray.data.from_arrow(tbl), num_partitions=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert full.equals(pre)
    assert (pre.loc[:2, "n_bytes_removed"] > 0).all()  # periodic docs scrubbed
    assert pre.loc[3, "n_bytes_removed"] == 0


def test_prefilter_min_len_guard(ray_session):
    """Explicit prefilter=True below the guarantee raises; the default
    auto-disables (full fanout) and still finds sub-guarantee spans."""
    import pyarrow as pa
    import pytest
    import ray

    from deduplicatr_ray.stages.scrub import scrub_spans

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(
                [
                    "shared thirty byte run here!! plus tail one",
                    "prefix two shared thirty byte run here!!",
                ],
                pa.string(),
            ),
        }
    )
    with pytest.raises(ValueError):
        scrub_spans(
            ray.data.from_arrow(tbl), min_len=30, prefilter=True, num_partitions=4
        )
    # default auto-disables the prefilter below the guarantee: identical
    # to explicit full fanout (sub-guarantee spans are only found via
    # coincidental co-location, so equivalence — not recall — is the
    # contract here)
    auto = (
        scrub_spans(ray.data.from_arrow(tbl), min_len=30, num_partitions=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    full = (
        scrub_spans(
            ray.data.from_arrow(tbl),
            min_len=30,
            num_partitions=4,
            prefilter=False,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert auto.equals(full)
