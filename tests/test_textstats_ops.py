"""Corpus-level text ops (stages/textstats.py): top_tokens vocabulary head."""

from __future__ import annotations

import pyarrow as pa

from deduplicatr_ray.stages.textstats import token_doc_freq, top_tokens


def _docs(texts):
    return pa.table({"text": pa.array(texts, pa.string())})


def _docs_ids(texts):
    return pa.table(
        {
            "doc_id": pa.array(list(range(1, len(texts) + 1)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


def test_top_tokens_counts_and_tie_order(ray_session):
    import ray

    ds = ray.data.from_arrow(
        _docs(["b a a", "A b! c", "zz-a", ""])
    )
    out = top_tokens(ds, k=3).to_pandas()
    # counts: a=4 (one is 'A' lowered), b=2, c=1, zz=1 -> tie c<zz
    assert out["token"].tolist() == ["a", "b", "c"]
    assert out["n"].tolist() == [4, 2, 1]


def test_token_doc_freq_counts_docs_not_occurrences(ray_session):
    import ray

    # "a" appears 3x in doc1 but df counts docs: a->2, b->2, c->1
    ds = ray.data.from_arrow(_docs_ids(["a a a b", "b a", "c"]))
    out = token_doc_freq(ds, k=10).to_pandas()
    assert out["token"].tolist() == ["a", "b", "c"]
    assert out["df"].tolist() == [2, 2, 1]


def test_top_tokens_k_exceeds_vocab_and_punct_only(ray_session):
    import ray

    ds = ray.data.from_arrow(_docs(["!!!", "x"]))
    out = top_tokens(ds, k=10).to_pandas()
    assert out["token"].tolist() == ["x"]
    assert out["n"].tolist() == [1]
