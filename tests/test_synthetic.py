"""Fixture-generator invariants (FIXTURES.md §§1-2)."""

from __future__ import annotations

import numpy as np
import pyarrow.compute as pc
import pytest

from deduplicatr_ray.sources.synthetic import gen_corpus


@pytest.mark.parametrize("name", ["exact", "near", "boiler", "mixed", "edge"])
def test_corpus_deterministic_and_well_formed(name):
    p1, t1 = gen_corpus(name)
    p2, t2 = gen_corpus(name)
    assert p1.equals(p2) and t1.equals(t2)  # seeded determinism
    assert p1.schema.names == ["url", "warc_ts", "html", "text", "lang"]
    # never both html and text null
    both_null = pc.and_(pc.is_null(p1["html"]), pc.is_null(p1["text"]))
    assert pc.sum(pc.cast(both_null, "int64")).as_py() == 0
    # urls unique
    assert len(set(p1["url"].to_pylist())) == len(p1)
    # truth pairs ordered url_a < url_b
    for a, b in zip(t1["url_a"].to_pylist(), t1["url_b"].to_pylist()):
        assert a < b


def test_exact_corpus_truth_all_jaccard_one():
    _, truth = gen_corpus("exact")
    assert len(truth) > 0
    assert (np.array(truth["jaccard_true"].to_pylist()) == 1.0).all()


def test_near_corpus_truth_mostly_above_threshold():
    _, truth = gen_corpus("near")
    j = np.array(truth["jaccard_true"].to_pylist())
    assert len(j) > 0
    assert (j >= 0.7).mean() > 0.8  # contiguous-span edits keep Jaccard high


def test_boiler_duplicated_bodies_above_threshold():
    _, truth = gen_corpus("boiler")
    j = np.array(truth["jaccard_true"].to_pylist())
    assert (j >= 0.7).mean() > 0.9


def test_corpus_sizes():
    assert len(gen_corpus("exact")[0]) == 300
    assert len(gen_corpus("near")[0]) == 300
    assert len(gen_corpus("boiler")[0]) == 300
    assert len(gen_corpus("mixed")[0]) == 1000
    assert len(gen_corpus("edge")[0]) == 50
