"""Corpus-level text ops (stages/textstats.py): top_tokens vocabulary head."""

from __future__ import annotations

import numpy as np
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


def test_doc_tfidf_scores_and_ranks(ray_session):
    import math

    import ray

    from deduplicatr_ray.stages.textstats import doc_tfidf_top_terms

    # 4 docs; "common" is in all 4 (idf = ln(1) = 0), each doc has one
    # distinctive token that must outrank it
    texts = [
        "common apple apple",
        "common banana",
        "common cherry cherry cherry",
        "common date",
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    out = (
        doc_tfidf_top_terms(ds, k=2)
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    # every doc: rank 1 = its distinctive token, rank 2 = common (tfidf 0)
    top1 = out[out["rank"] == 1].set_index("doc_id")["token"]
    assert top1.to_dict() == {1: "apple", 2: "banana", 3: "cherry", 4: "date"}
    top2 = out[out["rank"] == 2]
    assert set(top2["token"]) == {"common"}
    assert (top2["tfidf"] == 0.0).all()
    # exact score: tf * ln(N/df), libm log
    cherry = out[(out["doc_id"] == 3) & (out["token"] == "cherry")].iloc[0]
    assert cherry["tf"] == 3
    assert cherry["tfidf"] == 3.0 * math.log(4 / 1)


def test_doc_tfidf_k_exceeds_doc_vocab(ray_session):
    import ray

    from deduplicatr_ray.stages.textstats import doc_tfidf_top_terms

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(["solo", "alpha beta"], pa.string()),
            }
        )
    )
    out = doc_tfidf_top_terms(ds, k=5).to_pandas()
    # doc 1 has one token -> one row; doc 2 -> two rows, ties by token asc
    assert len(out[out["doc_id"] == 1]) == 1
    d2 = out[out["doc_id"] == 2].sort_values("rank")
    assert d2["token"].tolist() == ["alpha", "beta"]


def test_mg_trim_lower_bounds_and_survival():
    """Misra-Gries trim: counts drop by exactly the (capacity+1)-th largest,
    survivors are the heavy counters, every kept count is a lower bound."""
    import numpy as np

    from deduplicatr_ray.stages.textstats import mg_trim

    toks = pa.array(["a", "b", "c", "d"])
    counts = np.array([5, 3, 1, 1], np.int64)
    out = mg_trim(toks, counts, capacity=2)
    got = dict(zip(out["token"].to_pylist(), out["cnt"].to_pylist()))
    assert got == {"a": 4, "b": 2}  # threshold = 3rd largest = 1
    # no trim when within capacity
    out2 = mg_trim(toks, counts, capacity=4)
    assert dict(zip(out2["token"].to_pylist(), out2["cnt"].to_pylist())) == {
        "a": 5, "b": 3, "c": 1, "d": 1
    }


def test_heavy_tokens_exact_when_capacity_suffices(ray_session):
    import ray

    from deduplicatr_ray.stages.textstats import heavy_tokens, top_tokens

    docs = pa.table(
        {
            "text": pa.array(
                ["apple apple banana", "apple cherry", "banana apple date"] * 10,
                pa.string(),
            )
        }
    )
    ds = ray.data.from_arrow(docs)
    exact = top_tokens(ds, k=4).to_pandas()
    approx = heavy_tokens(ds, k=4).to_pandas().rename(columns={})
    assert approx["token"].tolist() == exact["token"].tolist()
    assert approx["n"].tolist() == exact["n"].tolist()
    # tiny capacity: the dominant token still surfaces with a lower-bound count
    tiny = heavy_tokens(ds, k=1, capacity=1).to_pandas()
    assert tiny["token"].tolist() == ["apple"]
    assert 0 < tiny["n"].iloc[0] <= exact.set_index("token")["n"]["apple"]


def test_pii_stats_counts_and_duckdb_parity(ray_session):
    """Crafted strings with REAL matches: counts are exact and identical
    under pyarrow's RE2 kernel and DuckDB's regexp_extract_all (the
    corpus oracle only exercises the all-zeros case)."""
    import duckdb
    import ray.data as rd

    from deduplicatr_ray.stages.textstats import PII_PATTERNS, pii_stats

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    "mail a@b.co and c.d@e.org, call +1 (555) 123 4567",
                    "server at 10.0.0.1 and 192.168.1.254",
                    "no pii here at all",
                    "x@y.io x@y.io x@y.io",
                ]
            ),
        }
    )
    got = pii_stats(rd.from_arrow(t)).to_pandas().sort_values("doc_id")
    assert got["n_emails"].tolist() == [2, 0, 0, 3]
    assert got["n_phones"].tolist() == [1, 0, 0, 0]
    assert got["n_ipv4"].tolist() == [0, 2, 0, 0]
    assert got["has_pii"].tolist() == [True, True, False, True]

    con = duckdb.connect()
    con.register("docs", t.to_pandas())
    for name, pat in PII_PATTERNS.items():
        want = con.execute(
            f"SELECT len(regexp_extract_all(text, '{pat}')) FROM docs ORDER BY doc_id"
        ).df().iloc[:, 0].tolist()
        assert got[name].tolist() == want, name


def test_charlm_orders_gibberish_after_real_text(ray_session):
    """The trigram LM must score in-distribution text strictly better
    (fewer bits/char) than character gibberish, deterministically; docs
    with < 3 usable chars get null."""
    import ray.data as rd

    from deduplicatr_ray.stages.textstats import (
        charlm_quality,
        charlm_score_stage,
        charlm_train,
    )

    words = ["the", "quick", "brown", "fox", "jumps", "over", "lazy", "dogs"]
    rng = np.random.Generator(np.random.PCG64(21))
    corpus = [
        " ".join(rng.choice(words, 40).tolist()) for _ in range(64)
    ]
    docs = pa.table(
        {
            "doc_id": pa.array(list(range(64)), pa.int64()),
            "text": pa.array(corpus),
        }
    )
    ds = rd.from_arrow(docs)
    lp, cd = charlm_train(ds, sample_mod=1)
    probe = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(
                ["the quick brown fox jumps over lazy dogs", "zqxvj wkpf zzj qqv xjz", "ab"]
            ),
        }
    )
    out = (
        charlm_score_stage(rd.from_arrow(probe), lp, cd)
        .to_pandas().sort_values("doc_id")
    )
    assert out.bits_per_char.iloc[0] < out.bits_per_char.iloc[1]
    assert np.isnan(out.bits_per_char.iloc[2])
    # determinism across runs
    again = charlm_quality(ds, sample_mod=1).to_pandas().sort_values("doc_id")
    once = charlm_quality(ds, sample_mod=1).to_pandas().sort_values("doc_id")
    assert np.allclose(again.bits_per_char, once.bits_per_char)


def test_word_repetition_hand_computed(ray_session):
    import ray

    from deduplicatr_ray.stages.textstats import word_repetition_stage

    # doc1: 6 tokens, 3 distinct (a x3, b x2, c x1); top bigram "a a" x2
    # doc2: 1 token; doc3: empty
    ds = ray.data.from_arrow(
        _docs_ids(["a a a b b c", "solo", "!!!"])
    )
    out = (
        word_repetition_stage(ds)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["n_tokens"].tolist() == [6, 1, 0]
    assert out["n_distinct"].tolist() == [3, 1, 0]
    assert out["dup_token_frac"].tolist() == [1.0 - 3 / 6, 0.0, 0.0]
    assert out["top_token_frac"].tolist() == [3 / 6, 1.0, 0.0]
    # bigrams of doc1: "a a","a a","a b","b b","b c" -> max 2 of 5
    assert out["top_bigram_frac"].tolist() == [2 / 5, 0.0, 0.0]


def test_decontaminate_seeded_13gram_overlap(ray_session):
    import ray

    from deduplicatr_ray.stages.textstats import decontaminate

    run = " ".join(f"w{i}" for i in range(13))  # the shared 13-gram
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "source": pa.array(["train", "train", "train", "zeval"], pa.string()),
            "text": pa.array(
                [
                    f"prefix {run} suffix",       # 1 hit? shifted grams differ
                    "totally unrelated words here " * 5,
                    f"{run} and {run}",           # same gram twice -> 1 distinct
                    f"eval doc contains {run} once",
                ],
                pa.string(),
            ),
        }
    )
    out = decontaminate(
        ray.data.from_arrow(docs), eval_source="zeval"
    ).to_pandas()
    # docs 1 and 3 share the exact 13-gram with the eval doc; doc 2 clean.
    # grams overlapping the prefix/suffix boundaries differ, so only the
    # pure run matches; doc3's two copies dedupe to one distinct hit
    assert out["doc_id"].tolist() == [1, 3]
    assert out["n_hits"].tolist() == [1, 1]


def test_substring_pairs_exact_known_50char_overlap(ray_session):
    import ray

    from deduplicatr_ray.stages.textstats import suffix_array_pairs

    shared = "x" * 21 + "the quick brown fox jumps over the lazy dog again"  # 70 chars
    assert len(shared) == 70
    docs = pa.table(
        {
            "doc_id": pa.array([10, 20, 30], pa.int64()),
            "text": pa.array(
                [
                    "A" * 30 + shared + "B" * 30,
                    "C" * 11 + shared[:55] + "D" * 44,  # 55-char overlap with doc10
                    "no overlap with anything else at all, short and unique",
                ],
                pa.string(),
            ),
        }
    )
    out = suffix_array_pairs(
        ray.data.from_arrow(docs),
        min_len=50,
        guarantee_len=50,
        group_cap=1_000_000,
    ).to_pandas()
    assert out[["id_a", "id_b"]].values.tolist() == [[10, 20]]
    assert int(out["lcs_len"][0]) >= 50


def test_quality_filter_first_failing_rule(ray_session):
    import ray

    from deduplicatr_ray.stages.textstats import quality_filter_stage

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    "short doc",                              # too_short (2 toks)
                    "rep rep rep rep rep " * 5,               # 25 toks, all dup ->
                    # dup_frac 24/25=0.96 AND top_frac 1.0; first rule wins
                    " ".join(f"u{i}" for i in range(30)),     # 30 distinct -> ok
                    " ".join(["hot"] * 6 + [f"v{i}" for i in range(24)]),
                    # 30 toks, dup=(30-25)/30=0.167<0.6, top=6/30=0.2>0.15
                ],
                pa.string(),
            ),
        }
    )
    out = (
        quality_filter_stage(ray.data.from_arrow(docs))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["reason"].tolist() == ["too_short", "repetitive", "ok", "top_heavy"]
    assert out["keep"].tolist() == [False, False, True, False]


def test_token_chunk_layout_and_bucket_invariance(ray_session):
    import ray

    from deduplicatr_ray.stages.pack import token_chunk_stage

    # chunk size 8: doc1 has 5 toks [0,5), doc2 has 6 toks [5,11) spanning
    # chunks 0-1, doc3 empty at offset 11, doc4 has 7 toks [11,18) chunks 1-2
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    "a b c d e",
                    "f g h i j k",
                    "!!!",
                    "l m n o p q r",
                ],
                pa.string(),
            ),
        }
    )
    out = (
        token_chunk_stage(ray.data.from_arrow(docs), chunk_tokens=8)
        .to_pandas()
        .sort_values("doc_id")  # the stage is deliberately unsorted
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [1, 2, 3, 4]
    assert out["n_tokens"].tolist() == [5, 6, 0, 7]
    assert out["start_offset"].tolist() == [0, 5, 11, 11]
    assert out["first_chunk"].tolist() == [0, 0, 1, 1]
    assert out["last_chunk"].tolist() == [0, 1, 1, 2]

    # a 1-wide id bucket forces the multi-bucket scan path; offsets are
    # defined by doc_id order, so the layout must be identical
    out2 = (
        token_chunk_stage(ray.data.from_arrow(docs), chunk_tokens=8, id_bucket=1)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out2.equals(out)


def test_token_chunks_all_empty_docs(ray_session):
    import ray

    from deduplicatr_ray.stages.pack import token_chunk_stage

    out = (
        token_chunk_stage(
            ray.data.from_arrow(_docs_ids(["", "!!!", ""]))
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["n_tokens"].tolist() == [0, 0, 0]
    assert out["start_offset"].tolist() == [0, 0, 0]
    assert out["first_chunk"].tolist() == out["last_chunk"].tolist() == [0, 0, 0]


def test_decontaminate_bloom_equals_exact(ray_session):
    """The bloom prefilter is results-invariant: same rows as the exact
    broadcast path, even with a TINY bitmap that forces a high FP rate
    through the exact confirmation join."""
    import ray

    from deduplicatr_ray.stages.textstats import decontaminate, decontaminate_bloom

    run = " ".join(f"w{i}" for i in range(13))
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "source": pa.array(["train", "train", "train", "zeval"], pa.string()),
            "text": pa.array(
                [
                    f"prefix {run} suffix",
                    "totally unrelated words here " * 5,
                    f"{run} and {run}",
                    f"eval doc contains {run} once",
                ],
                pa.string(),
            ),
        }
    )
    ds = ray.data.from_arrow(docs)
    exact = (
        decontaminate(ds, eval_source="zeval")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for n_bits in (1 << 20, 64):  # 64 bits ~ everything collides
        got = (
            decontaminate_bloom(ds, eval_source="zeval", n_bits=n_bits)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert got.equals(exact), n_bits


def test_decontaminate_bloom_clean_corpus(ray_session):
    """No contamination: the empty-result guard returns a typed empty."""
    import ray

    from deduplicatr_ray.stages.textstats import decontaminate_bloom

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "source": pa.array(["train", "zeval"], pa.string()),
            "text": pa.array(
                [" ".join(f"a{i}" for i in range(20)),
                 " ".join(f"b{i}" for i in range(20))],
                pa.string(),
            ),
        }
    )
    ds = decontaminate_bloom(ray.data.from_arrow(docs), eval_source="zeval")
    assert ds.count() == 0
    # NB: Dataset.to_pandas() drops columns for empty datasets (Ray
    # behavior), so assert the schema on the Dataset itself
    assert sorted(ds.schema().names) == ["doc_id", "n_hits"]


def test_dup_rate_by_source_cross_batch_dedup(ray_session):
    """The same text split across batches must still count as ONE unique
    (the combining groupby, not per-batch state, does the dedup)."""
    import ray

    from deduplicatr_ray.stages.textstats import dup_rate_by_source

    docs = pa.table(
        {
            "doc_id": pa.array(list(range(8)), pa.int64()),
            "source": pa.array(["a"] * 4 + ["b"] * 4, pa.string()),
            "text": pa.array(
                ["same", "same", "x", "y", "same", "p", "q", "r"], pa.string()
            ),
        }
    )
    # 1-row blocks force cross-batch duplicates
    ds = ray.data.from_arrow(docs).repartition(8)
    out = (
        dup_rate_by_source(ds).to_pandas().sort_values("source").reset_index(drop=True)
    )
    assert out["n_docs"].tolist() == [4, 4]
    assert out["n_unique"].tolist() == [3, 4]
    assert out["dup_rate"].tolist() == [1.0 - 3 / 4.0, 0.0]


def test_token_chunks_shuffled_is_permutation(ray_session):
    """Shuffled packing: same total token volume and per-doc counts, a
    different (seed-determined) stream order, still densely packed."""
    import ray

    from deduplicatr_ray.stages.pack import token_chunk_stage

    docs = _docs_ids([f"w{i} " * (i + 1) for i in range(20)])
    plain = (
        token_chunk_stage(ray.data.from_arrow(docs), chunk_tokens=8)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    shuf = (
        token_chunk_stage(ray.data.from_arrow(docs), chunk_tokens=8, shuffle_seed=17)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert shuf["n_tokens"].tolist() == plain["n_tokens"].tolist()
    assert shuf["start_offset"].tolist() != plain["start_offset"].tolist()
    # dense packing in shuffled order: offsets sorted by stream position
    # tile the token count exactly
    s2 = shuf.sort_values("start_offset")
    assert (
        s2["start_offset"].values[1:]
        == (s2["start_offset"] + s2["n_tokens"]).values[:-1]
    ).all()
    # deterministic: same seed -> same layout
    again = (
        token_chunk_stage(ray.data.from_arrow(docs), chunk_tokens=8, shuffle_seed=17)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert again.equals(shuf)


def test_token_chunks_bpe_fixture_tokenizer(ray_session):
    """Tokenizer seam: the frozen-vocab BPE fixture counts subword merges
    (pinned golden), the layout stays a dense prefix sum over those counts,
    and the default path is unchanged by the seam's existence."""
    import ray

    from deduplicatr_ray.functions.tokenizers import BPETokenizer, bpe_fixture
    from deduplicatr_ray.stages.pack import token_chunk_stage

    # pinned merge-table goldens (computed once from BPE_FIXTURE_MERGES)
    tok = BPETokenizer()
    assert tok(
        ["the running theory", "ingestion pipeline concatenation", "a b c", ""]
    ).tolist() == [8, 18, 3, 0]

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    "the running theory",
                    "ingestion pipeline concatenation",
                    "a b c",
                    "",
                ],
                pa.string(),
            ),
        }
    )
    out = (
        token_chunk_stage(
            ray.data.from_arrow(docs), chunk_tokens=8, tokenizer=bpe_fixture
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["n_tokens"].tolist() == [8, 18, 3, 0]
    assert out["start_offset"].tolist() == [0, 8, 26, 29]
    assert out["first_chunk"].tolist() == [0, 1, 3, 3]
    assert out["last_chunk"].tolist() == [0, 3, 3, 3]

    # default path (regex lexer) is byte-identical with the seam in place
    plain = (
        token_chunk_stage(ray.data.from_arrow(docs), chunk_tokens=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert plain["n_tokens"].tolist() == [3, 3, 3, 0]


def test_token_chunks_external_merges_file(ray_session, tmp_path):
    """External-vocab seam (r3 verdict item 6): a user-supplied merges.txt
    (GPT-2/HF layout, comments + blank lines) loads through bpe_factory /
    DedupConfig.tokenizer_factory and drives packing counts that differ
    from both the fixture vocab and the regex lexer."""
    import ray
    import pytest

    from deduplicatr_ray.config import DedupConfig
    from deduplicatr_ray.functions.tokenizers import (
        BPETokenizer,
        bpe_factory,
        load_merges,
    )
    from deduplicatr_ray.stages.pack import token_chunk_stage

    merges_path = tmp_path / "merges.txt"
    merges_path.write_text(
        "#version: 0.2\n"
        "\n"
        "a b\n"          # "ab"
        "ab c\n"         # "abc"
        "x y\n"
    )
    merges = load_merges(str(merges_path))
    assert merges == (("a", "b"), ("ab", "c"), ("x", "y"))

    # hand-check: "abc" -> a b c -> ab c -> abc = 1 token; "xyz" -> xy z = 2;
    # under the FIXTURE vocab none of these merges exist (3 and 3).
    tok = BPETokenizer(merges)
    assert tok(["abc", "xyz"]).tolist() == [1, 2]
    assert BPETokenizer()(["abc", "xyz"]).tolist() == [3, 3]

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["abc xyz", "abc abc abc"], pa.string()),
        }
    )
    out = (
        token_chunk_stage(
            ray.data.from_arrow(docs),
            chunk_tokens=4,
            tokenizer=bpe_factory(str(merges_path)),
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["n_tokens"].tolist() == [3, 3]  # 1+2, 1+1+1
    assert out["start_offset"].tolist() == [0, 3]

    # the config carries the path (lineage hashes the vocab choice) and
    # hands back the same factory form the stage takes
    cfg = DedupConfig(tokenizer_merges_path=str(merges_path))
    assert cfg.config_hash() != DedupConfig().config_hash()
    fac = cfg.tokenizer_factory()
    assert fac().__call__(["abc"]).tolist() == [1]
    assert DedupConfig().tokenizer_factory() is None

    # strict parsing: malformed lines and empty tables raise
    bad = tmp_path / "bad.txt"
    bad.write_text("a b c\n")
    with pytest.raises(ValueError, match="expected 'left right'"):
        load_merges(str(bad))
    empty = tmp_path / "empty.txt"
    empty.write_text("#only a header\n")
    with pytest.raises(ValueError, match="no merge pairs"):
        load_merges(str(empty))


def test_window_dedup_keep_first_semantics(ray_session):
    """Hand-built corpus, window=3: within-doc repeats, cross-doc repeats,
    and partial final windows all resolve to keep-first-(doc_id, win_idx)."""
    import ray

    from deduplicatr_ray.stages.textstats import window_dedup_stage

    docs = [
        "a b c a b c d",   # doc1: wins [a b c] [a b c] [d] -> self-dup
        "a b c x",         # doc2: [a b c] dups doc1's win0; [x] unique
        "d",               # doc3: [d] dups doc1's win2
        "",                # doc4: no tokens -> absent from output
    ]
    ds = ray.data.from_arrow(_docs_ids(docs))
    out = (
        window_dedup_stage(ds, window=3, num_partitions=4)
        .to_pandas()
        .sort_values("doc_id")
        .set_index("doc_id")
    )
    assert out.index.tolist() == [1, 2, 3]
    # doc1 owns the first occurrence of every one of its windows
    assert out.loc[1].tolist() == [3, 1, 7, 4]  # [a b c] repeat dropped
    assert out.loc[2].tolist() == [2, 1, 4, 1]  # [a b c] dup, [x] kept
    assert out.loc[3].tolist() == [1, 1, 1, 0]  # [d] dup of doc1 win2
    # conservation: kept + dropped token counts partition the total
    assert (out["tokens_kept"] <= out["tokens_total"]).all()
    assert ((out["dup_windows"] == 0) == (out["tokens_kept"] == out["tokens_total"])).all()


def test_window_dedup_unique_corpus_keeps_everything(ray_session):
    import ray

    from deduplicatr_ray.stages.textstats import window_dedup_stage

    ds = ray.data.from_arrow(
        _docs_ids([f"tok{i} tok{i + 1} tok{i + 2} uniq{i}" for i in range(0, 40, 4)])
    )
    out = window_dedup_stage(ds, window=2, num_partitions=4).to_pandas()
    assert (out["dup_windows"] == 0).all()
    assert (out["tokens_kept"] == out["tokens_total"]).all()


def test_window_scrub_rebuilds_from_kept_windows(ray_session):
    import ray

    from deduplicatr_ray.stages.textstats import window_scrub_stage

    docs = [
        "a b c a b c d",   # wins [a b c][a b c][d] -> "a b c d"
        "a b c x",         # [a b c] dup of doc1 win0 -> "x"
        "d",               # dup of doc1 win2 -> ""
        "",                # token-less -> absent
    ]
    ds = ray.data.from_arrow(_docs_ids(docs))
    out = (
        window_scrub_stage(ds, window=3, num_partitions=4)
        .to_pandas()
        .sort_values("doc_id")
        .set_index("doc_id")
    )
    assert out.index.tolist() == [1, 2, 3]
    assert out["clean_text"].tolist() == ["a b c d", "x", ""]
    assert out["n_windows"].tolist() == [3, 2, 1]
    assert out["dup_windows"].tolist() == [1, 1, 1]


def test_window_scrub_broadcast_equals_shuffle_tail(ray_session):
    """The broadcast cut (default on small slivers) and the union-tag
    partition join (forced via ``broadcast_budget=0``) produce identical
    output on a dup-heavy randomized corpus."""
    import numpy as np
    import ray

    from deduplicatr_ray.stages.textstats import window_scrub_stage

    rng = np.random.Generator(np.random.PCG64(23))
    vocab = [f"w{i}" for i in range(30)]
    texts = [
        " ".join(vocab[j] for j in rng.choice(30, size=rng.integers(3, 25)))
        for _ in range(150)
    ] + ["", "w0 w1"]

    def run(budget):
        return (
            window_scrub_stage(
                ray.data.from_arrow(_docs_ids(texts)),
                window=3,
                num_partitions=4,
                broadcast_budget=budget,
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    bcast, shuffle = run(None), run(0)
    assert bcast.equals(shuffle)
    assert int(bcast.dup_windows.sum()) > 0


def test_window_scrub_no_dups_is_identity_rebuild(ray_session):
    """Dup-free corpus: the dropped sliver is EMPTY (zero-block side of the
    union) and every doc rebuilds to its full token-normalized text."""
    import ray

    from deduplicatr_ray.stages.textstats import window_scrub_stage

    texts = [f"alpha{i} beta{i} gamma{i} delta{i} eps{i}" for i in range(10)]
    ds = ray.data.from_arrow(_docs_ids(texts))
    out = (
        window_scrub_stage(ds, window=3, num_partitions=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(out) == 10
    assert (out["dup_windows"] == 0).all()
    assert out["clean_text"].tolist() == texts


def test_canonical_dedup_folds_case_digits_whitespace(ray_session):
    """CCNet canonical form: case, digit, and whitespace variants group;
    genuinely different text does not."""
    import ray

    from deduplicatr_ray.stages.textstats import (
        canonical_dup_assign,
        canonical_dup_groups,
    )

    texts = [
        "Breaking News: 17 things happened today",     # 1
        "breaking   news: 99 things HAPPENED today",   # 2 -> variant of 1
        "breaking news: 00 things happened today  ",   # 3 -> variant of 1
        "completely different article body",           # 4
        "Completely\tDIFFERENT article body",          # 5 -> variant of 4
        "a third unrelated text",                      # 6
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(list(range(1, 7)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(tbl)
    assign = (
        canonical_dup_assign(ds, num_partitions=4)
        .to_pandas()
        .sort_values("doc_id")["canonical_id"]
        .tolist()
    )
    assert assign == [1, 1, 1, 4, 4, 6]
    groups = (
        canonical_dup_groups(ray.data.from_arrow(tbl), num_partitions=4)
        .to_pandas()
        .sort_values("keep_id")
        .reset_index(drop=True)
    )
    assert groups["keep_id"].tolist() == [1, 4]
    assert groups["n_docs"].tolist() == [3, 2]
    assert groups["total_chars"].tolist() == [
        sum(len(t) for t in texts[:3]),
        len(texts[3]) + len(texts[4]),
    ]


def test_canonical_dup_groups_empty_on_unique_corpus(ray_session):
    import ray

    from deduplicatr_ray.stages.textstats import canonical_dup_groups

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["alpha beta", "gamma delta"], pa.string()),
            "n_chars": pa.array([10, 11], pa.int64()),
        }
    )
    out = canonical_dup_groups(ray.data.from_arrow(tbl), num_partitions=4)
    assert sum(len(b) for b in out.iter_batches(batch_format="pyarrow")) == 0


def test_window_ops_degenerate_inputs(ray_session):
    """Window width 1, all-empty corpus, single-token docs — no crashes,
    sane outputs."""
    import ray

    from deduplicatr_ray.stages.textstats import (
        window_dedup_stage,
        window_scrub_stage,
    )

    # all-empty corpus -> empty outputs (no schema-less crash)
    empty = ray.data.from_arrow(_docs_ids(["", "", ""]))
    assert (
        sum(len(b) for b in window_dedup_stage(empty, window=5, num_partitions=2)
            .iter_batches(batch_format="pyarrow")) == 0
    )
    assert (
        sum(len(b) for b in window_scrub_stage(empty, window=5, num_partitions=2)
            .iter_batches(batch_format="pyarrow")) == 0
    )
    # window=1: token-level dedup; "a b a" keeps first a, b
    out = (
        window_dedup_stage(
            ray.data.from_arrow(_docs_ids(["a b a"])), window=1, num_partitions=2
        )
        .to_pandas()
        .iloc[0]
    )
    assert out["n_windows"] == 3 and out["dup_windows"] == 1
    sc = (
        window_scrub_stage(
            ray.data.from_arrow(_docs_ids(["a b a"])), window=1, num_partitions=2
        )
        .to_pandas()
        .iloc[0]
    )
    assert sc["clean_text"] == "a b"


_BYTE_MERGES = (
    "#version: 0.2\n"
    "Ġ t\n"      # rank 0: leading-space + t
    "Ġt h\n"
    "Ġth e\n"    # -> ' the' = 1 token
    "h e\n"
    "l l\n"
    "he ll\n"
    "hell o\n"   # -> 'hello' = 1 token
)


def test_byte_level_merges_load_and_tokenize(tmp_path):
    """GPT-2/HF byte-level merges.txt (r4 verdict item 3): loads through
    the same seam, auto-detected by merges_level, and tokenizes with the
    GPT-2 byte-unicode pre-tokenization — marker merges (Ġ = leading
    space) actually apply instead of staying dead."""
    import pytest

    from deduplicatr_ray.functions.tokenizers import (
        ByteLevelBPETokenizer,
        bpe_factory,
        load_merges,
        merges_level,
    )

    p = tmp_path / "merges.txt"
    p.write_text(_BYTE_MERGES, encoding="utf-8")
    merges = load_merges(str(p))
    assert merges_level(merges) == "byte"
    tok = bpe_factory(str(p))()
    assert isinstance(tok, ByteLevelBPETokenizer)

    # hand-check: 'hello'=1 (h e->he, l l->ll, he ll->hell, hell o),
    # ' the'=1 (G t, Gt h, Gth e), ' cat'=4 (no merges apply)
    assert tok(["hello the cat"]).tolist() == [1 + 1 + 4]
    # byte-level is case-PRESERVING: 'Hello' has no 'H e' merge ->
    # H, e, ll, o = 4 tokens (the char-level fixture would lowercase)
    assert tok(["Hello"]).tolist() == [4]
    # non-ASCII survives through the byte map: 'é' = 2 utf-8 bytes
    assert tok(["é"]).tolist() == [2]
    assert tok(["", None or ""]).tolist() == [0, 0]

    # a char-level table over [a-z0-9] still loads as the char tokenizer
    p2 = tmp_path / "ok.txt"
    p2.write_text("t h\nth e\n", encoding="utf-8")
    assert load_merges(str(p2)) == (("t", "h"), ("th", "e"))
    assert merges_level(load_merges(str(p2))) == "char"

    # symbols outside BOTH alphabets (SentencePiece's U+2581) still raise
    p3 = tmp_path / "sp.txt"
    p3.write_text("▁ t\n", encoding="utf-8")
    with pytest.raises(ValueError, match="unsupported vocab format"):
        load_merges(str(p3))


def test_token_chunks_byte_level_merges(ray_session, tmp_path):
    """Sequence packing over a byte-level merges.txt fixture — the r4
    verdict's done-criterion for the tokenizer seam."""
    import ray

    from deduplicatr_ray.functions.tokenizers import bpe_factory
    from deduplicatr_ray.stages.pack import token_chunk_stage

    p = tmp_path / "merges.txt"
    p.write_text(_BYTE_MERGES, encoding="utf-8")
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["hello the cat", "hello hello"], pa.string()),
        }
    )
    out = (
        token_chunk_stage(
            ray.data.from_arrow(docs),
            chunk_tokens=4,
            tokenizer=bpe_factory(str(p)),
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # doc1 = 6 tokens (1+1+4), doc2 = 'hello'(1) + ' hello'(G,h,e,..? no
    # 'Gh' merge -> G + hello-merge chain cannot cross the marker: G,
    # he->hell->hello needs plain h start: ' hello' = G + hello = 2)
    assert out["n_tokens"].tolist() == [6, 3]
    assert out["start_offset"].tolist() == [0, 6]


def test_textstats_and_fingerprint_null_text(ray_session):
    """NULL text rows must score as empty docs, not crash the actor or
    the fingerprint stage (code-review findings)."""
    import ray

    from deduplicatr_ray.stages.textstats import (
        fingerprint_stage,
        textstats_stage,
    )

    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["hello world one two three", None], pa.string()),
        }
    )
    out = textstats_stage(ray.data.from_arrow(t)).to_pandas().sort_values("doc_id")
    assert out["n_chars"].tolist()[1] == 0
    assert out["n_tokens"].tolist()[1] == 0

    fp = fingerprint_stage(ray.data.from_arrow(t)).to_pandas()
    assert (fp["doc_id"] != 2).all()  # null doc emits no fingerprints
