"""Unit tests: banding math, pair emission, cap routing, union-find."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from deduplicatr_ray.config import CANONICAL
from deduplicatr_ray.stages.lsh import band_explode_batch, emit_pairs_group
from deduplicatr_ray.stages.signatures import EMPTY_SENTINEL, SignatureActor
from deduplicatr_ray.state.unionfind import UnionFind, components_from_pairs


def _sig_batch(texts: list[str]) -> pa.Table:
    actor = SignatureActor()
    batch = pa.table(
        {
            "url": pa.array([f"u/{i}" for i in range(len(texts))]),
            "text": pa.array(texts, pa.large_string()),
            "text_sha1": pa.array([b"\x00" * 20] * len(texts), pa.binary(20)),
        }
    )
    return actor(batch)


def test_band_explode_counts_and_ids():
    texts = ["alpha beta gamma delta epsilon zeta eta theta", "one two"]
    sigs = _sig_batch(texts)
    bands = band_explode_batch(sigs)
    cfg = CANONICAL
    # doc 0: 32 minhash bands + 4 simhash blocks; doc 1 (< w tokens): simhash only
    ids = np.array(bands["band_id"].to_pylist())
    urls = bands["url"].to_pylist()
    assert (np.array(urls) == "u/0").sum() == cfg.bands + cfg.simhash_blocks
    assert (np.array(urls) == "u/1").sum() == cfg.simhash_blocks
    assert set(ids[np.array(urls) == "u/1"]) <= set(
        range(cfg.bands, cfg.bands + cfg.simhash_blocks)
    )


def test_identical_docs_share_all_bands():
    t = "the quick brown fox jumps over the lazy dog again and again"
    sigs = _sig_batch([t, t])
    bands = band_explode_batch(sigs)
    tbl = bands.to_pandas()
    mh = tbl[tbl.band_id < CANONICAL.bands]
    per_band = mh.groupby("band_id")["band_hash"].nunique()
    assert (per_band == 1).all()


def test_empty_doc_emits_no_bands():
    sigs = _sig_batch([""])
    assert sigs["n_shingles"][0].as_py() == 0
    assert sigs["minhash"][0].values.to_pylist() == [int(EMPTY_SENTINEL)] * 128
    assert len(band_explode_batch(sigs)) == 0


def test_emit_pairs_cap_routes_giant_groups():
    cfg = CANONICAL
    m = cfg.band_group_cap + 1
    group = pa.table(
        {
            "band_id": pa.array([0] * m, pa.int32()),
            "band_hash": pa.array([1] * m, pa.uint64()),
            "url": pa.array([f"u/{i:04d}" for i in range(m)]),
            "sig8": pa.FixedSizeListArray.from_arrays(
                pa.array(np.zeros(m * cfg.sketch_width, np.uint8)), cfg.sketch_width
            ),
            "simhash": pa.array(np.zeros(m, np.uint64)),
        }
    )
    assert len(emit_pairs_group(group)) == 0          # routed to exact path
    assert len(emit_pairs_group(group.slice(0, 3))) == 3  # under cap: all pairs


def test_emit_pairs_jaccard_filter():
    cfg = CANONICAL
    from deduplicatr_ray.stages.signatures import pack_sketch

    rng = np.random.Generator(np.random.PCG64(5))
    lanes1 = rng.integers(0, 1 << 16, cfg.num_perm).astype(np.uint64)
    lanes2 = lanes1.copy()
    lanes2[: cfg.num_perm // 2] = rng.integers(
        0, 1 << 16, cfg.num_perm // 2
    ).astype(np.uint64)  # ~50% of lanes agree
    s1 = pack_sketch(lanes1[None, :], cfg)[0]
    s2 = pack_sketch(lanes2[None, :], cfg)[0]
    group = pa.table(
        {
            "band_id": pa.array([0, 0], pa.int32()),
            "band_hash": pa.array([1, 1], pa.uint64()),
            "url": pa.array(["u/a", "u/b"]),
            "sig8": pa.FixedSizeListArray.from_arrays(
                pa.array(np.concatenate([s1, s2])), cfg.sketch_width
            ),
            "simhash": pa.array(np.zeros(2, np.uint64)),
        }
    )
    assert len(emit_pairs_group(group)) == 0  # est ~0.5 < tau - margin
    same = pa.table(
        {
            "band_id": pa.array([0, 0], pa.int32()),
            "band_hash": pa.array([1, 1], pa.uint64()),
            "url": pa.array(["u/a", "u/b"]),
            "sig8": pa.FixedSizeListArray.from_arrays(
                pa.array(np.concatenate([s1, s1])), cfg.sketch_width
            ),
            "simhash": pa.array(np.zeros(2, np.uint64)),
        }
    )
    out = emit_pairs_group(same)
    assert out["url_a"].to_pylist() == ["u/a"]
    assert out["jaccard_est"][0].as_py() == 1.0


def test_unionfind_chain_and_disjoint():
    """Hand-built edge lists (FIXTURES.md §2 micro-fixtures): chain a-b, b-c
    merges; d-e disjoint; clusters merge across methods via shared members."""
    mapping = components_from_pairs([("b", "a"), ("c", "b"), ("e", "d")])
    assert mapping == {"a": "a", "b": "a", "c": "a", "d": "d", "e": "d"}


def test_unionfind_order_independent():
    edges = [("a", "b"), ("c", "d"), ("b", "c"), ("x", "y")]
    m1 = components_from_pairs(edges)
    m2 = components_from_pairs(reversed(edges))
    assert m1 == m2


def test_unionfind_find_idempotent():
    uf = UnionFind()
    uf.union("p", "q")
    assert uf.find("p") == uf.find("q")
    assert uf.find("solo") == "solo"


def test_pack_sketch_roundtrip_and_eq():
    """b=4 packing stores two lanes per byte and sketch_eq_mean recovers the
    exact per-lane agreement rate of the unpacked lanes."""
    from deduplicatr_ray.config import DedupConfig
    from deduplicatr_ray.stages.signatures import pack_sketch, sketch_eq_mean

    cfg4 = DedupConfig(bbit_bits=4)
    rng = np.random.Generator(np.random.PCG64(11))
    lanes = rng.integers(0, 1 << 32, (6, cfg4.num_perm)).astype(np.uint64)
    packed = pack_sketch(lanes, cfg4)
    assert packed.shape == (6, cfg4.num_perm // 2)
    lo = packed & 0xF
    hi = packed >> 4
    assert (lo == (lanes[:, 0::2] & 0xF)).all()
    assert (hi == (lanes[:, 1::2] & 0xF)).all()

    a, b = lanes[:3], lanes[3:]
    want = ((a & 0xF) == (b & 0xF)).mean(axis=1)
    got = sketch_eq_mean(pack_sketch(a, cfg4), pack_sketch(b, cfg4), cfg4)
    assert np.allclose(got, want)

    cfg8 = DedupConfig(bbit_bits=8)
    got8 = sketch_eq_mean(pack_sketch(a, cfg8), pack_sketch(b, cfg8), cfg8)
    want8 = ((a & 0xFF) == (b & 0xFF)).mean(axis=1)
    assert np.allclose(got8, want8)
