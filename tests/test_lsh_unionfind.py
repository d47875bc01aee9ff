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
    # doc 0: 32 minhash bands + C(blocks, combo) simhash tables;
    # doc 1 (< w tokens): simhash tables only
    ntab = cfg.num_simhash_tables
    ids = np.array(bands["band_id"].to_pylist())
    urls = bands["url"].to_pylist()
    assert (np.array(urls) == "u/0").sum() == cfg.bands + ntab
    assert (np.array(urls) == "u/1").sum() == ntab
    assert set(ids[np.array(urls) == "u/1"]) <= set(
        range(cfg.bands, cfg.bands + ntab)
    )


def _fake_sig_batch(simhashes: np.ndarray) -> pa.Table:
    """Signature rows with NO shingles (minhash bands suppressed) and a
    chosen simhash per row — isolates the SimHash blocking path."""
    n = len(simhashes)
    cfg = CANONICAL
    return pa.table(
        {
            "url": pa.array([f"s/{i}" for i in range(n)]),
            "n_shingles": pa.array(np.zeros(n, np.int64), pa.int64()),
            "sig8": pa.FixedSizeListArray.from_arrays(
                pa.array(np.zeros(n * cfg.sketch_width, np.uint8), pa.uint8()),
                cfg.sketch_width,
            ),
            "simhash": pa.array(simhashes.astype(np.uint64), pa.uint64()),
            "text_sha1": pa.array(
                [i.to_bytes(20, "big") for i in range(n)], pa.binary(20)
            ),
        }
    )


def test_simhash_combination_tables_guarantee_hamming_radius():
    """Pigeonhole recall: every pair within Hamming (blocks - combo) of the
    fingerprint shares >= 1 combination-table key (Manku WWW'07)."""
    cfg = CANONICAL
    radius = cfg.simhash_blocks - cfg.simhash_combo
    assert radius >= cfg.hamming_threshold
    rng = np.random.Generator(np.random.PCG64(7))
    base = rng.integers(1, 2**63, size=64, dtype=np.uint64)
    flips = [
        np.bitwise_xor.reduce(
            (np.uint64(1) << rng.choice(64, size=k, replace=False).astype(np.uint64))
        )
        for k in rng.integers(1, radius + 1, size=64)
    ]
    pairs = np.stack([base, base ^ np.array(flips, np.uint64)])
    bands = band_explode_batch(_fake_sig_batch(pairs.T.reshape(-1)))
    tbl = bands.to_pandas()
    tbl["doc"] = tbl["url"].str.split("/").str[1].astype(int) // 2
    shared = tbl.groupby(["doc", "band_id", "band_hash"]).size()
    collided = set(shared[shared == 2].index.get_level_values("doc"))
    assert collided == set(range(64))


def test_simhash_hot_block_no_longer_saturates_cap():
    """r3 verdict weak #1: a corpus where every doc shares ONE hot bit block
    (boilerplate signature) used to form a single giant group per block
    table and silently fall to the exact path via band_group_cap. With
    combination keys, every table mixes in >= 2 other (random) blocks, so
    groups stay tiny and the cap never trips."""
    cfg = CANONICAL
    n = cfg.band_group_cap * 4
    rng = np.random.Generator(np.random.PCG64(11))
    widths = cfg.simhash_block_widths()
    sh = rng.integers(1, 2**63, size=n, dtype=np.uint64)
    # pin block 0 (the low widths[0] bits) to one hot value for every doc
    mask = np.uint64((1 << widths[0]) - 1)
    sh = (sh & ~mask) | np.uint64(0x2A5)
    bands = band_explode_batch(_fake_sig_batch(sh)).to_pandas()
    gsizes = bands.groupby(["band_id", "band_hash"]).size()
    assert gsizes.max() <= cfg.band_group_cap


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


def test_emit_pairs_hot_group_salted_star_not_dropped():
    """A giant DISTINCT-content band group is salt-split, not dropped: with
    identical sketches every salt lane agrees, so after band_salt_depth
    levels the still-hot leaf is connected by a verified star around the
    min-url member (m-1 edges at est 1.0). The old behavior (0 pairs) was
    the recall hole the north-star's 'salting/skew-splitting of hot bands'
    requirement exists to close."""
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
    out = emit_pairs_group(group)
    assert len(out) == m - 1                           # verified star
    assert set(out["url_a"].to_pylist()) == {"u/0000"}  # hub = min url
    assert set(out["method"].to_pylist()) == {"minhash"}
    assert len(emit_pairs_group(group.slice(0, 3))) == 3  # under cap: all pairs


def test_hot_group_salt_split_separates_families():
    """Two near-dup families land in ONE hot band bucket; their sketches
    differ, so the first salt lane splits them and each family is paired
    only within itself (triu below cap after the split)."""
    from deduplicatr_ray.stages.signatures import pack_sketch

    cfg = CANONICAL
    half = cfg.band_group_cap  # 2*half > cap -> hot group
    rng = np.random.Generator(np.random.PCG64(17))
    lanes_a = rng.integers(0, 1 << 16, cfg.num_perm).astype(np.uint64)
    lanes_b = rng.integers(0, 1 << 16, cfg.num_perm).astype(np.uint64)
    s_a = pack_sketch(lanes_a[None, :], cfg)[0]
    s_b = pack_sketch(lanes_b[None, :], cfg)[0]
    m = 2 * half
    sk = np.concatenate([np.tile(s_a, half), np.tile(s_b, half)])
    # urls interleave the families so the split is not positional
    urls, fam = [], []
    for i in range(half):
        urls.append(f"u/a{i:04d}")
        fam.append("a")
    for i in range(half):
        urls.append(f"u/b{i:04d}")
        fam.append("b")
    group = pa.table(
        {
            "band_id": pa.array([0] * m, pa.int32()),
            "band_hash": pa.array([7] * m, pa.uint64()),
            "url": pa.array(urls),
            "sig8": pa.FixedSizeListArray.from_arrays(
                pa.array(sk), cfg.sketch_width
            ),
            "simhash": pa.array(np.zeros(m, np.uint64)),
        }
    )
    out = emit_pairs_group(group).to_pandas()
    fam_of = dict(zip(urls, fam))
    assert len(out) > 0
    assert (
        out["url_a"].map(fam_of) == out["url_b"].map(fam_of)
    ).all()  # no cross-family pair survives
    # each family fully paired (identical sketches -> est 1.0 -> all kept)
    per_fam = out["url_a"].map(fam_of).value_counts()
    exp = half * (half - 1) // 2
    assert per_fam.get("a", 0) == exp and per_fam.get("b", 0) == exp


def test_hot_group_pairs_deterministic_and_bounded():
    from deduplicatr_ray.stages.lsh import _hot_group_pairs

    cfg = CANONICAL
    m = 4 * cfg.band_group_cap
    rng = np.random.Generator(np.random.PCG64(23))
    seg8 = rng.integers(0, 256, (m, cfg.sketch_width)).astype(np.uint8)
    i1, j1 = _hot_group_pairs(0, seg8, m, cfg)
    i2, j2 = _hot_group_pairs(0, seg8, m, cfg)
    assert np.array_equal(i1, i2) and np.array_equal(j1, j2)
    assert (i1 < j1).all()
    # worst case O(m * cap), never O(m^2)
    assert len(i1) <= m * cfg.band_group_cap
    # simhash band (band_id >= bands): straight star
    si, sj = _hot_group_pairs(cfg.bands + 3, None, m, cfg)
    assert len(si) == m - 1 and (si == 0).all()


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


# --- LSH banding auto-tune (config.optimal_bands) ---------------------------


def test_optimal_bands_recall_floor_and_divisors():
    """Every tuned banding is an exact divisor pair and catches a pair AT
    the threshold with p >= the recall floor (when any divisor can)."""
    from deduplicatr_ray.config import optimal_bands

    for t in (0.3, 0.5, 0.6, 0.7, 0.8, 0.9, 0.95):
        b, r = optimal_bands(t, num_perm=128)
        assert b * r == 128
        p_at_t = 1.0 - (1.0 - t**r) ** b
        assert p_at_t >= 0.99, (t, b, r, p_at_t)


def test_optimal_bands_monotone_rows_in_threshold():
    """Higher threshold -> longer bands (rows non-decreasing): selective
    banding for near-identical targets, permissive for loose ones."""
    from deduplicatr_ray.config import optimal_bands

    prev_rows = 0
    for t in (0.3, 0.5, 0.7, 0.9, 0.95):
        _, r = optimal_bands(t)
        assert r >= prev_rows, (t, r, prev_rows)
        prev_rows = r


def test_tuned_config_reproduces_canonical_banding():
    """DedupConfig.tuned(0.7) independently lands on the frozen canonical
    32x4 banding — the hand-picked default is the optimum under the
    engine's own recall gate."""
    from deduplicatr_ray.config import CANONICAL, DedupConfig

    c = DedupConfig.tuned(CANONICAL.jaccard_threshold)
    assert (c.bands, c.rows_per_band) == (CANONICAL.bands, CANONICAL.rows_per_band)
    assert c.num_perm == CANONICAL.num_perm
    # tuned configs hash stably (pure function of inputs)
    assert c.config_hash() == DedupConfig.tuned(0.7).config_hash()


def test_optimal_bands_infeasible_falls_back_to_max_recall():
    """When no divisor pair can reach the floor, the highest-P(t) banding
    (most bands, shortest rows) is returned rather than an arbitrary one."""
    from deduplicatr_ray.config import optimal_bands

    b, r = optimal_bands(0.99, num_perm=4, min_recall=0.999999)
    p = lambda bb, rr: 1.0 - (1.0 - 0.99**rr) ** bb  # noqa: E731
    assert p(b, r) == max(p(bb, 4 // bb) for bb in (1, 2, 4))


def test_hot_group_pairs_invariant_to_row_order():
    """The salted split is content-derived: shuffling the rows of a hot
    group must yield the identical verified pair set (url pairs)."""
    from deduplicatr_ray.stages.signatures import pack_sketch

    cfg = CANONICAL
    rng = np.random.Generator(np.random.PCG64(53))
    m = cfg.band_group_cap + 40
    lanes = rng.integers(0, 1 << 16, (7, cfg.num_perm)).astype(np.uint64)
    rows = np.concatenate(
        [pack_sketch(lanes[i % 7][None, :], cfg)[0] for i in range(m)]
    )
    urls = [f"u/{i:05d}" for i in range(m)]

    def build(order):
        sk = np.concatenate(
            [rows[i * cfg.sketch_width : (i + 1) * cfg.sketch_width] for i in order]
        )
        return pa.table(
            {
                "band_id": pa.array([0] * m, pa.int32()),
                "band_hash": pa.array([9] * m, pa.uint64()),
                "url": pa.array([urls[i] for i in order]),
                "sig8": pa.FixedSizeListArray.from_arrays(
                    pa.array(sk), cfg.sketch_width
                ),
                "simhash": pa.array(np.zeros(m, np.uint64)),
            }
        )

    a = emit_pairs_group(build(list(range(m)))).to_pandas()
    perm = list(rng.permutation(m))
    b = emit_pairs_group(build(perm)).to_pandas()
    pa_set = set(zip(a["url_a"], a["url_b"]))
    pb_set = set(zip(b["url_a"], b["url_b"]))
    assert pa_set == pb_set and len(pa_set) > 0


def test_hot_group_multi_chunk_verify():
    """A hot group whose salted leaves carry >1M candidate pairs exercises
    the chunked verification loop (CHUNK = 1<<20): 40 identical-sketch
    families scattered over 10k rows — all emitted pairs are same-family
    (precision 1.0 at est 1.0), bounded-memory chunks change nothing."""
    from deduplicatr_ray.stages.signatures import pack_sketch

    cfg = CANONICAL
    rng = np.random.Generator(np.random.PCG64(71))
    fam_lanes = rng.integers(0, 1 << 16, (40, cfg.num_perm)).astype(np.uint64)
    m = 10_000
    fam = rng.integers(0, 40, m)
    sk = np.concatenate(
        [pack_sketch(fam_lanes[f][None, :], cfg)[0] for f in fam]
    )
    group = pa.table(
        {
            "band_id": pa.array([0] * m, pa.int32()),
            "band_hash": pa.array([3] * m, pa.uint64()),
            "url": pa.array([f"u/{i:06d}" for i in range(m)]),
            "sig8": pa.FixedSizeListArray.from_arrays(
                pa.array(sk), cfg.sketch_width
            ),
            "simhash": pa.array(np.zeros(m, np.uint64)),
        }
    )
    out = emit_pairs_group(group).to_pandas()
    fam_of = {f"u/{i:06d}": int(fam[i]) for i in range(m)}
    assert len(out) > 500_000  # multi-chunk volume
    assert (out["url_a"].map(fam_of) == out["url_b"].map(fam_of)).all()
    assert (out["jaccard_est"] == 1.0).all()
