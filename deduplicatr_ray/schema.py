"""Declared Arrow schemas for every table in the pipeline (SURVEY.md §1.2).

The reference uses fixed implicit record shapes (FileSummary/DirSummary,
``src/deduplicatr/file.clj:~5-45``, approximate citation — reference mount
empty at survey time); the target pins the analogous shapes as explicit
``pyarrow.Schema`` constants. No dynamic schema inference beyond what
``read_parquet`` provides.
"""

from __future__ import annotations

import pyarrow as pa

from .config import CANONICAL

NUM_PERM = CANONICAL.num_perm
SKETCH_WIDTH = CANONICAL.sketch_width  # packed b-bit verify sketch bytes

# Input table (binding input_hint, BASELINE.json:15).
PAGES = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
)

# After extract+normalize (M4/M5/M1); `html` is dropped immediately after
# extraction (SURVEY.md §7.5 wide-row note).
EXTRACTED = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("text", pa.large_string()),
        pa.field("lang", pa.string()),
        pa.field("text_sha1", pa.binary(20)),
        pa.field("n_chars", pa.int64()),
    ]
)

# Signature stage output (M6-M8). The flagship materializes the LEAN form
# (no raw minhash): per-band hashes replace the 1 KiB minhash column, which
# has no downstream consumer beyond banding (keep_minhash=True restores it).
SIGNATURES = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("text_sha1", pa.binary(20)),
        pa.field("band_hashes", pa.list_(pa.uint64(), CANONICAL.bands)),
        pa.field("sig8", pa.list_(pa.uint8(), SKETCH_WIDTH)),  # b-bit verify sketch
        pa.field("simhash", pa.uint64()),
        pa.field("n_shingles", pa.int64()),
    ]
)

# With keep_minhash=True the actor also emits the raw signature column:
SIGNATURES_FULL = SIGNATURES.insert(
    2, pa.field("minhash", pa.list_(pa.uint64(), NUM_PERM))
)

# Exploded LSH band keys (1 row per band per doc; minhash bands use
# band_id 0..bands-1, SimHash combination tables use
# bands..bands+C(simhash_blocks, simhash_combo)-1).
BAND_KEYS = pa.schema(
    [
        pa.field("band_id", pa.int32()),
        pa.field("band_hash", pa.uint64()),
        pa.field("url", pa.string()),
        pa.field("sig8", pa.list_(pa.uint8(), SKETCH_WIDTH)),
        pa.field("simhash", pa.uint64()),
    ]
)

# Verified candidate pairs (url_a < url_b).
PAIRS = pa.schema(
    [
        pa.field("url_a", pa.string()),
        pa.field("url_b", pa.string()),
        pa.field("jaccard_est", pa.float32()),
        pa.field("method", pa.string()),  # exact | minhash | simhash | suffix
    ]
)

# Final cluster assignment (J1/A6).
CLUSTERS = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("cluster_id", pa.string()),   # min url in the component
        pa.field("cluster_size", pa.int64()),
        pa.field("is_canonical", pa.bool_()),
    ]
)
