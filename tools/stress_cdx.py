"""CDX / cross-crawl dedup / compaction stress: throughput evidence for
BASELINE.md at the Common Crawl task grain (one file per task).

Builds two deterministic crawls with Ray tasks (old: N_FILES x
PAGES_PER_FILE pages; new: same urls where even pages re-capture old
content byte-identically and odd pages carry an edit), then measures in
ONE Ray session at 32 CPUs:

* warc_cdx_index over the old crawl (header walk + digest per record)
* cdx_dedup_against (new index vs old index, broadcast digest set)
* compact_warc (rewrite of the new crawl against the old index)

Prints one JSON line. Usage: python tools/stress_cdx.py [n_files]
[pages_per_file]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import tempfile
import time


def main() -> int:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    per_file = int(sys.argv[2]) if len(sys.argv) > 2 else 25_000
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 32)),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    root = tempfile.mkdtemp(prefix="graft_cdx_stress_")
    old_dir, new_dir, out_dir = (
        os.path.join(root, d) for d in ("old", "new", "out")
    )
    for d in (old_dir, new_dir, out_dir):
        os.makedirs(d)

    @ray.remote
    def build(f: int) -> tuple[int, int]:
        from deduplicatr_ray.sources.warc import build_warc

        def page(i: int, edited: bool) -> bytes:
            # incompressible filler (distinct digests) so per-record gz
            # sizes resemble real page entropy, not a 6:1-collapsing
            # repeat — saved_pct would otherwise be meaningless
            filler = "".join(
                hashlib.sha256(f"{i}:{k}".encode()).hexdigest()
                for k in range(6)
            )
            tail = " EDITED-IN-RECRAWL" if edited else ""
            return f"<html><body><p>page {i} {filler}{tail}</p></body></html>".encode()

        base = f * per_file
        old = build_warc(
            [
                {
                    "url": f"http://h{i % 997}.example/p{i}",
                    "html": page(i, False),
                }
                for i in range(base, base + per_file)
            ]
        )
        new = build_warc(
            [
                {
                    "url": f"http://h{i % 997}.example/p{i}",
                    "html": page(i, i % 2 == 1),
                }
                for i in range(base, base + per_file)
            ]
        )
        with open(os.path.join(old_dir, f"old-{f:04d}.warc.gz"), "wb") as fh:
            fh.write(old)
        with open(os.path.join(new_dir, f"new-{f:04d}.warc.gz"), "wb") as fh:
            fh.write(new)
        return len(old), len(new)

    t0 = time.monotonic()
    sizes = ray.get([build.remote(f) for f in range(n_files)])
    build_wall = time.monotonic() - t0
    gz_bytes_old = sum(a for a, _ in sizes)
    gz_bytes_new = sum(b for _, b in sizes)
    n_pages = n_files * per_file

    from deduplicatr_ray.sources.warc import (
        cdx_dedup_against,
        compact_warc,
        warc_cdx_index,
    )

    t0 = time.monotonic()
    old_idx = warc_cdx_index(old_dir).materialize()
    index_wall = time.monotonic() - t0
    assert old_idx.count() == n_pages

    def to_int(b):
        import pyarrow as pa
        import pyarrow.compute as pc

        return pa.table({"dup": pc.cast(b["dup_of_prior"], pa.int64())})

    t0 = time.monotonic()
    new_idx = warc_cdx_index(new_dir)
    marked = cdx_dedup_against(new_idx, old_idx)
    n_dup = marked.map_batches(to_int, batch_format="pyarrow").sum("dup")
    dedup_wall = time.monotonic() - t0
    assert n_dup == n_pages // 2, n_dup

    t0 = time.monotonic()
    man = compact_warc(new_dir, old_idx, out_dir).to_pandas()
    compact_wall = time.monotonic() - t0
    assert int(man["n_revisit"].sum()) == n_pages // 2

    from deduplicatr_ray.sources.warc import write_wat

    wat_dir = os.path.join(root, "wat")
    t0 = time.monotonic()
    wat_man = write_wat(old_dir, wat_dir).to_pandas()
    wat_wall = time.monotonic() - t0
    assert int(wat_man["n_records"].sum()) == n_pages

    out = {
        "n_files": n_files,
        "n_pages": n_pages,
        "gz_mb_old": round(gz_bytes_old / 2**20, 1),
        "build_wall_s": round(build_wall, 1),
        "index_wall_s": round(index_wall, 2),
        "index_pages_per_s": round(n_pages / index_wall),
        "cross_dedup_wall_s": round(dedup_wall, 2),
        "cross_dedup_pages_per_s": round(n_pages / dedup_wall),
        "n_dup": int(n_dup),
        "compact_wall_s": round(compact_wall, 2),
        "compact_pages_per_s": round(n_pages / compact_wall),
        "bytes_in_mb": round(int(man["bytes_in"].sum()) / 2**20, 1),
        "bytes_out_mb": round(int(man["bytes_out"].sum()) / 2**20, 1),
        "saved_pct": round(
            100.0
            * (1 - int(man["bytes_out"].sum()) / int(man["bytes_in"].sum())),
            1,
        ),
        "wat_wall_s": round(wat_wall, 2),
        "wat_pages_per_s": round(n_pages / wat_wall),
        "wat_mb_out": round(int(wat_man["bytes_out"].sum()) / 2**20, 1),
        "num_cpus": int(os.environ.get("RAY_GRAFT_CPUS", 32)),
    }
    print(json.dumps(out))
    ray.shutdown()
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
