#!/usr/bin/env python
"""Round-4 new-operator stress: paragraph_dedup + dsir_weights at ~1 M
multi-paragraph docs (200x sf0.1, deterministic), inside the sandbox.

Corpus shape: each replica of a base doc splits its text into 4
newline-joined paragraphs and prepends a replica-unique token to ONE of
them — so ~3/4 of all paragraphs are exact cross-replica dups (the
pathological-for-shuffle shape: the paragraph key groupby sees group
sizes equal to the replica count), while every doc still differs
(no whole-doc dedup shortcut). dsir runs its two scans over the same
corpus with lang as the target column.

The corpus is materialized to DISK (/tmp) so tmpfs doesn't compete with
the object store. Prints ONE JSON line; BASELINE.md quotes it.

Usage: python tools/stress_newops.py [--sf-dir D] [--num-cpus 32]
           [--replicas 200]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.stress_memory import _spill_stats  # noqa: E402


def build_corpus(sf_dir: str, replicas: int, out_dir: str) -> int:
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    base = rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang"],
        override_num_blocks=64,
    )

    def expand(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = [t or "" for t in batch["text"].to_pylist()]
        langs = batch["lang"].to_pylist()
        out_id, out_tx, out_lg = [], [], []
        for did, t, lg in zip(ids, texts, langs):
            words = t.split(" ")
            q = max(1, len(words) // 4)
            paras = [
                " ".join(words[i : i + q]) for i in range(0, len(words), q)
            ]
            for r in range(replicas):
                p = list(paras)
                p[r % len(p)] = f"uniq{did}x{r} " + p[r % len(p)]
                out_id.append(int(did) * replicas + r)
                out_tx.append("\n".join(p))
                out_lg.append(lg)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "text": pa.array(out_tx, pa.string()),
                "lang": pa.array(out_lg, pa.string()),
            }
        )

    ds = base.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True)
    ds.write_parquet(out_dir)
    return ds.count()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--num-cpus", type=int, default=32)
    ap.add_argument("--replicas", type=int, default=200)
    args = ap.parse_args()

    import ray

    ray.init(
        address="local",
        num_cpus=args.num_cpus,
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import ray.data as rd

    from deduplicatr_ray.stages.dsir import dsir_weights
    from deduplicatr_ray.stages.paradedup import paragraph_dedup

    corpus_dir = "/tmp/stress_newops_corpus"
    shutil.rmtree(corpus_dir, ignore_errors=True)
    t0 = time.monotonic()
    n_docs = build_corpus(args.sf_dir, args.replicas, corpus_dir)
    build_s = time.monotonic() - t0

    docs = rd.read_parquet(corpus_dir, columns=["doc_id", "text"])
    t0 = time.monotonic()
    para = paragraph_dedup(docs, min_chars=3)
    from ray.data.aggregate import Sum

    para_tot = para.aggregate(
        Sum("n_paras", alias_name="paras"), Sum("n_kept", alias_name="kept")
    )
    para_s = time.monotonic() - t0

    docs_l = rd.read_parquet(corpus_dir, columns=["doc_id", "text", "lang"])
    t0 = time.monotonic()
    ds = dsir_weights(docs_l, target_col="lang", target_value="en")
    n_scored = ds.count()
    dsir_s = time.monotonic() - t0

    out = {
        "metric": "newops_stress",
        "n_docs": n_docs,
        "build_sec": round(build_s, 1),
        "paragraph_dedup": {
            "wall_sec": round(para_s, 1),
            "docs_per_sec": round(n_docs / para_s, 1),
            "paras": int(para_tot["paras"]),
            "kept": int(para_tot["kept"]),
        },
        "dsir_weights": {
            "wall_sec": round(dsir_s, 1),
            "docs_per_sec": round(n_docs / dsir_s, 1),
            "rows": n_scored,
        },
        "spill": _spill_stats(),
        "num_cpus": args.num_cpus,
    }
    print(json.dumps(out))
    ray.shutdown()
    shutil.rmtree(corpus_dir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
