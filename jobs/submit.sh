#!/usr/bin/env bash
# Multi-node submission of the flagship dedup pipeline via the Ray Jobs API.
#
# This script is the cluster analog of `python -m deduplicatr_ray.cli run`
# in the sandbox; it CANNOT run in the single-node sandbox (no cluster, no
# dashboard/Jobs endpoint) and is shipped as the deployment recipe
# (SURVEY.md §3.3, VERDICT r1 "What's missing" #6). See jobs/README.md for
# sizing guidance.
#
# Usage:
#   RAY_HEAD=http://head-node:8265 \
#   INPUT=s3://bucket/pages/ CKPT=s3://bucket/ckpt/run42 \
#   OUTPUT=s3://bucket/clusters/run42 ./jobs/submit.sh
set -euo pipefail

RAY_HEAD="${RAY_HEAD:?set RAY_HEAD to the head node Jobs endpoint, e.g. http://head:8265}"
INPUT="${INPUT:?set INPUT to the pages parquet dir (s3:// or shared fs)}"
CKPT="${CKPT:?set CKPT to a durable checkpoint root (s3:// or shared fs)}"
OUTPUT="${OUTPUT:-}"
RUN_ID="${RUN_ID:-run0}"
# partition-level signature checkpoints: one per input-file group; a killed
# job resumed with the same CKPT/RUN_ID recomputes only missing partitions
PARTITIONS="${PARTITIONS:-256}"
# 'auto' picks driver vs hash-only components by forest-edge count;
# 'distributed' keeps everything off the driver (10^9+ edges)
COMPONENTS="${COMPONENTS:-auto}"

cd "$(dirname "$0")/.."

exec ray job submit \
  --address "$RAY_HEAD" \
  --runtime-env jobs/runtime_env.yaml \
  --no-wait \
  -- python -m deduplicatr_ray.cli run \
  --address auto \
  --input "$INPUT" \
  --ckpt "$CKPT" \
  --run-id "$RUN_ID" \
  --partitions "$PARTITIONS" \
  --components "$COMPONENTS" \
  ${OUTPUT:+--output "$OUTPUT"}
