#!/bin/bash
# Round-5 AOT queue: serial (jax.experimental.topologies holds
# /tmp/libtpu_lockfile — ONE topology process at a time).
#
# Probe first (3s @ 2L, minutes): validates the tp=4 fused-backward path +
# grad-accum batch reshape through the detached topology compiler before
# committing to 75-minute 63s compiles.
set -u
cd "$(dirname "$0")/.."
OUT=docs/aot_scale_r5.json
LOG=/tmp/aot_r5_queue.log
exec >> "$LOG" 2>&1

echo "=== $(date) probe: 3s 2L v5p-8 rep1,fsdp2,tp4 accum2"
timeout 3600 python scripts/aot_scale_check.py \
  --config configs/train/ttt-mlp/3s.toml --chip v5p --parallelism 1,2,4 \
  --layers 2 --override=--training.grad_accum_steps --override=2 \
  --json /tmp/aot_r5_probe.jsonl || { echo "PROBE FAILED rc=$?"; exit 1; }

echo "=== $(date) row A: 63s 42L v5p-128 rep4,fsdp8,tp4 accum2"
timeout 10800 python scripts/aot_scale_check.py \
  --config configs/train/ttt-mlp/63s.toml --chip v5p --parallelism 4,8,4 \
  --override=--training.grad_accum_steps --override=2 \
  --json "$OUT" || echo "ROW A rc=$?"

echo "=== $(date) row B: 63s 42L v5p-64 rep2,fsdp8,tp4 accum4 (north star)"
timeout 10800 python scripts/aot_scale_check.py \
  --config configs/train/ttt-mlp/63s.toml --chip v5p --parallelism 2,8,4 \
  --override=--training.grad_accum_steps --override=4 \
  --json "$OUT" || echo "ROW B rc=$?"

echo "=== $(date) queue done"
