#!/bin/bash
# Round-5 AOT queue, take 3 — rows AFTER the TTT-layer-entry cotangent fix
# (models/ttt/layer.py shard_boundary; the v5e-256 tp8 row E' OOM'd on a
# replicated f32 [1,352512,3072] token-gate cotangent, 4.03 GiB/chip).
#
# Serial on purpose: jax.experimental.topologies holds /tmp/libtpu_lockfile
# (ONE topology process at a time) and the host has ONE CPU core.
set -u
cd "$(dirname "$0")/.."
OUT=docs/aot_scale_r5.json
LOG=/tmp/aot_r5_queue3.log
exec >> "$LOG" 2>&1

echo "=== $(date) row F'': 63s 42L v5p-32 rep1,fsdp8,tp4 accum8 (entry-cotangent fix)"
timeout 10800 python scripts/aot_scale_check.py \
  --config configs/train/ttt-mlp/63s.toml --chip v5p --parallelism 1,8,4 \
  --override=--training.grad_accum_steps --override=8 \
  --json "$OUT" || echo "ROW F'' rc=$?"

echo "=== $(date) row E'': 63s 42L v5e-256 rep1,fsdp32,tp8 accum2 (entry-cotangent fix)"
timeout 10800 python scripts/aot_scale_check.py \
  --config configs/train/ttt-mlp/63s.toml --chip v5e --parallelism 1,32,8 \
  --json "$OUT" || echo "ROW E'' rc=$?"

echo "=== $(date) row G: 63s 42L v5e-256 rep1,fsdp16,tp16 accum4 (fsdp16 halves the boundary slab vs tp8; 3 local heads keep fused G=3 bwd; micro-batch 16 over 16 data shards = 1/chip)"
timeout 10800 python scripts/aot_scale_check.py \
  --config configs/train/ttt-mlp/63s.toml --chip v5e --parallelism 1,16,16 \
  --override=--training.grad_accum_steps --override=4 \
  --json "$OUT" || echo "ROW G rc=$?"

echo "=== $(date) queue3 done"
