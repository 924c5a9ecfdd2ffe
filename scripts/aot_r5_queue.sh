#!/bin/bash
# Round-5 AOT queue, take 2 (serial: jax.experimental.topologies holds
# /tmp/libtpu_lockfile — ONE topology process at a time; this host also has
# ONE CPU core, so concurrency would stretch every 63 s 42L compile past its
# timeout). Each 63 s 42L compile is ~75 min of XLA time.
#
# Landed rows (docs/aot_scale_r5.json):
#   - 3s 2L v5p-8 rep1,fsdp2,tp4 accum2 probe: FITS (48.9/95 GiB).
#   - 63s 42L v5p-128 rep8,fsdp8,tp2 accum1 (round-4 TOML): OOM 96.7/95.7,
#     41 GiB boundary slab (token axis /tp2) + 48% fragmentation.
#   - 63s 42L v5p-128 rep4,fsdp8,tp4 accum2 PRE-shard_boundary-fix: OOM
#     117.4/95.7 — 341550 % 4 != 0 dropped the token-axis constraint and the
#     82 GiB slab went fully replicated. Fixed by shard_boundary (feature-dim
#     fallback); rows below run with the fix.
set -u
cd "$(dirname "$0")/.."
OUT=docs/aot_scale_r5.json
LOG=/tmp/aot_r5_queue.log
exec >> "$LOG" 2>&1

echo "=== $(date) row A': 63s 42L v5p-128 rep4,fsdp8,tp4 accum2 (shard_boundary fix)"
timeout 10800 python scripts/aot_scale_check.py \
  --config configs/train/ttt-mlp/63s.toml --chip v5p --parallelism 4,8,4 \
  --json "$OUT" || echo "ROW A' rc=$?"

echo "=== $(date) row B: 63s 42L v5p-64 rep2,fsdp8,tp4 accum4 (north star)"
timeout 10800 python scripts/aot_scale_check.py \
  --config configs/train/ttt-mlp/63s.toml --chip v5p --parallelism 2,8,4 \
  --override=--training.grad_accum_steps --override=4 \
  --json "$OUT" || echo "ROW B rc=$?"

echo "=== $(date) row C: gated CI AOT test (63s 2L BS2 v5p-8), artifact committed"
TTT_RUN_AOT_TEST=1 TTT_AOT_ARTIFACT=tests/artifacts/aot_63s_ci.jsonl \
  timeout 7200 python -m pytest tests/test_aot_scale.py -q || echo "ROW C rc=$?"

echo "=== $(date) row D: 63s 42L v5e-256 rep16,fsdp4,tp4 (reference's literal 256-chip shape)"
timeout 10800 python scripts/aot_scale_check.py \
  --config configs/train/ttt-mlp/63s.toml --chip v5e --parallelism 16,4,4 \
  --json "$OUT" || echo "ROW D rc=$?"

echo "=== $(date) queue done"
