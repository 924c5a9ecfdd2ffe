#!/usr/bin/env bash
# Offline precompute wrapper (counterpart of reference scripts/precompute.sh,
# which torchruns dev/precomp_video.py on one GPU). Video latents first, then
# text embeddings; set PROCESS_INDEX/PROCESS_COUNT per host to partition
# episodes the way the reference partitions by rank.
set -euo pipefail
cd "$(dirname "$0")/.."
EPISODE_DIR="${EPISODE_DIR:?set EPISODE_DIR (mp4 episodes)}"
SAVE_DIR="${SAVE_DIR:?set SAVE_DIR (latent + text output root)}"
VAE_CHECKPOINT="${VAE_CHECKPOINT:?set VAE_CHECKPOINT (torch VAE .pt)}"
T5_DIR="${T5_DIR:?set T5_DIR (T5 model dir)}"
ANNOTATIONS="${ANNOTATIONS:?set ANNOTATIONS (jsonl of episode texts)}"
VIDEO_LENGTH="${VIDEO_LENGTH:-3}"

PYTHONPATH=. python data/precompute_video.py \
    --episode-dir "$EPISODE_DIR" --save-dir "$SAVE_DIR/video" \
    --vae-checkpoint "$VAE_CHECKPOINT" --video-length "$VIDEO_LENGTH" \
    --process-index "${PROCESS_INDEX:-0}" --process-count "${PROCESS_COUNT:-1}" "$@"
PYTHONPATH=. python data/precompute_text.py \
    --t5-dir "$T5_DIR" --input-jsonl "$ANNOTATIONS" \
    --output-path "$SAVE_DIR/text" --video-length "$VIDEO_LENGTH"
