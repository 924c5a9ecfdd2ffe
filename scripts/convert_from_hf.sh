#!/usr/bin/env bash
# HF -> framework weight conversion wrapper (counterpart of reference
# scripts/convert_weights_from_hf.sh). Fill in the two paths, pick the SSM
# type, run. Refuses to overwrite an existing output directory, like the
# reference.
set -euo pipefail
cd "$(dirname "$0")/.."

FINAL_SAVE_PATH="TODO"
HUGGINGFACE_PRETRAINED_WEIGHTS_PATH="TODO"
SSM_TYPE="ttt_mlp" # ttt_linear or ttt_mlp

if [ -d "$FINAL_SAVE_PATH" ]; then
    echo "Warning: $FINAL_SAVE_PATH exists — refusing to overwrite." >&2
    echo "Remove it (or comment this check out) to proceed." >&2
    exit 1
fi
mkdir -p "$FINAL_SAVE_PATH"

PYTHONPATH=. python scripts/convert_from_hf.py \
    --hf-dir "$HUGGINGFACE_PRETRAINED_WEIGHTS_PATH" \
    --output "$FINAL_SAVE_PATH" \
    --ssm-layer "$SSM_TYPE"
