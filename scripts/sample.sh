#!/usr/bin/env bash
# Sampling wrapper (counterpart of reference docs/sampling.md torchrun line).
set -euo pipefail
cd "$(dirname "$0")/.."
CONFIG="${1:?usage: sample.sh <eval-config.toml> <storyboard.json> [extra args...]}"
STORY="${2:?usage: sample.sh <eval-config.toml> <storyboard.json> [extra args...]}"
shift 2
PYTHONPATH=. python sample.py --job.config_file "$CONFIG" --eval.input_file "$STORY" "$@"
