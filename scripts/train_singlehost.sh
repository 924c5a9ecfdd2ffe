#!/usr/bin/env bash
# Single-host training smoke (counterpart of reference scripts/train_singlenode.sh).
# Runs the debug preset on synthetic data on whatever accelerators are local.
set -euo pipefail
cd "$(dirname "$0")/.."
PYTHONPATH=. python train.py --job.config_file configs/train/debug.toml "$@"
