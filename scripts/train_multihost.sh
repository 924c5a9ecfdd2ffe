#!/usr/bin/env bash
# Multi-host TPU training: run this script on EVERY host of the slice
# (e.g. via `gcloud compute tpus tpu-vm ssh ... --worker=all --command=...`).
# jax.distributed.initialize() picks up the TPU pod topology automatically.
set -euo pipefail
cd "$(dirname "$0")/.."
CONFIG="${1:?usage: train_multihost.sh <config.toml> [extra args...]}"
shift
export TTT_NUM_PROCESSES="${TTT_NUM_PROCESSES:-2}"  # any value >1 triggers jax.distributed.initialize
PYTHONPATH=. python train.py --job.config_file "$CONFIG" "$@"
