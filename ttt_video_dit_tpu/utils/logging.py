"""Logging: rank-0 file+stdout logger, persisted stats history, optional wandb.

Port of the reference's MultiLogger/WandBLogger
(reference: ttt/infra/logging.py:19-147): process-0-only text log with a
unique file name, a full stats history persisted each step (JSON here instead
of ``all_stat_dict.pth``) and snapshotted into checkpoints, and a wandb run id
that is carried through checkpoints for seamless resume.
"""

from __future__ import annotations

import datetime
import json
import os
import sys
from typing import Any, Dict, Optional

import jax


class MultiLogger:
    def __init__(self, dump_folder: str, exp_name: str = "job", enable_wandb: bool = False,
                 wandb_project: str = "ttt-video", wandb_entity: Optional[str] = None,
                 wandb_run_id: Optional[str] = None):
        self.is_main = jax.process_index() == 0
        self.dump_folder = dump_folder
        self.stats: list[Dict[str, Any]] = []
        self._wandb = None
        self.wandb_run_id = wandb_run_id

        if not self.is_main:
            return

        os.makedirs(dump_folder, exist_ok=True)
        stamp = datetime.datetime.now().strftime("%Y%m%d-%H%M%S")
        safe = "".join(c if c.isalnum() or c in "-_" else "_" for c in exp_name)
        self.log_path = os.path.join(dump_folder, f"log_{safe}_{stamp}.txt")
        # Append-only JSONL: one record per step. The reference rewrites its
        # whole ``all_stat_dict.pth`` every step (logging.py:126-137) — O(n²)
        # host time over a 250k-step schedule; a JSONL append is O(1) and the
        # full-file compaction happens only at checkpoint snapshots.
        self.stats_path = os.path.join(dump_folder, "all_stats.jsonl")
        self._fh = open(self.log_path, "a")

        if enable_wandb:
            try:
                import wandb

                run = wandb.init(
                    project=wandb_project,
                    entity=wandb_entity,
                    id=wandb_run_id,
                    resume="must" if wandb_run_id else None,
                )
                self._wandb = wandb
                self.wandb_run_id = run.id
            except Exception as e:  # wandb optional; never fail training over it
                self.write(f"wandb disabled ({e})")

    def write(self, msg: str) -> None:
        if not self.is_main:
            return
        line = f"[{datetime.datetime.now().strftime('%H:%M:%S')}] {msg}"
        print(line, flush=True)
        self._fh.write(line + "\n")
        self._fh.flush()

    def log_stats(self, step: int, stats: Dict[str, Any]) -> None:
        if not self.is_main:
            return
        record = {"global_step": step, **stats}
        self.stats.append(record)
        if self._wandb is not None:
            self._wandb.log(stats, step=step)
        with open(self.stats_path, "a") as f:
            f.write(json.dumps(record) + "\n")

    def alert(self, title: str, text: str) -> None:
        """Send a wandb alert (reference: ttt/infra/logging.py:44-62); logs
        locally regardless, never fails the run."""
        self.write(f"ALERT [{title}] {text}")
        if self._wandb is not None:
            try:
                self._wandb.alert(title=title, text=text)
            except Exception as e:  # noqa: BLE001
                self.write(f"wandb alert failed ({e})")

    def load_stats(self, src_dir: str) -> None:
        """Restore the stats history snapshotted into a checkpoint directory
        on resume (reference: ttt/infra/logging.py:138-147, ``load_multi``);
        resuming without one just warns, like the reference."""
        if not self.is_main:
            return
        path = os.path.join(src_dir, "all_stats.jsonl")
        legacy = os.path.join(src_dir, "all_stats.json")
        if os.path.exists(path):
            with open(path) as f:
                self.stats = [json.loads(line) for line in f if line.strip()]
        elif os.path.exists(legacy):  # pre-JSONL checkpoints
            with open(legacy) as f:
                self.stats = json.load(f)
        else:
            self.write("WARNING: resuming without a stats-history snapshot")
            return
        # Compact the live file to the restored history so post-resume
        # appends continue from the checkpointed step, not a stale tail.
        with open(self.stats_path, "w") as f:
            for record in self.stats:
                f.write(json.dumps(record) + "\n")

    def snapshot_stats(self, dst_dir: str) -> None:
        """Copy the stats history into a checkpoint directory
        (reference: ttt/infra/logging.py:126-147)."""
        if not self.is_main:
            return
        os.makedirs(dst_dir, exist_ok=True)
        with open(os.path.join(dst_dir, "all_stats.jsonl"), "w") as f:
            for record in self.stats:
                f.write(json.dumps(record) + "\n")

    def init_log(self, job_config, model_config, num_params: int) -> None:
        self.write(f"experiment: {getattr(job_config.job, 'exp_name', '?')}")
        self.write(f"devices: {jax.device_count()} ({jax.devices()[0].device_kind})")
        self.write(f"parameters: {num_params:,}")
        self.write(f"model config: {model_config}")
