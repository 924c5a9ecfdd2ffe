"""Slurm launcher with preemption/timeout auto-requeue.

Counterpart of the reference's train_submitit.py:17-130: a submitit
AutoExecutor job per TPU host, checkpoint-on-requeue via DelayedSubmission,
and the distributed env exported for ``jax.distributed.initialize``. The
timeout-aware checkpointing inside the training loop
(ttt_video_dit_tpu/training/iterator.py) pairs with ``--checkpoint.timeout_minutes``
so the job saves before the wall clock and resumes after requeue.

Usage:
    python train_submitit.py --job.config_file configs/train/ttt-mlp/3s.toml \
        --submitit.partition tpu --submitit.nodes 8 --submitit.timeout-min 720
"""

from __future__ import annotations

import argparse
import os
import sys


class Trainer:
    """Checkpointable callable: submitit pickles this across requeues."""

    def __init__(self, argv):
        self.argv = list(argv)

    def __call__(self):
        import submitit

        env = submitit.helpers.TorchDistributedEnvironment().export()
        # Map the torch-style rendezvous env onto jax.distributed.
        os.environ["TTT_NUM_PROCESSES"] = str(env.world_size)
        os.environ.setdefault("JAX_COORDINATOR_ADDRESS", f"{env.master_addr}:{env.master_port}")
        os.environ.setdefault("JAX_PROCESS_ID", str(env.rank))
        os.environ.setdefault("JAX_NUM_PROCESSES", str(env.world_size))

        import train as train_module
        from ttt_video_dit_tpu.config.job_config import JobConfig

        config = JobConfig()
        config.parse_args(self.argv)
        train_module.init_distributed()
        train_module.main(config)

    def checkpoint(self):
        """Requeue on preemption/timeout with resume enabled
        (reference: train_submitit.py:68-74)."""
        import submitit

        argv = list(self.argv)
        if "--checkpoint.resume" not in argv:
            argv.append("--checkpoint.resume")
        return submitit.helpers.DelayedSubmission(Trainer(argv))


def main() -> None:
    try:
        import submitit
    except ImportError:
        print("submitit is not installed; install it or launch train.py per host manually", file=sys.stderr)
        sys.exit(1)

    parser = argparse.ArgumentParser(add_help=False)
    parser.add_argument("--submitit.partition", dest="partition", default="tpu")
    parser.add_argument("--submitit.nodes", dest="nodes", type=int, default=1)
    parser.add_argument("--submitit.timeout-min", dest="timeout_min", type=int, default=720)
    parser.add_argument("--submitit.folder", dest="folder", default="slurm_logs/%j")
    parser.add_argument("--submitit.max-timeouts", dest="max_timeouts", type=int, default=15)
    args, train_argv = parser.parse_known_args()

    executor = submitit.AutoExecutor(folder=args.folder, slurm_max_num_timeout=args.max_timeouts)
    executor.update_parameters(
        nodes=args.nodes,
        tasks_per_node=1,  # one JAX process per TPU host
        slurm_partition=args.partition,
        timeout_min=args.timeout_min,
        name="ttt-video-tpu",
    )

    # Surface the wallclock to the in-loop timeout-aware checkpointing.
    if "--checkpoint.timeout_minutes" not in train_argv:
        train_argv += ["--checkpoint.timeout_minutes", str(args.timeout_min)]

    job = executor.submit(Trainer(train_argv))
    print(f"submitted {job.job_id}")


if __name__ == "__main__":
    main()
