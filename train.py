"""Training entry point.

Equivalent of the reference's train.py (reference: train.py:25-216), TPU-native:
one global mesh + jitted SPMD train step replaces NCCL/FSDP2/DTensor plumbing;
Orbax replaces torch DCP; sigma stratification, text dropout, grad accum,
grouped AdamW schedules, fault-tolerant data resume, interval + timeout-aware
checkpointing all preserved.

Usage:
    python train.py --job.config_file configs/train/debug.toml
    python train.py --job.config_file configs/train/ttt-mlp/3s.toml \
        --training.dataset_path /data --training.jsonl_paths /data/meta.jsonl
"""

from __future__ import annotations

import os

from ttt_video_dit_tpu.utils.tpu_flags import ensure_tpu_flags

ensure_tpu_flags()  # before backend init (scoped-vmem limit for splash)

import jax


def init_distributed() -> None:
    """Initialize multi-host JAX if launched as a multi-process job."""
    if int(os.environ.get("TTT_NUM_PROCESSES", "1")) > 1 or "SLURM_NTASKS" in os.environ and int(
        os.environ.get("SLURM_NTASKS", "1")
    ) > 1:
        jax.distributed.initialize()


def main(job_config) -> None:
    import jax.numpy as jnp
    import numpy as np

    from ttt_video_dit_tpu.config.model_config import ModelConfig
    from ttt_video_dit_tpu.data.dataset import DataModule, SyntheticDataModule
    from ttt_video_dit_tpu.models.dit.diffusion import CogVideoX
    from ttt_video_dit_tpu.models.dit.schedule import StratifiedSigmaBuckets
    from ttt_video_dit_tpu.parallel.mesh import build_mesh, use_mesh
    from ttt_video_dit_tpu.training import optimizer as opt_mod
    from ttt_video_dit_tpu.training.checkpoint import Checkpointer
    from ttt_video_dit_tpu.training.iterator import TrainingIterator
    from ttt_video_dit_tpu.training.setup import (
        batch_shardings,
        create_train_state,
        init_params,
        make_global_batch,
    )
    from ttt_video_dit_tpu.training.train_step import make_train_step
    from ttt_video_dit_tpu.utils.compile_cache import enable_compile_cache
    from ttt_video_dit_tpu.utils.logging import MultiLogger
    from ttt_video_dit_tpu.utils.metrics import device_peak_flops, train_step_flops

    enable_compile_cache()

    logger = MultiLogger(
        dump_folder=os.path.join(job_config.job.dump_folder, "logs"),
        exp_name=job_config.job.exp_name,
        enable_wandb=not job_config.wandb.disable,
        wandb_project=job_config.wandb.project,
        wandb_entity=job_config.wandb.entity,
    )

    mesh = build_mesh(
        dp_replicate=job_config.parallelism.dp_replicate,
        dp_sharding=job_config.parallelism.dp_sharding,
        tp_sharding=job_config.parallelism.tp_sharding,
    )
    dp_size = mesh.shape["replica"] * mesh.shape["fsdp"]
    logger.write(f"mesh: {dict(mesh.shape)}")

    model_config = ModelConfig.get_preset(job_config.model.size, job_config.model.video_length, job_config)
    model = CogVideoX(model_config)

    global_bs = job_config.training.global_batch_size
    buckets = StratifiedSigmaBuckets.create(model_config.sigma_interval, dp_size)
    sigma_lo, sigma_hi = buckets.sample_bounds(global_bs, dp_size)
    # Per-process contiguous slice of the (identically computed) global bounds.
    pi, pc = jax.process_index(), jax.process_count()
    assert global_bs % pc == 0, f"global batch {global_bs} not divisible by {pc} processes"
    local_bs = global_bs // pc
    sigma_lo_local = sigma_lo[pi * local_bs : (pi + 1) * local_bs]
    sigma_hi_local = sigma_hi[pi * local_bs : (pi + 1) * local_bs]

    # Data
    if job_config.training.jsonl_paths:
        data_module = DataModule(
            dataset_path=job_config.training.dataset_path,
            scale_factor=model_config.scale_factor,
            jsonl_paths=job_config.training.jsonl_paths,
            seed=job_config.job.seed,
            process_index=jax.process_index(),
            process_count=jax.process_count(),
        )
        text_length = None  # from files
    else:
        # Synthetic smoke-training data with the configured geometry.
        T = model_config.compressed_num_frames
        h = model_config.latent_height * model_config.patch_size
        w = model_config.latent_width * model_config.patch_size
        C = model_config.num_chunks
        # Choose a text length near the reference default that keeps the
        # sequence divisible by the TTT mini-batch size.
        CS = model_config.mini_batch_size
        vid_tokens = T * model_config.tokens_per_frame
        tl = 498
        while (C * tl + vid_tokens) % CS != 0:
            tl += 1
        data_module = SyntheticDataModule(
            vid_shape=(T, model_config.in_channels, h, w),
            text_shape=(C, tl, model_config.text_dim),
            seed=job_config.job.seed,
            process_count=jax.process_count(),
        )
        text_length = tl
        logger.write(f"synthetic data: text_length={tl}, seq={C * tl + vid_tokens}")

    with use_mesh(mesh):
        params = init_params(
            model, model_config, mesh, jax.random.PRNGKey(job_config.job.seed), text_length=text_length or 498
        )
        num_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
        adapter = model_config.adapter_method if model_config.adapter_method != "none" else "none"
        trainable, _ = opt_mod.partition_params(params, adapter)
        tx, labels, schedules = opt_mod.build_optimizer_from_config(trainable, job_config)
        state = create_train_state(params, tx, adapter)

        ckpt_dir = os.path.join(job_config.job.dump_folder, "checkpoint")
        checkpointer = Checkpointer(ckpt_dir)

        start_step = 0
        if job_config.checkpoint.resume:
            abstract = jax.eval_shape(lambda: state)
            start_step, state, sampler_state, metadata = checkpointer.restore(
                job_config.checkpoint.resume_step, abstract
            )
            data_module.sampler.load_state_dict(sampler_state)
            logger.wandb_run_id = metadata.get("wandb_id")
            logger.load_stats(os.path.join(ckpt_dir, str(start_step)))
            logger.write(f"resumed from step {start_step}")
        elif job_config.checkpoint.init_state_dir:
            loaded = checkpointer.load_pretrained(job_config.checkpoint.init_state_dir, jax.eval_shape(lambda: params))
            trainable, frozen = opt_mod.partition_params(loaded, adapter)
            state = state.replace(trainable=trainable, frozen=frozen)
            logger.write(f"loaded pretrained weights from {job_config.checkpoint.init_state_dir}")

        logger.init_log(job_config, model_config, num_params)

        step_fn = jax.jit(
            make_train_step(
                model,
                tx,
                grad_accum_steps=job_config.training.grad_accum_steps,
                text_dropout_prob=job_config.training.text_dropout_prob,
            ),
            donate_argnums=0,
        )
        b_shardings = batch_shardings(mesh)
        rng = jax.random.PRNGKey(job_config.job.seed)

        def on_checkpoint(step: int, timeout: bool) -> None:
            checkpointer.save(step, state, data_module.sampler.state_dict(), {"wandb_id": logger.wandb_run_id})
            # Stats-history snapshot per checkpoint (reference: logging.py:126-147).
            logger.snapshot_stats(os.path.join(ckpt_dir, str(step)))
            logger.write(f"checkpoint saved at step {step}{' (timeout-aware)' if timeout else ''}")

        train_iter = TrainingIterator(
            start_step,
            job_config.training.steps,
            checkpoint_interval=job_config.checkpoint.interval,
            timeout_minutes=job_config.checkpoint.timeout_minutes,
            on_checkpoint=on_checkpoint,
            desc=job_config.job.exp_name,
        )

        from ttt_video_dit_tpu.utils.misc import GarbageCollection, TimedContext, set_random_seed

        set_random_seed(job_config.job.seed)
        gc_handler = GarbageCollection(gc_freq=job_config.training.gc_freq)

        batches = data_module.batches(global_bs)
        flops = None
        for step in train_iter:
            gc_handler.run(step)
            if job_config.job.profile_dir:
                if step == 10:
                    jax.profiler.start_trace(job_config.job.profile_dir)
                elif step == 13:
                    jax.profiler.stop_trace()
                    logger.write(f"profiler trace written to {job_config.job.profile_dir}")

            with TimedContext() as data_timer:
                host_batch = next(batches)  # per-process shard (global_bs / process_count)
                host_batch["sigma_lo"], host_batch["sigma_hi"] = sigma_lo_local, sigma_hi_local
                batch = make_global_batch(host_batch, b_shardings, process_count=pc)
            data_time = data_timer.duration

            state, metrics = step_fn(state, batch, rng)

            if flops is None:
                tl_actual = host_batch["text"].shape[2]
                flops = train_step_flops(model_config, global_bs, tl_actual)

            loss = float(metrics["loss"])  # host readback fences the step
            step_s = train_iter.ema_step_seconds or 0.0
            mfu = flops / (step_s * jax.device_count() * device_peak_flops()) if step_s else 0.0
            lr_now = {name: float(fn(step)) for name, fn in schedules.items()}
            stats = {
                "train/loss": loss,
                "gradient_norm": float(metrics["grad_norm"]),
                "dataloader_time": data_time,
                "step_time_ema_s": step_s,
                "mfu": mfu,
                **{f"learning_rate/{k}": v for k, v in lr_now.items()},
            }
            logger.log_stats(step, stats)
            if step % 10 == 1 or step == job_config.training.steps:
                logger.write(
                    f"step {step}/{job_config.training.steps} loss {loss:.4f} "
                    f"grad_norm {stats['gradient_norm']:.4f} s/it {step_s:.2f} mfu {mfu * 100:.1f}%"
                )

        checkpointer.wait()
        logger.alert("Training complete", f"{job_config.job.exp_name} finished {job_config.training.steps} steps")
        logger.write("training complete")


if __name__ == "__main__":
    from ttt_video_dit_tpu.config.job_config import JobConfig

    config = JobConfig()
    config.parse_args()
    if config.job.platform:
        jax.config.update("jax_platforms", config.job.platform)
    init_distributed()
    main(config)
