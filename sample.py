"""Sampling entry point: storyboard JSON -> minute-long video.

Equivalent of the reference's sample.py (reference: sample.py:57-257):
parse storyboards, T5-encode positive+negative prompts, run the 50-step
DPM++(2M) ZeroSNR sampler with dynamic CFG through the DiT, VAE-decode, and
write mp4. Prompts round-robin over processes; components degrade gracefully
when their inputs are absent (no T5 dir -> random embeddings for smoke runs;
no VAE checkpoint -> latents saved as .npy; no imageio -> frames as .npz).

Usage:
    python sample.py --job.config_file configs/eval/ttt-mlp/3s.toml \
        --eval.input_file inputs/example.json --checkpoint.init_state_dir ...
"""

from __future__ import annotations

import os

from ttt_video_dit_tpu.utils.tpu_flags import ensure_tpu_flags

ensure_tpu_flags()  # before backend init (scoped-vmem limit for splash)

import contextlib

import jax
import numpy as np


def build_eval_mesh(par):
    """SPMD sampling mesh from the ``[parallelism]`` section, or None.

    The reference samples the 63 s stage under tp=2 because the model does not
    fit one GPU (reference: configs/eval/ttt-mlp/63s.toml, ttt/infra/
    parallelisms.py:106-152); here ``tp_sharding`` head-shards the denoiser the
    same way via the model's sharding constraints. Only the first
    replica*fsdp*tensor devices are used, so an 8-chip host honors
    ``tp_sharding = 2`` exactly rather than rounding up; with fewer devices
    than the config asks for we return None and the caller logs the fallback.
    ``dp_sharding = -1`` is treated as 1: sampling batches are tiny (CFG pair),
    so fsdp/replica axes only matter when the TOML requests them explicitly.
    """
    from ttt_video_dit_tpu.parallel.mesh import build_mesh

    rep = max(par.dp_replicate, 1)
    fsdp = max(par.dp_sharding, 1)
    tp = max(par.tp_sharding, 1)
    want = rep * fsdp * tp
    if want <= 1 or len(jax.devices()) < want:
        return None
    return build_mesh(rep, fsdp, tp, devices=jax.devices()[:want])


def save_video_mp4(frames: np.ndarray, path: str, fps: int = 16) -> bool:
    """frames: [T, H, W, 3] uint8. Returns False if no mp4 writer available."""
    try:
        import imageio.v2 as imageio

        writer = imageio.get_writer(path, fps=fps, codec="libx264")
        for frame in frames:
            writer.append_data(frame)
        writer.close()
        return True
    except Exception:
        np.savez_compressed(path.replace(".mp4", ".npz"), frames=frames)
        return False


def main(job_config) -> None:
    import jax.numpy as jnp

    from ttt_video_dit_tpu.config.model_config import ModelConfig
    from ttt_video_dit_tpu.models.dit import sampler as S
    from ttt_video_dit_tpu.models.dit.diffusion import CogVideoX
    from ttt_video_dit_tpu.parallel.mesh import use_mesh
    from ttt_video_dit_tpu.parallel.sharding import param_shardings
    from ttt_video_dit_tpu.training.checkpoint import Checkpointer
    from ttt_video_dit_tpu.utils.compile_cache import enable_compile_cache
    from ttt_video_dit_tpu.utils.logging import MultiLogger

    enable_compile_cache()
    logger = MultiLogger(
        dump_folder=os.path.join(job_config.job.dump_folder, "logs"), exp_name="sample", enable_wandb=False
    )

    eval_cfg = job_config.eval
    model_config = ModelConfig.get_preset(job_config.model.size, job_config.model.video_length, job_config)
    # Fused Pallas forward wins at inference — but only on real hardware; on
    # CPU (smoke runs) the kernels would run in single-threaded interpret
    # mode, turning one denoise eval into tens of minutes. The lax.scan
    # oracle path is the same math (tests/test_pallas_kernels.py).
    model_config.use_kernel = jax.default_backend() == "tpu"
    model = CogVideoX(model_config)

    # --- prompts ---------------------------------------------------------
    assert eval_cfg.input_file, "--eval.input_file (storyboard json/jsonl) required"
    storyboards = S.load_storyboards(eval_cfg.input_file)
    storyboards = storyboards[jax.process_index() :: jax.process_count()]
    logger.write(f"{len(storyboards)} storyboards for this process")

    # --- text encoder ----------------------------------------------------
    encoder = None
    if eval_cfg.t5_model_dir:
        from ttt_video_dit_tpu.models.t5 import load_text_encoder

        encoder = load_text_encoder(
            eval_cfg.t5_model_dir, dtype=eval_cfg.dtype, backend=eval_cfg.t5_backend
        )
        logger.write(f"text encoder backend: {type(encoder).__name__}")
    else:
        logger.write("WARNING: no --eval.t5_model_dir; using random text embeddings (smoke mode)")

    # --- SPMD mesh ---------------------------------------------------------
    # Honors [parallelism] the way the reference's eval configs do (tp=2 at
    # 63 s); params load/init sharded per the partition rules, the jitted
    # denoiser traces under the ambient mesh so the model's maybe_shard
    # constraints activate, and the VAE decode spatially shards.
    mesh = build_eval_mesh(job_config.parallelism)
    if mesh is not None:
        logger.write(f"SPMD sampling mesh: {dict(mesh.shape)}")
    elif any(ax > 1 for ax in (job_config.parallelism.dp_replicate,
                               job_config.parallelism.dp_sharding,
                               job_config.parallelism.tp_sharding)):
        # Any requested axis >1 that we can't satisfy deserves the warning,
        # not just tp (dp_* axes matter for batched eval too).
        logger.write(
            f"WARNING: [parallelism] asks for replicate="
            f"{job_config.parallelism.dp_replicate} fsdp="
            f"{job_config.parallelism.dp_sharding} tp="
            f"{job_config.parallelism.tp_sharding} but only "
            f"{len(jax.devices())} device(s) visible; sampling unsharded"
        )

    # --- DiT weights -----------------------------------------------------
    T = eval_cfg.sampling_num_frames
    H_lat = eval_cfg.image_height // 8
    W_lat = eval_cfg.image_width // 8
    shape = (1, T, eval_cfg.latent_channels, H_lat, W_lat)

    vid0 = jnp.zeros(shape, jnp.float32)
    scenes = max(1, model_config.num_chunks)
    text0 = jnp.zeros((1, scenes, eval_cfg.txt_maxlen, model_config.text_dim), jnp.float32)
    bounds = (jnp.zeros((1,), jnp.int32), jnp.full((1,), model_config.sigma_interval, jnp.int32))
    init_fn = lambda: model.init(jax.random.PRNGKey(0), vid0, text0, jax.random.PRNGKey(1), bounds)
    abstract = jax.eval_shape(init_fn)
    shardings = None
    if mesh is not None:
        shardings = param_shardings(abstract, mesh)
        # Sharding-annotated abstract pytree: Orbax restores each leaf
        # directly onto its mesh placement (no full-replica host copy).
        abstract = jax.tree.map(
            lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh), abstract, shardings
        )

    with use_mesh(mesh) if mesh is not None else contextlib.nullcontext():
        if job_config.checkpoint.init_state_dir:
            ckptr = Checkpointer(os.path.join(job_config.job.dump_folder, "checkpoint"))
            params = ckptr.load_pretrained(job_config.checkpoint.init_state_dir, abstract)
            logger.write(f"loaded DiT weights from {job_config.checkpoint.init_state_dir}")
        else:
            logger.write("WARNING: no --checkpoint.init_state_dir; sampling from random weights (smoke mode)")
            # Init must run under jit: an eager flax init executes the model
            # op-by-op, compiling every Pallas kernel as its own standalone
            # program through the stricter standalone-compile vmem limits.
            params = jax.jit(init_fn, out_shardings=shardings)()

        # --- VAE decoder ---------------------------------------------------
        vae = None
        if eval_cfg.vae_checkpoint_path:
            from ttt_video_dit_tpu.models.vae.autoencoder import VideoAutoencoder

            vae = VideoAutoencoder.load_decoder(
                eval_cfg.vae_checkpoint_path, scale_factor=eval_cfg.vae_scale_factor, mesh=mesh
            )
            logger.write(f"loaded VAE from {eval_cfg.vae_checkpoint_path}")

        os.makedirs(eval_cfg.output_dir, exist_ok=True)
        sampler = S.DPMPP2MSampler(
            num_steps=eval_cfg.num_denoising_steps,
            guider=S.DynamicCFG(job_config.guider.scale, job_config.guider.exp, job_config.guider.num_steps),
            shift_scale=job_config.discretization.shift_scale,
            num_idx=job_config.denoiser.num_idx,
        )

        for vi, (texts, neg_texts) in enumerate(storyboards):
            if encoder is not None:
                pos = encoder.encode(texts, eval_cfg.txt_maxlen)[None]  # [1, scenes, S, E]
                neg = encoder.encode(neg_texts, eval_cfg.txt_maxlen)[None]
            else:
                rng_np = np.random.default_rng(vi)
                pos = rng_np.standard_normal((1, len(texts), eval_cfg.txt_maxlen, model_config.text_dim)).astype(np.float32)
                neg = np.zeros_like(pos)

            denoise_fn = S.make_cfg_denoise_fn(
                model, params, jnp.asarray(pos), jnp.asarray(neg),
                sigma_interval=job_config.denoiser.num_idx,
                quantize_c_noise=job_config.denoiser.quantize_c_noise,
            )
            logger.write(f"[{vi}] sampling {T} latent frames, {eval_cfg.num_denoising_steps} steps...")
            latents = sampler(
                jax.random.PRNGKey(job_config.job.seed + vi),
                denoise_fn,
                shape,
                progress_cb=lambda i, n: logger.write(f"  denoise {i}/{n}") if i % 10 == 0 else None,
            )
            latents = np.asarray(latents[0]) / model_config.scale_factor  # [T, C, H, W]

            base = os.path.join(eval_cfg.output_dir, f"video_{jax.process_index()}_{vi}")
            if vae is None:
                np.save(base + "_latents.npy", latents)
                logger.write(f"[{vi}] saved latents to {base}_latents.npy (no VAE)")
            else:
                frames = vae.decode(latents)  # [T*4-3, H*8, W*8, 3] float in [-1, 1]
                frames = ((np.clip(frames, -1, 1) + 1) * 127.5).astype(np.uint8)
                ok = save_video_mp4(frames, base + ".mp4", fps=eval_cfg.sampling_fps)
                logger.write(f"[{vi}] wrote {base}.mp4" if ok else f"[{vi}] wrote {base}.npz (no mp4 codec)")


if __name__ == "__main__":
    import faulthandler
    import signal

    # Live stack dump on SIGUSR1 (kill -USR1 <pid>): long sampling runs on a
    # tunnel-attached TPU can stall host-side (compile transport, readbacks);
    # this makes a hung run diagnosable without a debugger.
    faulthandler.register(signal.SIGUSR1, all_threads=True)

    from ttt_video_dit_tpu.config.job_config import JobConfig

    config = JobConfig(eval_mode=True)
    config.parse_args()
    if config.job.platform:
        import jax

        jax.config.update("jax_platforms", config.job.platform)
    main(config)
