"""Benchmark harness: measures training-step MFU on real hardware.

Runs a single-chip CogVideoX-architecture training step with the full 3-second
sequence geometry (18,048 tokens: 498 text + 13 frames x 1350 tokens) and
bidirectional TTT-MLP layers, at a width that fits one chip's HBM, and prints
ONE JSON line:

    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

vs_baseline is measured MFU / 0.40 — the 40%-MFU north star from BASELINE.md
(the reference repo publishes no step-time/MFU numbers of its own).
"""

import argparse
import json
import sys
import time


def main():
    parser = argparse.ArgumentParser()
    # Default geometry: flagship *width* (5B preset is d3072/48 heads,
    # reference: ttt/models/configs.py:63-68) at 2 layers — layer count is
    # benched separately (--num-layers 42 at reduced width) since 42 x d3072
    # exceeds one chip's HBM for params+optimizer and is a multi-chip config.
    parser.add_argument("--model-dim", type=int, default=3072)
    parser.add_argument("--num-heads", type=int, default=48)
    parser.add_argument("--num-layers", type=int, default=2)
    parser.add_argument("--ssm-layer", default="ttt_mlp", choices=["ttt_mlp", "ttt_linear"])
    parser.add_argument("--video-length", default="3sec")
    parser.add_argument("--text-length", type=int, default=498)
    parser.add_argument("--batch-size", type=int, default=1)
    parser.add_argument("--steps", type=int, default=5)
    parser.add_argument("--warmup", type=int, default=2)
    parser.add_argument("--use-kernel", action="store_true", default=True)
    parser.add_argument("--no-kernel", dest="use_kernel", action="store_false")
    parser.add_argument("--no-fused-ttt-bwd", dest="fused_ttt_bwd", action="store_false",
                        default=True, help="hybrid TTT backward (fused-forward + XLA VJP "
                        "recompute) instead of the fully-fused Pallas backward")
    parser.add_argument("--remat", default="none", choices=["block", "none", "full", "layer"],
                        help="activation-checkpointing preset for the bench model; 'none' "
                        "is fastest and fits HBM at the default geometry (remat trades "
                        "recompute for memory and is for flagship-width runs). 'layer' "
                        "remats ONLY at layer granularity (no nested seq-block/MLP remat "
                        "— 'block' triple-computes those interiors); combine with "
                        "--remat-policy save_seq to skip recomputing the splash/TTT "
                        "sequential kernels entirely")
    parser.add_argument("--remat-policy", default="none", choices=["none", "save_seq"],
                        help="checkpoint policy inside remat regions: save_seq keeps the "
                        "splash out+logsumexp and TTT output+state checkpoints across the "
                        "remat boundary (recompute covers only dense/elementwise work)")
    parser.add_argument("--cpu", action="store_true", help="force CPU (debug)")
    parser.add_argument("--profile-dir", default=None,
                        help="capture a jax.profiler trace of the timed steps into this dir")
    parser.add_argument("--dump-hlo", default=None,
                        help="write the compiled train step's optimized HLO text here "
                        "(maps profile op names to instructions; compile-cache-neutral)")
    parser.add_argument("--mode", default="train", choices=["train", "sample"],
                        help="train-step MFU (default, driver contract) or DPM++ denoise throughput")
    parser.add_argument("--eval-mini-batch", type=int, default=16,
                        help="sample-mode TTT mini-batch (reference eval TOMLs use 16)")
    parser.add_argument("--splash-lean", default="auto", choices=["auto", "on", "off"],
                        help="splash block profile: auto/off=tuned blocks (default, faster "
                        "everywhere measured); on=vmem-lean 1024 recovery profile")
    parser.add_argument("--scan-layers", action="store_true",
                        help="lax.scan over transformer layers (one-layer HLO; for deep configs)")
    parser.add_argument("--storyboards", type=int, default=1,
                        help="sample mode: number of distinct storyboards (different "
                        "conditioning) to sample; >1 also asserts the per-model denoiser "
                        "jit cache prevents re-tracing between storyboards")
    parser.add_argument("--allow-selftest-fail", action="store_true",
                        help="exit 0 even when the pre-timing kernel selftest fails "
                        "(default: a parity failure exits non-zero so drivers that only "
                        "check the exit status cannot mistake the JSON for a valid perf "
                        "artifact; the JSON still prints with selftest:'fail')")
    parser.add_argument("--no-selftest", dest="selftest", action="store_false", default=True,
                        help="skip the compiled-mode kernel parity self-test that runs "
                        "before timing on TPU (utils/selftest.py; ~2 min of small compiles "
                        "cold, cache hits warm) — the bench JSON carries its verdict in "
                        "the 'selftest' field so every driver bench is also a hardware "
                        "parity artifact")
    parser.add_argument("--config", default=None,
                        help="drive the bench from a train TOML (configs/train/...): the "
                        "model preset, remat recipe, scan_layers, and kernel knobs come "
                        "from the config file exactly as train.py would resolve them; "
                        "--num-layers still overrides depth (the 42-layer 5B stack "
                        "needs a multi-chip HBM budget — see scripts/aot_scale_check.py)")
    args = parser.parse_args()

    from ttt_video_dit_tpu.utils.tpu_flags import ensure_tpu_flags

    ensure_tpu_flags()  # before backend init (scoped-vmem limit for splash)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from ttt_video_dit_tpu.utils.compile_cache import enable_compile_cache, install_cache_stats

    enable_compile_cache()
    cache_stats = install_cache_stats()
    args._cache_stats = cache_stats

    import jax.numpy as jnp
    import numpy as np

    from ttt_video_dit_tpu.config.model_config import ModelConfig, VIDEO_DURATION_CONFIGS
    from ttt_video_dit_tpu.models.dit.diffusion import CogVideoX
    from ttt_video_dit_tpu.training import optimizer as opt_mod
    from ttt_video_dit_tpu.training.setup import create_train_state, init_params
    from ttt_video_dit_tpu.training.train_step import make_train_step
    from ttt_video_dit_tpu.utils.metrics import device_peak_flops, train_step_flops

    if args.config is not None:
        # Config-file-driven row: resolve the ModelConfig exactly as train.py
        # does (JobConfig -> get_preset -> update), so the bench measures the
        # recipe a user actually gets from `--job.config_file`. Only depth is
        # overridden (42 x d3072 exceeds one chip's HBM; multi-chip fit is
        # proved by scripts/aot_scale_check.py instead).
        from ttt_video_dit_tpu.config.job_config import JobConfig

        job_config = JobConfig().parse_args(["--job.config_file", args.config])
        cfg = ModelConfig.get_preset(job_config.model.size, job_config.model.video_length, job_config)
        cfg.num_layers = args.num_layers
        cfg.text_dim = 4096
        args.model_dim = cfg.model_dim
        args.ssm_layer = cfg.ssm_layer
        args.video_length = job_config.model.video_length
    else:
        cfg = ModelConfig(
            model_dim=args.model_dim,
            num_heads=args.num_heads,
            num_layers=args.num_layers,
            ssm_layer=args.ssm_layer,
            text_dim=4096,
            use_kernel=args.use_kernel,
            remat_transformer_layers=args.remat != "none",
            remat_seq_modeling_block=args.remat in ("block", "full"),
            remat_mlp=args.remat in ("block", "full"),
            remat_attention=args.remat == "full",
            remat_forward_ssm=args.remat == "full",
            remat_reverse_ssm=args.remat == "full",
            remat_policy=args.remat_policy,
            use_fused_backward=args.fused_ttt_bwd,
            scan_layers=args.scan_layers,
            splash_lean_blocks={"auto": None, "on": True, "off": False}[args.splash_lean],
            dtype="bfloat16",
            **VIDEO_DURATION_CONFIGS[args.video_length],
        )

    # Hardware parity before timing: every bench JSON doubles as a
    # compiled-mode kernel parity artifact (VERDICT r3 ask; the reference's
    # analogous mechanism is use_kernel=False, ttt/models/ssm/ttt_layer.py:338).
    args._selftest = "skipped"
    rc = 0
    if args.selftest and jax.default_backend() == "tpu":
        from ttt_video_dit_tpu.utils.selftest import kernel_selftest

        st = kernel_selftest()
        args._selftest = "pass" if st["ok"] else "fail"
        if not st["ok"]:
            bad = {k: round(v, 5) for k, v in st["checks"].items()}
            print(f"SELFTEST FAILURES: {bad}", file=sys.stderr)
            if not args.allow_selftest_fail:
                # Still print the timing JSON (selftest:'fail' inside), but
                # exit non-zero so status-only drivers can't mistake a
                # failed-parity bench for a valid perf artifact.
                rc = 1

    if args.mode == "sample":
        bench_sampling(args)
        return rc

    model = CogVideoX(cfg)
    B, TL = args.batch_size, args.text_length
    rng_np = np.random.default_rng(0)
    T = cfg.compressed_num_frames
    h, w = cfg.latent_height * cfg.patch_size, cfg.latent_width * cfg.patch_size
    seq = cfg.num_chunks * TL + T * cfg.tokens_per_frame
    assert seq % cfg.mini_batch_size == 0, f"seq {seq} not divisible by CS {cfg.mini_batch_size}"

    batch = dict(
        vid=jnp.asarray(rng_np.standard_normal((B, T, cfg.in_channels, h, w)), jnp.float32),
        text=jnp.asarray(rng_np.standard_normal((B, cfg.num_chunks, TL, cfg.text_dim)), jnp.float32),
        sigma_lo=jnp.zeros((B,), jnp.int32),
        sigma_hi=jnp.full((B,), cfg.sigma_interval, jnp.int32),
    )

    params = init_params(model, cfg, mesh=None, rng=jax.random.PRNGKey(0), text_length=TL)
    trainable, _ = opt_mod.partition_params(params, "sft")
    tx, _, _ = opt_mod.build_optimizer(
        trainable, lr=1e-4, lr_ssm=1e-4, lr_end=0.0, warmup_steps=10, total_steps=1000
    )
    state = create_train_state(params, tx, "sft")
    step_fn = jax.jit(make_train_step(model, tx, 1, 0.1), donate_argnums=0)

    rng = jax.random.PRNGKey(42)
    if args.dump_hlo:
        with open(args.dump_hlo, "w") as f:
            f.write(step_fn.lower(state, batch, rng).compile().as_text())
    hits0, miss0 = cache_stats["hits"], cache_stats["misses"]
    t_compile0 = time.perf_counter()
    state, metrics = step_fn(state, batch, rng)
    float(metrics["loss"])  # fences trace+compile+first step
    compile_s = time.perf_counter() - t_compile0
    # hits/misses count persistent-cache retrievals/writes during the step
    # compile (only compiles >= 1 s are written, so tiny aux programs don't
    # pollute the signal). cache_hit=False means a cold environment: expect
    # ~8 min at the flagship geometry through the remote tunnel (~1 min warm);
    # the unrolled 42-layer graph is ~15 min cold (use --scan-layers).
    cache_hit = cache_stats["hits"] > hits0 and cache_stats["misses"] == miss0
    for _ in range(max(args.warmup - 1, 0)):
        state, metrics = step_fn(state, batch, rng)
    # NOTE: through the remote-execution tunnel, block_until_ready returns
    # before the device finishes; a host readback of a scalar is the only
    # reliable execution fence.
    float(metrics["loss"])

    if args.profile_dir:
        jax.profiler.start_trace(args.profile_dir)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = step_fn(state, batch, rng)
    loss_val = float(metrics["loss"])  # fences the whole chained sequence
    dt = (time.perf_counter() - t0) / args.steps
    if args.profile_dir:
        jax.profiler.stop_trace()

    flops = train_step_flops(cfg, B, TL)
    peak = device_peak_flops()
    mfu = flops / (dt * peak)

    result = {
        "metric": f"train_mfu_{args.video_length}_{args.ssm_layer}_d{args.model_dim}x{args.num_layers}_1chip",
        "value": round(mfu * 100, 2),
        "unit": "% MFU",
        "vs_baseline": round(mfu / 0.40, 4),
        "step_time_s": round(dt, 4),
        "tokens": seq,
        "tflops_per_step": round(flops / 1e12, 2),
        "device": jax.devices()[0].device_kind,
        "loss": loss_val,
        "compile_s": round(compile_s, 1),
        "cache_hit": cache_hit,
        "selftest": args._selftest,
    }
    if args.config is not None:
        result["config_file"] = args.config
    print(json.dumps(result))
    return rc


def bench_sampling(args):
    """DPM++(2M) denoise throughput (model-evals/s at CFG batch 2) — the
    BASELINE.md sampling target. Eval uses mini_batch 16 like the reference's
    eval TOMLs (reference: configs/eval/ttt-mlp/3s.toml)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ttt_video_dit_tpu.config.model_config import ModelConfig, VIDEO_DURATION_CONFIGS
    from ttt_video_dit_tpu.models.dit import sampler as S
    from ttt_video_dit_tpu.models.dit.diffusion import CogVideoX
    from ttt_video_dit_tpu.training.setup import init_params
    from ttt_video_dit_tpu.utils.metrics import device_peak_flops, dit_forward_flops

    cfg = ModelConfig(
        model_dim=args.model_dim,
        num_heads=args.num_heads,
        num_layers=args.num_layers,
        ssm_layer=args.ssm_layer,
        text_dim=4096,
        use_kernel=args.use_kernel,
        mini_batch_size=args.eval_mini_batch,
        dtype="bfloat16",
        **VIDEO_DURATION_CONFIGS[args.video_length],
    )
    model = CogVideoX(cfg)
    TL = args.text_length
    T = cfg.compressed_num_frames
    shape = (1, T, cfg.in_channels, cfg.latent_height * cfg.patch_size, cfg.latent_width * cfg.patch_size)
    assert (cfg.num_chunks * TL + T * cfg.tokens_per_frame) % cfg.mini_batch_size == 0

    params = init_params(model, cfg, mesh=None, rng=jax.random.PRNGKey(0), text_length=TL)
    rng_np = np.random.default_rng(0)
    # Distinct storyboards = distinct conditioning values through the SAME
    # jitted denoiser (the per-model cache in models/dit/sampler.py; a
    # re-trace would add minutes per video at the 63 s geometry).
    boards = [
        jnp.asarray(rng_np.standard_normal((1, cfg.num_chunks, TL, cfg.text_dim)), jnp.float32)
        for _ in range(max(args.storyboards, 1))
    ]
    smp = S.DPMPP2MSampler(num_steps=args.steps)

    denoise_fn = S.make_cfg_denoise_fn(model, params, boards[0], jnp.zeros_like(boards[0]))
    latents = smp(jax.random.PRNGKey(0), denoise_fn, shape)  # compile + warmup
    float(jnp.sum(latents.astype(jnp.float32)))  # fence (see train-mode NOTE)
    if args.profile_dir:
        # Normalize the parse with --steps (storyboards * (steps+1) evals).
        jax.profiler.start_trace(args.profile_dir)
    t0 = time.perf_counter()
    for i, pos in enumerate(boards):
        denoise_fn = S.make_cfg_denoise_fn(model, params, pos, jnp.zeros_like(pos))
        latents = smp(jax.random.PRNGKey(1 + i), denoise_fn, shape)
        float(jnp.sum(latents.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / len(boards)
    if args.profile_dir:
        jax.profiler.stop_trace()

    # The jitted denoiser body must have traced exactly once across all
    # storyboards (conditioning is an argument, never a closure constant).
    n_traces = S._DENOISE_JIT_CACHE[(id(model), False)][1]._cache_size()
    assert n_traces == 1, f"denoiser re-traced: {n_traces} cache entries"

    evals = args.steps + 1  # DPM++ evaluates once per sigma incl. endpoint
    flops = 2 * dit_forward_flops(cfg, 1, TL).total  # CFG doubles the batch
    result = {
        "metric": f"sample_denoise_evals_per_s_{args.video_length}_{args.ssm_layer}_d{args.model_dim}x{args.num_layers}_1chip",
        "value": round(evals / dt, 3),
        "unit": "denoise evals/s",
        "vs_baseline": None,
        "s_per_eval": round(dt / evals, 4),
        "mfu_pct": round(100 * evals * flops / (dt * device_peak_flops()), 2),
        "storyboards": len(boards),
        "denoiser_traces": n_traces,
        "device": jax.devices()[0].device_kind,
        "selftest": args._selftest,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
