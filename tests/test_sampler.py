"""Sampling stack tests: storyboard parsing, DynamicCFG schedule parity,
DPM++(2M) multiplier parity vs the reference implementation, and an
end-to-end tiny sampling smoke."""

import json
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.reference_oracle import load_reference, reference_available
from tests.test_dit import tiny_config
from ttt_video_dit_tpu.models.dit import sampler as S

needs_reference = pytest.mark.skipif(not reference_available(), reason="reference checkout not available")


def test_storyboard_parsing(tmp_path):
    scenes = [
        [
            {"text": "a cat", "neg_text": "blurry"},
            {"text": "a dog", "requires_scene_transition": True},
            {"text": "a bird", "requires_scene_transition": False},
        ]
    ]
    p = tmp_path / "story.json"
    p.write_text(json.dumps(scenes))
    out = S.load_storyboards(str(p))
    assert len(out) == 1
    texts, negs = out[0]
    assert texts[0] == "a cat" + S.SCENE_END_TOKEN
    assert texts[1] == S.SCENE_START_TOKEN + "a dog"
    assert texts[2] == "a bird"
    assert negs[0] == "blurry" and negs[1] is None

    # jsonl with single-scene video; first scene never gets a start token.
    p2 = tmp_path / "story.jsonl"
    p2.write_text(json.dumps([{"text": "solo", "requires_scene_transition": True}]) + "\n")
    out2 = S.load_storyboards(str(p2))
    assert out2[0][0] == ["solo"]


@needs_reference
def test_dynamic_cfg_schedule_matches_reference():
    ref_cog, _ = load_reference()
    ref = ref_cog.DynamicCFG(scale=6, exp=5, num_steps=50)
    ours = S.DynamicCFG(scale=6, exp=5, num_steps=50)
    # step_index values as produced by the reference loop: num_steps - timestep
    # over the ZeroSNR timesteps (mostly large negative — reproduced verbatim).
    for step_index in [-949, -750, -500, -101, 0, 10, 31, 49]:
        ref_scale = ref.scale_schedule(None, step_index)
        np.testing.assert_allclose(ours.scale_at(step_index), ref_scale, rtol=1e-12)


@needs_reference
def test_dpmpp_multipliers_match_reference():
    import torch

    ref_cog, _ = load_reference()
    ref = ref_cog.VPSDEDPMPP2MSampler.__new__(ref_cog.VPSDEDPMPP2MSampler)
    ours = S.DPMPP2MSampler(num_steps=50)

    for a, a_next, a_prev in [(0.2, 0.5, 0.1), (0.5, 0.9, 0.2), (0.9, 0.99, 0.5)]:
        t = lambda v: torch.tensor(v, dtype=torch.float64)
        h, r, _, _ = ref.get_variables(t(a), t(a_next), t(a_prev))
        ref_m = ref.get_mult(h, r, t(a), t(a_next), t(a_prev))
        h2, our_m = ours._mults(a, a_next, a_prev)
        np.testing.assert_allclose(float(h), h2, rtol=1e-9)
        for rm, om in zip(ref_m, our_m):
            np.testing.assert_allclose(float(rm), om, rtol=1e-9)

    # No-previous case
    h, r, _, _ = ref.get_variables(torch.tensor(0.2), torch.tensor(0.5))
    ref_m = ref.get_mult(h, r, torch.tensor(0.2), torch.tensor(0.5), None)
    _, our_m = ours._mults(0.2, 0.5, None)
    assert len(our_m) == 2
    for rm, om in zip(ref_m, our_m):
        np.testing.assert_allclose(float(rm), om, rtol=1e-6)


def test_sampling_smoke(rng):
    """Tiny end-to-end: 4 denoise steps through the real DiT produce finite
    latents of the right shape."""
    from ttt_video_dit_tpu.models.dit.diffusion import CogVideoX

    cfg = tiny_config()
    model = CogVideoX(cfg)
    B, frames, scenes, text_len = 1, 13, 1, 8
    shape = (B, frames, cfg.in_channels, 8, 8)
    text = jnp.asarray(rng.standard_normal((B, scenes, text_len, cfg.text_dim)), jnp.float32)
    neg = jnp.zeros_like(text)

    vid0 = jnp.zeros(shape, jnp.float32)
    bounds = (jnp.zeros((B,), jnp.int32), jnp.full((B,), 1000, jnp.int32))
    params = model.init(jax.random.PRNGKey(0), vid0, text, jax.random.PRNGKey(1), bounds)

    denoise_fn = S.make_cfg_denoise_fn(model, params, text, neg)
    sampler = S.DPMPP2MSampler(num_steps=4, guider=S.DynamicCFG(scale=6, exp=5, num_steps=4))
    out = sampler(jax.random.PRNGKey(7), denoise_fn, shape)
    assert out.shape == shape
    assert np.isfinite(np.asarray(out)).all()


def test_denoise_program_has_no_baked_weights(rng):
    """The jitted denoiser must take params/conditioning as arguments, not
    closure constants: a closed-over pytree is baked into the program as
    literals, multiplying program size by model size (a 400+ MB HLO at d512,
    which broke remote-compile transports). Guard the program size."""
    from ttt_video_dit_tpu.models.dit.diffusion import CogVideoX

    cfg = tiny_config()
    model = CogVideoX(cfg)
    B, frames, scenes, text_len = 1, 13, 1, 8
    shape = (B, frames, cfg.in_channels, 8, 8)
    text = jnp.asarray(rng.standard_normal((B, scenes, text_len, cfg.text_dim)), jnp.float32)
    vid0 = jnp.zeros(shape, jnp.float32)
    bounds = (jnp.zeros((B,), jnp.int32), jnp.full((B,), 1000, jnp.int32))
    params = model.init(jax.random.PRNGKey(0), vid0, text, jax.random.PRNGKey(1), bounds)
    n_param_bytes = sum(np.asarray(x).nbytes for x in jax.tree.leaves(params))

    denoise_fn = S.make_cfg_denoise_fn(model, params, text, jnp.zeros_like(text))
    # Reach through the wrapper to the underlying jitted callable and lower it
    # with the wrapper's bound arguments.
    import inspect

    closure = inspect.getclosurevars(denoise_fn).nonlocals
    lowered = closure["_denoise"].lower(
        closure["params"], closure["cond"], closure["table"], vid0, 0.5, 500.0
    )
    hlo_bytes = len(lowered.as_text().encode())
    # Literal-baked params would push the program well past the param size;
    # the real program is tens of KB at this geometry.
    assert hlo_bytes < max(n_param_bytes // 2, 2 * 1024 * 1024), (
        f"denoise HLO is {hlo_bytes/1e6:.1f} MB for {n_param_bytes/1e6:.1f} MB "
        "of params - weights or tables are being baked into the program"
    )


def test_scanned_sampler_matches_loop(rng):
    """The single-program lax.scan trajectory must match the per-step Python
    loop bit-for-bit in structure (same rng split order, same per-step
    constants) and numerically to float tolerance."""
    from ttt_video_dit_tpu.models.dit.diffusion import CogVideoX

    cfg = tiny_config()
    model = CogVideoX(cfg)
    B, frames, scenes, text_len = 1, 13, 1, 8
    shape = (B, frames, cfg.in_channels, 8, 8)
    text = jnp.asarray(rng.standard_normal((B, scenes, text_len, cfg.text_dim)), jnp.float32)
    vid0 = jnp.zeros(shape, jnp.float32)
    bounds = (jnp.zeros((B,), jnp.int32), jnp.full((B,), 1000, jnp.int32))
    params = model.init(jax.random.PRNGKey(0), vid0, text, jax.random.PRNGKey(1), bounds)

    denoise_fn = S.make_cfg_denoise_fn(model, params, text, jnp.zeros_like(text))
    sampler = S.DPMPP2MSampler(num_steps=4, guider=S.DynamicCFG(scale=6, exp=5, num_steps=4))
    out_loop = sampler(jax.random.PRNGKey(7), denoise_fn, shape, scan=False)
    out_scan = sampler(jax.random.PRNGKey(7), denoise_fn, shape, scan=True)
    assert np.isfinite(np.asarray(out_scan)).all()
    np.testing.assert_allclose(np.asarray(out_scan), np.asarray(out_loop), rtol=1e-4, atol=1e-4)


def test_denoiser_jit_reused_across_conditionings(rng):
    """A new storyboard (new text conditioning) must NOT re-trace the
    denoiser: the jit wrapper is cached per (model, quantize flag) and the
    conditioning is an argument. Per-video re-compiles cost minutes on TPU."""
    from ttt_video_dit_tpu.models.dit.diffusion import CogVideoX

    cfg = tiny_config()
    model = CogVideoX(cfg)
    text1 = jnp.asarray(rng.standard_normal((1, 1, 8, cfg.text_dim)), jnp.float32)
    text2 = jnp.asarray(rng.standard_normal((1, 1, 8, cfg.text_dim)), jnp.float32)
    f1 = S.make_cfg_denoise_fn(model, {}, text1, jnp.zeros_like(text1))
    f2 = S.make_cfg_denoise_fn(model, {}, text2, jnp.zeros_like(text2))
    c1 = inspect_closure(f1)
    c2 = inspect_closure(f2)
    assert c1["_denoise"] is c2["_denoise"]
    assert f1.core is f2.core


def inspect_closure(fn):
    import inspect

    return inspect.getclosurevars(fn).nonlocals


# ----------------------------------------------------------- SPMD sampling


def test_spmd_sampling_parity(rng):
    """Sharded sampling (tp=2 head sharding + fsdp param sharding on the CPU
    mesh) must reproduce the unsharded latents: this is the sample.py SPMD
    wiring — params sharded per the partition rules, the denoiser traced
    under the ambient mesh so the model's maybe_shard constraints activate
    (reference samples 63 s under tp=2: configs/eval/ttt-mlp/63s.toml,
    ttt/infra/parallelisms.py:106-152)."""
    import contextlib

    from ttt_video_dit_tpu.models.dit.diffusion import CogVideoX
    from ttt_video_dit_tpu.parallel.mesh import build_mesh, use_mesh
    from ttt_video_dit_tpu.parallel.sharding import shard_params

    cfg = tiny_config()
    model = CogVideoX(cfg)
    B, frames, scenes, text_len = 1, 13, 1, 8
    shape = (B, frames, cfg.in_channels, 8, 8)
    text = jnp.asarray(rng.standard_normal((B, scenes, text_len, cfg.text_dim)), jnp.float32)
    vid0 = jnp.zeros(shape, jnp.float32)
    bounds = (jnp.zeros((B,), jnp.int32), jnp.full((B,), 1000, jnp.int32))
    params = model.init(jax.random.PRNGKey(0), vid0, text, jax.random.PRNGKey(1), bounds)

    def run(mesh, params_):
        denoise_fn = S.make_cfg_denoise_fn(model, params_, text, jnp.zeros_like(text))
        sampler = S.DPMPP2MSampler(num_steps=3, guider=S.DynamicCFG(scale=6, exp=5, num_steps=3))
        with use_mesh(mesh) if mesh is not None else contextlib.nullcontext():
            return np.asarray(sampler(jax.random.PRNGKey(7), denoise_fn, shape))

    ref = run(None, params)
    mesh = build_mesh(1, 2, 2, devices=jax.devices()[:4])
    out = run(mesh, shard_params(params, mesh))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_eval_toml_tp_sharding_builds_mesh():
    """configs/eval/ttt-mlp/63s.toml carries tp_sharding=2; sample.py's mesh
    builder must honor it (a 1x1x2 mesh over the first 2 devices) instead of
    silently ignoring it."""
    # Load by explicit path: the reference oracle puts /root/reference on
    # sys.path, whose own sample.py would otherwise shadow ours.
    import importlib.util
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(__file__)), "sample.py")
    spec = importlib.util.spec_from_file_location("ttt_tpu_sample_entry", path)
    sample_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sample_mod)
    from ttt_video_dit_tpu.config.job_config import JobConfig

    jc = JobConfig(eval_mode=True).parse_args(["--job.config_file", "configs/eval/ttt-mlp/63s.toml"])
    mesh = sample_mod.build_eval_mesh(jc.parallelism)
    assert mesh is not None, "tp_sharding=2 must build a mesh when devices allow"
    assert dict(mesh.shape) == {"replica": 1, "fsdp": 1, "tensor": 2}

    # Single-axis config -> no mesh (unsharded fast path).
    jc1 = JobConfig(eval_mode=True).parse_args(["--job.config_file", "configs/eval/ttt-mlp/3s.toml"])
    assert sample_mod.build_eval_mesh(jc1.parallelism) is None
