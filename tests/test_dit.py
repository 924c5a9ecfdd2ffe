"""DiT forward-pass tests on a tiny debug-scale config (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ttt_video_dit_tpu.config.model_config import ModelConfig
from ttt_video_dit_tpu.models.dit.diffusion import CogVideoX
from ttt_video_dit_tpu.models.dit.dit import DiffusionTransformer


def tiny_config(**kw) -> ModelConfig:
    defaults = dict(
        model_dim=64,
        num_heads=4,
        num_layers=2,
        ssm_layer="ttt_linear",
        mini_batch_size=8,
        latent_height=8,
        latent_width=8,
        compressed_num_frames=13,
        attn_length=12,
        prefix_temporal_length=1,
        text_dim=32,
        time_embed_dim=32,
        scan_checkpoint_group_size=4,
        use_kernel=False,
        dtype="float32",
    )
    defaults.update(kw)
    return ModelConfig(**defaults)


def _data(rng, cfg, B=2, frames=13, scenes=1, text_len=8):
    vid = jnp.asarray(rng.standard_normal((B, frames, cfg.in_channels, cfg.latent_height, cfg.latent_width)), jnp.float32)
    text = jnp.asarray(rng.standard_normal((B, scenes, text_len, cfg.text_dim)), jnp.float32)
    t = jnp.asarray(rng.uniform(0, 999, (B,)), jnp.float32)
    return vid, text, t


def _seq_len(cfg, frames, scenes, text_len):
    return scenes * text_len + frames * cfg.tokens_per_frame


def test_dit_forward_single_scene(rng):
    cfg = tiny_config()
    # seq len = 8 + 13*16 = 216, divisible by mini_batch_size 8
    vid, text, t = _data(rng, cfg)
    model = DiffusionTransformer(cfg)
    params = model.init(jax.random.PRNGKey(0), vid, text, t)
    out = model.apply(params, vid, text, t)
    assert out.shape == vid.shape
    assert np.isfinite(np.asarray(out)).all()


def test_dit_forward_multiscene(rng):
    cfg = tiny_config(compressed_num_frames=37, ssm_layer="ttt_mlp")
    # 3 scenes: frames = 1 + 3*12 = 37; seq = 3*8 + 37*16 = 616 = 77*8 ✓
    vid, text, t = _data(rng, cfg, frames=37, scenes=3)
    model = DiffusionTransformer(cfg)
    params = model.init(jax.random.PRNGKey(0), vid, text, t)
    out = model.apply(params, vid, text, t)
    assert out.shape == vid.shape
    assert np.isfinite(np.asarray(out)).all()


def test_dit_remat_flags_do_not_change_values(rng):
    base = tiny_config()
    remat = tiny_config(
        remat_attention=True,
        remat_forward_ssm=True,
        remat_reverse_ssm=True,
        remat_mlp=True,
        remat_seq_modeling_block=True,
        remat_transformer_layer_group_size=2,
    )
    vid, text, t = _data(rng, base)
    m1, m2 = DiffusionTransformer(base), DiffusionTransformer(remat)
    params = m1.init(jax.random.PRNGKey(0), vid, text, t)
    out1 = m1.apply(params, vid, text, t)
    out2 = m2.apply(params, vid, text, t)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-5, atol=1e-5)


def test_cogvideox_loss(rng):
    cfg = tiny_config()
    vid, text, t = _data(rng, cfg)
    model = CogVideoX(cfg)
    B = vid.shape[0]
    bounds = (jnp.zeros((B,), jnp.int32), jnp.full((B,), 1000, jnp.int32))
    params = model.init(jax.random.PRNGKey(0), vid, text, jax.random.PRNGKey(1), bounds)
    loss = model.apply(params, vid, text, jax.random.PRNGKey(1), bounds)
    assert loss.shape == (B,)
    assert np.isfinite(np.asarray(loss)).all()
    assert (np.asarray(loss) > 0).all()


def test_dit_grads_flow(rng):
    cfg = tiny_config()
    vid, text, t = _data(rng, cfg, B=1)
    model = CogVideoX(cfg)
    bounds = (jnp.zeros((1,), jnp.int32), jnp.full((1,), 1000, jnp.int32))
    params = model.init(jax.random.PRNGKey(0), vid, text, jax.random.PRNGKey(1), bounds)

    def loss_fn(p):
        return model.apply(p, vid, text, jax.random.PRNGKey(1), bounds).mean()

    grads = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_leaves_with_path(grads)
    nonzero = sum(bool(np.abs(np.asarray(g)).max() > 0) for _, g in flat)
    assert nonzero > 0.9 * len(flat), f"only {nonzero}/{len(flat)} grads nonzero"
    for path, g in flat:
        assert np.isfinite(np.asarray(g)).all(), f"non-finite grad at {path}"
