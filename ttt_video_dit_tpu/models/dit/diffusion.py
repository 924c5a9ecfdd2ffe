"""CogVideoX diffusion wrapper: sigma sampling, v-prediction noising, and the
weighted L2 training loss (reference: ttt/models/cogvideo/model.py:8-66).

Functional re-design: instead of a stateful module carrying a CUDA noise
generator, the train step passes a jax PRNG key and the per-sample stratified
sigma-index bounds; everything else is pure.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ttt_video_dit_tpu.config.model_config import ModelConfig
from ttt_video_dit_tpu.models.dit.dit import DiffusionTransformer
from ttt_video_dit_tpu.models.dit.schedule import training_sigma_table, video_scaling


def _append_dims(x, ndim: int):
    return x.reshape(x.shape + (1,) * (ndim - x.ndim))


class CogVideoX(nn.Module):
    """Training loss wrapper around the DiT."""

    config: ModelConfig

    def setup(self):
        self.dit = DiffusionTransformer(self.config)

    def __call__(self, vid, text, rng, sigma_bounds):
        """Per-sample training loss.

        vid: [B, T, C, H, W] latents; text: [B, scenes, S, text_dim];
        rng: PRNG key; sigma_bounds: ([B], [B]) int32 stratified index bounds.
        Returns loss [B].
        """
        cfg = self.config
        B = vid.shape[0]
        key_idx, key_noise = jax.random.split(rng)

        # randint with per-sample bounds: draw in [0, hi-lo) then offset.
        lo, hi = sigma_bounds
        u = jax.random.randint(key_idx, (B,), 0, jnp.int32(1) << 30, dtype=jnp.int32)
        idx = lo + u % jnp.maximum(hi - lo, 1)

        table = jnp.asarray(training_sigma_table(cfg.sigma_interval))
        alphas_cumprod_sqrt = table[idx]
        a = _append_dims(alphas_cumprod_sqrt, vid.ndim)

        noise = jax.random.normal(key_noise, vid.shape, jnp.float32)
        vid_f = vid.astype(jnp.float32)
        noised = vid_f * a + noise * jnp.sqrt(1.0 - a**2)

        c_skip, c_out, c_in, c_noise = video_scaling(a, idx)

        model_output = self.dit((noised * c_in).astype(jnp.dtype(cfg.dtype)), text, c_noise)
        denoised = model_output.astype(jnp.float32) * c_out + noised * c_skip

        w = 1.0 / (1.0 - a**2)
        return jnp.mean((w * (denoised - vid_f) ** 2).reshape(B, -1), axis=1)

    def denoise(self, noised, alpha_cumprod_sqrt, text, timesteps):
        """One denoiser evaluation for sampling: applies v-pred scalings around
        the DiT (reference: DiscreteDenoiser.forward, cogvideo/utils.py:460-492).

        noised: [B,T,C,H,W]; alpha_cumprod_sqrt: [B]; timesteps: [B] (c_noise).
        """
        cfg = self.config
        a = _append_dims(alpha_cumprod_sqrt, noised.ndim).astype(jnp.float32)
        c_skip, c_out, c_in, _ = video_scaling(a, timesteps)
        model_output = self.dit((noised * c_in).astype(jnp.dtype(cfg.dtype)), text, timesteps)
        return model_output.astype(jnp.float32) * c_out + noised.astype(jnp.float32) * c_skip
