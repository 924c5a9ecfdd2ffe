"""3D causal VAE encoder/decoder (CogVideoX architecture), TPU-native flax.

Re-design of the reference's context-parallel VAE
(reference: ttt/models/vae/cp_enc_dec.py:356-976): ResNet-style 3D UNet halves
with *causal* temporal convolutions (kernel sees only past frames), temporal
4x + spatial 8x compression, GroupNorm(32) / spatially-modulated norm in the
decoder, and the first-frame-special temporal up/downsampling.

TPU-first choices:
- channels-last [B, T, H, W, C] layout everywhere (MXU/conv native); the
  public wrapper (autoencoder.py) converts from the reference's NCTHW.
- The reference's "fake context parallel" inter-tile conv cache (CPU-cached
  padding tensors, reference: cp_enc_dec.py:237-284, 394-419) becomes a flax
  ``cache`` variable collection: each CausalConv3d stores its last
  (kt-1) input frames; sequential temporal tiles thread the collection
  through ``apply(..., mutable=["cache"])``.
- Real context parallelism (halo exchange) is unnecessary: the reference
  ships with cp_size=1 (reference: autoencoder.py:81) and tiles sequentially.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ttt_video_dit_tpu.config.model_config import VaeModelConfig


def swish(x):
    return x * jax.nn.sigmoid(x)


# SafeConv3d parity (reference: ttt/models/vae/utils.py:72-91): the reference
# splits any conv whose input exceeds 2 GB into temporal parts (cudnn's 2 GB
# tensor limit).  TPUs have no such hard limit, but the same static temporal
# chunking bounds the conv workspace XLA must keep live at the full-resolution
# encoder levels.  Chunking a *causal* conv with a (kt-1)-frame halo is exact,
# so this never changes numerics (tests/test_vae.py::test_chunked_conv_exact).
CONV_CHUNK_BYTES = 2 ** 31


def _conv_time_chunks(t_out: int, nbytes: int, limit: int):
    """Split t_out output frames into equal-ish chunks so each chunk's input
    stays under `limit` bytes.  Returns a list of (start, stop) output ranges;
    a single full-range chunk means "don't split"."""
    if nbytes <= limit or t_out <= 1:
        return [(0, t_out)]
    n = min(-(-nbytes // limit), t_out)
    step = -(-t_out // n)
    return [(s, min(s + step, t_out)) for s in range(0, t_out, step)]


class CausalConv3d(nn.Module):
    """3D conv, causal in time: pads (kt-1) frames on the left, either by
    repeating the first frame (first tile) or from the cached tail of the
    previous tile (reference: ContextParallelCausalConv3d)."""

    features: int
    kernel_size: Tuple[int, int, int] = (3, 3, 3)

    @nn.compact
    def __call__(self, x, first: bool = True):
        kt, kh, kw = self.kernel_size
        if kt > 1:
            cache = self.variable(
                "cache", "pad", lambda: jnp.zeros((x.shape[0], kt - 1) + x.shape[2:], x.dtype)
            )
            pad = jnp.repeat(x[:, :1], kt - 1, axis=1) if first else cache.value
            x = jnp.concatenate([pad, x], axis=1)
            cache.value = x[:, -(kt - 1):]
        conv = nn.Conv(
            self.features,
            kernel_size=(kt, kh, kw),
            strides=(1, 1, 1),
            padding=[(0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2)],
            name="conv",
        )
        t_out = x.shape[1] - (kt - 1)
        chunks = _conv_time_chunks(t_out, x.size * x.dtype.itemsize, CONV_CHUNK_BYTES)
        if len(chunks) == 1:
            return conv(x)
        # Each output range [s, e) reads input frames [s, e + kt - 1).
        return jnp.concatenate([conv(x[:, s : e + kt - 1]) for s, e in chunks], axis=1)


class SpatialNorm3D(nn.Module):
    """GroupNorm modulated by a nearest-resized projection of the latent zq
    (reference: cp_enc_dec.py:447-506)."""

    features: int

    @nn.compact
    def __call__(self, f, zq, first: bool = True):
        T = f.shape[1]
        target = f.shape[1:4]
        if T > 1 and T % 2 == 1:
            # First frame resized alone (temporal causality of the upsampling).
            zq_first = _nearest_resize(zq[:, :1], (1,) + target[1:])
            zq_rest = _nearest_resize(zq[:, 1:], (T - 1,) + target[1:])
            zq = jnp.concatenate([zq_first, zq_rest], axis=1)
        else:
            zq = _nearest_resize(zq, target)

        norm_f = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm_layer")(f)
        conv_y = CausalConv3d(f.shape[-1], (1, 1, 1), name="conv_y")(zq, first)
        conv_b = CausalConv3d(f.shape[-1], (1, 1, 1), name="conv_b")(zq, first)
        return norm_f * conv_y + conv_b


def _nearest_resize(x, target_thw):
    """Nearest-neighbor resize of [B, T, H, W, C] to target (T', H', W')."""
    B, T, H, W, C = x.shape
    return jax.image.resize(x, (B,) + tuple(target_thw) + (C,), method="nearest")


class Upsample3D(nn.Module):
    """2x spatial (and optionally causal 2x temporal) nearest upsampling +
    conv (reference: cp_enc_dec.py:527-564)."""

    features: int
    compress_time: bool = False

    @nn.compact
    def __call__(self, x):
        B, T, H, W, C = x.shape
        if self.compress_time and T > 1:
            if T % 2 == 1:
                # First frame upsamples spatially only; the rest 2x in time too.
                first = jnp.repeat(jnp.repeat(x[:, :1], 2, axis=2), 2, axis=3)
                rest = x[:, 1:]
                rest = jnp.repeat(jnp.repeat(jnp.repeat(rest, 2, axis=1), 2, axis=2), 2, axis=3)
                x = jnp.concatenate([first, rest], axis=1)
            else:
                x = jnp.repeat(jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2), 2, axis=3)
        else:
            x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)

        T2 = x.shape[1]
        y = x.reshape(B * T2, *x.shape[2:])
        y = nn.Conv(self.features, kernel_size=(3, 3), padding=1, name="conv")(y)
        return y.reshape(B, T2, *y.shape[1:])


class DownSample3D(nn.Module):
    """Strided-conv 2x spatial (and optionally causal 2x temporal avg-pool)
    downsampling (reference: cp_enc_dec.py:567-607)."""

    features: int
    compress_time: bool = False

    @nn.compact
    def __call__(self, x):
        B, T, H, W, C = x.shape
        if self.compress_time and T > 1:
            if T % 2 == 1:
                first, rest = x[:, :1], x[:, 1:]
                if rest.shape[1] > 0:
                    rest = rest.reshape(B, (T - 1) // 2, 2, H, W, C).mean(axis=2)
                x = jnp.concatenate([first, rest], axis=1)
            else:
                x = x.reshape(B, T // 2, 2, H, W, C).mean(axis=2)

        T2 = x.shape[1]
        y = x.reshape(B * T2, *x.shape[2:])
        # Asymmetric (0,1) spatial padding then stride-2 conv, like torch.
        y = jnp.pad(y, ((0, 0), (0, 1), (0, 1), (0, 0)))
        y = nn.Conv(self.features, kernel_size=(3, 3), strides=(2, 2), padding="VALID", name="conv")(y)
        return y.reshape(B, T2, *y.shape[1:])


class ResnetBlock3D(nn.Module):
    """norm -> swish -> causal conv, twice, with residual
    (reference: cp_enc_dec.py:610-711)."""

    out_channels: int
    spatial_norm: bool = False  # decoder blocks use zq-modulated norm

    @nn.compact
    def __call__(self, x, zq=None, first: bool = True):
        in_channels = x.shape[-1]

        def norm(name, h):
            if self.spatial_norm:
                return SpatialNorm3D(h.shape[-1], name=name)(h, zq, first)
            return nn.GroupNorm(num_groups=32, epsilon=1e-6, name=name)(h)

        h = norm("norm1", x)
        h = swish(h)
        h = CausalConv3d(self.out_channels, (3, 3, 3), name="conv1")(h, first)
        h = norm("norm2", h)
        h = swish(h)
        h = CausalConv3d(self.out_channels, (3, 3, 3), name="conv2")(h, first)

        if in_channels != self.out_channels:
            x = nn.Conv(self.out_channels, kernel_size=(1, 1, 1), name="nin_shortcut")(x)
        return x + h


class Encoder3D(nn.Module):
    """Causal 3D encoder: spatial 8x, temporal 4x compression
    (reference: ContextParallelEncoder3D, cp_enc_dec.py:714-829)."""

    config: VaeModelConfig
    temporal_compress_times: int = 4

    @nn.compact
    def __call__(self, x, first: bool = True):
        cfg = self.config
        num_resolutions = len(cfg.ch_mult)
        temporal_level = int(np.log2(self.temporal_compress_times))

        h = CausalConv3d(cfg.ch, (3, 3, 3), name="conv_in")(x, first)
        for i_level in range(num_resolutions):
            block_out = cfg.ch * cfg.ch_mult[i_level]
            for i_block in range(cfg.num_res_blocks):
                h = ResnetBlock3D(block_out, name=f"down_{i_level}_block_{i_block}")(h, first=first)
            if i_level != num_resolutions - 1:
                h = DownSample3D(
                    h.shape[-1], compress_time=i_level < temporal_level, name=f"down_{i_level}_downsample"
                )(h)

        h = ResnetBlock3D(h.shape[-1], name="mid_block_1")(h, first=first)
        h = ResnetBlock3D(h.shape[-1], name="mid_block_2")(h, first=first)

        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm_out")(h)
        h = swish(h)
        out_ch = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
        return CausalConv3d(out_ch, (3, 3, 3), name="conv_out")(h, first)


class Decoder3D(nn.Module):
    """Causal 3D decoder: spatial 8x, temporal 4x expansion with
    zq-modulated norms (reference: ContextParallelDecoder3D,
    cp_enc_dec.py:832-976)."""

    config: VaeModelConfig
    temporal_compress_times: int = 4

    @nn.compact
    def __call__(self, z, first: bool = True):
        cfg = self.config
        num_resolutions = len(cfg.ch_mult)
        temporal_level = int(np.log2(self.temporal_compress_times))
        zq = z

        block_in = cfg.ch * cfg.ch_mult[-1]
        h = CausalConv3d(block_in, (3, 3, 3), name="conv_in")(z, first)

        h = ResnetBlock3D(block_in, spatial_norm=True, name="mid_block_1")(h, zq, first)
        h = ResnetBlock3D(block_in, spatial_norm=True, name="mid_block_2")(h, zq, first)

        for i_level in reversed(range(num_resolutions)):
            block_out = cfg.ch * cfg.ch_mult[i_level]
            for i_block in range(cfg.num_res_blocks + 1):
                h = ResnetBlock3D(block_out, spatial_norm=True, name=f"up_{i_level}_block_{i_block}")(h, zq, first)
            if i_level != 0:
                h = Upsample3D(
                    h.shape[-1],
                    compress_time=i_level >= num_resolutions - temporal_level,
                    name=f"up_{i_level}_upsample",
                )(h)

        h = SpatialNorm3D(h.shape[-1], name="norm_out")(h, zq, first)
        h = swish(h)
        return CausalConv3d(cfg.out_ch, (3, 3, 3), name="conv_out")(h, first)
