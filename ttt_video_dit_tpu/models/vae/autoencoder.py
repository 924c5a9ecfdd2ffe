"""VAE inference wrapper: temporal-tiled encode/decode with conv-cache carry,
diagonal-Gaussian regularization, and torch-checkpoint weight conversion.

Counterpart of the reference's ``VideoAutoencoderInferenceWrapper``
(reference: ttt/models/vae/autoencoder.py:70-234): encode in 48+1-frame
windows, decode in 2-latent-frame windows (first window gets the extra causal
frame), threading each CausalConv3d's cached tail between windows instead of
the reference's CPU cache_padding tensors.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ttt_video_dit_tpu.config.model_config import VaeModelConfig
from ttt_video_dit_tpu.models.vae.enc_dec import Decoder3D, Encoder3D


def _to_channels_last(x):  # [B, C, T, H, W] -> [B, T, H, W, C]
    return jnp.transpose(x, (0, 2, 3, 4, 1))


def _to_channels_first(x):  # [B, T, H, W, C] -> [B, C, T, H, W]
    return jnp.transpose(x, (0, 4, 1, 2, 3))


class VideoAutoencoder:
    """Functional inference wrapper holding encoder/decoder params."""

    def __init__(
        self,
        encoder_config: Optional[VaeModelConfig] = None,
        decoder_config: Optional[VaeModelConfig] = None,
        enc_params=None,
        dec_params=None,
        scale_factor: float = 1.0,
        mesh: Optional[Mesh] = None,
    ):
        self.encoder_config = encoder_config or VaeModelConfig.get_encoder_config()
        self.decoder_config = decoder_config or VaeModelConfig.get_decoder_config()
        self.encoder = Encoder3D(self.encoder_config)
        self.decoder = Decoder3D(self.decoder_config)
        self.enc_params = enc_params
        self.dec_params = dec_params
        self.scale_factor = scale_factor
        # SPMD spatial sharding: the TPU-native form of the reference's VAE
        # context parallelism (reference: ttt/models/vae/cp_enc_dec.py:237-284
        # ships halo exchange but runs cp_size=1).  With a mesh, pixel tiles
        # are sharded over H across ALL mesh devices; GSPMD inserts the conv
        # halo exchanges and GroupNorm all-reduces, dividing the ~8.7 GB
        # level-0 feature maps of a 49x480x720 encode window by the device
        # count (the reason that window does not fit one v5e chip —
        # docs/performance.md).
        self.mesh = mesh
        if mesh is not None:
            all_axes = tuple(mesh.axis_names)
            self._x_shd = NamedSharding(mesh, P(None, None, all_axes, None, None))
            self._rep_shd = NamedSharding(mesh, P())

        self._enc_apply = jax.jit(
            lambda v, x, first: self.encoder.apply(v, x, first=first, mutable=["cache"]),
            static_argnames=("first",),
        )
        self._dec_apply = jax.jit(
            lambda v, z, first: self.decoder.apply(v, z, first=first, mutable=["cache"]),
            static_argnames=("first",),
        )

    def _place(self, x, params):
        """Shard a pixel/latent tile over H and replicate params (no-op
        without a mesh)."""
        if self.mesh is None:
            return x, params
        params = jax.tree.map(lambda p: jax.device_put(p, self._rep_shd), params)
        return jax.device_put(x, self._x_shd), params

    # ------------------------------------------------------------- init
    def init_random(self, rng, spatial: int = 256, latent_spatial: int = 32):
        """Random-init both halves (tests / smoke runs)."""
        r1, r2 = jax.random.split(jax.random.PRNGKey(0) if rng is None else rng)
        x = jnp.zeros((1, 1, spatial, spatial, self.encoder_config.in_channels))
        z = jnp.zeros((1, 1, latent_spatial, latent_spatial, self.decoder_config.z_channels))
        ev = self.encoder.init(r1, x)
        dv = self.decoder.init(r2, z)
        self.enc_params = {"params": ev["params"]}
        self.dec_params = {"params": dv["params"]}
        return self

    # ------------------------------------------------------- tiled encode
    def encode_first_stage(self, x, unregularized: bool = True, window: int = 48,
                           rng=None, noise=None, multiply_by_scale_factor: bool = False):
        """x: [B, C, T, H, W] pixels in [-1, 1]; T = n*window + 1.

        Returns latent posterior params [B, 2*z, T_lat, h, w] when
        ``unregularized`` (the precompute path; reference:
        data/precomp_video.py saves posteriors), or a diagonal-Gaussian
        SAMPLE [B, z, T_lat, h, w] when ``unregularized=False`` — the
        reference's ``DiagonalGaussianRegularizer(sample=True)`` applied to
        the encoder output (reference: ttt/models/vae/autoencoder.py:200-233,
        regularizers.py:87-105). The reference regularizes per temporal
        window inside ``encode``; sampling is elementwise, so regularizing
        the concatenated posterior with the same noise values is identical.
        ``noise`` (same shape as the mean) overrides the ``rng`` draw —
        parity tests inject the reference's noise tensor through it.
        ``multiply_by_scale_factor`` mirrors autoencoder.py:232-233.
        """
        out = self._encode_posterior(x, window)
        if not unregularized:
            mean, logvar = jnp.split(out, 2, axis=1)
            logvar = jnp.clip(logvar, -30.0, 20.0)
            std = jnp.exp(0.5 * logvar)
            if noise is None:
                assert rng is not None, "regularized encode samples: pass rng= or noise="
                noise = jax.random.normal(rng, mean.shape, mean.dtype)
            out = mean + std * jnp.asarray(noise, mean.dtype)
        if multiply_by_scale_factor:
            out = out * self.scale_factor
        return out

    def _encode_posterior(self, x, window: int = 48):
        x = _to_channels_last(jnp.asarray(x, jnp.float32))
        T = x.shape[1]
        # Reference semantics (reference: ttt/models/vae/autoencoder.py:200-214,
        # data/precomp_video.py:210): valid inputs have T = n*window + 1 frames
        # (FPS*seconds + 1) and tile into T // window windows — first window
        # window+1 frames, the rest window. Any other T would silently drop or
        # double-read frames, so reject it up front.
        assert T == 1 or T % window == 1, (
            f"encode expects T = n*{window} + 1 frames (got {T}); "
            f"precompute targets FPS*seconds+1 frames per episode"
        )
        n_windows = T // window if T > 1 else 1
        x, enc_params = self._place(x, self.enc_params)

        cache = {}
        outs = []
        for i in range(n_windows):
            start, end = (0, window + 1) if i == 0 else (window * i + 1, window * (i + 1) + 1)
            part = x[:, start:end]
            variables = {"params": enc_params["params"], **({"cache": cache} if cache else {})}
            out, mut = self._enc_apply(variables, part, first=(i == 0))
            cache = mut["cache"]
            outs.append(out)
        z = jnp.concatenate(outs, axis=1)
        return _to_channels_first(z)

    # ------------------------------------------------------- tiled decode
    def decode_first_stage(self, z, window: int = 2):
        """z: [B, C, T_lat, h, w] scaled latents -> pixels [B, C, T, H, W]."""
        z = jnp.asarray(z, jnp.float32) / self.scale_factor
        z = _to_channels_last(z)
        T = z.shape[1]
        n_windows = T // window
        z, dec_params = self._place(z, self.dec_params)

        cache = {}
        outs = []
        for i in range(n_windows):
            start, end = (0, window + 1) if i == 0 else (window * i + 1, window * (i + 1) + 1)
            part = z[:, start:end]
            variables = {"params": dec_params["params"], **({"cache": cache} if cache else {})}
            out, mut = self._dec_apply(variables, part, first=(i == 0))
            cache = mut["cache"]
            outs.append(out)
        x = jnp.concatenate(outs, axis=1)
        return _to_channels_first(x)

    def decode(self, latents: np.ndarray) -> np.ndarray:
        """Convenience for sampling: [T, C, h, w] latents -> [T_out, H, W, 3]
        float frames in [-1, 1]."""
        z = jnp.asarray(latents)[None].transpose(0, 2, 1, 3, 4)  # [1, C, T, h, w]
        x = self.decode_first_stage(z)  # [1, 3, T_out, H, W]
        return np.asarray(jnp.transpose(x[0], (1, 2, 3, 0)))

    # ------------------------------------------------------------ loading
    @classmethod
    def from_torch_checkpoint(
        cls, path: str, scale_factor: float = 1.0, version: float = 1.0, mesh: Optional[Mesh] = None
    ):
        enc_cfg = VaeModelConfig.get_encoder_config(version)
        dec_cfg = VaeModelConfig.get_decoder_config(version)
        vae = cls(enc_cfg, dec_cfg, scale_factor=scale_factor, mesh=mesh)
        enc_params, dec_params = load_torch_vae_checkpoint(path)
        # Commit once to device: numpy param trees are re-staged host->device
        # on every jitted encode/decode call (one per spatial/temporal tile
        # under SafeConv3d chunking) — pathological through the TPU tunnel.
        pin = lambda tree: jax.tree.map(jnp.asarray, tree)
        vae.enc_params, vae.dec_params = {"params": pin(enc_params)}, {"params": pin(dec_params)}
        return vae

    @classmethod
    def load_decoder(
        cls, path: str, scale_factor: float = 1.0, version: float = 1.0, mesh: Optional[Mesh] = None
    ):
        return cls.from_torch_checkpoint(path, scale_factor, version, mesh=mesh)


# ------------------------------------------------------- weight conversion


def _convert_tensor(key: str, value: np.ndarray) -> tuple[str, np.ndarray]:
    """Map a torch parameter name+tensor to flax (leaf name, transposed array)."""
    if key.endswith(".weight"):
        if value.ndim == 5:  # Conv3d [O, I, kt, kh, kw] -> [kt, kh, kw, I, O]
            return "kernel", value.transpose(2, 3, 4, 1, 0)
        if value.ndim == 4:  # Conv2d [O, I, kh, kw] -> [kh, kw, I, O]
            return "kernel", value.transpose(2, 3, 1, 0)
        if value.ndim == 2:  # Linear [O, I] -> [I, O]
            return "kernel", value.transpose(1, 0)
        return "scale", value  # norm weight
    return "bias", value


def _map_torch_key(key: str) -> tuple:
    """torch module path -> our flax param path (tuple of names).

    e.g. encoder.down.0.block.1.conv1.conv.weight
      -> ('down_0_block_1', 'conv1', 'conv', ...)
    """
    parts = key.split(".")
    out = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p in ("down", "up") and i + 3 < len(parts) and parts[i + 1].isdigit():
            level = parts[i + 1]
            kind = parts[i + 2]
            if kind == "block":
                out.append(f"{p}_{level}_block_{parts[i + 3]}")
                i += 4
            else:  # downsample / upsample
                out.append(f"{p}_{level}_{kind}")
                i += 3
        elif p == "mid":
            out.append(f"mid_{parts[i + 1]}")
            i += 2
        else:
            out.append(p)
            i += 1
    return tuple(out)


def _read_torch_state_dict(path: str) -> dict:
    """``{name: np.float32 array}`` from a torch checkpoint: the native C++
    .pt reader when it can parse the file (no torch import, tensors stream
    straight into numpy buffers), else torch.load."""
    try:
        from ttt_video_dit_tpu.data import native

        if native.available():
            flat = native.load_pt_dict(path)
            sd = {}
            for key, value in flat.items():
                if key.startswith("state_dict."):
                    key = key[len("state_dict."):]
                sd[key] = np.asarray(value, dtype=np.float32)
            if sd:
                return sd
    except Exception:
        pass  # zip64 / legacy .pt / exotic storages -> torch fallback
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.to(torch.float32).numpy() for k, v in sd.items() if hasattr(v, "numpy")}


def load_torch_vae_checkpoint(path: str):
    """Load the reference VAE torch checkpoint (``state_dict`` with
    ``encoder.*`` / ``decoder.*`` keys) into flax param trees."""
    sd = _read_torch_state_dict(path)

    enc: dict = {}
    dec: dict = {}
    for key, tensor in sd.items():
        if key.startswith("encoder."):
            tree, sub = enc, key[len("encoder."):]
        elif key.startswith("decoder."):
            tree, sub = dec, key[len("decoder."):]
        else:
            continue
        value = tensor
        leaf, value = _convert_tensor(sub, value)
        # GroupNorms nest under a 'norm' module in our CausalConv-free blocks.
        path_parts = list(_map_torch_key(sub[: sub.rfind(".")]))
        node = tree
        for part in path_parts:
            node = node.setdefault(part, {})
        node[leaf] = value
    return enc, dec
