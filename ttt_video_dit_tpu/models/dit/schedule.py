"""Diffusion noise schedule, v-prediction scalings, and sigma sampling.

Pure-function port of the reference's schedule stack
(reference: ttt/models/cogvideo/utils.py:137-151, 252-359): linear-beta DDPM
discretization with the Zero-Terminal-SNR rescale, CogVideoX "VideoScaling"
v-prediction coefficients, rank-stratified uniform sigma-index sampling, and
the sinusoidal timestep embedding. All tables are computed host-side in
float64 numpy (matching torch numerics) and baked into the jitted graph as
constants.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np


def make_beta_schedule(n_timestep: int, linear_start: float = 1e-4, linear_end: float = 2e-2) -> np.ndarray:
    """Linear-in-sqrt beta schedule (float64)."""
    return np.linspace(linear_start**0.5, linear_end**0.5, n_timestep, dtype=np.float64) ** 2


def generate_roughly_equally_spaced_steps(num_substeps: int, max_step: int) -> np.ndarray:
    return np.linspace(max_step - 1, 0, num_substeps, endpoint=False).astype(int)[::-1]


class ZeroSNRDDPMDiscretization:
    """DDPM alphas-cumprod discretization rescaled for zero terminal SNR
    (reference: ttt/models/cogvideo/utils.py:312-359).

    ``get_sigmas``/``__call__`` return sqrt(alpha_cumprod) values ("sigmas" in
    the reference's nomenclature) as float32 numpy arrays.
    """

    def __init__(
        self,
        linear_start: float = 0.00085,
        linear_end: float = 0.0120,
        num_timesteps: int = 1000,
        shift_scale: float = 1.0,
    ):
        self.num_timesteps = num_timesteps
        betas = make_beta_schedule(num_timesteps, linear_start, linear_end)
        alphas_cumprod = np.cumprod(1.0 - betas, axis=0)
        self.alphas_cumprod = alphas_cumprod / (shift_scale + (1 - shift_scale) * alphas_cumprod)

    def get_sigmas(self, n: int, return_idx: bool = False):
        if n < self.num_timesteps:
            timesteps = generate_roughly_equally_spaced_steps(n, self.num_timesteps)
            alphas_cumprod = self.alphas_cumprod[timesteps]
        elif n == self.num_timesteps:
            timesteps = np.arange(self.num_timesteps)
            alphas_cumprod = self.alphas_cumprod
        else:
            raise ValueError(f"n={n} > num_timesteps={self.num_timesteps}")

        a_sqrt = np.sqrt(alphas_cumprod.astype(np.float32))
        a0, aT = a_sqrt[0].copy(), a_sqrt[-1].copy()
        # Zero-terminal-SNR rescale: force sqrt(alpha_cumprod)[T] -> 0 while
        # keeping [0] fixed.
        a_sqrt = (a_sqrt - aT) * (a0 / (a0 - aT))

        flipped = a_sqrt[::-1].copy()
        return (flipped, timesteps) if return_idx else flipped

    def __call__(self, n: int, do_append_zero: bool = False, flip: bool = False, return_idx: bool = False):
        if return_idx:
            sigmas, idx = self.get_sigmas(n, return_idx=True)
        else:
            sigmas = self.get_sigmas(n)
        if do_append_zero:
            sigmas = np.concatenate([sigmas, np.zeros((1,), dtype=sigmas.dtype)])
        if flip:
            sigmas = sigmas[::-1].copy()
        return (sigmas, idx) if return_idx else sigmas


def video_scaling(alpha_cumprod_sqrt, idx):
    """CogVideoX v-prediction coefficients (reference: utils.py:252-258).

    ``alpha_cumprod_sqrt`` plays the role the reference calls "sigma".
    Returns (c_skip, c_out, c_in, c_noise).
    """
    c_skip = alpha_cumprod_sqrt
    c_out = -jnp.sqrt(1.0 - alpha_cumprod_sqrt**2)
    c_in = jnp.ones_like(alpha_cumprod_sqrt)
    c_noise = idx
    return c_skip, c_out, c_in, c_noise


@functools.lru_cache(maxsize=4)
def training_sigma_table(sigma_interval: int = 1000) -> np.ndarray:
    """sqrt(alpha_cumprod) lookup table indexed by training sigma index; index
    0 is (nearly) clean, index `sigma_interval-1` is pure noise
    (reference: DiscreteSampler, utils.py:286-308). Numpy (not jnp) so the
    lru_cache never captures a traced value."""
    return ZeroSNRDDPMDiscretization()(sigma_interval, flip=True)


@dataclass(frozen=True)
class StratifiedSigmaBuckets:
    """Rank-stratified uniform sigma-index bucketing.

    The reference gives each effective rank a contiguous slice of the
    [0, sigma_interval) index range so a global batch covers noise levels
    uniformly (reference: DiscreteSampler.__init__, utils.py:262-284). Here the
    train step is SPMD over the global batch, so we precompute per-*sample*
    bucket bounds instead of per-rank ones.
    """

    sigma_interval: int
    group_num: int
    group_width: int

    @classmethod
    def create(cls, sigma_interval: int, effective_world_size: int) -> "StratifiedSigmaBuckets":
        i = 1
        while True:
            if effective_world_size % i != 0 or sigma_interval % (effective_world_size // i) != 0:
                i += 1
            else:
                group_num = effective_world_size // i
                break
        return cls(sigma_interval, group_num, effective_world_size // group_num)

    def sample_bounds(self, global_batch_size: int, effective_world_size: int):
        """Per-sample (start, end) index bounds, shape [B] each (int32 numpy)."""
        per_rank = max(global_batch_size // effective_world_size, 1)
        interval = self.sigma_interval // self.group_num
        ranks = np.arange(global_batch_size) // per_rank
        group_index = (ranks % effective_world_size) // self.group_width
        start = (group_index * interval).astype(np.int32)
        return start, (start + interval).astype(np.int32)


def timestep_embedding(timesteps, dim: int, max_period: int = 10000, dtype=jnp.float32):
    """Sinusoidal timestep embedding, cos-then-sin order
    (reference: ttt/models/cogvideo/utils.py:102-114)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    embedding = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        embedding = jnp.concatenate([embedding, jnp.zeros_like(embedding[:, :1])], axis=-1)
    return embedding.astype(dtype)
