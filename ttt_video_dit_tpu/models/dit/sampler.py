"""Sampling stack: storyboard prompts, dynamic CFG, and the VP-SDE DPM++(2M)
sampler with Zero-SNR discretization.

Functional port of the reference sampling machinery
(reference: ttt/models/cogvideo/sampler.py:21-73 prompt handling;
ttt/models/cogvideo/utils.py:441-711 DiscreteDenoiser / DynamicCFG /
VPSDEDPMPP2MSampler). The 50-step outer loop runs in Python; each step calls
one jitted denoiser evaluation (batch doubled for CFG); the DPM++ update
algebra is pure jnp.
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ttt_video_dit_tpu.models.dit.schedule import ZeroSNRDDPMDiscretization

SCENE_END_TOKEN = "<end_scene>"
SCENE_START_TOKEN = "<start_scene>"


# -------------------------------------------------------------- storyboard


@dataclass
class SceneDescription:
    """One scene of a multi-scene storyboard."""

    text: str
    requires_scene_transition: bool = False
    neg_text: Optional[str] = None


def load_storyboards(path: str) -> List[Tuple[List[str], List[Optional[str]]]]:
    """Parse a .json/.jsonl storyboard file into per-video scene prompt lists,
    inserting <start_scene>/<end_scene> transition tokens
    (reference: PromptManager, sampler.py:30-73).

    Returns a list of (scene_texts, scene_neg_texts) tuples.
    """
    if path.endswith(".jsonl"):
        with open(path, "r", encoding="utf-8") as f:
            videos = [json.loads(line) for line in f if line.strip()]
    elif path.endswith(".json"):
        with open(path, "r", encoding="utf-8") as f:
            videos = json.load(f)
    else:
        raise ValueError("Invalid prompt file format. Expected .jsonl or .json")

    out = []
    for video in videos:
        scenes = [SceneDescription(**obj) for obj in video]
        if scenes:
            scenes[0].requires_scene_transition = False
        for i, scene in enumerate(scenes):
            if scene.requires_scene_transition:
                scenes[i - 1].text += SCENE_END_TOKEN
                scene.text = SCENE_START_TOKEN + scene.text
        out.append(([s.text for s in scenes], [s.neg_text for s in scenes]))
    return out


# ---------------------------------------------------------------- guidance


class DynamicCFG:
    """Cosine-ramped classifier-free guidance scale
    (reference: cogvideo/utils.py:519-543)."""

    def __init__(self, scale: float, exp: float, num_steps: int):
        self.scale = scale
        self.exp = exp
        self.num_steps = num_steps

    def scale_at(self, step_index: int) -> float:
        return 1.0 + self.scale * (1.0 - math.cos(math.pi * (step_index / self.num_steps) ** self.exp)) / 2.0

    def combine(self, denoised_doubled, step_index: int):
        """Split the CFG-doubled batch and apply guidance."""
        x_u, x_c = jnp.split(denoised_doubled, 2, axis=0)
        s = self.scale_at(step_index)
        return x_u + s * (x_c - x_u)


# ----------------------------------------------------------------- sampler


class DPMPP2MSampler:
    """VP-SDE DPM++(2M) ancestral sampler over the Zero-SNR discretization
    (reference: VPSDEDPMPP2MSampler, cogvideo/utils.py:547-711).

    ``denoise_fn(x_doubled, a_sqrt_doubled, timestep_doubled) -> denoised`` is
    a (jitted) function evaluating the CFG-doubled denoiser; conditioning is
    closed over by the caller.
    """

    def __init__(
        self,
        num_steps: int = 50,
        guider: Optional[DynamicCFG] = None,
        shift_scale: float = 1.0,
        num_idx: int = 1000,
    ):
        self.num_steps = num_steps
        self.guider = guider or DynamicCFG(scale=6, exp=5, num_steps=num_steps)
        self.discretization = ZeroSNRDDPMDiscretization(shift_scale=shift_scale, num_timesteps=num_idx)

    @staticmethod
    def _lamb(a_sqrt):
        # Clip both Zero-SNR endpoints: a_sqrt == 1 divides by zero and
        # a_sqrt == 0 takes log(0). Neither inf changes results (a == 1 is
        # bypassed by the idx==1 branch; at a == 0 the clip turns exp(-h) == 0
        # into ~2e-12), but the infs raised warnings.
        a = np.clip(a_sqrt**2, 1e-24, 1.0 - 1e-12)
        return np.log(np.sqrt(a / (1.0 - a)))

    def _mults(self, a, a_next, a_prev):
        """DPM++(2M) multipliers (reference: utils.py:587-612)."""
        h = self._lamb(a_next) - self._lamb(a)
        mult1 = np.sqrt((1 - a_next**2) / (1 - a**2)) * np.exp(-h)
        mult2 = np.expm1(-2 * h) * a_next
        if a_prev is None:
            return h, (mult1, mult2)
        r = (self._lamb(a) - self._lamb(a_prev)) / h
        return h, (mult1, mult2, 1 + 1 / (2 * r), 1 / (2 * r))

    def __call__(self, rng, denoise_fn, shape, dtype=jnp.float32, progress_cb=None):
        """Run the full sampling loop. shape = (B, T, C, H, W)."""
        a_sqrt, timesteps = self.discretization(self.num_steps, return_idx=True)
        a_sqrt = np.concatenate([a_sqrt, np.ones((1,), a_sqrt.dtype)])
        timesteps = np.concatenate([[-1], np.asarray(timesteps)])

        x = jax.random.normal(rng, shape, jnp.float32)
        num_sigmas = len(a_sqrt)

        old_denoised = None
        for i in range(num_sigmas - 1):
            idx = self.num_steps - i
            timestep = float(timesteps[-(i + 1)])
            a = float(a_sqrt[i])
            a_next = float(a_sqrt[i + 1])
            a_prev = None if i == 0 else float(a_sqrt[i - 1])

            denoised = denoise_fn(x, a, timestep)
            denoised = self.guider.combine(denoised, self.num_steps - int(timestep)).astype(jnp.float32)

            if idx == 1:
                x = denoised
                old_denoised = denoised
                if progress_cb:
                    progress_cb(i + 1, num_sigmas - 1)
                continue

            rng, key = jax.random.split(rng)
            h, mult = self._mults(a, a_next, a_prev)
            mult_noise = math.sqrt(1 - a_next**2) * math.sqrt(max(1 - math.exp(-2 * h), 0.0))
            noise = jax.random.normal(key, x.shape, jnp.float32)

            if old_denoised is None or a_next < 1e-14:
                x = mult[0] * x - mult[1] * denoised + mult_noise * noise
            else:
                denoised_d = mult[2] * denoised - mult[3] * old_denoised
                x = mult[0] * x - mult[1] * denoised_d + mult_noise * noise
            old_denoised = denoised
            if progress_cb:
                progress_cb(i + 1, num_sigmas - 1)

        return x.astype(dtype)


def make_cfg_denoise_fn(model, params, text_emb, neg_emb, sigma_interval: int = 1000, quantize_c_noise: bool = False):
    """Build the jitted CFG-doubled denoiser evaluation.

    text_emb/neg_emb: [B, scenes, S, E]. Follows the reference's
    DiscreteDenoiser: sigma is quantized to the nearest table index, and the
    network conditioning timestep is that index (reference: utils.py:460-508).
    """
    from ttt_video_dit_tpu.models.dit.schedule import training_sigma_table

    table = jnp.asarray(training_sigma_table(sigma_interval))
    cond = jnp.concatenate([neg_emb, text_emb], axis=0)

    # params/cond/table must enter as jit ARGUMENTS: a closed-over pytree is
    # baked into the HLO as literal constants, which multiplies the program
    # size by the model size (a 400+ MB HLO at d512; breaks compile services).
    @jax.jit
    def _denoise(params, cond, table, x, a_sqrt, timestep):
        B = x.shape[0]
        x2 = jnp.concatenate([x, x], axis=0)
        a = jnp.full((2 * B,), a_sqrt, jnp.float32)
        # Quantize sigma to nearest discretization index (idx_to_sigma of
        # sigma_to_idx); c_noise is the raw timestep unless quantized.
        idx = jnp.argmin(jnp.abs(a[:, None] - table[None, :]), axis=1)
        a_q = table[idx]
        t = idx.astype(jnp.float32) if quantize_c_noise else jnp.full((2 * B,), timestep, jnp.float32)
        return model.apply(params, x2, a_q, cond, t, method="denoise")

    def denoise_fn(x, a_sqrt, timestep):
        return _denoise(params, cond, table, x, a_sqrt, timestep)

    return denoise_fn
