"""Exponential-moving-average parameter tracking.

Functional counterpart of the reference's LitEma (reference:
ttt/models/vae/ema.py:1-82 — shipped, unused by training): warmup-ramped
decay ``min(decay, (1 + updates) / (10 + updates))``, an update step, and a
swap helper for eval-with-EMA-weights. Being a pytree-to-pytree transform it
is jit/scan/pjit-compatible and shards like the params themselves.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class EmaState(NamedTuple):
    ema_params: Any  # pytree matching params
    num_updates: jnp.ndarray  # int32 scalar


def init(params, use_num_updates: bool = True) -> EmaState:
    return EmaState(
        ema_params=jax.tree.map(jnp.asarray, params),
        num_updates=jnp.asarray(0 if use_num_updates else -1, jnp.int32),
    )


def update(state: EmaState, params, decay: float = 0.9999) -> EmaState:
    """One EMA step: ema += (1 - d) * (param - ema), with the reference's
    warmup ramp d = min(decay, (1 + n) / (10 + n)) while n >= 0."""
    n = state.num_updates
    ramped = jnp.where(
        n >= 0,
        jnp.minimum(decay, (1.0 + n.astype(jnp.float32)) / (10.0 + n.astype(jnp.float32))),
        decay,
    )
    one_minus = 1.0 - ramped
    new_ema = jax.tree.map(
        lambda e, p: e - one_minus.astype(e.dtype) * (e - p.astype(e.dtype)),
        state.ema_params,
        params,
    )
    return EmaState(ema_params=new_ema, num_updates=jnp.where(n >= 0, n + 1, n))


def swap(state: EmaState, params):
    """Return (ema_params_for_eval, stashed_live_params) — the functional
    analogue of LitEma.store/copy_to/restore."""
    return state.ema_params, params
