"""Grouped AdamW optimizer with per-group LR schedules and adapter freezing.

Functional re-design of the reference's optimizer stack
(reference: ttt/infra/optimizers.py): the same four parameter groups
(TTT +/- weight decay, other +/- weight decay), AdamW(0.9, 0.95, eps 1e-8),
WD 1e-4, and warmup+cosine/linear decay schedules — expressed as
``optax.multi_transform`` over a path->label pytree instead of torch param
groups + LambdaLR.

Freezing: the reference freezes modules at construction via requires_grad
(reference: ttt/models/cogvideo/dit.py:19-29,109-150). Here trainability is a
pure function of the parameter path + adapter method; the train step partitions
params so frozen ones never even get gradients computed.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, Tuple

import jax
import optax

# Matches the reference patterns exactly (reference: optimizers.py:34); our
# LayerNorm scales are all under modules with "norm" in the name, so the
# "norm" pattern covers them like it covers torch's `*.norm.weight`.
NO_WEIGHT_DECAY_PATTERNS = ("bias", "norm", "b1", "b2")
TTT_PARAMETER_PATTERNS = ("ttt", "ssm")
WEIGHT_DECAY_VALUE = 1e-4

_QKVO_NAMES = ("/q/", "/k/", "/v/", "/o/")


def path_str(path) -> str:
    """KeyPath -> 'a/b/c' string."""
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def is_ttt_parameter(path: str) -> bool:
    p = path.lower()
    return any(pat in p for pat in TTT_PARAMETER_PATTERNS)


def skips_weight_decay(path: str) -> bool:
    p = path.lower()
    return any(pat in p for pat in NO_WEIGHT_DECAY_PATTERNS)


def is_trainable(path: str, adapter_method: str) -> bool:
    """Which params train per adapter method (reference behavior):

    - sft: everything.
    - qkvo: attention q/k/v/o + q/k norms + all TTT params + SSM gates.
    - none: same as qkvo but the q/k norms stay frozen.
    """
    if adapter_method == "sft":
        return True
    p = "/" + path.lower() + "/"
    if "ssm" in p:  # TTT layer params and the ssm gating alphas
        return True
    if "/attention/" in p and any(n in p for n in _QKVO_NAMES):
        return True
    if adapter_method == "qkvo" and ("q_norm" in p or "k_norm" in p):
        return True
    return False


def group_label(path: str) -> str:
    ttt = is_ttt_parameter(path)
    no_wd = skips_weight_decay(path)
    if ttt:
        return "ttt_no_wd" if no_wd else "ttt_wd"
    return "other_no_wd" if no_wd else "other_wd"


def make_lr_schedule(
    schedule_type: str, warmup_steps: int, total_steps: int, lr_peak: float, lr_end: float
) -> Callable[[int], float]:
    """Absolute-LR schedule matching the reference's LambdaLR multipliers
    (reference: ttt/infra/optimizers.py:267-331). Works on traced step values."""
    import jax.numpy as jnp

    decay_steps = max(1, total_steps - warmup_steps)

    def cosine(step):
        warm = lr_peak * (step + 1.0) / max(warmup_steps, 1)
        sid = step - warmup_steps
        cos_factor = 0.5 * (1.0 + jnp.cos(math.pi * sid / decay_steps))
        decay = lr_end + (lr_peak - lr_end) * cos_factor
        return jnp.where(step < warmup_steps, warm, decay)

    def linear(step):
        warm = lr_peak * (step + 1.0) / max(warmup_steps, 1)
        frac = jnp.minimum((step - warmup_steps) / decay_steps, 1.0)
        decay = lr_peak * (1.0 - frac) + lr_end * frac
        return jnp.where(step < warmup_steps, warm, decay)

    if schedule_type == "cosine":
        return cosine
    if schedule_type == "linear":
        return linear
    raise ValueError(f"Unsupported schedule type: {schedule_type!r}")


def build_optimizer(
    trainable_params: Any,
    *,
    lr: float,
    lr_ssm: float,
    lr_end: float,
    lr_schedule: str = "linear",
    lr_ssm_schedule: str = "linear",
    warmup_steps: int,
    total_steps: int,
    gradient_clipping_norm: float = 0.1,
) -> Tuple[optax.GradientTransformation, Any, Dict[str, Callable[[int], float]]]:
    """Returns (tx, label pytree, per-group schedule fns for logging).

    ``trainable_params`` must already exclude frozen params (the train step
    partitions them; see training/train_step.py).
    """
    labels = jax.tree_util.tree_map_with_path(lambda p, _: group_label(path_str(p)), trainable_params)

    schedules = {
        "ttt_no_wd": make_lr_schedule(lr_ssm_schedule, warmup_steps, total_steps, lr_ssm, lr_end),
        "ttt_wd": make_lr_schedule(lr_ssm_schedule, warmup_steps, total_steps, lr_ssm, lr_end),
        "other_no_wd": make_lr_schedule(lr_schedule, warmup_steps, total_steps, lr, lr_end),
        "other_wd": make_lr_schedule(lr_schedule, warmup_steps, total_steps, lr, lr_end),
    }
    wd = {"ttt_no_wd": 0.0, "ttt_wd": WEIGHT_DECAY_VALUE, "other_no_wd": 0.0, "other_wd": WEIGHT_DECAY_VALUE}

    transforms = {
        name: optax.chain(
            optax.scale_by_adam(b1=0.9, b2=0.95, eps=1e-8),
            optax.add_decayed_weights(wd[name]),
            optax.scale_by_learning_rate(schedules[name]),
        )
        for name in schedules
    }

    tx = optax.chain(
        optax.clip_by_global_norm(gradient_clipping_norm),
        optax.multi_transform(transforms, labels),
    )
    return tx, labels, schedules


def build_optimizer_from_config(trainable_params, job_config):
    """Convenience wrapper reading the reference-named config sections."""
    return build_optimizer(
        trainable_params,
        lr=job_config.optimizer.lr,
        lr_ssm=job_config.optimizer.lr_ssm,
        lr_end=job_config.optimizer.lr_end,
        lr_schedule=job_config.optimizer.lr_schedule,
        lr_ssm_schedule=job_config.optimizer.lr_ssm_schedule,
        warmup_steps=job_config.training.warmup_steps,
        total_steps=job_config.training.steps,
        gradient_clipping_norm=job_config.optimizer.gradient_clipping_norm,
    )


def partition_params(params, adapter_method: str):
    """Split a param pytree into (trainable, frozen) sub-trees (None where the
    other partition holds the leaf) — optax.multi_transform-free masking that
    also lets jax.grad skip frozen params entirely."""
    trainable = jax.tree_util.tree_map_with_path(
        lambda p, x: x if is_trainable(path_str(p), adapter_method) else None, params
    )
    frozen = jax.tree_util.tree_map_with_path(
        lambda p, x: None if is_trainable(path_str(p), adapter_method) else x, params
    )
    return trainable, frozen


def merge_params(trainable, frozen):
    """Inverse of partition_params."""
    return jax.tree.map(
        lambda a, b: a if a is not None else b, trainable, frozen, is_leaf=lambda x: x is None
    )
