"""Dispatch wrapper for the Pallas TTT-MLP kernel.

Replaces the reference's ThunderKittens CUDA kernel (reference:
ttt/models/ssm/mlp_tk.py + ttt-tk/ submodule, H100-only). Falls back to the
lax.scan oracle off-TPU; ``interpret=True`` runs the kernel in the Pallas
interpreter on CPU for parity checks.
"""

from __future__ import annotations

import jax

from ttt_video_dit_tpu.ops.pallas import ttt_vjp

_FORCE_INTERPRET = False


def is_supported(shape) -> bool:
    B, H, NC, CS, F = shape
    shapes_ok = CS % 8 == 0 and F % 8 == 0
    return shapes_ok and (_FORCE_INTERPRET or jax.default_backend() == "tpu")


def ttt_mlp(XQ, XK, XV, eta, ln_w, ln_b, W1, b1, W2, b2, checkpoint_group_size: int = 16):
    NC = XQ.shape[2]
    K = min(max(checkpoint_group_size, 1), NC)
    return ttt_vjp.ttt_mlp_fused(K, _FORCE_INTERPRET, XQ, XK, XV, eta, ln_w, ln_b, W1, b1, W2, b2)
