"""Pallas TPU kernel for the TTT-MLP inner-loop scan.

Replaces the reference's ThunderKittens CUDA kernel (reference:
ttt/models/ssm/mlp_tk.py, ttt-tk/ submodule, H100-only).

Placeholder for now: reports unsupported so callers fall back to the
``lax.scan`` oracle. Implemented later in this round.
"""


def is_supported(shape) -> bool:
    return False


def ttt_mlp(*args, **kwargs):
    raise NotImplementedError("Pallas TTT-MLP kernel not yet implemented")
