"""Pallas TPU kernel for the TTT-linear inner-loop scan.

Replaces the reference's Triton forward/backward scan kernels
(reference: ttt/models/ssm/kernels/linear_forward.py, linear_backward.py).

Placeholder for now: reports unsupported so callers fall back to the
``lax.scan`` oracle. Implemented later in this round.
"""


def is_supported(shape) -> bool:
    return False


def ttt_linear(*args, **kwargs):
    raise NotImplementedError("Pallas TTT-linear kernel not yet implemented")
