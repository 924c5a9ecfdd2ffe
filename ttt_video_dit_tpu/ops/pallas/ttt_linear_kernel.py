"""Dispatch wrapper for the Pallas TTT-linear kernel.

Replaces the reference's Triton forward/backward scan kernels
(reference: ttt/models/ssm/kernels/linear_forward.py, linear_backward.py,
launched via linear_triton.py). Falls back to the lax.scan oracle
(ops/ttt_scan.py) off-TPU; ``interpret=True`` (set by tests) runs the kernel
in the Pallas interpreter on CPU for parity checks.
"""

from __future__ import annotations

import jax

from ttt_video_dit_tpu.ops.pallas import ttt_vjp
from ttt_video_dit_tpu.ops.pallas.sharded import shard_mapped_ttt
from ttt_video_dit_tpu.parallel.mesh import target_platform

_FORCE_INTERPRET = False  # tests flip this to exercise kernels on CPU


def is_supported(shape) -> bool:
    B, H, NC, CS, F = shape
    shapes_ok = CS % 8 == 0 and F % 8 == 0
    return shapes_ok and (_FORCE_INTERPRET or target_platform() == "tpu")


def ttt_linear(XQ, XK, XV, eta, ln_w, ln_b, W1, b1, checkpoint_group_size: int = 16,
               use_fused_bwd: bool | None = None, rope_cos=None, rope_sin=None,
               eta_scale=None, token_major: bool = False):
    """With ``rope_cos``/``rope_sin`` ([NC, CS, F] interleaved tables), the
    q/k/v inputs are the RAW projections and the kernel fuses L2-norm + rope +
    LN-reconstruction-target (requires the fused Pallas backward). With
    ``eta_scale``, ``eta`` carries the pre-sigmoid LR-gate logits and the
    kernel fuses eta = sigmoid(gate) * eta_scale too (and emits d_gate).
    ``token_major``: see ttt_mlp_kernel.ttt_mlp."""
    NC = XQ.shape[1] if token_major else XQ.shape[2]
    K = min(max(checkpoint_group_size, 1), NC)
    fused = ttt_vjp.USE_FUSED_BWD if use_fused_bwd is None else use_fused_bwd

    if rope_cos is not None:
        assert fused, "fused TTT preprocessing requires the fused Pallas backward"

        def kernel_pre(xq, xk, xv, e, lw, lb, w1, b1_, cos, sin):
            return ttt_vjp.ttt_linear_fused_pre(K, _FORCE_INTERPRET, eta_scale, token_major,
                                                xq, xk, xv, e, cos, sin, lw, lb, w1, b1_)

        return shard_mapped_ttt(kernel_pre, n_states=2, n_tables=2, token_major=token_major)(
            XQ, XK, XV, eta, ln_w, ln_b, W1, b1, rope_cos, rope_sin
        )

    assert not token_major, "token-major kernel IO requires the fused-preproc path"
    assert eta_scale is None or rope_cos is not None, "eta-gate fusion requires fused preproc"

    def kernel_fn(xq, xk, xv, e, lw, lb, w1, b1_):
        return ttt_vjp.ttt_linear_fused(K, _FORCE_INTERPRET, fused, xq, xk, xv, e, lw, lb, w1, b1_)

    # Under a multi-chip mesh the kernel runs per (batch, head) shard via
    # shard_map — GSPMD cannot partition pallas_call itself.
    return shard_mapped_ttt(kernel_fn, n_states=2)(XQ, XK, XV, eta, ln_w, ln_b, W1, b1)
