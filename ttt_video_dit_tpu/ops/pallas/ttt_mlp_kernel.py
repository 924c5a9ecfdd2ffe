"""Dispatch wrapper for the Pallas TTT-MLP kernel.

Replaces the reference's ThunderKittens CUDA kernel (reference:
ttt/models/ssm/mlp_tk.py + ttt-tk/ submodule, H100-only). Falls back to the
lax.scan oracle off-TPU; ``interpret=True`` runs the kernel in the Pallas
interpreter on CPU for parity checks.
"""

from __future__ import annotations

import jax

from ttt_video_dit_tpu.ops.pallas import ttt_vjp
from ttt_video_dit_tpu.ops.pallas.sharded import shard_mapped_ttt
from ttt_video_dit_tpu.parallel.mesh import target_platform

_FORCE_INTERPRET = False


def is_supported(shape) -> bool:
    B, H, NC, CS, F = shape
    shapes_ok = CS % 8 == 0 and F % 8 == 0
    return shapes_ok and (_FORCE_INTERPRET or target_platform() == "tpu")


def ttt_mlp(XQ, XK, XV, eta, ln_w, ln_b, W1, b1, W2, b2, checkpoint_group_size: int = 16,
            use_fused_bwd: bool | None = None, rope_cos=None, rope_sin=None,
            eta_scale=None, token_major: bool = False):
    """With ``rope_cos``/``rope_sin`` ([NC, CS, F] interleaved tables), the
    q/k/v inputs are the RAW projections and the kernel fuses L2-norm + rope +
    LN-reconstruction-target (requires the fused Pallas backward). With
    ``eta_scale``, ``eta`` carries the pre-sigmoid LR-gate logits and the
    kernel fuses eta = sigmoid(gate) * eta_scale too (and emits d_gate).
    With ``token_major`` (fused-preproc mode only), q/k/v and the output ride
    as [B, NC, CS, H*F] — no moveaxis relayout, no T(8,128) lane padding
    (ops/pallas/ttt_forward.py token-major note; measured 31% faster forward
    at the flagship geometry)."""
    NC = XQ.shape[1] if token_major else XQ.shape[2]
    K = min(max(checkpoint_group_size, 1), NC)
    fused = ttt_vjp.USE_FUSED_BWD if use_fused_bwd is None else use_fused_bwd

    if rope_cos is not None:
        assert fused, "fused TTT preprocessing requires the fused Pallas backward"

        def kernel_pre(xq, xk, xv, e, lw, lb, w1, b1_, w2, b2_, cos, sin):
            return ttt_vjp.ttt_mlp_fused_pre(K, _FORCE_INTERPRET, eta_scale, token_major,
                                             xq, xk, xv, e, cos, sin, lw, lb, w1, b1_, w2, b2_)

        return shard_mapped_ttt(kernel_pre, n_states=4, n_tables=2, token_major=token_major)(
            XQ, XK, XV, eta, ln_w, ln_b, W1, b1, W2, b2, rope_cos, rope_sin
        )
    assert not token_major, "token-major kernel IO requires the fused-preproc path"

    assert eta_scale is None or rope_cos is not None, "eta-gate fusion requires fused preproc"

    def kernel_fn(xq, xk, xv, e, lw, lb, w1, b1_, w2, b2_):
        return ttt_vjp.ttt_mlp_fused(K, _FORCE_INTERPRET, fused, xq, xk, xv, e, lw, lb, w1, b1_, w2, b2_)

    # Under a multi-chip mesh the kernel runs per (batch, head) shard via
    # shard_map — GSPMD cannot partition pallas_call itself.
    return shard_mapped_ttt(kernel_fn, n_states=4)(XQ, XK, XV, eta, ln_w, ln_b, W1, b1, W2, b2)
