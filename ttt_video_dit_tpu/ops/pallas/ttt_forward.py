"""Pallas TPU forward-scan kernels for the TTT inner loop.

Replaces the reference's Triton TTT-linear forward
(reference: ttt/models/ssm/kernels/linear_forward.py:5-148) and the
ThunderKittens TTT-MLP forward (reference: ttt-tk, mlp_tk.py:65-133) with one
kernel family, designed for the TPU execution model:

- A GPU runs one SM per (batch, head) and hides the sequential scan latency
  with 100+ parallel SMs. A TPU core runs ONE kernel instance, so a
  per-(b,h) grid would serialize B*H*NC tiny steps. Instead each grid step
  processes a whole *group* of heads with batched dots (the MXU chews through
  the per-head matmuls back to back), so the sequential dimension is just NC.
- grid = (B * head_groups, NC); NC is innermost and sequential; fast-weight
  state for the whole head group lives in float32 VMEM scratch across grid
  steps (never round-trips HBM between mini-batches).
- bf16 matmuls against the fp32 state (cast per step), fp32 accumulation —
  the same mixed-precision scheme as the reference kernels.
- fp32 state checkpoints written every `checkpoint_group_size` mini-batches
  for the gradient pass (same remat strategy as reference:
  linear_forward.py:54-73 / mlp_tk.py:95-98).

Mosaic workaround: broadcasting a [G, 1, F] value along the sublane axis in a
kernel that also contains batched dots crashes the TPU compiler (array.h
"limits <= dim" check). Biases and LN affines are therefore kept
*row-replicated* ([G, CS, F]); the bias update "b - sum_rows(G)" becomes the
matmul ones[CS,CS] @ G (which replicates the column sums), so no sublane
broadcast ever occurs.

The backward pass lives in ttt_vjp.py (custom_vjp over these kernels).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ttt_video_dit_tpu.ops.ln import gelu_bwd, gelu_tanh, ln_fused_l2_bwd, ln_fwd


def _bmm(a, b, *, transpose_b: bool = False, transpose_a: bool = False):
    """Batched matmul over the leading (head) dim with fp32 accumulation."""
    if transpose_a:
        dn = (((1,), (1,)), ((0,), (0,)))
    elif transpose_b:
        dn = (((2,), (2,)), ((0,), (0,)))
    else:
        dn = (((2,), (1,)), ((0,), (0,)))
    return jax.lax.dot_general(a, b, dimension_numbers=dn, preferred_element_type=jnp.float32)


def _rowsum_replicated(x, ones_cs):
    """ones[CS,CS] @ x: every row = column sums of x. [G,CS,F] -> [G,CS,F]."""
    return _bmm(ones_cs, x)


# --------------------------------------------------------- in-kernel preproc
# Fused TTT preprocessing (L2-norm + rope on q/k, LN-reconstruction target on
# v) inside the scan kernels. Outside, these ops plus their autodiff cost
# ~100 ms/step of XLA elementwise passes and layout copies at the d3072 bench
# geometry; in-kernel they ride on data already resident in VMEM and the
# backward recomputes them per step. All math in f32, matching the XLA-side
# formulation (layer.py _ln_reconstruction_target / norm / apply_rope).


def _l2norm_f32(x, eps: float = 1e-12):
    """torch F.normalize parity: x / max(||x||_2, eps), rowwise over F."""
    n = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / jnp.maximum(n, eps)


def _rope_f32(x, cos, sin, R):
    """Interleaved-pair rotation via the constant pair-swap matmul
    (ops/rope.py apply_rope): out = x*cos + (x @ R)*sin. cos/sin: [CS, F]."""
    G, CS, F = x.shape
    xr = jax.lax.dot_general(
        x.reshape(G * CS, F), R, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).reshape(G, CS, F)
    return x * cos + xr * sin


def _target_ln_f32(t, lnw, lnb, eps: float = 1e-8):
    """LN-reconstruction normalization: *unbiased* std with eps added to the
    std (not the var), matching reference ttt/models/ssm/ttt_layer.py:219-235.
    Returns (target, t_hat, s)."""
    n = t.shape[-1]
    mu = jnp.mean(t, axis=-1, keepdims=True)
    var = jnp.var(t, axis=-1, keepdims=True) * (n / max(n - 1, 1))
    s = jnp.sqrt(var) + eps
    t_hat = (t - mu) / s
    return lnw * t_hat + lnb, t_hat, s


def _rot_matrix(F):
    """The ops/rope.py pair-swap matrix built with iota (Pallas kernels may
    not capture host constants as closures): (x@R)[2i] = -x[2i+1],
    (x@R)[2i+1] = x[2i]."""
    i = jax.lax.broadcasted_iota(jnp.int32, (F, F), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (F, F), 1)
    plus = ((j == i + 1) & (i % 2 == 0)).astype(jnp.float32)
    minus = ((j == i - 1) & (i % 2 == 1)).astype(jnp.float32)
    return plus - minus


def _fused_preproc(xq_raw, xk_raw, xv_raw, cos, sin, lnw, lnb):
    """Raw projections -> (XQ, XK, target), all f32 [G, CS, F]."""
    F = xq_raw.shape[-1]
    R = _rot_matrix(F)
    XQ = _rope_f32(_l2norm_f32(xq_raw), cos, sin, R)
    XK = _rope_f32(_l2norm_f32(xk_raw), cos, sin, R)
    target, _, _ = _target_ln_f32(xv_raw - XK, lnw, lnb)
    return XQ, XK, target


def _eta_from_gate(raw, eta_scale):
    """Per-step eta tile [G, CS, 1] from the kernel's eta input: either the
    precomputed eta itself (``eta_scale`` is None) or the pre-sigmoid LR-gate
    logit with eta = sigmoid(gate) * eta_scale fused in-kernel — the sigmoid/
    scale the reference computes as a separate pass outside its kernels
    (reference: ttt/models/ssm/ttt_layer.py:143-155, 285-288). The gate's
    matmul (x . lr_weight + bias) stays in XLA on the MXU."""
    e = raw.astype(jnp.float32)[..., None]
    if eta_scale is None:
        return e
    return jax.nn.sigmoid(e) * eta_scale


def pick_head_group(num_heads: int, head_dim: int, mlp: bool) -> int:
    """Largest head group whose per-step VMEM (state scratch + live
    intermediates) fits comfortably under the 100 MB compiler limit.

    Bigger groups batch more independent per-head matmul chains per
    sequential mini-batch step, hiding MXU latency (measured v5e, 16 heads,
    3s geometry: G=16 4.99 ms vs G=8 5.33 ms vs round-1 8 MB budget 10.4 ms).
    Capped at 16 heads/group — the largest measured configuration."""
    per_head = (2 * head_dim * 4 * head_dim * 4 + 10 * 64 * 4 * head_dim * 4) if mlp else (
        head_dim * head_dim * 4 + 8 * 64 * head_dim * 4
    )
    budget = 40 * 1024 * 1024
    g = max(1, min(num_heads, 16, budget // max(per_head, 1)))
    # g must divide num_heads AND satisfy TPU sublane tiling: blocks of shape
    # (g, F) need g % 8 == 0 or g == num_heads.
    while g > 1 and not (num_heads % g == 0 and (g == num_heads or g % 8 == 0)):
        g -= 1
    if num_heads % g != 0:
        g = num_heads
    return g


# ------------------------------------------------------- token-major kernel IO
# The head-grouped HBM layout [B, H, NC, CS, F] tiles T(8,128) on its minor
# (CS, F=64) dims — every x input/output is stored (and DMA'd) at 2x its
# logical bytes, and the XLA side pays a moveaxis relayout each way between
# the model's token-major [B, L, H*F] stream and the kernel layout (~17
# ms/step of head-layout copies at the 3 s d3072 flagship, more at 63 s).
# With ``token_major=True`` the kernels read/write [B, NC, CS, H*F] directly
# (a pure reshape of the token stream; lanes full, no padding, no relayout)
# and transpose the [CS, G*F] block to the [G, CS, F] compute layout
# in-register per grid step.


def _x_in(ref, tm: bool, G: int, i=0):
    """Read one mini-batch step's x block as [G, CS, F]. ``i`` indexes the
    step inside the block (always 0 in the forward kernels, whose x blocks
    carry one mini-batch; the backward blocks carry a K-step group)."""
    if not tm:
        return ref[0, :, i]  # [G, CS, F]
    x = ref[0, i]  # [CS, G*F]
    CS, GF = x.shape
    F = GF // G
    # Per-head static lane slices + stack (a lane-splitting reshape
    # [CS, G*F] -> [CS, G, F] does not lower in Mosaic).
    return jnp.stack([jax.lax.slice(x, (0, g * F), (CS, (g + 1) * F)) for g in range(G)])


def _x_out(ref, val, tm: bool, i=0):
    if not tm:
        ref[0, :, i] = val
    else:
        G, CS, F = val.shape
        ref[0, i] = jnp.concatenate([val[g] for g in range(G)], axis=-1)


def _linear_kernel(K: int, pre: bool, eta_scale, tm: bool, *refs):
    if pre:
        (xq_ref, xk_ref, xv_ref, cos_ref, sin_ref, eta_ref, lnw_ref, lnb_ref, w1_ref, b1_ref,
         out_ref, w1_ckpt_ref, b1_ckpt_ref, w_scr, b_scr) = refs
    else:
        (xq_ref, xk_ref, xv_ref, eta_ref, lnw_ref, lnb_ref, w1_ref, b1_ref,
         out_ref, w1_ckpt_ref, b1_ckpt_ref, w_scr, b_scr) = refs
    n = pl.program_id(1)
    Gh = lnw_ref.shape[0]

    @pl.when(n == 0)
    def _():
        w_scr[:] = w1_ref[0]
        b_scr[:] = b1_ref[0]  # row-replicated [G, CS, F]

    @pl.when(n % K == 0)
    def _():
        w1_ckpt_ref[0, :, 0] = w_scr[:]
        # Bias rows are identical; store 8 rows x 0.125 so the consumer's
        # ones[CS,8] matmul reconstructs b exactly (1/8 the HBM of CS rows).
        b1_ckpt_ref[0, :, 0] = b_scr[:, 0:8] * 0.125

    eta = _eta_from_gate(eta_ref[0, 0], eta_scale)  # [G, CS, 1]
    lnw = lnw_ref[:].astype(jnp.float32)  # [G, CS, F] row-replicated
    lnb = lnb_ref[:].astype(jnp.float32)
    dt = xq_ref.dtype

    if pre:
        XQf, XKf, target = _fused_preproc(
            _x_in(xq_ref, tm, Gh).astype(jnp.float32), _x_in(xk_ref, tm, Gh).astype(jnp.float32),
            _x_in(xv_ref, tm, Gh).astype(jnp.float32), cos_ref[0], sin_ref[0], lnw, lnb,
        )
        XQ, XK = XQf.astype(dt), XKf.astype(dt)
    else:
        XQ = _x_in(xq_ref, tm, Gh)  # [G, CS, F] (bf16 or f32)
        XK = _x_in(xk_ref, tm, Gh)
        XV = _x_in(xv_ref, tm, Gh)
        target = (XV - XK).astype(jnp.float32)

    W = w_scr[:]  # [G, F, F] fp32
    b = b_scr[:]  # [G, CS, F] fp32 (rows identical)
    G_heads, CS, _ = XQ.shape
    ones_cs = jnp.ones((G_heads, CS, CS), dt)

    Z1 = _bmm(XK, W.astype(dt)) + b
    grad = ln_fused_l2_bwd(Z1, target, lnw, lnb)
    Gs = (eta * grad).astype(dt)  # eta-scaled gradient [G, CS, F]

    attn = _bmm(XQ, XK, transpose_b=True)  # [G, CS, CS]
    b_new = b - _rowsum_replicated(Gs, ones_cs)
    Z1_bar = _bmm(XQ, W.astype(dt)) - _bmm(attn.astype(dt), Gs) + b_new
    W_new = W - _bmm(XK, Gs, transpose_a=True)

    out = XQ.astype(jnp.float32) + ln_fwd(Z1_bar, lnw, lnb)
    _x_out(out_ref, out.astype(out_ref.dtype), tm)

    w_scr[:] = W_new
    b_scr[:] = b_new


def _mlp_kernel(K: int, pre: bool, eta_scale, tm: bool, *refs):
    if pre:
        (xq_ref, xk_ref, xv_ref, cos_ref, sin_ref, eta_ref, lnw_ref, lnb_ref,
         w1_ref, b1_ref, w2_ref, b2_ref,
         out_ref, w1_ckpt_ref, b1_ckpt_ref, w2_ckpt_ref, b2_ckpt_ref,
         w1_scr, b1_scr, w2_scr, b2_scr) = refs
    else:
        (xq_ref, xk_ref, xv_ref, eta_ref, lnw_ref, lnb_ref,
         w1_ref, b1_ref, w2_ref, b2_ref,
         out_ref, w1_ckpt_ref, b1_ckpt_ref, w2_ckpt_ref, b2_ckpt_ref,
         w1_scr, b1_scr, w2_scr, b2_scr) = refs
    n = pl.program_id(1)
    Gh = lnw_ref.shape[0]

    @pl.when(n == 0)
    def _():
        w1_scr[:] = w1_ref[0]
        b1_scr[:] = b1_ref[0]
        w2_scr[:] = w2_ref[0]
        b2_scr[:] = b2_ref[0]

    @pl.when(n % K == 0)
    def _():
        w1_ckpt_ref[0, :, 0] = w1_scr[:]
        # 8-row x 0.125 bias checkpoints (see _linear_kernel note).
        b1_ckpt_ref[0, :, 0] = b1_scr[:, 0:8] * 0.125
        w2_ckpt_ref[0, :, 0] = w2_scr[:]
        b2_ckpt_ref[0, :, 0] = b2_scr[:, 0:8] * 0.125

    eta = _eta_from_gate(eta_ref[0, 0], eta_scale)  # [G, CS, 1]
    lnw = lnw_ref[:].astype(jnp.float32)  # [G, CS, F]
    lnb = lnb_ref[:].astype(jnp.float32)
    dt = xq_ref.dtype

    if pre:
        XQf, XKf, target = _fused_preproc(
            _x_in(xq_ref, tm, Gh).astype(jnp.float32), _x_in(xk_ref, tm, Gh).astype(jnp.float32),
            _x_in(xv_ref, tm, Gh).astype(jnp.float32), cos_ref[0], sin_ref[0], lnw, lnb,
        )
        XQ, XK = XQf.astype(dt), XKf.astype(dt)
    else:
        XQ = _x_in(xq_ref, tm, Gh)  # [G, CS, F]
        XK = _x_in(xk_ref, tm, Gh)
        XV = _x_in(xv_ref, tm, Gh)
        target = (XV - XK).astype(jnp.float32)

    W1, b1 = w1_scr[:], b1_scr[:]  # [G, F, 4F], [G, CS, 4F]
    W2, b2 = w2_scr[:], b2_scr[:]  # [G, 4F, F], [G, CS, F]
    G_heads, CS, _ = XQ.shape
    ones_cs = jnp.ones((G_heads, CS, CS), dt)

    Z1 = _bmm(XK, W1.astype(dt)) + b1
    X2 = gelu_tanh(Z1)  # fp32 [G, CS, 4F]
    X2c = X2.astype(dt)
    Z2 = _bmm(X2c, W2.astype(dt)) + b2

    grad_z2 = ln_fused_l2_bwd(Z2, target, lnw, lnb)
    grad_z1 = _bmm(grad_z2.astype(dt), W2.astype(dt), transpose_b=True) * gelu_bwd(Z1)

    G1 = (eta * grad_z1).astype(dt)  # [G, CS, 4F]
    G2 = (eta * grad_z2).astype(dt)  # [G, CS, F]

    attn1 = _bmm(XQ, XK, transpose_b=True)
    b1_new = b1 - _rowsum_replicated(G1, ones_cs)
    Z1_bar = _bmm(XQ, W1.astype(dt)) - _bmm(attn1.astype(dt), G1) + b1_new
    X2_bar = gelu_tanh(Z1_bar)
    X2_barc = X2_bar.astype(dt)

    attn2 = _bmm(X2_barc, X2c, transpose_b=True)
    b2_new = b2 - _rowsum_replicated(G2, ones_cs)
    Z2_bar = _bmm(X2_barc, W2.astype(dt)) - _bmm(attn2.astype(dt), G2) + b2_new

    W1_new = W1 - _bmm(XK, G1, transpose_a=True)
    W2_new = W2 - _bmm(X2c, G2, transpose_a=True)

    out = XQ.astype(jnp.float32) + ln_fwd(Z2_bar, lnw, lnb)
    _x_out(out_ref, out.astype(out_ref.dtype), tm)

    w1_scr[:] = W1_new
    b1_scr[:] = b1_new
    w2_scr[:] = W2_new
    b2_scr[:] = b2_new


def _specs(H, G, CS, F, K, tm: bool = False):
    """Common BlockSpecs for the head-grouped layout. HG = H // G groups.

    ``tm``: x inputs/outputs ride TOKEN-MAJOR [B, NC, CS, H*F] (see the
    token-major note above _x_in) — the block is the [CS, G*F] slab of one
    mini-batch row for one head group; everything else is unchanged."""
    HG = H // G
    if tm:
        x_map = lambda i, n: (i // HG, n, 0, i % HG)
        x_spec = lambda f: pl.BlockSpec((1, 1, CS, G * f), x_map, memory_space=pltpu.VMEM)
    else:
        x_map = lambda i, n: (i // HG, i % HG, n, 0, 0)
        x_spec = lambda f: pl.BlockSpec((1, G, 1, CS, f), x_map, memory_space=pltpu.VMEM)
    # eta rides as [B, NC, H, CS] (rank 4): a trailing singleton lane dim
    # ([..., CS, 1]) would be padded 128x in HBM (measured: 0.58 MB -> 72 MB
    # per remat temp at the 42-layer geometry -> OOM). The [G, CS] block is
    # expanded to [G, CS, 1] inside the kernel instead.
    eta_spec = pl.BlockSpec((1, 1, G, CS), lambda i, n: (i // HG, n, i % HG, 0), memory_space=pltpu.VMEM)
    # ln params row-replicated host-side to [H, CS, F].
    ln_spec = pl.BlockSpec((G, CS, F), lambda i, n: (i % HG, 0, 0), memory_space=pltpu.VMEM)
    state_map = lambda i, n: (i // HG, i % HG, 0, 0)
    state_spec = lambda d0, d1: pl.BlockSpec((1, G, d0, d1), state_map, memory_space=pltpu.VMEM)
    ckpt_map = lambda i, n: (i // HG, i % HG, n // K, 0, 0)
    ckpt_spec = lambda d0, d1: pl.BlockSpec((1, G, 1, d0, d1), ckpt_map, memory_space=pltpu.VMEM)
    # rope tables [NC, CS, F] f32, one mini-batch row per grid step (fused
    # preproc only); head/batch-independent.
    rope_spec = pl.BlockSpec((1, CS, F), lambda i, n: (n, 0, 0), memory_space=pltpu.VMEM)
    return x_spec, eta_spec, ln_spec, state_spec, ckpt_spec, rope_spec


def _replicate_rows(x, CS):
    """[..., 1, F] -> [..., CS, F] (host-side tile; no kernel broadcast)."""
    return jnp.broadcast_to(x, x.shape[:-2] + (CS, x.shape[-1]))


def ttt_linear_forward(XQ, XK, XV, eta, ln_w, ln_b, W1, b1, checkpoint_group_size: int,
                       interpret: bool = False, head_group: int | None = None,
                       rope_cos=None, rope_sin=None, eta_scale=None,
                       token_major: bool = False):
    """XQ/XK/XV: [B,H,NC,CS,F]; eta: [B,H,NC,CS]; W1: [B,H,F,F]; b1: [B,H,1,F].

    With ``rope_cos``/``rope_sin`` ([NC, CS, F] f32 interleaved tables), the
    inputs are the RAW projections and the kernel applies L2-norm + rope +
    LN-reconstruction-target internally (fused preproc).

    With ``token_major=True``, XQ/XK/XV and the returned XQW ride as
    [B, NC, CS, H*F] (a pure reshape of the model's [B, L, D] stream — no
    moveaxis relayout, no T(8,128) lane padding; see _x_in).

    Returns (XQW, W1_ckpts [B,H,NG,F,F], b1_ckpts [B,H,NG,1,F]).
    """
    if token_major:
        B, NC, CS, HF = XQ.shape
        H, F = ln_w.shape
        assert HF == H * F
    else:
        B, H, NC, CS, F = XQ.shape
    K = min(max(checkpoint_group_size, 1), NC)
    NG = pl.cdiv(NC, K)
    G = head_group or pick_head_group(H, F, mlp=False)
    x_spec, eta_spec, ln_spec, state_spec, ckpt_spec, rope_spec = _specs(H, G, CS, F, K, token_major)
    pre = rope_cos is not None
    rope_in = [rope_cos, rope_sin] if pre else []
    rope_specs = [rope_spec, rope_spec] if pre else []
    x_shape = (B, NC, CS, H * F) if token_major else (B, H, NC, CS, F)

    out, w_ckpt, b_ckpt = pl.pallas_call(
        functools.partial(_linear_kernel, K, pre, eta_scale, token_major),
        grid=(B * (H // G), NC),
        in_specs=[x_spec(F), x_spec(F), x_spec(F), *rope_specs, eta_spec, ln_spec, ln_spec,
                  state_spec(F, F), state_spec(CS, F)],
        out_specs=(x_spec(F), ckpt_spec(F, F), ckpt_spec(8, F)),
        out_shape=(
            jax.ShapeDtypeStruct(x_shape, XQ.dtype),
            jax.ShapeDtypeStruct((B, H, NG, F, F), jnp.float32),
            jax.ShapeDtypeStruct((B, H, NG, 8, F), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((G, F, F), jnp.float32),
            pltpu.VMEM((G, CS, F), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        XQ, XK, XV, *rope_in, jnp.transpose(eta, (0, 2, 1, 3)),
        _replicate_rows(ln_w[:, None, :], CS), _replicate_rows(ln_b[:, None, :], CS),
        W1.astype(jnp.float32), _replicate_rows(b1.astype(jnp.float32), CS),
    )
    # b checkpoints returned 8-row compressed [B,H,NG,8,F] (rows = b * 0.125);
    # reconstruct with sum over the row axis.
    return out, w_ckpt, b_ckpt


def ttt_mlp_forward(XQ, XK, XV, eta, ln_w, ln_b, W1, b1, W2, b2, checkpoint_group_size: int,
                    interpret: bool = False, head_group: int | None = None,
                    rope_cos=None, rope_sin=None, eta_scale=None,
                    token_major: bool = False):
    """Same layout as ttt_linear_forward with W1 [B,H,F,4F], W2 [B,H,4F,F]."""
    if token_major:
        B, NC, CS, HF = XQ.shape
        H, F = ln_w.shape
        assert HF == H * F
    else:
        B, H, NC, CS, F = XQ.shape
    F4 = W1.shape[-1]
    K = min(max(checkpoint_group_size, 1), NC)
    NG = pl.cdiv(NC, K)
    G = head_group or pick_head_group(H, F, mlp=True)
    x_spec, eta_spec, ln_spec, state_spec, ckpt_spec, rope_spec = _specs(H, G, CS, F, K, token_major)
    pre = rope_cos is not None
    rope_in = [rope_cos, rope_sin] if pre else []
    rope_specs = [rope_spec, rope_spec] if pre else []
    x_shape = (B, NC, CS, H * F) if token_major else (B, H, NC, CS, F)

    out, w1_ck, b1_ck, w2_ck, b2_ck = pl.pallas_call(
        functools.partial(_mlp_kernel, K, pre, eta_scale, token_major),
        grid=(B * (H // G), NC),
        in_specs=[x_spec(F), x_spec(F), x_spec(F), *rope_specs, eta_spec, ln_spec, ln_spec,
                  state_spec(F, F4), state_spec(CS, F4), state_spec(F4, F), state_spec(CS, F)],
        out_specs=(x_spec(F), ckpt_spec(F, F4), ckpt_spec(8, F4), ckpt_spec(F4, F), ckpt_spec(8, F)),
        out_shape=(
            jax.ShapeDtypeStruct(x_shape, XQ.dtype),
            jax.ShapeDtypeStruct((B, H, NG, F, F4), jnp.float32),
            jax.ShapeDtypeStruct((B, H, NG, 8, F4), jnp.float32),
            jax.ShapeDtypeStruct((B, H, NG, F4, F), jnp.float32),
            jax.ShapeDtypeStruct((B, H, NG, 8, F), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((G, F, F4), jnp.float32),
            pltpu.VMEM((G, CS, F4), jnp.float32),
            pltpu.VMEM((G, F4, F), jnp.float32),
            pltpu.VMEM((G, CS, F), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        XQ, XK, XV, *rope_in, jnp.transpose(eta, (0, 2, 1, 3)),
        _replicate_rows(ln_w[:, None, :], CS), _replicate_rows(ln_b[:, None, :], CS),
        W1.astype(jnp.float32), _replicate_rows(b1.astype(jnp.float32), CS),
        W2.astype(jnp.float32), _replicate_rows(b2.astype(jnp.float32), CS),
    )
    return out, w1_ck, b1_ck, w2_ck, b2_ck
