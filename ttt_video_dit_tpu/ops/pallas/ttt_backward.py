"""Fully-fused Pallas TPU backward kernels for the TTT inner loop.

Replaces the hybrid (XLA-recompute) backward in ttt_vjp.py with the same
strategy as the reference's Triton backward
(reference: ttt/models/ssm/kernels/linear_backward.py:208-520) and the
ThunderKittens backward (reference: mlp_tk.py:156-275): iterate checkpoint
groups in *reverse* grid order; per group, pass A re-runs the forward from the
checkpointed state stashing the per-step fast-weight states in VMEM, then
pass B walks the group backwards applying the hand-derived step VJP (validated
against the lax.scan oracle's autodiff in tests/test_pallas_kernels.py).

All row-reductions use the ones-matmul trick and biases stay row-replicated
(see ttt_forward.py docstring for the Mosaic sublane-broadcast pitfall).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ttt_video_dit_tpu.ops.ln import gelu_bwd, gelu_tanh
from ttt_video_dit_tpu.ops.pallas.ttt_forward import (
    _bmm,
    _eta_from_gate,
    _l2norm_f32,
    _rope_f32,
    _rot_matrix,
    _target_ln_f32,
    _x_in,
    _x_out,
)


def gelu_bwd2(x):
    """Second derivative of tanh-approx GELU (for grad-of-grad in the MLP
    backward). phi'(x) with phi = gelu_bwd; validated vs autodiff."""
    a = 0.79788456
    c3 = 0.1070322243  # 3c where u = a x + c x^3
    u = a * x + (c3 / 3.0) * x * x * x
    T = jnp.tanh(u)
    up = a + c3 * x * x
    upp = 2.0 * c3 * x
    return (1.0 - T * T) * (up + 0.5 * x * (upp - 2.0 * T * up * up))


def _ln_stats(x, eps=1e-8):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    std = jnp.sqrt(var + eps)
    return (x - mu) / std, std


def _ln_fused_l2(x_hat, std, target, lnw, lnb):
    """Forward inner-loop gradient from precomputed stats."""
    y = lnw * x_hat + lnb
    gx = lnw * (y - target)
    m2 = jnp.mean(gx * x_hat, axis=-1, keepdims=True)
    return (gx - jnp.mean(gx, axis=-1, keepdims=True) - x_hat * m2) / std


def _ln_fwd_vjp_rows(x_hat, std, lnw, u):
    """VJP of ln_fwd: returns (dx, dgamma_rows, dbeta_rows) with the gamma/beta
    integrands left per-row (caller accumulates then row-sums)."""
    w = lnw * u
    dx = (w - jnp.mean(w, axis=-1, keepdims=True) - x_hat * jnp.mean(w * x_hat, axis=-1, keepdims=True)) / std
    return dx, u * x_hat, u


def _ln_fused_l2_vjp_rows(x_hat, std, target, lnw, lnb, u):
    """VJP of the fused LN-L2 gradient (second-order LN term). Returns
    (dx, dtarget, dgamma_rows, dbeta_rows)."""
    D = x_hat.shape[-1]
    y = lnw * x_hat + lnb
    gx = lnw * (y - target)
    m2 = jnp.mean(gx * x_hat, axis=-1, keepdims=True)
    z = (gx - jnp.mean(gx, axis=-1, keepdims=True) - x_hat * m2) / std

    mean_u = jnp.mean(u, axis=-1, keepdims=True)
    mean_ux = jnp.mean(u * x_hat, axis=-1, keepdims=True)
    dgx = (u - mean_u - x_hat * mean_ux) / std
    dx_hat = -(m2 * u + gx * mean_ux) / std + lnw * lnw * dgx
    dstd = -jnp.sum(u * z, axis=-1, keepdims=True) / std

    dx = (
        dx_hat
        - jnp.mean(dx_hat, axis=-1, keepdims=True)
        - x_hat * jnp.mean(dx_hat * x_hat, axis=-1, keepdims=True)
    ) / std + dstd * x_hat / D
    dtarget = -lnw * dgx
    dgamma_rows = dgx * (y - target) + dgx * lnw * x_hat
    dbeta_rows = dgx * lnw
    return dx, dtarget, dgamma_rows, dbeta_rows


def _rowsum_rep(x, ones_cs):
    """ones[CS,CS] @ x — every row = column sums (row-replicated)."""
    return _bmm(ones_cs, x)


def _eta_in(ref, hm: bool, i):
    """One step's eta/gate rows [G, CS] from the kernel's eta block — either
    the chunk-major block [1, K, G, CS] (G on the sublane axis: tiling-legal
    only when G % 8 == 0 or G == H) or the head-major block [1, G, K, CS]
    (K on the sublane axis: legal for ANY divisor G when K % 8 == 0 or
    K == NC — this is what makes a fused backward possible at 12 local
    heads, i.e. 48 global heads under tp=4, where no old-style group
    exists; see pick_bwd_head_group)."""
    return ref[0, :, i] if hm else ref[0, i]


def _deta_out(ref, hm: bool, j, val):
    """Counterpart store of one step's deta rows [G, CS]."""
    if hm:
        ref[0, :, j] = val
    else:
        ref[0, j] = val


# ------------------------------------------------- fused-preproc VJP helpers
# (counterparts of ttt_forward._fused_preproc; validated against jax autodiff
# of the XLA-side preprocessing in tests/test_pallas_kernels.py)


def _target_ln_vjp(t_hat, s, lnw, u, eps: float = 1e-8):
    """VJP of target = lnw * t_hat + lnb w.r.t. t, for the unbiased-variance
    LN with eps added to the *std* (s = sqrt(var) + eps):
    dt_j = (g_j - mean(g))/s - t_hat_j * sum(g*t_hat) / ((n-1) * sqrt(var)),
    g = lnw * u. Returns (dt, dlnw_rows, dlnb_rows). The sqrt(var) guard
    makes zero-variance (eta=0 padded) rows produce zeros, not NaNs."""
    n = t_hat.shape[-1]
    g = lnw * u
    sqrtv = jnp.maximum(s - eps, 1e-20)
    dt = (g - jnp.mean(g, axis=-1, keepdims=True)) / s - t_hat * (
        jnp.sum(g * t_hat, axis=-1, keepdims=True) / ((n - 1) * sqrtv)
    )
    return dt, u * t_hat, u


def _l2norm_vjp(x_raw, u, eps: float = 1e-12):
    """VJP of y = x / max(||x||, eps)."""
    nrm = jnp.sqrt(jnp.sum(x_raw * x_raw, axis=-1, keepdims=True))
    m = jnp.maximum(nrm, eps)
    proj = jnp.sum(u * x_raw, axis=-1, keepdims=True)
    corr = jnp.where(nrm > eps, proj / (m * m * jnp.maximum(nrm, 1e-20)), 0.0)
    return u / m - x_raw * corr


def _rope_vjp(u, cos, sin, R):
    """VJP of rope (out = x*cos + (x@R)*sin): dx = u*cos - (u@R)*sin, since
    R^T = -R for the pair-swap matrix."""
    G, CS, F = u.shape
    ur = jax.lax.dot_general(
        u.reshape(G * CS, F), R, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).reshape(u.shape)
    return u * cos - ur * sin


# ------------------------------------------------------------------ MLP bwd


def _mlp_bwd_kernel(K: int, NG: int, NC: int, pre: bool, eta_scale, tm: bool, eta_hm: bool, *refs):
    if pre:
        (xq_ref, xk_ref, xv_ref, cos_ref, sin_ref, eta_ref, lnw_ref, lnb_ref,
         w1ck_ref, b1ck_ref, w2ck_ref, b2ck_ref, dout_ref,
         dxq_ref, dxk_ref, dxv_ref, deta_ref,
         dw1_ref, db1_ref, dw2_ref, db2_ref, dlnw_ref, dlnb_ref,
         w1_stash, b1_stash, w2_stash, b2_stash,
         dw1_c, db1_c, dw2_c, db2_c, dlnw_acc, dlnb_acc) = refs
    else:
        (xq_ref, xk_ref, xv_ref, eta_ref, lnw_ref, lnb_ref,
         w1ck_ref, b1ck_ref, w2ck_ref, b2ck_ref, dout_ref,
         dxq_ref, dxk_ref, dxv_ref, deta_ref,
         dw1_ref, db1_ref, dw2_ref, db2_ref, dlnw_ref, dlnb_ref,
         w1_stash, b1_stash, w2_stash, b2_stash,
         dw1_c, db1_c, dw2_c, db2_c, dlnw_acc, dlnb_acc) = refs
    n = pl.program_id(1)

    # Ragged NC: the last group (processed first, n == 0) has fewer than K
    # valid mini-batches; its trailing block rows are Pallas edge padding
    # (garbage reads, masked writes) and the loops below never touch them.
    # The data-dependent bound makes every grid step's fori_loops
    # while-lowered (no unrolling) even though only n == 0 is ragged;
    # splitting the grid so the other groups get a static-K bound was
    # considered and rejected — it doubles the kernel instantiations per
    # call for a loop whose large body already amortizes the trip-count
    # check (the flagship bench runs this exact ragged path, NC=282 K=16,
    # at 40.77 % MFU). Compiled-mode ragged behavior is exercised on
    # hardware by scripts/tpu_smoke.py.
    last_valid = NC - (NG - 1) * K
    valid = K if last_valid == K else jnp.where(n == 0, last_valid, K)

    @pl.when(n == 0)
    def _():
        dw1_c[:] = jnp.zeros_like(dw1_c)
        db1_c[:] = jnp.zeros_like(db1_c)
        dw2_c[:] = jnp.zeros_like(dw2_c)
        db2_c[:] = jnp.zeros_like(db2_c)
        dlnw_acc[:] = jnp.zeros_like(dlnw_acc)
        dlnb_acc[:] = jnp.zeros_like(dlnb_acc)

    lnw = lnw_ref[:].astype(jnp.float32)  # [G, CS, F] row-replicated
    lnb = lnb_ref[:].astype(jnp.float32)
    G_heads, CS, F = lnw.shape
    dt = xq_ref.dtype
    ones_cs = jnp.ones((G_heads, CS, CS), dt)
    R = _rot_matrix(F) if pre else None

    def load_step(i, need_q: bool):
        """Per-step (XQ, XK [dt], target f32) plus preproc residuals for the
        fused-preproc VJP (None when preproc runs outside the kernel)."""
        XV = _x_in(xv_ref, tm, G_heads, i)
        if not pre:
            XQ = _x_in(xq_ref, tm, G_heads, i) if need_q else None
            XK = _x_in(xk_ref, tm, G_heads, i)
            return XQ, XK, (XV - XK).astype(jnp.float32), None
        cos_i, sin_i = cos_ref[i], sin_ref[i]
        xq_raw = _x_in(xq_ref, tm, G_heads, i).astype(jnp.float32) if need_q else None
        xk_raw = _x_in(xk_ref, tm, G_heads, i).astype(jnp.float32)
        XKf = _rope_f32(_l2norm_f32(xk_raw), cos_i, sin_i, R)
        target, t_hat, s_t = _target_ln_f32(XV.astype(jnp.float32) - XKf, lnw, lnb)
        XQ = None
        if need_q:
            XQ = _rope_f32(_l2norm_f32(xq_raw), cos_i, sin_i, R).astype(dt)
        return XQ, XKf.astype(dt), target, (xq_raw, xk_raw, t_hat, s_t, cos_i, sin_i)

    # ---- Pass A: recompute forward through the group, stashing states.
    # W stashes are stored in the input dtype (bf16 in production): pass B
    # only ever consumes them via .astype(dt) inside matmuls, so a bf16 stash
    # is bit-identical to stashing fp32 and casting — at half the VMEM, which
    # doubles the feasible head group. Bias stashes stay fp32 (added in fp32).
    def fwd_body(i, state):
        W1, b1, W2, b2 = state  # [G,F,4F], [G,CS,4F] (rows identical), ...
        w1_stash[i] = W1.astype(w1_stash.dtype)
        b1_stash[i] = b1[:, 0:8] * 0.125
        w2_stash[i] = W2.astype(w2_stash.dtype)
        b2_stash[i] = b2[:, 0:8] * 0.125

        _, XK, target, _ = load_step(i, need_q=False)
        eta = _eta_from_gate(_eta_in(eta_ref, eta_hm, i), eta_scale)  # [G, CS, 1]

        Z1 = _bmm(XK, W1.astype(dt)) + b1
        X2 = gelu_tanh(Z1)
        X2c = X2.astype(dt)
        Z2 = _bmm(X2c, W2.astype(dt)) + b2
        z2_hat, std2 = _ln_stats(Z2)
        grad_z2 = _ln_fused_l2(z2_hat, std2, target, lnw, lnb)
        grad_z1 = _bmm(grad_z2.astype(dt), W2.astype(dt), transpose_b=True) * gelu_bwd(Z1)
        G1 = (eta * grad_z1).astype(dt)
        G2 = (eta * grad_z2).astype(dt)
        b1n = b1 - _rowsum_rep(G1, ones_cs)
        b2n = b2 - _rowsum_rep(G2, ones_cs)
        W1n = W1 - _bmm(XK, G1, transpose_a=True)
        W2n = W2 - _bmm(X2c, G2, transpose_a=True)
        return (W1n, b1n, W2n, b2n)

    ones_cs8 = jnp.ones((G_heads, CS, 8), jnp.float32)
    init = (
        w1ck_ref[0, :, 0],
        _bmm(ones_cs8, b1ck_ref[0, :, 0]),  # 8-row x 0.125 ckpt -> [G, CS, F4]
        w2ck_ref[0, :, 0],
        _bmm(ones_cs8, b2ck_ref[0, :, 0]),
    )
    jax.lax.fori_loop(0, valid, fwd_body, init)

    # ---- Pass B: reverse through the group applying the step VJP.
    def bwd_body(jj, _):
        j = valid - 1 - jj
        W1 = w1_stash[j]
        b1 = _bmm(jnp.ones((G_heads, CS, 8), jnp.float32), b1_stash[j])
        W2 = w2_stash[j]
        b2 = _bmm(jnp.ones((G_heads, CS, 8), jnp.float32), b2_stash[j])

        XQ, XK, target, pre_res = load_step(j, need_q=True)
        eta = _eta_from_gate(_eta_in(eta_ref, eta_hm, j), eta_scale)  # [G, CS, 1]
        d_out = _x_in(dout_ref, tm, G_heads, j).astype(jnp.float32)

        # Recompute the step's forward intermediates.
        Z1 = _bmm(XK, W1.astype(dt)) + b1
        phi = gelu_bwd(Z1)
        X2 = gelu_tanh(Z1)
        X2c = X2.astype(dt)
        Z2 = _bmm(X2c, W2.astype(dt)) + b2
        z2_hat, std2 = _ln_stats(Z2)
        g2 = _ln_fused_l2(z2_hat, std2, target, lnw, lnb)
        P = _bmm(g2.astype(dt), W2.astype(dt), transpose_b=True)
        g1 = P * phi
        G1 = (eta * g1).astype(dt)
        G2 = (eta * g2).astype(dt)
        A1 = _bmm(XQ, XK, transpose_b=True)
        Zb1 = _bmm(XQ, W1.astype(dt)) - _bmm(A1.astype(dt), G1) + b1 - _rowsum_rep(G1, ones_cs)
        Xb2 = gelu_tanh(Zb1)
        Xb2c = Xb2.astype(dt)
        A2 = _bmm(Xb2c, X2c, transpose_b=True)
        Zb2 = _bmm(Xb2c, W2.astype(dt)) - _bmm(A2.astype(dt), G2) + b2 - _rowsum_rep(G2, ones_cs)
        zb2_hat, stdb2 = _ln_stats(Zb2)

        # (1) out = XQ + LN(Zb2)
        dZb2, dgw, dgb = _ln_fwd_vjp_rows(zb2_hat, stdb2, lnw, d_out)
        dlnw_acc[:] = dlnw_acc[:] + dgw
        dlnb_acc[:] = dlnb_acc[:] + dgb
        dXQ = d_out
        dZb2c = dZb2.astype(dt)

        # (2) Zb2 = Xb2@W2 - A2@G2 + b2'
        dXb2 = _bmm(dZb2c, W2.astype(dt), transpose_b=True)
        dW2 = _bmm(Xb2c, dZb2c, transpose_a=True)
        dA2 = -_bmm(dZb2c, G2, transpose_b=True)
        dG2 = -_bmm(A2.astype(dt), dZb2c, transpose_a=True)
        # Bias cotangents use the row-replicated representation: every row of
        # db*_c equals the true (1, F) cotangent, so S = colsum(G) backward
        # (dG -= broadcast_rows(db_tot)) is a plain elementwise subtract.
        db2_tot = db2_c[:] + _rowsum_rep(dZb2, ones_cs)
        dG2 = dG2 - db2_tot

        # (3) A2 = Xb2 @ X2^T
        dXb2 = dXb2 + _bmm(dA2.astype(dt), X2c)
        dX2 = _bmm(dA2.astype(dt), Xb2c, transpose_a=True)

        # (4) Xb2 = gelu(Zb1)
        dZb1 = gelu_bwd(Zb1) * dXb2
        dZb1c = dZb1.astype(dt)

        # (5) Zb1 = XQ@W1 - A1@G1 + b1'
        dXQ = dXQ + _bmm(dZb1c, W1.astype(dt), transpose_b=True)
        dW1 = _bmm(XQ, dZb1c, transpose_a=True)
        dA1 = -_bmm(dZb1c, G1, transpose_b=True)
        dG1 = -_bmm(A1.astype(dt), dZb1c, transpose_a=True)
        db1_tot = db1_c[:] + _rowsum_rep(dZb1, ones_cs)
        dG1 = dG1 - db1_tot

        # (6) weight updates W' = W - X^T G
        dW2 = dW2 + dw2_c[:]
        dX2 = dX2 - _bmm(G2, dw2_c[:].astype(dt), transpose_b=True)
        dG2 = dG2 - _bmm(X2c, dw2_c[:].astype(dt))
        dW1 = dW1 + dw1_c[:]
        dXK = -_bmm(G1, dw1_c[:].astype(dt), transpose_b=True)
        dG1 = dG1 - _bmm(XK, dw1_c[:].astype(dt))

        # (7) A1 = XQ @ XK^T
        dXQ = dXQ + _bmm(dA1.astype(dt), XK)
        dXK = dXK + _bmm(dA1.astype(dt), XQ, transpose_a=True)

        # (8) G = eta * g
        de = jnp.sum(dG2 * g2, axis=-1, keepdims=True) + jnp.sum(dG1 * g1, axis=-1, keepdims=True)
        dg2 = eta * dG2
        dg1 = eta * dG1

        # (9) g1 = (g2 @ W2^T) * phi(Z1)
        dP = dg1 * phi
        dZ1 = dg1 * P * gelu_bwd2(Z1)
        dPc = dP.astype(dt)
        dg2 = dg2 + _bmm(dPc, W2.astype(dt))
        dW2 = dW2 + _bmm(dPc, g2.astype(dt), transpose_a=True)

        # (10) g2 = L(Z2, target)
        dZ2, dtarget, dgw2, dgb2 = _ln_fused_l2_vjp_rows(z2_hat, std2, target, lnw, lnb, dg2)
        dlnw_acc[:] = dlnw_acc[:] + dgw2
        dlnb_acc[:] = dlnb_acc[:] + dgb2

        # (11) Z2 = X2@W2 + b2
        dZ2c = dZ2.astype(dt)
        dX2 = dX2 + _bmm(dZ2c, W2.astype(dt), transpose_b=True)
        dW2 = dW2 + _bmm(X2c, dZ2c, transpose_a=True)
        db2_new = db2_tot + _rowsum_rep(dZ2, ones_cs)

        # (12) target chain: outside-preproc target = XV - XK directly;
        # fused preproc chains through the LN-reconstruction normalization
        # (target = lnw * t_hat + lnb, t = XV - XK_roped).
        if pre:
            _, _, t_hat, s_t, _, _ = pre_res
            dtv, dgw_t, dgb_t = _target_ln_vjp(t_hat, s_t, lnw, dtarget)
            dlnw_acc[:] = dlnw_acc[:] + dgw_t
            dlnb_acc[:] = dlnb_acc[:] + dgb_t
            dXV = dtv
            dXK = dXK - dtv
        else:
            dXV = dtarget
            dXK = dXK - dtarget

        # (13) X2 = gelu(Z1)
        dZ1 = dZ1 + phi * dX2
        dZ1c = dZ1.astype(dt)

        # (14) Z1 = XK@W1 + b1
        dXK = dXK + _bmm(dZ1c, W1.astype(dt), transpose_b=True)
        dW1 = dW1 + _bmm(XK, dZ1c, transpose_a=True)
        db1_new = db1_tot + _rowsum_rep(dZ1, ones_cs)

        # (15) fused preproc: chain dXQ/dXK through rope then the L2 norm
        # back to the raw projections.
        if pre:
            xq_raw, xk_raw, _, _, cos_j, sin_j = pre_res
            dXQ = _l2norm_vjp(xq_raw, _rope_vjp(dXQ, cos_j, sin_j, R))
            dXK = _l2norm_vjp(xk_raw, _rope_vjp(dXK, cos_j, sin_j, R))

        # Store outputs and carries.
        _x_out(dxq_ref, dXQ.astype(dxq_ref.dtype), tm, j)
        _x_out(dxk_ref, dXK.astype(dxk_ref.dtype), tm, j)
        _x_out(dxv_ref, dXV.astype(dxv_ref.dtype), tm, j)
        if eta_scale is None:
            _deta_out(deta_ref, eta_hm, j, de[..., 0].astype(deta_ref.dtype))
        else:
            # d_gate = d_eta * d(sigmoid(g)*scale)/dg = de * eta * (1 - sigma)
            sig = eta * (1.0 / eta_scale)
            _deta_out(deta_ref, eta_hm, j, (de * eta * (1.0 - sig))[..., 0].astype(deta_ref.dtype))
        dw1_c[:] = dW1
        db1_c[:] = db1_new
        dw2_c[:] = dW2
        db2_c[:] = db2_new
        return 0

    jax.lax.fori_loop(0, valid, bwd_body, 0)

    # Flush param grads every step (same-index output block; final grid step
    # — group 0 — wins).
    dw1_ref[0] = dw1_c[:]
    db1_ref[0] = db1_c[:]
    dw2_ref[0] = dw2_c[:]
    db2_ref[0] = db2_c[:]
    dlnw_ref[0] = dlnw_acc[:]
    dlnb_ref[0] = dlnb_acc[:]


# ---------------------------------------------------------------- linear bwd


def _linear_bwd_kernel(K: int, NG: int, NC: int, pre: bool, eta_scale, tm: bool, eta_hm: bool, *refs):
    if pre:
        (xq_ref, xk_ref, xv_ref, cos_ref, sin_ref, eta_ref, lnw_ref, lnb_ref,
         w1ck_ref, b1ck_ref, dout_ref,
         dxq_ref, dxk_ref, dxv_ref, deta_ref,
         dw1_ref, db1_ref, dlnw_ref, dlnb_ref,
         w1_stash, b1_stash,
         dw1_c, db1_c, dlnw_acc, dlnb_acc) = refs
    else:
        (xq_ref, xk_ref, xv_ref, eta_ref, lnw_ref, lnb_ref,
         w1ck_ref, b1ck_ref, dout_ref,
         dxq_ref, dxk_ref, dxv_ref, deta_ref,
         dw1_ref, db1_ref, dlnw_ref, dlnb_ref,
         w1_stash, b1_stash,
         dw1_c, db1_c, dlnw_acc, dlnb_acc) = refs
    n = pl.program_id(1)

    # Ragged NC: see _mlp_bwd_kernel.
    last_valid = NC - (NG - 1) * K
    valid = K if last_valid == K else jnp.where(n == 0, last_valid, K)

    @pl.when(n == 0)
    def _():
        dw1_c[:] = jnp.zeros_like(dw1_c)
        db1_c[:] = jnp.zeros_like(db1_c)
        dlnw_acc[:] = jnp.zeros_like(dlnw_acc)
        dlnb_acc[:] = jnp.zeros_like(dlnb_acc)

    lnw = lnw_ref[:].astype(jnp.float32)
    lnb = lnb_ref[:].astype(jnp.float32)
    G_heads, CS, F = lnw.shape
    dt = xq_ref.dtype
    ones_cs = jnp.ones((G_heads, CS, CS), dt)
    R = _rot_matrix(F) if pre else None

    def load_step(i, need_q: bool):
        XV = _x_in(xv_ref, tm, G_heads, i)
        if not pre:
            XQ = _x_in(xq_ref, tm, G_heads, i) if need_q else None
            XK = _x_in(xk_ref, tm, G_heads, i)
            return XQ, XK, (XV - XK).astype(jnp.float32), None
        cos_i, sin_i = cos_ref[i], sin_ref[i]
        xq_raw = _x_in(xq_ref, tm, G_heads, i).astype(jnp.float32) if need_q else None
        xk_raw = _x_in(xk_ref, tm, G_heads, i).astype(jnp.float32)
        XKf = _rope_f32(_l2norm_f32(xk_raw), cos_i, sin_i, R)
        target, t_hat, s_t = _target_ln_f32(XV.astype(jnp.float32) - XKf, lnw, lnb)
        XQ = None
        if need_q:
            XQ = _rope_f32(_l2norm_f32(xq_raw), cos_i, sin_i, R).astype(dt)
        return XQ, XKf.astype(dt), target, (xq_raw, xk_raw, t_hat, s_t, cos_i, sin_i)

    def fwd_body(i, state):
        W1, b1 = state
        w1_stash[i] = W1.astype(w1_stash.dtype)  # bf16 stash; see MLP kernel note
        b1_stash[i] = b1[:, 0:8] * 0.125

        _, XK, target, _ = load_step(i, need_q=False)
        eta = _eta_from_gate(_eta_in(eta_ref, eta_hm, i), eta_scale)  # [G, CS, 1]

        Z1 = _bmm(XK, W1.astype(dt)) + b1
        z1_hat, std1 = _ln_stats(Z1)
        grad = _ln_fused_l2(z1_hat, std1, target, lnw, lnb)
        Gs = (eta * grad).astype(dt)
        b1n = b1 - _rowsum_rep(Gs, ones_cs)
        W1n = W1 - _bmm(XK, Gs, transpose_a=True)
        return (W1n, b1n)

    ones_cs8 = jnp.ones((G_heads, CS, 8), jnp.float32)
    jax.lax.fori_loop(0, valid, fwd_body, (w1ck_ref[0, :, 0], _bmm(ones_cs8, b1ck_ref[0, :, 0])))

    def bwd_body(jj, _):
        j = valid - 1 - jj
        W1 = w1_stash[j]
        b1 = _bmm(jnp.ones((G_heads, CS, 8), jnp.float32), b1_stash[j])

        XQ, XK, target, pre_res = load_step(j, need_q=True)
        eta = _eta_from_gate(_eta_in(eta_ref, eta_hm, j), eta_scale)  # [G, CS, 1]
        d_out = _x_in(dout_ref, tm, G_heads, j).astype(jnp.float32)

        Z1 = _bmm(XK, W1.astype(dt)) + b1
        z1_hat, std1 = _ln_stats(Z1)
        g1 = _ln_fused_l2(z1_hat, std1, target, lnw, lnb)
        Gs = (eta * g1).astype(dt)
        A1 = _bmm(XQ, XK, transpose_b=True)
        Zb1 = _bmm(XQ, W1.astype(dt)) - _bmm(A1.astype(dt), Gs) + b1 - _rowsum_rep(Gs, ones_cs)
        zb1_hat, stdb1 = _ln_stats(Zb1)

        # out = XQ + LN(Zb1)
        dZb1, dgw, dgb = _ln_fwd_vjp_rows(zb1_hat, stdb1, lnw, d_out)
        dlnw_acc[:] = dlnw_acc[:] + dgw
        dlnb_acc[:] = dlnb_acc[:] + dgb
        dXQ = d_out
        dZb1c = dZb1.astype(dt)

        # Zb1 = XQ@W1 - A1@Gs + b1'
        dXQ = dXQ + _bmm(dZb1c, W1.astype(dt), transpose_b=True)
        dW1 = _bmm(XQ, dZb1c, transpose_a=True)
        dA1 = -_bmm(dZb1c, Gs, transpose_b=True)
        dG = -_bmm(A1.astype(dt), dZb1c, transpose_a=True)
        db1_tot = db1_c[:] + _rowsum_rep(dZb1, ones_cs)
        dG = dG - db1_tot

        # W1' = W1 - XK^T Gs
        dW1 = dW1 + dw1_c[:]
        dXK = -_bmm(Gs, dw1_c[:].astype(dt), transpose_b=True)
        dG = dG - _bmm(XK, dw1_c[:].astype(dt))

        # A1 = XQ @ XK^T
        dXQ = dXQ + _bmm(dA1.astype(dt), XK)
        dXK = dXK + _bmm(dA1.astype(dt), XQ, transpose_a=True)

        # Gs = eta * g1
        de = jnp.sum(dG * g1, axis=-1, keepdims=True)
        dg1 = eta * dG

        # g1 = L(Z1, target)
        dZ1, dtarget, dgw2, dgb2 = _ln_fused_l2_vjp_rows(z1_hat, std1, target, lnw, lnb, dg1)
        dlnw_acc[:] = dlnw_acc[:] + dgw2
        dlnb_acc[:] = dlnb_acc[:] + dgb2

        if pre:
            _, _, t_hat, s_t, _, _ = pre_res
            dtv, dgw_t, dgb_t = _target_ln_vjp(t_hat, s_t, lnw, dtarget)
            dlnw_acc[:] = dlnw_acc[:] + dgw_t
            dlnb_acc[:] = dlnb_acc[:] + dgb_t
            dXV = dtv
            dXK = dXK - dtv
        else:
            dXV = dtarget
            dXK = dXK - dtarget

        # Z1 = XK@W1 + b1
        dZ1c = dZ1.astype(dt)
        dXK = dXK + _bmm(dZ1c, W1.astype(dt), transpose_b=True)
        dW1 = dW1 + _bmm(XK, dZ1c, transpose_a=True)
        db1_new = db1_tot + _rowsum_rep(dZ1, ones_cs)

        if pre:
            xq_raw, xk_raw, _, _, cos_j, sin_j = pre_res
            dXQ = _l2norm_vjp(xq_raw, _rope_vjp(dXQ, cos_j, sin_j, R))
            dXK = _l2norm_vjp(xk_raw, _rope_vjp(dXK, cos_j, sin_j, R))

        _x_out(dxq_ref, dXQ.astype(dxq_ref.dtype), tm, j)
        _x_out(dxk_ref, dXK.astype(dxk_ref.dtype), tm, j)
        _x_out(dxv_ref, dXV.astype(dxv_ref.dtype), tm, j)
        if eta_scale is None:
            _deta_out(deta_ref, eta_hm, j, de[..., 0].astype(deta_ref.dtype))
        else:
            # d_gate = d_eta * d(sigmoid(g)*scale)/dg = de * eta * (1 - sigma)
            sig = eta * (1.0 / eta_scale)
            _deta_out(deta_ref, eta_hm, j, (de * eta * (1.0 - sig))[..., 0].astype(deta_ref.dtype))
        dw1_c[:] = dW1
        db1_c[:] = db1_new
        return 0

    jax.lax.fori_loop(0, valid, bwd_body, 0)

    dw1_ref[0] = dw1_c[:]
    db1_ref[0] = db1_c[:]
    dlnw_ref[0] = dlnw_acc[:]
    dlnb_ref[0] = dlnb_acc[:]


def ttt_linear_backward(XQ, XK, XV, eta, ln_w, ln_b, w1_ck, b1_ck, g,
                        checkpoint_group_size: int, interpret: bool = False,
                        head_group: int | None = None, rope_cos=None, rope_sin=None,
                        eta_scale=None, token_major: bool = False):
    """Fused TTT-linear backward; see ttt_mlp_backward for conventions."""
    if token_major:
        B, NC, CS, HF = XQ.shape
        H, F = ln_w.shape
        assert HF == H * F
    else:
        B, H, NC, CS, F = XQ.shape
    K = min(max(checkpoint_group_size, 1), NC)
    NG = pl.cdiv(NC, K)  # ragged last group handled in-kernel (dynamic bound)
    G = head_group or pick_bwd_head_group(H, F, K, CS, mlp=False, NC=NC)
    HG = H // G

    rev_x = lambda i, n: (i // HG, i % HG, NG - 1 - n, 0, 0)
    if token_major:
        tm_map = lambda i, n: (i // HG, NG - 1 - n, 0, i % HG)
        x_spec = lambda f: pl.BlockSpec((1, K, CS, G * f), tm_map, memory_space=pltpu.VMEM)
    else:
        x_spec = lambda f: pl.BlockSpec((1, G, K, CS, f), rev_x, memory_space=pltpu.VMEM)
    # eta/deta ride as [B, NC, H, CS] (rank 4) — a trailing singleton lane dim
    # is padded 128x in HBM (see ttt_forward._specs). When the chunk-major
    # block (G on the sublane axis) is tiling-illegal for this G, eta rides
    # HEAD-major [B, H, NC, CS] with K on the sublane axis instead (_eta_in).
    eta_hm = not (G % 8 == 0 or G == H)
    if eta_hm:
        eta_spec = pl.BlockSpec((1, G, K, CS), lambda i, n: (i // HG, i % HG, NG - 1 - n, 0),
                                memory_space=pltpu.VMEM)
        eta_in, deta_shape = eta, (B, H, NC, CS)
    else:
        eta_spec = pl.BlockSpec((1, K, G, CS), lambda i, n: (i // HG, NG - 1 - n, i % HG, 0),
                                memory_space=pltpu.VMEM)
        eta_in, deta_shape = jnp.transpose(eta, (0, 2, 1, 3)), (B, NC, H, CS)
    ln_spec = pl.BlockSpec((G, CS, F), lambda i, n: (i % HG, 0, 0), memory_space=pltpu.VMEM)
    ck_spec = lambda d0, d1: pl.BlockSpec((1, G, 1, d0, d1), rev_x, memory_space=pltpu.VMEM)
    state_map = lambda i, n: (i // HG, i % HG, 0, 0)
    out_state = lambda d0, d1: pl.BlockSpec((1, G, d0, d1), state_map, memory_space=pltpu.VMEM)
    out_ln = pl.BlockSpec((1, G, CS, F), state_map, memory_space=pltpu.VMEM)
    pre = rope_cos is not None
    rope_spec = pl.BlockSpec((K, CS, F), lambda i, n: (NG - 1 - n, 0, 0), memory_space=pltpu.VMEM)
    rope_in = [rope_cos, rope_sin] if pre else []
    rope_specs = [rope_spec, rope_spec] if pre else []

    x_shape = (B, NC, CS, H * F) if token_major else (B, H, NC, CS, F)
    outs = pl.pallas_call(
        functools.partial(_linear_bwd_kernel, K, NG, NC, pre, eta_scale, token_major, eta_hm),
        grid=(B * HG, NG),
        in_specs=[x_spec(F), x_spec(F), x_spec(F), *rope_specs, eta_spec, ln_spec, ln_spec,
                  ck_spec(F, F), ck_spec(8, F), x_spec(F)],
        out_specs=(x_spec(F), x_spec(F), x_spec(F), eta_spec,
                   out_state(F, F), out_state(CS, F), out_ln, out_ln),
        out_shape=(
            jax.ShapeDtypeStruct(x_shape, XQ.dtype),
            jax.ShapeDtypeStruct(x_shape, XQ.dtype),
            jax.ShapeDtypeStruct(x_shape, XQ.dtype),
            jax.ShapeDtypeStruct(deta_shape, jnp.float32),
            jax.ShapeDtypeStruct((B, H, F, F), jnp.float32),
            jax.ShapeDtypeStruct((B, H, CS, F), jnp.float32),
            jax.ShapeDtypeStruct((B, H, CS, F), jnp.float32),
            jax.ShapeDtypeStruct((B, H, CS, F), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((K, G, F, F), XQ.dtype),
            pltpu.VMEM((K, G, 8, F), jnp.float32),
            pltpu.VMEM((G, F, F), jnp.float32),
            pltpu.VMEM((G, CS, F), jnp.float32),
            pltpu.VMEM((G, CS, F), jnp.float32),
            pltpu.VMEM((G, CS, F), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        XQ, XK, XV, *rope_in, eta_in,
        jnp.broadcast_to(ln_w.astype(jnp.float32)[:, None, :], (H, CS, F)),
        jnp.broadcast_to(ln_b.astype(jnp.float32)[:, None, :], (H, CS, F)),
        w1_ck, b1_ck, g,
    )
    # deta back to the caller's [B, H, NC, CS] layout.
    deta = outs[3] if eta_hm else jnp.transpose(outs[3], (0, 2, 1, 3))
    return outs[:3] + (deta,) + outs[4:]


def _eta_hm_legal(K: int | None, NC: int | None) -> bool:
    """Whether the HEAD-major eta layout ([B, H, NC, CS], K on the sublane
    axis) is tiling-legal: blocks of shape (K, CS) need K % 8 == 0 or
    K == NC. K defaults to 16 (config remat.scan_checkpoint_group_size), so
    this holds in practice; an exotic K (e.g. 10 with NC > 10) falls back to
    the chunk-major-only group rule."""
    return K is not None and (K % 8 == 0 or (NC is not None and K == NC))


def _legal_groups(num_heads: int, eta_hm_ok: bool) -> list[int]:
    """Backward head groups under the compile-proven G <= 8 VMEM cap.
    Chunk-major eta blocks ([.., G, CS], G on the sublane axis) additionally
    need G % 8 == 0 or G == num_heads; the head-major layout lifts that and
    admits ANY divisor <= 8."""
    return [g for g in range(1, 9)
            if num_heads % g == 0 and (eta_hm_ok or g % 8 == 0 or g == num_heads)]


def pick_bwd_head_group(num_heads: int, head_dim: int, K: int, CS: int, mlp: bool,
                        NC: int | None = None) -> int:
    """Head group sized so the bf16 state stash + pipelined IO blocks fit in
    VMEM (limit raised to 100 MB; 48 MB budget leaves pipelining headroom).

    TPU tiling admits two eta layouts: chunk-major (G on the sublane axis —
    G must be a multiple of 8 or equal num_heads; a bare G=6 pick at 12
    local heads failed Pallas lowering in the 63 s pod-config AOT compile)
    and head-major (K on the sublane axis — any divisor G, provided
    K % 8 == 0 or K == NC; see _eta_in). Measured v5e (16 heads, K=16,
    CS=64, F=64, ttt-mlp): G=8 10.2 ms vs G=2 13.3 ms; G=16 fails to
    compile (VMEM), and the forced G=12 at 12 local heads fails too (both
    the detached v5e-256 AOT compile and the live remote compiler die on
    the kernel's VMEM stack) — so the compile-proven cap is a HARD G <= 8.
    With the head-major layout, 12 local heads (48 global under tp=4, the
    reference's 63 s shape) gets G=6. Head counts with no legal group at
    all fall to the non-fused path (fused_bwd_supported, layer.py)."""
    valid = _legal_groups(num_heads, _eta_hm_legal(K, NC))
    if not valid:
        # Explicit raise (not assert): must survive `python -O`, and an empty
        # `valid` would otherwise surface as an opaque min()-of-empty error
        # deep in tracing.
        raise ValueError(
            f"fused TTT backward unsupported at {num_heads} heads with "
            f"checkpoint group K={K} (NC={NC}): no head group <= 8 is "
            f"tiling-legal. Use K % 8 == 0 (any divisor group then works), "
            f"or shard so local heads have a divisor that is a multiple of "
            f"8 or <= 8."
        )
    if mlp:
        # W1/W2 stash bf16, b stashes fp32 8-row compressed.
        stash = K * (2 * head_dim * 4 * head_dim * 2 + 8 * 4 * head_dim * 4 + 8 * head_dim * 4)
    else:
        stash = K * (head_dim * head_dim * 2 + 8 * head_dim * 4)
    io = 2 * 9 * K * CS * head_dim * 2  # 5 in + 4 out blocks, double-buffered, bf16
    budget = 48 * 1024 * 1024
    cap = budget // max(stash + io, 1)
    in_budget = [g for g in valid if g <= max(cap, 1)]
    return max(in_budget) if in_budget else min(valid)


def fused_bwd_supported(num_heads: int, checkpoint_group: int | None = None,
                        num_chunks: int | None = None) -> bool:
    """True iff a tiling-legal backward head group exists under the
    compile-proven G <= 8 cap. With the chunk-major eta layout that means a
    divisor g of num_heads with g % 8 == 0 or g == num_heads; when the
    head-major layout is available (checkpoint_group % 8 == 0 or ==
    num_chunks — pass them when known) ANY divisor <= 8 qualifies, which
    covers 12 local heads (48 global under tp=4, the reference's 63 s
    shape: /root/reference/configs/train/ttt-mlp/63s.toml:44) via G=6.
    Callers that can't supply K get the conservative chunk-major answer."""
    return bool(_legal_groups(num_heads, _eta_hm_legal(checkpoint_group, num_chunks)))


def ttt_mlp_backward(XQ, XK, XV, eta, ln_w, ln_b, w1_ck, b1_ck, w2_ck, b2_ck, g,
                     checkpoint_group_size: int, interpret: bool = False,
                     head_group: int | None = None, rope_cos=None, rope_sin=None,
                     eta_scale=None, token_major: bool = False):
    """Fused backward. NC need not divide the checkpoint group: the ragged
    last group is handled in-kernel with dynamically-bounded loops (its edge
    block rows are Pallas garbage-reads/masked-writes and are never touched).
    Inputs are the raw tensors plus the forward kernel's state checkpoints
    (b ckpts row-replicated [B,H,NG,CS,F']) and the output cotangent ``g``.

    Returns (dXQ, dXK, dXV, deta, d_lnw [B,H,CS,F], d_lnb [B,H,CS,F],
    dW1 [B,H,F,4F], db1 [B,H,CS,4F], dW2, db2) — ln/bias grads row-replicated
    and per-batch; the caller reduces.

    With ``token_major=True``, XQ/XK/XV/g and the returned dXQ/dXK/dXV ride
    as [B, NC, CS, H*F] (see ttt_forward's token-major note); everything
    else is unchanged.
    """
    if token_major:
        B, NC, CS, HF = XQ.shape
        H, F = ln_w.shape
        assert HF == H * F
    else:
        B, H, NC, CS, F = XQ.shape
    F4 = w1_ck.shape[-1]
    K = min(max(checkpoint_group_size, 1), NC)
    NG = pl.cdiv(NC, K)  # ragged last group handled in-kernel (dynamic bound)
    G = head_group or pick_bwd_head_group(H, F, K, CS, mlp=True, NC=NC)
    HG = H // G

    rev_x = lambda i, n: (i // HG, i % HG, NG - 1 - n, 0, 0)
    if token_major:
        tm_map = lambda i, n: (i // HG, NG - 1 - n, 0, i % HG)
        x_spec = lambda f: pl.BlockSpec((1, K, CS, G * f), tm_map, memory_space=pltpu.VMEM)
    else:
        x_spec = lambda f: pl.BlockSpec((1, G, K, CS, f), rev_x, memory_space=pltpu.VMEM)
    # eta/deta ride as [B, NC, H, CS] (rank 4) — a trailing singleton lane dim
    # is padded 128x in HBM (see ttt_forward._specs). When the chunk-major
    # block (G on the sublane axis) is tiling-illegal for this G, eta rides
    # HEAD-major [B, H, NC, CS] with K on the sublane axis instead (_eta_in).
    eta_hm = not (G % 8 == 0 or G == H)
    if eta_hm:
        eta_spec = pl.BlockSpec((1, G, K, CS), lambda i, n: (i // HG, i % HG, NG - 1 - n, 0),
                                memory_space=pltpu.VMEM)
        eta_in, deta_shape = eta, (B, H, NC, CS)
    else:
        eta_spec = pl.BlockSpec((1, K, G, CS), lambda i, n: (i // HG, NG - 1 - n, i % HG, 0),
                                memory_space=pltpu.VMEM)
        eta_in, deta_shape = jnp.transpose(eta, (0, 2, 1, 3)), (B, NC, H, CS)
    ln_spec = pl.BlockSpec((G, CS, F), lambda i, n: (i % HG, 0, 0), memory_space=pltpu.VMEM)
    ck_spec = lambda d0, d1: pl.BlockSpec((1, G, 1, d0, d1), rev_x, memory_space=pltpu.VMEM)
    state_map = lambda i, n: (i // HG, i % HG, 0, 0)
    out_state = lambda d0, d1: pl.BlockSpec((1, G, d0, d1), state_map, memory_space=pltpu.VMEM)
    out_ln = pl.BlockSpec((1, G, CS, F), state_map, memory_space=pltpu.VMEM)
    pre = rope_cos is not None
    rope_spec = pl.BlockSpec((K, CS, F), lambda i, n: (NG - 1 - n, 0, 0), memory_space=pltpu.VMEM)
    rope_in = [rope_cos, rope_sin] if pre else []
    rope_specs = [rope_spec, rope_spec] if pre else []

    x_shape = (B, NC, CS, H * F) if token_major else (B, H, NC, CS, F)
    outs = pl.pallas_call(
        functools.partial(_mlp_bwd_kernel, K, NG, NC, pre, eta_scale, token_major, eta_hm),
        grid=(B * HG, NG),
        in_specs=[x_spec(F), x_spec(F), x_spec(F), *rope_specs, eta_spec, ln_spec, ln_spec,
                  ck_spec(F, F4), ck_spec(8, F4), ck_spec(F4, F), ck_spec(8, F),
                  x_spec(F)],
        out_specs=(x_spec(F), x_spec(F), x_spec(F), eta_spec,
                   out_state(F, F4), out_state(CS, F4), out_state(F4, F), out_state(CS, F),
                   out_ln, out_ln),
        out_shape=(
            jax.ShapeDtypeStruct(x_shape, XQ.dtype),
            jax.ShapeDtypeStruct(x_shape, XQ.dtype),
            jax.ShapeDtypeStruct(x_shape, XQ.dtype),
            jax.ShapeDtypeStruct(deta_shape, jnp.float32),
            jax.ShapeDtypeStruct((B, H, F, F4), jnp.float32),
            jax.ShapeDtypeStruct((B, H, CS, F4), jnp.float32),
            jax.ShapeDtypeStruct((B, H, F4, F), jnp.float32),
            jax.ShapeDtypeStruct((B, H, CS, F), jnp.float32),
            jax.ShapeDtypeStruct((B, H, CS, F), jnp.float32),
            jax.ShapeDtypeStruct((B, H, CS, F), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((K, G, F, F4), XQ.dtype),
            pltpu.VMEM((K, G, 8, F4), jnp.float32),
            pltpu.VMEM((K, G, F4, F), XQ.dtype),
            pltpu.VMEM((K, G, 8, F), jnp.float32),
            pltpu.VMEM((G, F, F4), jnp.float32),
            pltpu.VMEM((G, CS, F4), jnp.float32),
            pltpu.VMEM((G, F4, F), jnp.float32),
            pltpu.VMEM((G, CS, F), jnp.float32),
            pltpu.VMEM((G, CS, F), jnp.float32),
            pltpu.VMEM((G, CS, F), jnp.float32),
        ],
        # The 16 MB scoped-vmem default is conservative; the stash + grouped
        # IO for this kernel legitimately needs more (v5e has 128 MB VMEM).
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        XQ, XK, XV, *rope_in, eta_in,
        jnp.broadcast_to(ln_w.astype(jnp.float32)[:, None, :], (H, CS, F)),
        jnp.broadcast_to(ln_b.astype(jnp.float32)[:, None, :], (H, CS, F)),
        w1_ck, b1_ck, w2_ck, b2_ck, g,
    )
    # deta back to the caller's [B, H, NC, CS] layout.
    deta = outs[3] if eta_hm else jnp.transpose(outs[3], (0, 2, 1, 3))
    return outs[:3] + (deta,) + outs[4:]
