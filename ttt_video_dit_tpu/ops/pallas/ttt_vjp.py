"""custom_vjp glue: Pallas forward kernels + checkpoint-group backward.

Forward runs the fused Pallas scan (ttt_forward.py) and keeps only the fp32
state checkpoints (one per group of `checkpoint_group_size` mini-batches) as
residuals. Backward walks the groups in reverse; for each group it re-runs the
pure-JAX oracle scan (ops/ttt_scan.py) from the checkpointed state under
``jax.vjp`` — the same recompute-per-group strategy as the reference's Triton
backward (reference: ttt/models/ssm/kernels/linear_backward.py:208-520) and
ThunderKittens backward (reference: mlp_tk.py:156-275), with XLA generating
the in-group backward instead of hand-written kernels.

If NC is not a multiple of the group size, the Pallas kernels handle the
ragged last checkpoint group natively (the forward grid is per-mini-batch;
the backward bounds its in-group loops dynamically) — no padding, no
pad/slice ops in the step program. Only the XLA-recompute fallback backward
still pads with eta=0 mini-batches (a zero learning rate makes the
fast-weight update an exact no-op) and slices the padded outputs away.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.ad_checkpoint import checkpoint_name as _ckpt_name

from ttt_video_dit_tpu.ops import ttt_scan
from ttt_video_dit_tpu.ops.pallas import ttt_forward


def _name_res(*cks):
    """Tag the fast-weight state checkpoints as saveable residuals: with the
    save_seq remat policy (models/dit/dit.py:_ckpt_policy) they survive the
    remat boundary, so the backward consumes the ORIGINAL forward's
    checkpoints and the sequential forward scan is DCE'd from the recompute
    (only the cheap projections are re-run). Inert without a policy."""
    return tuple(_ckpt_name(c, "ttt_residuals") for c in cks)

# Default for the fully-fused Pallas backward kernels (ttt_backward.py); the
# per-call ``fused`` argument (config: model.use_fused_backward) selects the
# XLA checkpoint-group backward below when False. Measured at flagship scale
# (bench.py --no-fused-ttt-bwd, d3072x48hx2L save_seq): hybrid 1.583 s/step
# vs fused 0.962 — and hybrid OOMs at remat=none — so the fallback is a
# debugging/bisection path, not a production one (docs/performance.md).
USE_FUSED_BWD = True


def _pad_nc(x, pad):
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[2] = (0, pad)
    return jnp.pad(x, widths)


def _group_axes(x, NG, K):
    """[B,H,NC,...] -> [NG, K, B, H, ...] for scanning over groups."""
    B, H = x.shape[:2]
    moved = jnp.moveaxis(x, 2, 0)  # [NC, B, H, ...]
    return moved.reshape(NG, K, *moved.shape[1:])


def _ungroup_axes(y, NC):
    """[NG, K, B, H, ...] -> [B, H, NG*K, ...] (caller slices to NC)."""
    merged = y.reshape(y.shape[0] * y.shape[1], *y.shape[2:])
    return jnp.moveaxis(merged, 0, 2)


def _make_group_fn(step):
    def group_fn(state, ln_w, ln_b, xs):
        lw = ln_w.astype(jnp.float32)[:, None, :]
        lb = ln_b.astype(jnp.float32)[:, None, :]
        return jax.lax.scan(functools.partial(step, ln_weight=lw, ln_bias=lb), state, xs)

    return group_fn


def _grouped_backward(step, state_cls, ckpts, ln_w, ln_b, xs_grouped, g_grouped, d_final_state):
    """Reverse scan over groups; returns (d_state0, d_ln_w, d_ln_b, dxs_grouped)."""
    NG = jax.tree_util.tree_leaves(xs_grouped)[0].shape[0]
    group_fn = _make_group_fn(step)

    def body(carry, inp):
        d_state, d_lnw, d_lnb = carry
        state0, xs_g, g_g = inp
        _, vjp_fn = jax.vjp(group_fn, state_cls(*state0), ln_w, ln_b, xs_g)
        d_state0, dlw, dlb, dxs = vjp_fn((state_cls(*d_state), g_g))
        return (tuple(d_state0), d_lnw + dlw, d_lnb + dlb), dxs

    # Reverse group order.
    rev = lambda t: jax.tree.map(lambda x: jnp.flip(x, axis=0), t)
    init = (tuple(d_final_state), jnp.zeros_like(ln_w), jnp.zeros_like(ln_b))
    (d_state0, d_lnw, d_lnb), dxs_rev = jax.lax.scan(body, init, (rev(ckpts), rev(xs_grouped), rev(g_grouped)))
    return d_state0, d_lnw, d_lnb, rev(dxs_rev)


# ---------------------------------------------------------------- TTT-linear


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def ttt_linear_fused(K: int, interpret: bool, fused: bool, XQ, XK, XV, eta, ln_w, ln_b, W1, b1):
    out, _, _ = _linear_fwd_padded(K, interpret, XQ, XK, XV, eta, ln_w, ln_b, W1, b1)
    return out


def _linear_fwd_padded(K, interpret, XQ, XK, XV, eta, ln_w, ln_b, W1, b1):
    return ttt_forward.ttt_linear_forward(XQ, XK, XV, eta, ln_w, ln_b, W1, b1, K, interpret=interpret)


def _linear_fwd(K, interpret, fused, XQ, XK, XV, eta, ln_w, ln_b, W1, b1):
    out, w_ck, b_ck = _linear_fwd_padded(K, interpret, XQ, XK, XV, eta, ln_w, ln_b, W1, b1)
    w_ck, b_ck = _name_res(w_ck, b_ck)
    return out, (XQ, XK, XV, eta, ln_w, ln_b, w_ck, b_ck)


def _linear_bwd(K, interpret, fused, res, g):
    XQ, XK, XV, eta, ln_w, ln_b, w_ck, b_ck = res
    B, H, NC, CS, F = XQ.shape
    pad = (-NC) % K

    if fused:
        from ttt_video_dit_tpu.ops.pallas import ttt_backward

        dXQ, dXK, dXV, de, dW1, db1, dlnw, dlnb = ttt_backward.ttt_linear_backward(
            XQ, XK, XV, eta, ln_w, ln_b, w_ck, b_ck, g.astype(XQ.dtype), K, interpret=interpret,
        )
        sl = lambda x, proto: x.astype(proto.dtype)
        return (
            sl(dXQ, XQ), sl(dXK, XK), sl(dXV, XV), sl(de, eta),
            jnp.sum(dlnw, axis=(0, 2)).astype(ln_w.dtype),
            jnp.sum(dlnb, axis=(0, 2)).astype(ln_b.dtype),
            dW1, db1[:, :, 0:1, :],
        )

    NG = (NC + pad) // K

    gp = lambda x: _group_axes(_pad_nc(x, pad), NG, K)
    xs_grouped = (gp(XQ), gp(XK), gp(XV), gp(eta))
    g_grouped = gp(g.astype(jnp.float32))

    # Checkpoints: [B,H,NG,...] -> [NG,B,H,...]; b ckpts arrive 8-row
    # compressed (rows = b * 0.125) -> sum rows to reconstruct [.., 1, F].
    b_ck = jnp.sum(b_ck, axis=-2, keepdims=True)
    ck = lambda c: jnp.moveaxis(c, 2, 0)
    ckpts = (ck(w_ck), ck(b_ck))

    d_final = (jnp.zeros_like(w_ck[:, :, 0]), jnp.zeros_like(b_ck[:, :, 0]))
    d_state0, d_lnw, d_lnb, dxs = _grouped_backward(
        ttt_scan.ttt_linear_mini_batch, ttt_scan.LinearState, ckpts, ln_w, ln_b, xs_grouped, g_grouped, d_final
    )

    ug = lambda y, proto: _ungroup_axes(y, NC)[:, :, :NC].astype(proto.dtype)
    dXQ, dXK, dXV, deta = (ug(d, p) for d, p in zip(dxs, (XQ, XK, XV, eta)))
    dW1, db1 = (d.astype(jnp.float32) for d in d_state0)
    return dXQ, dXK, dXV, deta, d_lnw, d_lnb, dW1, db1


ttt_linear_fused.defvjp(_linear_fwd, _linear_bwd)


# ------------------------------------------------------------------ TTT-MLP


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def ttt_mlp_fused(K: int, interpret: bool, fused: bool, XQ, XK, XV, eta, ln_w, ln_b, W1, b1, W2, b2):
    out, *_ = _mlp_fwd_padded(K, interpret, XQ, XK, XV, eta, ln_w, ln_b, W1, b1, W2, b2)
    return out


def _mlp_fwd_padded(K, interpret, XQ, XK, XV, eta, ln_w, ln_b, W1, b1, W2, b2):
    return ttt_forward.ttt_mlp_forward(XQ, XK, XV, eta, ln_w, ln_b, W1, b1, W2, b2, K, interpret=interpret)


def _mlp_fwd(K, interpret, fused, XQ, XK, XV, eta, ln_w, ln_b, W1, b1, W2, b2):
    out, w1_ck, b1_ck, w2_ck, b2_ck = _mlp_fwd_padded(K, interpret, XQ, XK, XV, eta, ln_w, ln_b, W1, b1, W2, b2)
    w1_ck, b1_ck, w2_ck, b2_ck = _name_res(w1_ck, b1_ck, w2_ck, b2_ck)
    return out, (XQ, XK, XV, eta, ln_w, ln_b, w1_ck, b1_ck, w2_ck, b2_ck)


def _mlp_bwd(K, interpret, fused, res, g):
    XQ, XK, XV, eta, ln_w, ln_b, w1_ck, b1_ck, w2_ck, b2_ck = res
    B, H, NC, CS, F = XQ.shape
    pad = (-NC) % K

    if fused:
        from ttt_video_dit_tpu.ops.pallas import ttt_backward

        outs = ttt_backward.ttt_mlp_backward(
            XQ, XK, XV, eta, ln_w, ln_b, w1_ck, b1_ck, w2_ck, b2_ck,
            g.astype(XQ.dtype), K, interpret=interpret,
        )
        dXQ, dXK, dXV, de, dW1, db1, dW2, db2, dlnw, dlnb = outs
        sl = lambda x, proto: x.astype(proto.dtype)
        return (
            sl(dXQ, XQ), sl(dXK, XK), sl(dXV, XV), sl(de, eta),
            jnp.sum(dlnw, axis=(0, 2)).astype(ln_w.dtype),
            jnp.sum(dlnb, axis=(0, 2)).astype(ln_b.dtype),
            dW1, db1[:, :, 0:1, :], dW2, db2[:, :, 0:1, :],
        )

    NG = (NC + pad) // K

    gp = lambda x: _group_axes(_pad_nc(x, pad), NG, K)
    xs_grouped = (gp(XQ), gp(XK), gp(XV), gp(eta))
    g_grouped = gp(g.astype(jnp.float32))

    b1_ck = jnp.sum(b1_ck, axis=-2, keepdims=True)
    b2_ck = jnp.sum(b2_ck, axis=-2, keepdims=True)
    ck = lambda c: jnp.moveaxis(c, 2, 0)
    ckpts = (ck(w1_ck), ck(b1_ck), ck(w2_ck), ck(b2_ck))

    d_final = tuple(jnp.zeros_like(c[:, :, 0]) for c in (w1_ck, b1_ck, w2_ck, b2_ck))
    d_state0, d_lnw, d_lnb, dxs = _grouped_backward(
        ttt_scan.ttt_mlp_mini_batch, ttt_scan.MLPState, ckpts, ln_w, ln_b, xs_grouped, g_grouped, d_final
    )

    ug = lambda y, proto: _ungroup_axes(y, NC)[:, :, :NC].astype(proto.dtype)
    dXQ, dXK, dXV, deta = (ug(d, p) for d, p in zip(dxs, (XQ, XK, XV, eta)))
    dW1, db1, dW2, db2 = (d.astype(jnp.float32) for d in d_state0)
    return dXQ, dXK, dXV, deta, d_lnw, d_lnb, dW1, db1, dW2, db2


ttt_mlp_fused.defvjp(_mlp_fwd, _mlp_bwd)


# ----------------------------------------------- fused-preproc variants
# The kernel applies L2-norm + rope + LN-reconstruction-target internally
# (ttt_forward._fused_preproc); inputs are the RAW q/k/v projections plus
# interleaved rope tables [NC, CS, F]. Only the fully-fused Pallas backward
# supports this mode (the XLA-recompute fallback consumes post-preproc
# tensors). Table cotangents are zero (rope tables are positional constants).


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def ttt_linear_fused_pre(K: int, interpret: bool, eta_scale, token_major: bool,
                         XQ, XK, XV, eta, rope_cos, rope_sin, ln_w, ln_b, W1, b1):
    out, _, _ = _linear_fwd_padded_pre(K, interpret, eta_scale, token_major, XQ, XK, XV, eta,
                                       rope_cos, rope_sin, ln_w, ln_b, W1, b1)
    return out


def _linear_fwd_padded_pre(K, interpret, eta_scale, token_major, XQ, XK, XV, eta, cos, sin, ln_w, ln_b, W1, b1):
    return ttt_forward.ttt_linear_forward(XQ, XK, XV, eta, ln_w, ln_b, W1, b1, K,
                                          interpret=interpret, rope_cos=cos, rope_sin=sin,
                                          eta_scale=eta_scale, token_major=token_major)


def _linear_fwd_pre(K, interpret, eta_scale, token_major, XQ, XK, XV, eta, cos, sin, ln_w, ln_b, W1, b1):
    out, w_ck, b_ck = _linear_fwd_padded_pre(K, interpret, eta_scale, token_major, XQ, XK, XV, eta, cos, sin, ln_w, ln_b, W1, b1)
    w_ck, b_ck = _name_res(w_ck, b_ck)
    return out, (XQ, XK, XV, eta, cos, sin, ln_w, ln_b, w_ck, b_ck)


def _linear_bwd_pre(K, interpret, eta_scale, token_major, res, g):
    from ttt_video_dit_tpu.ops.pallas import ttt_backward

    XQ, XK, XV, eta, cos, sin, ln_w, ln_b, w_ck, b_ck = res

    dXQ, dXK, dXV, de, dW1, db1, dlnw, dlnb = ttt_backward.ttt_linear_backward(
        XQ, XK, XV, eta, ln_w, ln_b, w_ck, b_ck, g.astype(XQ.dtype), K, interpret=interpret,
        rope_cos=cos, rope_sin=sin, eta_scale=eta_scale, token_major=token_major,
    )
    sl = lambda x, proto: x.astype(proto.dtype)
    return (
        sl(dXQ, XQ), sl(dXK, XK), sl(dXV, XV), sl(de, eta),
        jnp.zeros_like(cos), jnp.zeros_like(sin),
        jnp.sum(dlnw, axis=(0, 2)).astype(ln_w.dtype),
        jnp.sum(dlnb, axis=(0, 2)).astype(ln_b.dtype),
        dW1, db1[:, :, 0:1, :],
    )


ttt_linear_fused_pre.defvjp(_linear_fwd_pre, _linear_bwd_pre)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def ttt_mlp_fused_pre(K: int, interpret: bool, eta_scale, token_major: bool,
                      XQ, XK, XV, eta, rope_cos, rope_sin, ln_w, ln_b, W1, b1, W2, b2):
    out, *_ = _mlp_fwd_padded_pre(K, interpret, eta_scale, token_major, XQ, XK, XV, eta,
                                  rope_cos, rope_sin, ln_w, ln_b, W1, b1, W2, b2)
    return out


def _mlp_fwd_padded_pre(K, interpret, eta_scale, token_major, XQ, XK, XV, eta, cos, sin, ln_w, ln_b, W1, b1, W2, b2):
    return ttt_forward.ttt_mlp_forward(XQ, XK, XV, eta, ln_w, ln_b, W1, b1, W2, b2, K,
                                       interpret=interpret, rope_cos=cos, rope_sin=sin,
                                       eta_scale=eta_scale, token_major=token_major)


def _mlp_fwd_pre(K, interpret, eta_scale, token_major, XQ, XK, XV, eta, cos, sin, ln_w, ln_b, W1, b1, W2, b2):
    out, w1_ck, b1_ck, w2_ck, b2_ck = _mlp_fwd_padded_pre(
        K, interpret, eta_scale, token_major, XQ, XK, XV, eta, cos, sin, ln_w, ln_b, W1, b1, W2, b2
    )
    w1_ck, b1_ck, w2_ck, b2_ck = _name_res(w1_ck, b1_ck, w2_ck, b2_ck)
    return out, (XQ, XK, XV, eta, cos, sin, ln_w, ln_b, w1_ck, b1_ck, w2_ck, b2_ck)


def _mlp_bwd_pre(K, interpret, eta_scale, token_major, res, g):
    from ttt_video_dit_tpu.ops.pallas import ttt_backward

    XQ, XK, XV, eta, cos, sin, ln_w, ln_b, w1_ck, b1_ck, w2_ck, b2_ck = res

    outs = ttt_backward.ttt_mlp_backward(
        XQ, XK, XV, eta, ln_w, ln_b, w1_ck, b1_ck, w2_ck, b2_ck,
        g.astype(XQ.dtype), K, interpret=interpret,
        rope_cos=cos, rope_sin=sin, eta_scale=eta_scale, token_major=token_major,
    )
    dXQ, dXK, dXV, de, dW1, db1, dW2, db2, dlnw, dlnb = outs
    sl = lambda x, proto: x.astype(proto.dtype)
    return (
        sl(dXQ, XQ), sl(dXK, XK), sl(dXV, XV), sl(de, eta),
        jnp.zeros_like(cos), jnp.zeros_like(sin),
        jnp.sum(dlnw, axis=(0, 2)).astype(ln_w.dtype),
        jnp.sum(dlnb, axis=(0, 2)).astype(ln_b.dtype),
        dW1, db1[:, :, 0:1, :], dW2, db2[:, :, 0:1, :],
    )


ttt_mlp_fused_pre.defvjp(_mlp_fwd_pre, _mlp_bwd_pre)
