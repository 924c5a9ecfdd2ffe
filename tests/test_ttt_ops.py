"""Unit tests for the pure-JAX TTT inner-loop scans (the correctness oracle).

Strategy (SURVEY.md §4): (1) verify our rank-1 eta formulation against a naive
transliteration of the reference's full-eta-matrix math
(reference: ttt/models/ssm/ops/ttt_linear.py:8-54, ops/ttt_mlp.py:9-67);
(2) verify the fused LN/GELU derivative helpers against jax autodiff;
(3) verify checkpoint-grouped scan == ungrouped scan (values and grads).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ttt_video_dit_tpu.ops.ln import gelu_bwd, gelu_tanh, ln_fused_l2_bwd, ln_fwd
from ttt_video_dit_tpu.ops import ttt_scan

B, H, NC, CS, F = 2, 3, 8, 16, 32


def _inputs(rng, mlp=False):
    shp = (B, H, NC, CS, F)
    XQ = jnp.asarray(rng.standard_normal(shp), jnp.float32)
    XK = jnp.asarray(rng.standard_normal(shp), jnp.float32)
    XV = jnp.asarray(rng.standard_normal(shp), jnp.float32)
    eta = jnp.asarray(rng.uniform(0.001, 0.01, (B, H, NC, CS)), jnp.float32)
    ln_w = jnp.asarray(rng.standard_normal((H, F)), jnp.float32)
    ln_b = jnp.asarray(rng.standard_normal((H, F)), jnp.float32)
    W1 = jnp.asarray(0.02 * rng.standard_normal((B, H, F, 4 * F if mlp else F)), jnp.float32)
    b1 = jnp.zeros((B, H, 1, 4 * F if mlp else F), jnp.float32)
    out = [XQ, XK, XV, eta, ln_w, ln_b, W1, b1]
    if mlp:
        out += [
            jnp.asarray(0.02 * rng.standard_normal((B, H, 4 * F, F)), jnp.float32),
            jnp.zeros((B, H, 1, F), jnp.float32),
        ]
    return out


def _naive_linear_step(W1, b1, XQ, XK, XV, eta_mat, ln_w, ln_b):
    """Direct transliteration of the reference's full-eta-matrix mini-batch
    (reference: ops/ttt_linear.py:8-54). eta_mat: [B,H,CS,CS]."""
    Z1 = XK @ W1 + b1
    target = XV - XK
    grad = ln_fused_l2_bwd(Z1, target, ln_w, ln_b)
    attn = XQ @ jnp.swapaxes(XK, -1, -2)
    b1_bar = b1 - eta_mat @ grad
    Z1_bar = XQ @ W1 - (eta_mat * attn) @ grad + b1_bar
    last_eta = eta_mat[:, :, -1, :, None]
    W1_new = W1 - jnp.swapaxes(last_eta * XK, -1, -2) @ grad
    b1_new = b1 - jnp.sum(last_eta * grad, axis=-2, keepdims=True)
    out = XQ + ln_fwd(Z1_bar, ln_w, ln_b)
    return W1_new, b1_new, out


def test_ln_fused_l2_bwd_matches_autodiff(rng):
    x = jnp.asarray(rng.standard_normal((4, 8)), jnp.float64)
    t = jnp.asarray(rng.standard_normal((4, 8)), jnp.float64)
    g = jnp.asarray(rng.standard_normal((8,)), jnp.float64)
    b = jnp.asarray(rng.standard_normal((8,)), jnp.float64)

    loss = lambda x: 0.5 * jnp.sum((ln_fwd(x, g, b) - t) ** 2)
    auto = jax.grad(loss)(x)
    fused = ln_fused_l2_bwd(x, t, g, b)
    np.testing.assert_allclose(np.asarray(auto), np.asarray(fused), rtol=1e-9, atol=1e-10)


def test_gelu_bwd_matches_autodiff(rng):
    x = jnp.asarray(rng.standard_normal((64,)), jnp.float64)
    auto = jax.vmap(jax.grad(lambda v: gelu_tanh(v)))(x)
    np.testing.assert_allclose(np.asarray(auto), np.asarray(gelu_bwd(x)), rtol=1e-6, atol=1e-8)


def test_ttt_linear_matches_naive_full_eta(rng):
    XQ, XK, XV, eta, ln_w, ln_b, W1, b1 = _inputs(rng)
    out = ttt_scan.ttt_linear(XQ, XK, XV, eta, ln_w, ln_b, W1, b1, checkpoint_group_size=4)

    # Naive loop with the O(CS^2) eta matrix (all rows identical).
    lw, lb = ln_w[:, None, :], ln_b[:, None, :]
    W, bb = W1, b1
    outs = []
    for n in range(NC):
        eta_mat = jnp.broadcast_to(eta[:, :, n, None, :], (B, H, CS, CS))
        W, bb, o = _naive_linear_step(W, bb, XQ[:, :, n], XK[:, :, n], XV[:, :, n], eta_mat, lw, lb)
        outs.append(o)
    naive = jnp.stack(outs, axis=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(naive), rtol=2e-4, atol=2e-4)


def test_ttt_mlp_matches_naive_full_eta(rng):
    XQ, XK, XV, eta, ln_w, ln_b, W1, b1, W2, b2 = _inputs(rng, mlp=True)
    out = ttt_scan.ttt_mlp(XQ, XK, XV, eta, ln_w, ln_b, W1, b1, W2, b2, checkpoint_group_size=4)

    lw, lb = ln_w[:, None, :], ln_b[:, None, :]
    Wa, ba, Wb, bbias = W1, b1, W2, b2
    outs = []
    for n in range(NC):
        eta_mat = jnp.broadcast_to(eta[:, :, n, None, :], (B, H, CS, CS))
        xq, xk, xv = XQ[:, :, n], XK[:, :, n], XV[:, :, n]
        Z1 = xk @ Wa + ba
        X2 = gelu_tanh(Z1)
        Z2 = X2 @ Wb + bbias
        target = xv - xk
        gZ2 = ln_fused_l2_bwd(Z2, target, lw, lb)
        gZ1 = gZ2 @ jnp.swapaxes(Wb, -1, -2) * gelu_bwd(Z1)
        attn1 = xq @ jnp.swapaxes(xk, -1, -2)
        b1_bar = ba - eta_mat @ gZ1
        Z1_bar = xq @ Wa - (eta_mat * attn1) @ gZ1 + b1_bar
        X2_bar = gelu_tanh(Z1_bar)
        attn2 = X2_bar @ jnp.swapaxes(X2, -1, -2)
        b2_bar = bbias - eta_mat @ gZ2
        Z2_bar = X2_bar @ Wb - (eta_mat * attn2) @ gZ2 + b2_bar
        last_eta = eta_mat[:, :, -1, :, None]
        Wa = Wa - jnp.swapaxes(last_eta * xk, -1, -2) @ gZ1
        ba = ba - jnp.sum(last_eta * gZ1, axis=-2, keepdims=True)
        Wb = Wb - jnp.swapaxes(last_eta * X2, -1, -2) @ gZ2
        bbias = bbias - jnp.sum(last_eta * gZ2, axis=-2, keepdims=True)
        outs.append(xq + ln_fwd(Z2_bar, lw, lb))
    naive = jnp.stack(outs, axis=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(naive), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("op", ["linear", "mlp"])
def test_checkpoint_grouping_invariance(rng, op):
    """Grouped-remat scan must equal ungrouped scan in values AND gradients."""
    if op == "linear":
        args = _inputs(rng)
        fn = lambda group, *a: ttt_scan.ttt_linear(*a, checkpoint_group_size=group)
    else:
        args = _inputs(rng, mlp=True)
        fn = lambda group, *a: ttt_scan.ttt_mlp(*a, checkpoint_group_size=group)

    out1 = fn(1, *args)
    out4 = fn(4, *args)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out4), rtol=1e-6, atol=1e-6)

    loss = lambda group: lambda *a: jnp.sum(fn(group, *a) ** 2)
    # Differentiate w.r.t. XQ, ln_w, W1 (positions 0, 4, 6).
    g1 = jax.grad(loss(1), argnums=(0, 4, 6))(*args)
    g4 = jax.grad(loss(4), argnums=(0, 4, 6))(*args)
    for a, b in zip(g1, g4):
        # fp32 accumulation-order noise across regrouped scans
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3)


def test_effective_group_size():
    assert ttt_scan._effective_group_size(16, 16) == 16
    assert ttt_scan._effective_group_size(16, 5) == 4
    assert ttt_scan._effective_group_size(7, 3) == 1
    assert ttt_scan._effective_group_size(12, 100) == 12
    assert ttt_scan._effective_group_size(12, 0) == 1
