"""Pure-JAX TTT inner-loop scans (the numerical reference / correctness oracle).

Re-derivation of the reference's dual-form TTT mini-batch updates
(reference: ttt/models/ssm/ops/ttt_linear.py:8-54, ops/ttt_mlp.py:9-67) as a
``jax.lax.scan`` over mini-batches with ``jax.checkpoint``-grouped remat —
exactly the structure the reference's hand-rolled ``scan()``
(reference: ttt/models/ssm/utils.py:111-146, "Mimic jax.lax.scan") emulates in
PyTorch. These functions are also the oracle the Pallas kernels are tested
against.

Eta parameterization
--------------------
The reference materializes a full per-mini-batch eta matrix
``eta[i, j] = lr_j / CS`` (all rows identical — non-causal chunks never use
token-eta; reference: ttt/models/ssm/ttt_layer.py:285-288) of shape
``[B, H, NC, CS, CS]``. Since that matrix is rank-1 in the row index, every use
reduces to scaling the inner-loop gradient per *token*:

    eta @ G            == broadcast_rows( sum_j eta_j * G_j )
    (eta * Attn) @ G   == Attn @ (eta ⊙ G)
    (last_eta * X)^T G == X^T (eta ⊙ G)

so we take ``eta`` as the per-token vector ``[B, H, NC, CS]`` (value
``lr_j / CS``) and never build the O(CS^2) matrix. ``tests/test_ttt_ops.py``
verifies equivalence against a naive full-matrix implementation.

Shapes
------
XQ/XK/XV: [B, H, NC, CS, F]   (NC mini-batches of CS tokens, head dim F)
eta:      [B, H, NC, CS]
W1: [B, H, F, F] (linear) or [B, H, F, 4F] (mlp);  b1: [B, H, 1, F] / [B, H, 1, 4F]
W2: [B, H, 4F, F];  b2: [B, H, 1, F]              (mlp only)
ttt_norm_weight/bias: [H, F]

States are carried in float32 regardless of input dtype; matmuls accumulate in
float32 (MXU-friendly); outputs are cast back to the input dtype.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ttt_video_dit_tpu.ops.ln import gelu_bwd, gelu_tanh, ln_fused_l2_bwd, ln_fwd

_EINSUM = functools.partial(jnp.einsum, preferred_element_type=jnp.float32)


class LinearState(NamedTuple):
    W1: jax.Array  # [B, H, F, F] float32
    b1: jax.Array  # [B, H, 1, F] float32


class MLPState(NamedTuple):
    W1: jax.Array  # [B, H, F, 4F] float32
    b1: jax.Array  # [B, H, 1, 4F] float32
    W2: jax.Array  # [B, H, 4F, F] float32
    b2: jax.Array  # [B, H, 1, F] float32


def _effective_group_size(num_mini_batch: int, requested: int) -> int:
    """Largest divisor of num_mini_batch that is <= max(requested, 1)."""
    g = min(max(requested, 1), num_mini_batch)
    while num_mini_batch % g != 0:
        g -= 1
    return g


def ttt_linear_mini_batch(state: LinearState, xs, ln_weight, ln_bias):
    """One dual-form TTT-linear mini-batch step.

    ln_weight/ln_bias: [H, 1, F] broadcastable over [B, H, CS, F].
    Returns (new_state, XQW) with XQW in float32.
    """
    XQ, XK, XV, eta = xs  # [B,H,CS,F] x3, [B,H,CS]
    W1, b1 = state

    Z1 = _EINSUM("bhkf,bhfg->bhkg", XK, W1) + b1
    target = (XV - XK).astype(jnp.float32)
    grad_z1 = ln_fused_l2_bwd(Z1, target, ln_weight, ln_bias)

    # Token-scaled gradient: G[j] = (lr_j / CS) * grad_z1[j]
    G = eta.astype(jnp.float32)[..., None] * grad_z1

    attn = _EINSUM("bhkf,bhlf->bhkl", XQ, XK)  # [B,H,CS,CS] token-mixing term
    b1_new = b1 - jnp.sum(G, axis=-2, keepdims=True)
    Z1_bar = _EINSUM("bhkf,bhfg->bhkg", XQ, W1) - _EINSUM("bhkl,bhlg->bhkg", attn, G) + b1_new
    W1_new = W1 - _EINSUM("bhlf,bhlg->bhfg", XK, G)

    XQW = XQ.astype(jnp.float32) + ln_fwd(Z1_bar, ln_weight, ln_bias)
    return LinearState(W1_new, b1_new), XQW


def ttt_mlp_mini_batch(state: MLPState, xs, ln_weight, ln_bias):
    """One dual-form TTT-MLP mini-batch step (2-layer GELU fast-weight net)."""
    XQ, XK, XV, eta = xs
    W1, b1, W2, b2 = state

    Z1 = _EINSUM("bhkf,bhfg->bhkg", XK, W1) + b1
    X2 = gelu_tanh(Z1)
    Z2 = _EINSUM("bhkg,bhgf->bhkf", X2, W2) + b2
    target = (XV - XK).astype(jnp.float32)

    grad_z2 = ln_fused_l2_bwd(Z2, target, ln_weight, ln_bias)
    grad_z1 = _EINSUM("bhkf,bhgf->bhkg", grad_z2, W2) * gelu_bwd(Z1)

    eta_f = eta.astype(jnp.float32)[..., None]
    G1 = eta_f * grad_z1  # [B,H,CS,4F]
    G2 = eta_f * grad_z2  # [B,H,CS,F]

    attn1 = _EINSUM("bhkf,bhlf->bhkl", XQ, XK)
    b1_new = b1 - jnp.sum(G1, axis=-2, keepdims=True)
    Z1_bar = _EINSUM("bhkf,bhfg->bhkg", XQ, W1) - _EINSUM("bhkl,bhlg->bhkg", attn1, G1) + b1_new
    X2_bar = gelu_tanh(Z1_bar)

    attn2 = _EINSUM("bhkg,bhlg->bhkl", X2_bar, X2)
    b2_new = b2 - jnp.sum(G2, axis=-2, keepdims=True)
    Z2_bar = _EINSUM("bhkg,bhgf->bhkf", X2_bar, W2) - _EINSUM("bhkl,bhlf->bhkf", attn2, G2) + b2_new

    W1_new = W1 - _EINSUM("bhlf,bhlg->bhfg", XK, G1)
    W2_new = W2 - _EINSUM("bhlg,bhlf->bhgf", X2, G2)

    XQW = XQ.astype(jnp.float32) + ln_fwd(Z2_bar, ln_weight, ln_bias)
    return MLPState(W1_new, b1_new, W2_new, b2_new), XQW


def _scan_mini_batches(step_fn, init_state, xs, checkpoint_group_size: int):
    """Scan ``step_fn`` over the leading (mini-batch) axis of ``xs`` with
    gradient checkpointing every ``checkpoint_group_size`` steps — the
    jax-native equivalent of the reference's grouped ``torch.utils.checkpoint``
    scan (reference: ttt/models/ssm/utils.py:131-146).
    """
    num_mini_batch = jax.tree_util.tree_leaves(xs)[0].shape[0]
    group = _effective_group_size(num_mini_batch, checkpoint_group_size)
    num_groups = num_mini_batch // group

    def group_fn(state, group_xs):
        return jax.lax.scan(step_fn, state, group_xs)

    grouped = jax.tree.map(lambda x: x.reshape(num_groups, group, *x.shape[1:]), xs)
    final_state, ys = jax.lax.scan(jax.checkpoint(group_fn, prevent_cse=False), init_state, grouped)
    ys = jax.tree.map(lambda y: y.reshape(num_mini_batch, *y.shape[2:]), ys)
    return final_state, ys


def _to_scan_order(x):
    """[B, H, NC, ...] -> [NC, B, H, ...] so NC is the scan axis."""
    return jnp.moveaxis(x, 2, 0)


def ttt_linear(
    XQ,
    XK,
    XV,
    eta,
    ttt_norm_weight,
    ttt_norm_bias,
    W1_init,
    b1_init,
    checkpoint_group_size: int = 16,
):
    """Full TTT-linear scan. Returns XQW of shape [B, H, NC, CS, F] in XQ.dtype."""
    ln_w = ttt_norm_weight.astype(jnp.float32)[:, None, :]
    ln_b = ttt_norm_bias.astype(jnp.float32)[:, None, :]
    step = functools.partial(ttt_linear_mini_batch, ln_weight=ln_w, ln_bias=ln_b)

    init = LinearState(W1_init.astype(jnp.float32), b1_init.astype(jnp.float32))
    xs = tuple(_to_scan_order(x) for x in (XQ, XK, XV, eta))
    _, ys = _scan_mini_batches(step, init, xs, checkpoint_group_size)
    return jnp.moveaxis(ys, 0, 2).astype(XQ.dtype)


def ttt_mlp(
    XQ,
    XK,
    XV,
    eta,
    ttt_norm_weight,
    ttt_norm_bias,
    W1_init,
    b1_init,
    W2_init,
    b2_init,
    checkpoint_group_size: int = 16,
):
    """Full TTT-MLP scan. Returns XQW of shape [B, H, NC, CS, F] in XQ.dtype."""
    ln_w = ttt_norm_weight.astype(jnp.float32)[:, None, :]
    ln_b = ttt_norm_bias.astype(jnp.float32)[:, None, :]
    step = functools.partial(ttt_mlp_mini_batch, ln_weight=ln_w, ln_bias=ln_b)

    init = MLPState(
        W1_init.astype(jnp.float32),
        b1_init.astype(jnp.float32),
        W2_init.astype(jnp.float32),
        b2_init.astype(jnp.float32),
    )
    xs = tuple(_to_scan_order(x) for x in (XQ, XK, XV, eta))
    _, ys = _scan_mini_batches(step, init, xs, checkpoint_group_size)
    return jnp.moveaxis(ys, 0, 2).astype(XQ.dtype)
