"""Fused layer-norm primitives used inside the TTT inner loop.

Behavioral parity with the reference's pure-PyTorch ops
(reference: ttt/models/ssm/ops/utils.py:4-54): layer norm with eps added to the
*biased* variance, the layer-norm-backward fused with an L2 reconstruction
loss, and the closed-form derivative of tanh-approximated GELU.
"""

import jax.numpy as jnp


def ln_fwd(x, gamma, beta, eps: float = 1e-8):
    """LayerNorm over the last dim: gamma * (x - mu) / sqrt(var + eps) + beta."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    x_hat = (x - mu) / jnp.sqrt(var + eps)
    return gamma * x_hat + beta


def ln_fused_l2_bwd(x, l2_target, gamma, beta, eps: float = 1e-8):
    """d/dx [ 0.5 * || LN_{gamma,beta}(x) - l2_target ||^2 ], fused.

    This is the inner-loop gradient of the TTT reconstruction objective
    (reference: ttt/models/ssm/ops/utils.py:21-48).
    """
    D = x.shape[-1]
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    std = jnp.sqrt(var + eps)
    x_hat = (x - mu) / std

    y = gamma * x_hat + beta
    grad_output = y - l2_target
    grad_x_hat = grad_output * gamma
    return (
        (1.0 / D)
        * (
            D * grad_x_hat
            - jnp.sum(grad_x_hat, axis=-1, keepdims=True)
            - x_hat * jnp.sum(grad_x_hat * x_hat, axis=-1, keepdims=True)
        )
        / std
    )


def ln_fwd_vjp(x, gamma, beta, u, eps: float = 1e-8):
    """VJP of ln_fwd w.r.t. (x, gamma, beta) given output cotangent u.

    Returns (dx, dgamma, dbeta) with dgamma/dbeta reduced over the row axis
    (-2) only; callers accumulate over remaining axes. Written with ops that
    lower cleanly inside Pallas kernels (no autodiff)."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    std = jnp.sqrt(var + eps)
    x_hat = (x - mu) / std

    dgamma = jnp.sum(u * x_hat, axis=-2, keepdims=True)
    dbeta = jnp.sum(u, axis=-2, keepdims=True)
    w = gamma * u
    dx = (w - jnp.mean(w, axis=-1, keepdims=True) - x_hat * jnp.mean(w * x_hat, axis=-1, keepdims=True)) / std
    return dx, dgamma, dbeta


def ln_fused_l2_bwd_vjp(x, l2_target, gamma, beta, u, eps: float = 1e-8):
    """VJP of ln_fused_l2_bwd (the inner-loop gradient) w.r.t.
    (x, l2_target, gamma, beta) given cotangent u — the second-order LN term
    the reference's Triton/TK backward kernels hand-derive
    (reference: kernels/linear_backward.py:208-520).

    Returns (dx, dtarget, dgamma, dbeta); dgamma/dbeta reduced over rows (-2).
    """
    D = x.shape[-1]
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    std = jnp.sqrt(var + eps)
    x_hat = (x - mu) / std

    y = gamma * x_hat + beta
    gx = gamma * (y - l2_target)  # grad_x_hat of the forward
    m2 = jnp.mean(gx * x_hat, axis=-1, keepdims=True)
    z = (gx - jnp.mean(gx, axis=-1, keepdims=True) - x_hat * m2) / std

    mean_u = jnp.mean(u, axis=-1, keepdims=True)
    mean_ux = jnp.mean(u * x_hat, axis=-1, keepdims=True)
    # Cotangent into gx (the row-centering map is self-adjoint).
    dgx = (u - mean_u - x_hat * mean_ux) / std
    # Cotangent into x_hat: direct (-x_hat * m2 term) + through gx.
    dx_hat = -(m2 * u + gx * mean_ux) / std + gamma * gamma * dgx
    # Cotangent into std from z = N / std.
    dstd = -jnp.sum(u * z, axis=-1, keepdims=True) / std

    dx = (
        dx_hat
        - jnp.mean(dx_hat, axis=-1, keepdims=True)
        - x_hat * jnp.mean(dx_hat * x_hat, axis=-1, keepdims=True)
    ) / std + dstd * x_hat / D
    dtarget = -gamma * dgx
    dgamma = jnp.sum(dgx * (y - l2_target) + dgx * gamma * x_hat, axis=-2, keepdims=True)
    dbeta = jnp.sum(dgx * gamma, axis=-2, keepdims=True)
    return dx, dtarget, dgamma, dbeta


def gelu_tanh(x):
    """GELU with tanh approximation (matches torch F.gelu(approximate='tanh'))."""
    return 0.5 * x * (1.0 + jnp.tanh(0.79788456 * x * (1.0 + 0.044715 * x * x)))


def gelu_bwd(x):
    """Closed-form derivative of tanh-approximated GELU."""
    tanh_out = jnp.tanh(0.79788456 * x * (1.0 + 0.044715 * x * x))
    return 0.5 * x * ((1.0 - tanh_out * tanh_out) * (0.79788456 + 0.1070322243 * x * x)) + 0.5 * (1.0 + tanh_out)
