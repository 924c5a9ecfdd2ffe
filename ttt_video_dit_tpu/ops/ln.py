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


def gelu_tanh(x):
    """GELU with tanh approximation (matches torch F.gelu(approximate='tanh'))."""
    return 0.5 * x * (1.0 + jnp.tanh(0.79788456 * x * (1.0 + 0.044715 * x * x)))


def gelu_bwd(x):
    """Closed-form derivative of tanh-approximated GELU."""
    tanh_out = jnp.tanh(0.79788456 * x * (1.0 + 0.044715 * x * x))
    return 0.5 * x * ((1.0 - tanh_out * tanh_out) * (0.79788456 + 0.1070322243 * x * x)) + 0.5 * (1.0 + tanh_out)
