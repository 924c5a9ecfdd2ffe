"""Pallas TTT kernel parity tests (interpreter mode on CPU).

Values AND gradients must match the lax.scan oracle (ops/ttt_scan.py) — the
same oracle-parity strategy the reference uses between its kernels and the
pure-PyTorch ops (reference: ttt_layer.py use_kernel flag; SURVEY.md §4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ttt_video_dit_tpu.ops import ttt_scan
from ttt_video_dit_tpu.ops.pallas import ttt_vjp

B, H, NC, CS, F = 2, 2, 6, 16, 32


def _inputs(rng, mlp=False):
    shp = (B, H, NC, CS, F)
    out = [
        jnp.asarray(rng.standard_normal(shp), jnp.float32),
        jnp.asarray(rng.standard_normal(shp), jnp.float32),
        jnp.asarray(rng.standard_normal(shp), jnp.float32),
        jnp.asarray(rng.uniform(0.001, 0.01, (B, H, NC, CS)), jnp.float32),
        jnp.asarray(rng.standard_normal((H, F)), jnp.float32),
        jnp.asarray(rng.standard_normal((H, F)), jnp.float32),
        jnp.asarray(0.02 * rng.standard_normal((B, H, F, 4 * F if mlp else F)), jnp.float32),
        jnp.zeros((B, H, 1, 4 * F if mlp else F), jnp.float32),
    ]
    if mlp:
        out += [
            jnp.asarray(0.02 * rng.standard_normal((B, H, 4 * F, F)), jnp.float32),
            jnp.zeros((B, H, 1, F), jnp.float32),
        ]
    return out


@pytest.mark.parametrize("K", [2, 3, 6])
def test_linear_kernel_matches_oracle(rng, K):
    args = _inputs(rng)
    out_kernel = ttt_vjp.ttt_linear_fused(K, True, True, *args)
    out_oracle = ttt_scan.ttt_linear(*args, checkpoint_group_size=K)
    np.testing.assert_allclose(np.asarray(out_kernel), np.asarray(out_oracle), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("K", [2, 6])
def test_mlp_kernel_matches_oracle(rng, K):
    args = _inputs(rng, mlp=True)
    out_kernel = ttt_vjp.ttt_mlp_fused(K, True, True, *args)
    out_oracle = ttt_scan.ttt_mlp(*args, checkpoint_group_size=K)
    np.testing.assert_allclose(np.asarray(out_kernel), np.asarray(out_oracle), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("fused", [True, False])
def test_linear_kernel_grads_match_oracle(rng, fused):
    args = _inputs(rng)
    argnums = tuple(range(len(args)))

    loss_k = lambda *a: jnp.sum(ttt_vjp.ttt_linear_fused(2, True, fused, *a) ** 2)
    loss_o = lambda *a: jnp.sum(ttt_scan.ttt_linear(*a, checkpoint_group_size=2) ** 2)

    gk = jax.grad(loss_k, argnums)(*args)
    go = jax.grad(loss_o, argnums)(*args)
    for i, (a, b) in enumerate(zip(gk, go)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3, err_msg=f"grad argnum {i}")


@pytest.mark.parametrize("fused", [True, False])
def test_mlp_kernel_grads_match_oracle(rng, fused):
    args = _inputs(rng, mlp=True)
    argnums = tuple(range(len(args)))

    loss_k = lambda *a: jnp.sum(ttt_vjp.ttt_mlp_fused(3, True, fused, *a) ** 2)
    loss_o = lambda *a: jnp.sum(ttt_scan.ttt_mlp(*a, checkpoint_group_size=3) ** 2)

    gk = jax.grad(loss_k, argnums)(*args)
    go = jax.grad(loss_o, argnums)(*args)
    for i, (a, b) in enumerate(zip(gk, go)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3, err_msg=f"grad argnum {i}")


def test_kernel_nc_not_divisible_by_group(rng):
    """NC=6 with K=4 pads with eta=0 no-op mini-batches; outputs must still
    match the oracle exactly."""
    args = _inputs(rng)
    out_kernel = ttt_vjp.ttt_linear_fused(4, True, True, *args)
    out_oracle = ttt_scan.ttt_linear(*args, checkpoint_group_size=4)
    np.testing.assert_allclose(np.asarray(out_kernel), np.asarray(out_oracle), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("fused", [True, False])
def test_kernel_grads_with_padded_nc(rng, fused):
    """Gradient path through the eta=0 padding (NC % K != 0) — regression for
    a double-padding bug in the grouped backward."""
    args = _inputs(rng)
    gk = jax.grad(lambda *a: jnp.sum(ttt_vjp.ttt_linear_fused(4, True, fused, *a) ** 2), argnums=(0, 4, 6))(*args)
    go = jax.grad(lambda *a: jnp.sum(ttt_scan.ttt_linear(*a, checkpoint_group_size=4) ** 2), argnums=(0, 4, 6))(*args)
    for a, b in zip(gk, go):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3)


def test_mlp_fused_bwd_grads_with_padded_nc(rng):
    """Fused Pallas MLP backward through eta=0 padded mini-batches."""
    args = _inputs(rng, mlp=True)
    argnums = tuple(range(len(args)))
    gk = jax.grad(lambda *a: jnp.sum(ttt_vjp.ttt_mlp_fused(4, True, True, *a) ** 2), argnums=argnums)(*args)
    go = jax.grad(lambda *a: jnp.sum(ttt_scan.ttt_mlp(*a, checkpoint_group_size=4) ** 2), argnums=argnums)(*args)
    for i, (a, b) in enumerate(zip(gk, go)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3, err_msg=f"argnum {i}")
