"""save_seq remat-policy tests.

The save_seq checkpoint policy (models/dit/dit.py:_ckpt_policy) keeps the
sequential kernels' residuals across remat boundaries — splash attention's
out+logsumexp (library residual_checkpoint_name, ops/attention.py) and the
TTT scan output + fast-weight state checkpoints (models/ttt/layer.py,
ops/pallas/ttt_vjp.py) — so a rematted layer's backward recomputes only the
dense/elementwise work. These tests pin (1) the checkpoint names actually
appearing in the differentiated jaxprs, and (2) gradient parity of the
policy'd remat against plain remat and no remat (a checkpoint policy must
never change values, only the recompute schedule).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ttt_video_dit_tpu.ops.attention as attn_mod
from tests.test_dit import tiny_config
from tests.test_pallas_kernels import _inputs
from ttt_video_dit_tpu.models.dit.dit import DiffusionTransformer, _ckpt_policy
from ttt_video_dit_tpu.ops.pallas import ttt_vjp


def test_policy_resolution():
    assert _ckpt_policy(tiny_config()) is None
    assert _ckpt_policy(tiny_config(remat_policy="save_seq")) is not None
    with pytest.raises(ValueError):
        _ckpt_policy(tiny_config(remat_policy="bogus"))


def test_ttt_residual_names_in_grad_jaxpr(rng):
    """The fused-kernel vjp stages the state checkpoints under the
    'ttt_residuals' name (interpret-mode Pallas on CPU)."""
    args = _inputs(rng)
    loss = lambda *a: jnp.sum(ttt_vjp.ttt_linear_fused(2, True, True, *a) ** 2)
    jaxpr = str(jax.make_jaxpr(jax.grad(loss, argnums=(0,)))(*args))
    assert "ttt_residuals" in jaxpr


def test_splash_residual_names_in_grad_jaxpr(monkeypatch, rng):
    monkeypatch.setattr(attn_mod, "_INTERPRET", True)
    attn_mod._splash_spec.cache_clear()
    B, S, H, F, block = 1, 256, 2, 128, 256
    q, k, v = (
        jnp.asarray(rng.standard_normal((B, S, H, F)), jnp.float32) for _ in range(3)
    )
    loss = lambda q, k, v: jnp.sum(attn_mod._splash_padded(q, k, v, block) ** 2)
    jaxpr = str(jax.make_jaxpr(jax.grad(loss))(q, k, v))
    assert "splash_residuals" in jaxpr


@pytest.mark.parametrize("policy_on", [True, False])
def test_splash_grads_under_checkpoint(monkeypatch, rng, policy_on):
    """Splash attention inside jax.checkpoint (with and without the save_seq
    policy): values and grads must match the un-rematted call. Regression for
    a tracer leak — the token-major splash custom_vjp must thread the mask
    infos through its residuals, not its closure, or the remat replay escapes
    the checkpoint trace (UnexpectedTracerError seen on the 30 s d1024
    --remat layer TPU bench)."""
    monkeypatch.setattr(attn_mod, "_INTERPRET", True)
    attn_mod._splash_spec.cache_clear()
    B, S, H, F, block = 1, 256, 2, 128, 256
    q, k, v = (
        jnp.asarray(rng.standard_normal((B, S, H, F)), jnp.float32) for _ in range(3)
    )
    policy = jax.checkpoint_policies.save_only_these_names(
        "splash_residuals", "ttt_residuals", "ttt_out"
    ) if policy_on else None

    def loss(q, k, v):
        return jnp.sum(attn_mod._splash_padded(q, k, v, block) ** 2)

    g_plain = jax.grad(loss, (0, 1, 2))(q, k, v)
    g_remat = jax.grad(jax.checkpoint(loss, policy=policy), (0, 1, 2))(q, k, v)
    for a, b in zip(g_plain, g_remat):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)


def test_policy_saves_kernel_residuals_under_checkpoint(rng):
    """jax.checkpoint(policy=save_seq-names) around an interpret-mode fused
    TTT call: gradients are identical to the un-rematted call (the policy
    only reschedules recompute, never changes math)."""
    args = _inputs(rng, mlp=True)
    policy = jax.checkpoint_policies.save_only_these_names(
        "splash_residuals", "ttt_residuals", "ttt_out"
    )

    def f(*a):
        out = ttt_vjp.ttt_mlp_fused(3, True, True, *a)
        out = jax.ad_checkpoint.checkpoint_name(out, "ttt_out")
        return jnp.sum(out ** 2)

    argnums = tuple(range(len(args)))
    g_plain = jax.grad(f, argnums)(*args)
    g_remat = jax.grad(jax.checkpoint(f, policy=policy), argnums)(*args)
    for i, (a, b) in enumerate(zip(g_plain, g_remat)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6, err_msg=f"grad argnum {i}"
        )


def _dit_loss_grads(cfg, rng):
    model = DiffusionTransformer(cfg)
    vid = jnp.asarray(rng.standard_normal((1, 13, cfg.in_channels, 8, 8)), jnp.float32)
    text = jnp.asarray(rng.standard_normal((1, 1, 8, cfg.text_dim)), jnp.float32)
    t = jnp.asarray([500.0], jnp.float32)
    params = model.init(jax.random.PRNGKey(0), vid, text, t)

    def loss(p):
        out = model.apply(p, vid, text, t)
        w = jnp.cos(jnp.arange(out.size, dtype=jnp.float32)).reshape(out.shape)
        return jnp.sum(out * w)

    return jax.grad(loss)(params)


@pytest.mark.parametrize("scan_layers", [False, True])
def test_dit_grads_invariant_to_remat_policy(rng, scan_layers):
    """Full tiny-DiT gradients: layer remat + save_seq policy == plain layer
    remat == no remat (both unrolled and scan-over-layers remat paths)."""
    rngs = np.random.default_rng(7)
    base = dict(scan_layers=scan_layers)
    g_none = _dit_loss_grads(
        tiny_config(remat_transformer_layers=False, **base), np.random.default_rng(7)
    )
    g_remat = _dit_loss_grads(
        tiny_config(remat_transformer_layers=True, **base), np.random.default_rng(7)
    )
    g_policy = _dit_loss_grads(
        tiny_config(remat_transformer_layers=True, remat_policy="save_seq", **base),
        np.random.default_rng(7),
    )
    flat_n = jax.tree.leaves(g_none)
    flat_r = jax.tree.leaves(g_remat)
    flat_p = jax.tree.leaves(g_policy)
    # The scanned remat (prevent_cse=False) may reassociate float ops between
    # the saved and recomputed schedules — ~1e-6-level noise, not a math
    # change; the unrolled path matches tightly.
    rtol, atol = (1e-4, 1e-5) if scan_layers else (1e-6, 1e-6)
    for a, b, c in zip(flat_n, flat_r, flat_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=rtol, atol=atol)
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=rtol, atol=atol)
