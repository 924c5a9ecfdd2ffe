"""Folded-window splash attention parity (CPU, pallas interpret mode).

The curriculum's windowed stages route ALL attention windows through one
splash call by folding the window dimension into the kernel's head grid
(ops/attention.py:_splash, replacing the reference's per-window Python loop,
reference: ttt/models/cogvideo/dit.py:163-211, and our old vmap-over-windows
dispatch). These tests run the real splash kernels in interpret mode at tiny
shapes and check values AND gradients against naive per-window softmax
attention — including the padded/masked edge and both backward flavors
(fused and separate-dq).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ttt_video_dit_tpu.ops.attention as attn_mod


def _naive(q, k, v):
    """Per-window softmax attention oracle: [BC, S, H, F] (f32)."""
    scale = 1.0 / (q.shape[-1] ** 0.5)
    logits = jnp.einsum("bshf,bthf->bhst", q * scale, k)
    return jnp.einsum("bhst,bthf->bshf", jax.nn.softmax(logits, axis=-1), v)


def _run(fn, q, k, v):
    out, vjp = jax.vjp(fn, q, k, v)
    ct = jnp.cos(jnp.arange(out.size, dtype=jnp.float32)).reshape(out.shape)
    return (out, *vjp(ct))


@pytest.mark.parametrize("windows,valid", [(3, 512), (3, 417), (1, 417)])
@pytest.mark.parametrize("force_separate_dq", [False, True])
def test_folded_windows_match_naive(monkeypatch, rng, windows, valid, force_separate_dq):
    monkeypatch.setattr(attn_mod, "_INTERPRET", True)
    attn_mod._splash_spec.cache_clear()
    if force_separate_dq:
        monkeypatch.setattr(attn_mod, "_fused_bwd_ok", lambda *a: False)

    B, H, F, block = 1, 2, 128, 256
    S = valid
    shape = (B * windows, S, H, F)
    q = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    k = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    v = jnp.asarray(rng.standard_normal(shape), jnp.float32)

    folded = functools.partial(attn_mod._splash_padded, block=block, windows=windows)
    got = _run(folded, q, k, v)
    want = _run(_naive, q, k, v)

    for g, w, name in zip(got, want, ("out", "dq", "dk", "dv")):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=2e-5, atol=2e-5, err_msg=name
        )


def test_attention_dispatch_accepts_windows(rng):
    """The public attention() entry accepts the windows hint on every path
    (non-splash backends batch over windows natively)."""
    q = jnp.asarray(rng.standard_normal((6, 64, 2, 16)), jnp.float32)
    out = attn_mod.attention(q, q, q, windows=3)
    assert out.shape == q.shape
