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


def test_fused_bwd_budget_decision_matrix():
    """Pin the fused-vs-separate-dq backward decisions (padded-byte partials
    vs a params-aware HBM budget). The round-3 tuned fused profile uses
    block_kv_dkv=6144 when it divides S, shrinking the dQ-partials stack 3x
    vs the old 2048 square profile:
    - d3072x2L flagship remat=none: fused (679 MB padded)
    - d3072x4L unrolled remat=block: fused
    - d3072x4L scan-layers (conservative 1024 blocks): separate-dq (3.8 GB
      padded OOMed v5e next to the 13 GB training state — the conservative
      profile keeps the square 1024 blocks, so this is unchanged)
    - 63 s d256 folded windows (84 pseudo-heads): fused (1.19 GB padded; was
      3.56 GB at kv_dkv 2048, already the 1.30x round-3 step-time win)
    - 63 s d512 (168 pseudo-heads): fused now too (2.38 GB padded, was
      7.1 GB — moot on one v5e where d512x63s exceeds HBM anyway, but the
      multi-chip head-sharded kernel benefits)
    """
    from ttt_video_dit_tpu.config.model_config import ModelConfig, VIDEO_DURATION_CONFIGS

    S, F = 18432, 64
    p3072 = lambda L: ModelConfig(model_dim=3072, num_heads=48, num_layers=L,
                                  text_dim=4096, **VIDEO_DURATION_CONFIGS["3sec"]).approx_param_count()
    # Sanity: the estimate is in the right ballpark (~170M/layer at d3072:
    # 16 D^2 matmuls + adaLN; the 4L OOM dump's 7.89 GB fp32+Adam arguments
    # imply ~650M real params, estimate gives 712M).
    assert 3.0e8 < p3072(2) < 5.0e8, p3072(2)

    ok = attn_mod._fused_bwd_ok
    eff = attn_mod._eff_kv_dkv
    assert eff(1, S, False) == 6144 and eff(1, S, True) == 1024
    assert ok(1, S, 48, F, eff(1, S, False), p3072(2))          # flagship 2L
    assert ok(1, S, 48, F, eff(1, S, False), p3072(4))          # 4L unrolled
    assert not ok(1, S, 48, F, eff(1, S, True), p3072(4))       # 4L scan-layers
    p256 = ModelConfig(model_dim=256, num_heads=4, num_layers=2, text_dim=4096,
                       **VIDEO_DURATION_CONFIGS["63sec"]).approx_param_count()
    assert ok(1, S, 21 * 4, F, eff(1, S, False), p256)          # 63 s d256 folded
    p512 = ModelConfig(model_dim=512, num_heads=8, num_layers=2, text_dim=4096,
                       **VIDEO_DURATION_CONFIGS["63sec"]).approx_param_count()
    assert ok(1, S, 21 * 8, F, eff(1, S, False), p512)          # 63 s d512 folded
