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


def _inputs(rng, mlp=False, shape=None):
    b, h, nc, cs, f = shape or (B, H, NC, CS, F)
    shp = (b, h, nc, cs, f)
    out = [
        jnp.asarray(rng.standard_normal(shp), jnp.float32),
        jnp.asarray(rng.standard_normal(shp), jnp.float32),
        jnp.asarray(rng.standard_normal(shp), jnp.float32),
        jnp.asarray(rng.uniform(0.001, 0.01, (b, h, nc, cs)), jnp.float32),
        jnp.asarray(rng.standard_normal((h, f)), jnp.float32),
        jnp.asarray(rng.standard_normal((h, f)), jnp.float32),
        jnp.asarray(0.02 * rng.standard_normal((b, h, f, 4 * f if mlp else f)), jnp.float32),
        jnp.zeros((b, h, 1, 4 * f if mlp else f), jnp.float32),
    ]
    if mlp:
        out += [
            jnp.asarray(0.02 * rng.standard_normal((b, h, 4 * f, f)), jnp.float32),
            jnp.zeros((b, h, 1, f), jnp.float32),
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
    """NC=6 with K=4: the kernels handle the ragged last checkpoint group
    in-kernel (no padding); outputs must still match the oracle exactly."""
    args = _inputs(rng)
    out_kernel = ttt_vjp.ttt_linear_fused(4, True, True, *args)
    out_oracle = ttt_scan.ttt_linear(*args, checkpoint_group_size=4)
    np.testing.assert_allclose(np.asarray(out_kernel), np.asarray(out_oracle), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("fused", [True, False])
def test_kernel_grads_with_padded_nc(rng, fused):
    """Gradient path with NC % K != 0 (ragged last group in the fused kernel;
    eta=0 padding in the XLA fallback) — regression for a double-padding bug
    in the grouped backward."""
    args = _inputs(rng)
    gk = jax.grad(lambda *a: jnp.sum(ttt_vjp.ttt_linear_fused(4, True, fused, *a) ** 2), argnums=(0, 4, 6))(*args)
    go = jax.grad(lambda *a: jnp.sum(ttt_scan.ttt_linear(*a, checkpoint_group_size=4) ** 2), argnums=(0, 4, 6))(*args)
    for a, b in zip(gk, go):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3)


def test_mlp_fused_bwd_grads_with_padded_nc(rng):
    """Fused Pallas MLP backward with a ragged last checkpoint group."""
    args = _inputs(rng, mlp=True)
    argnums = tuple(range(len(args)))
    gk = jax.grad(lambda *a: jnp.sum(ttt_vjp.ttt_mlp_fused(4, True, True, *a) ** 2), argnums=argnums)(*args)
    go = jax.grad(lambda *a: jnp.sum(ttt_scan.ttt_mlp(*a, checkpoint_group_size=4) ** 2), argnums=argnums)(*args)
    for i, (a, b) in enumerate(zip(gk, go)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3, err_msg=f"argnum {i}")


# ------------------------------------------------- fused in-kernel preproc


def _tables(rng, L, stl, F, NC, CS):
    from ttt_video_dit_tpu.ops.rope import interleaved_tables_prefixed, precompute_rope_3d

    cos, sin = precompute_rope_3d(F, 4, 4, (L - stl) // 16 + 1)
    cos_il, sin_il = interleaved_tables_prefixed(cos, sin, stl, L)
    return (jnp.asarray(cos_il.reshape(NC, CS, F)), jnp.asarray(sin_il.reshape(NC, CS, F)),
            cos, sin)


def _xla_preproc(XQr, XKr, XVr, lnw, lnb, cos, sin, stl):
    """The layer's XLA-side preprocessing on mini-batched [B,H,NC,CS,F]."""
    from ttt_video_dit_tpu.ops.rope import apply_rope_prefixed

    b, h, nc, cs, f = XQr.shape
    to_l = lambda x: x.reshape(b, h, nc * cs, f)
    to_mb = lambda x: x.reshape(b, h, nc, cs, f)
    l2n = lambda x: x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
    XQp = to_mb(apply_rope_prefixed(to_l(l2n(XQr)), cos, sin, stl, seq_axis=2))
    XKp = to_mb(apply_rope_prefixed(to_l(l2n(XKr)), cos, sin, stl, seq_axis=2))
    x = XVr - XKp
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True) * (f / (f - 1))
    xh = (x - mu) / (jnp.sqrt(var) + 1e-8)
    XVp = lnw[None, :, None, None] * xh + lnb[None, :, None, None] + XKp
    return XQp, XKp, XVp


@pytest.mark.parametrize("K", [3, 4])
def test_fused_preproc_grads_match_composed_autodiff(rng, K):
    """The in-kernel preproc (L2-norm + rope + LN-target) and its hand-derived
    VJPs must match jax autodiff of the XLA preproc composed with the scan
    oracle — for values and every gradient, including the ragged-NC case
    (K=4, NC=6: the backward's last checkpoint group has 2 valid steps)."""
    args = _inputs(rng, mlp=True)
    XQr, XKr, XVr, eta, lnw, lnb, W1, b1, W2, b2 = args
    stl = 24
    rope_cos, rope_sin, cos, sin = _tables(rng, NC * CS, stl, F, NC, CS)

    def ref_loss(a):
        XQp, XKp, XVp = _xla_preproc(a[0], a[1], a[2], a[4], a[5], cos, sin, stl)
        out = ttt_scan.ttt_mlp(XQp, XKp, XVp, a[3], a[4], a[5], a[6], a[7], a[8], a[9], K)
        return jnp.sum(out * out)

    def pre_loss(a):
        out = ttt_vjp.ttt_mlp_fused_pre(K, True, None, False, a[0], a[1], a[2], a[3], rope_cos, rope_sin,
                                        a[4], a[5], a[6], a[7], a[8], a[9])
        return jnp.sum(out * out)

    v_ref, g_ref = jax.value_and_grad(ref_loss)(tuple(args))
    v_pre, g_pre = jax.value_and_grad(pre_loss)(tuple(args))
    np.testing.assert_allclose(float(v_pre), float(v_ref), rtol=1e-5)
    for a, b in zip(g_ref, g_pre):
        scale = max(float(jnp.max(jnp.abs(a))), 1e-6)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=0, atol=3e-5 * scale)


def test_fused_preproc_linear_matches_composed_oracle(rng):
    args = _inputs(rng, mlp=False)
    XQr, XKr, XVr, eta, lnw, lnb, W1, b1 = args
    stl = 16
    rope_cos, rope_sin, cos, sin = _tables(rng, NC * CS, stl, F, NC, CS)

    XQp, XKp, XVp = _xla_preproc(XQr, XKr, XVr, lnw, lnb, cos, sin, stl)
    out_ref = ttt_scan.ttt_linear(XQp, XKp, XVp, eta, lnw, lnb, W1, b1, 3)
    out_pre = ttt_vjp.ttt_linear_fused_pre(3, True, None, False, XQr, XKr, XVr, eta, rope_cos, rope_sin,
                                           lnw, lnb, W1, b1)
    np.testing.assert_allclose(np.asarray(out_pre), np.asarray(out_ref), rtol=2e-5, atol=2e-5)


def test_layer_fused_preproc_matches_scan_path(rng, monkeypatch):
    """Full TTTLayer wiring: fused in-kernel preproc (tables, interleave,
    dispatch) must reproduce the XLA-preproc + scan-oracle path on a
    multiscene geometry, values and gradients."""
    import flax.linen  # noqa: F401  (ensures flax initialized)

    from ttt_video_dit_tpu.config.model_config import ModelConfig
    from ttt_video_dit_tpu.models.sequence import SequenceMetadata
    from ttt_video_dit_tpu.models.ttt.layer import TTTLayer
    from ttt_video_dit_tpu.ops.pallas import ttt_mlp_kernel

    meta = SequenceMetadata(
        text_length=8, num_frames=7, num_chunks=3, tokens_per_frame=16,
        latent_height=8, latent_width=8,
    )
    L = meta.seq_text_length + meta.num_video_tokens  # 3*8 + 7*16 = 136
    cfg_kw = dict(
        model_dim=64, num_heads=4, num_layers=1, ssm_layer="ttt_mlp",
        mini_batch_size=8, latent_height=8, latent_width=8, text_dim=32,
        time_embed_dim=32, scan_checkpoint_group_size=4, dtype="float32",
    )
    cfg_scan = ModelConfig(use_kernel=False, **cfg_kw)
    cfg_pre = ModelConfig(use_kernel=True, fuse_ttt_preproc=True, **cfg_kw)
    assert L % cfg_scan.mini_batch_size == 0

    x = jnp.asarray(rng.standard_normal((2, L, 64)), jnp.float32)
    layer = TTTLayer(cfg_scan)
    params = layer.init(jax.random.PRNGKey(0), x, meta)

    monkeypatch.setattr(ttt_mlp_kernel, "_FORCE_INTERPRET", True)
    layer_pre = TTTLayer(cfg_pre)

    def loss(mdl, p):
        return jnp.sum(mdl.apply(p, x, meta) ** 2)

    v_ref, g_ref = jax.value_and_grad(lambda p: loss(layer, p))(params)
    v_pre, g_pre = jax.value_and_grad(lambda p: loss(layer_pre, p))(params)
    np.testing.assert_allclose(float(v_pre), float(v_ref), rtol=1e-5)
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_flatten_with_path(g_ref)[0],
        jax.tree_util.tree_flatten_with_path(g_pre)[0],
    ):
        assert str(ka) == str(kb)
        scale = max(float(jnp.max(jnp.abs(a))), 1e-6)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=0, atol=5e-5 * scale,
                                   err_msg=str(ka))


# ----------------------------------------------------- fused eta gate (lr)


@pytest.mark.parametrize("K", [3, 4])
def test_fused_eta_gate_grads_match_composed_autodiff(rng, K):
    """eta-gate fusion: the kernel takes the PRE-SIGMOID LR-gate logits plus a
    static eta_scale, applies eta = sigmoid(gate) * eta_scale in-kernel, and
    its backward emits d_gate — must match jax autodiff through the XLA
    sigmoid/scale composed with the scan oracle (values and all grads,
    including the ragged-NC K=4 case). Reference computes this outside its
    kernels (ttt/models/ssm/ttt_layer.py:143-155, 285-288)."""
    args = _inputs(rng, mlp=True)
    XQr, XKr, XVr, _, lnw, lnb, W1, b1, W2, b2 = args
    gate = jnp.asarray(rng.standard_normal((B, H, NC, CS)), jnp.float32)
    scale = 0.1 / F / CS
    stl = 24
    rope_cos, rope_sin, cos, sin = _tables(rng, NC * CS, stl, F, NC, CS)

    def ref_loss(a):
        XQp, XKp, XVp = _xla_preproc(a[0], a[1], a[2], a[4], a[5], cos, sin, stl)
        eta = jax.nn.sigmoid(a[3]) * scale
        out = ttt_scan.ttt_mlp(XQp, XKp, XVp, eta, a[4], a[5], a[6], a[7], a[8], a[9], K)
        return jnp.sum(out * out)

    def gate_loss(a):
        out = ttt_vjp.ttt_mlp_fused_pre(K, True, scale, False, a[0], a[1], a[2], a[3], rope_cos,
                                        rope_sin, a[4], a[5], a[6], a[7], a[8], a[9])
        return jnp.sum(out * out)

    newargs = (XQr, XKr, XVr, gate, lnw, lnb, W1, b1, W2, b2)
    v_ref, g_ref = jax.value_and_grad(ref_loss)(newargs)
    v_pre, g_pre = jax.value_and_grad(gate_loss)(newargs)
    np.testing.assert_allclose(float(v_pre), float(v_ref), rtol=1e-5)
    for i, (a, b) in enumerate(zip(g_ref, g_pre)):
        scale_a = max(float(jnp.max(jnp.abs(a))), 1e-6)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=0, atol=3e-5 * scale_a,
                                   err_msg=f"grad argnum {i}")


def test_fused_eta_gate_linear_matches_composed_oracle(rng):
    args = _inputs(rng, mlp=False)
    XQr, XKr, XVr, _, lnw, lnb, W1, b1 = args
    gate = jnp.asarray(rng.standard_normal((B, H, NC, CS)), jnp.float32)
    scale = 0.1 / F / CS
    stl = 16
    rope_cos, rope_sin, cos, sin = _tables(rng, NC * CS, stl, F, NC, CS)

    XQp, XKp, XVp = _xla_preproc(XQr, XKr, XVr, lnw, lnb, cos, sin, stl)
    eta = jax.nn.sigmoid(gate) * scale
    out_ref = ttt_scan.ttt_linear(XQp, XKp, XVp, eta, lnw, lnb, W1, b1, 3)
    out_gate = ttt_vjp.ttt_linear_fused_pre(3, True, scale, False, XQr, XKr, XVr, gate, rope_cos,
                                            rope_sin, lnw, lnb, W1, b1)
    np.testing.assert_allclose(np.asarray(out_gate), np.asarray(out_ref), rtol=2e-5, atol=2e-5)

    g_gate = jax.grad(lambda g_: jnp.sum(ttt_vjp.ttt_linear_fused_pre(
        3, True, scale, False, XQr, XKr, XVr, g_, rope_cos, rope_sin, lnw, lnb, W1, b1) ** 2))(gate)
    g_ref = jax.grad(lambda g_: jnp.sum(ttt_scan.ttt_linear(
        XQp, XKp, XVp, jax.nn.sigmoid(g_) * scale, lnw, lnb, W1, b1, 3) ** 2))(gate)
    scale_a = max(float(jnp.max(jnp.abs(g_ref))), 1e-6)
    np.testing.assert_allclose(np.asarray(g_gate), np.asarray(g_ref), rtol=0, atol=3e-5 * scale_a)


@pytest.mark.parametrize("K", [3, 4])
def test_token_major_vjp_matches_head_major(rng, K):
    """Token-major kernel IO ([B, NC, CS, H*F] — no moveaxis relayout, no
    T(8,128) lane padding) must match the head-grouped layout for values and
    every x/gate gradient, including the ragged group (K=4, NC=6). Measured
    31% faster forward at the flagship geometry (microbench --which tm)."""
    from ttt_video_dit_tpu.ops.rope import interleaved_tables_prefixed, precompute_rope_3d

    args = _inputs(rng, mlp=True)
    XQ, XK, XV, eta, lnw, lnb, W1, b1, W2, b2 = args
    stl = 16
    cos, sin = precompute_rope_3d(F, 4, 4, (NC * CS - stl) // 16 + 1)
    ci, si = interleaved_tables_prefixed(cos, sin, stl, NC * CS)
    rc, rs = jnp.asarray(ci.reshape(NC, CS, F)), jnp.asarray(si.reshape(NC, CS, F))
    scale = 0.1 / F / CS
    tm = lambda x: jnp.transpose(x, (0, 2, 3, 1, 4)).reshape(B, NC, CS, H * F)

    loss_hm = lambda q, k, v, g_: jnp.sum(ttt_vjp.ttt_mlp_fused_pre(
        K, True, scale, False, q, k, v, g_, rc, rs, lnw, lnb, W1, b1, W2, b2) ** 2)
    loss_tm = lambda q, k, v, g_: jnp.sum(ttt_vjp.ttt_mlp_fused_pre(
        K, True, scale, True, tm(q), tm(k), tm(v), g_, rc, rs, lnw, lnb, W1, b1, W2, b2) ** 2)
    v1, g1 = jax.value_and_grad(loss_hm, (0, 1, 2, 3))(XQ, XK, XV, eta)
    v2, g2 = jax.value_and_grad(loss_tm, (0, 1, 2, 3))(XQ, XK, XV, eta)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)  # reassociation noise
    for a, b, nm in zip(g1, g2, ("dq", "dk", "dv", "dgate")):
        s = max(float(jnp.max(jnp.abs(a))), 1e-6)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=0, atol=3e-5 * s, err_msg=nm)


def test_head_group_picks_are_tiling_legal():
    """Both group pickers must return tiling-legal G. The forward (and the
    chunk-major backward eta layout) put G on the sublane axis of the
    eta/deta blocks, so Mosaic requires G % 8 == 0 or G == num_heads; with
    K % 8 == 0 (default 16) the backward may instead use the HEAD-major eta
    layout (K on the sublane axis) which admits ANY divisor <= 8 — that is
    what gives 12 local heads (48 global under tp=4, the reference's 63 s
    shape) a fused backward via G=6. The backward caps G at the
    compile-proven 8 (G=12 and G=16 exceed the kernel's VMEM on v5e)."""
    from ttt_video_dit_tpu.ops.pallas.ttt_backward import fused_bwd_supported, pick_bwd_head_group
    from ttt_video_dit_tpu.ops.pallas.ttt_forward import pick_head_group

    for h in (1, 2, 4, 6, 8, 12, 16, 24, 40, 48, 96):
        for mlp in (True, False):
            gf = pick_head_group(h, 64, mlp)
            assert h % gf == 0 and (gf % 8 == 0 or gf == h), f"fwd H={h} mlp={mlp} -> G={gf}"
            # K=16 (the config default) keeps the head-major eta layout legal,
            # so every head count has a fused backward group.
            assert fused_bwd_supported(h, 16)
            gb = pick_bwd_head_group(h, 64, 16, 64, mlp)
            assert h % gb == 0 and gb <= 8, f"bwd H={h} -> G={gb}"
            if not (gb % 8 == 0 or gb == h):
                # Head-major-only picks need the K legality that granted them.
                assert 16 % 8 == 0
    # The measured-optimal chunk-major picks must be preserved.
    assert pick_bwd_head_group(16, 64, 16, 64, True) == 8
    assert pick_bwd_head_group(48, 64, 16, 64, True) == 8
    # tp=4's 12 local heads: G=6 via the head-major eta layout.
    assert pick_bwd_head_group(12, 64, 16, 64, True) == 6
    assert fused_bwd_supported(12, 16) and fused_bwd_supported(12, 5, 5)
    # Conservative callers (no K) and tiling-illegal K still gate 12 out.
    assert not fused_bwd_supported(12)
    assert not fused_bwd_supported(12, 10, 20)
    with pytest.raises(ValueError):
        pick_bwd_head_group(12, 64, 10, 64, True, NC=20)
    assert fused_bwd_supported(24) and fused_bwd_supported(6)


def test_fused_bwd_at_12_local_heads_matches_oracle(rng):
    """tp=4 on 48 global heads leaves 12 local heads — no chunk-major head
    group exists (no divisor <= 8 is a multiple of 8), so the backward
    auto-selects G=6 with the HEAD-major eta layout (_eta_in / _deta_out;
    legal because K % 8 == 0). Values and every gradient must match the
    oracle, including a ragged last checkpoint group (NC=10, K=8). Match:
    /root/reference/configs/train/ttt-mlp/63s.toml:41-44 (16 nodes x 4 GPUs,
    tp=4)."""
    shp = (1, 12, 10, 16, 32)

    for mlp in (False, True):
        args = _inputs(rng, mlp=mlp, shape=shp)
        fused_fn = ttt_vjp.ttt_mlp_fused if mlp else ttt_vjp.ttt_linear_fused
        oracle = ttt_scan.ttt_mlp if mlp else ttt_scan.ttt_linear
        argnums = tuple(range(len(args)))
        gk = jax.grad(lambda *a: jnp.sum(fused_fn(8, True, True, *a) ** 2), argnums)(*args)
        go = jax.grad(lambda *a: jnp.sum(oracle(*a, checkpoint_group_size=8) ** 2), argnums)(*args)
        for i, (a, b) in enumerate(zip(gk, go)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3,
                                       err_msg=f"mlp={mlp} grad argnum {i}")


def test_token_major_eta_gate_at_12_local_heads(rng):
    """The production tp=4 63 s path end-to-end: token-major kernel IO +
    fused preproc + fused eta gate at 12 local heads (head-major deta
    emits d_gate). Values and all grads vs composed XLA preproc + sigmoid
    gate + scan-oracle autodiff."""
    shp = (1, 12, 10, 16, 32)
    b, h, nc, cs, f = shp
    args = _inputs(rng, mlp=True, shape=shp)
    XQr, XKr, XVr, _, lnw, lnb, W1, b1, W2, b2 = args
    gate = jnp.asarray(rng.standard_normal((b, h, nc, cs)), jnp.float32)
    scale = 0.1 / f / cs
    stl = 24
    rope_cos, rope_sin, cos, sin = _tables(rng, nc * cs, stl, f, nc, cs)
    tm = lambda x: jnp.transpose(x, (0, 2, 3, 1, 4)).reshape(b, nc, cs, h * f)

    def ref_loss(a):
        XQp, XKp, XVp = _xla_preproc(a[0], a[1], a[2], a[4], a[5], cos, sin, stl)
        eta = jax.nn.sigmoid(a[3]) * scale
        out = ttt_scan.ttt_mlp(XQp, XKp, XVp, eta, a[4], a[5], a[6], a[7], a[8], a[9], 8)
        return jnp.sum(out * out)

    def gate_loss(a):
        out = ttt_vjp.ttt_mlp_fused_pre(8, True, scale, True, tm(a[0]), tm(a[1]), tm(a[2]), a[3],
                                        rope_cos, rope_sin, a[4], a[5], a[6], a[7], a[8], a[9])
        return jnp.sum(out * out)

    newargs = (XQr, XKr, XVr, gate, lnw, lnb, W1, b1, W2, b2)
    v_ref, g_ref = jax.value_and_grad(ref_loss)(newargs)
    v_pre, g_pre = jax.value_and_grad(gate_loss)(newargs)
    np.testing.assert_allclose(float(v_pre), float(v_ref), rtol=1e-5)
    for i, (a, g2) in enumerate(zip(g_ref, g_pre)):
        sa = max(float(jnp.max(jnp.abs(a))), 1e-6)
        np.testing.assert_allclose(np.asarray(g2), np.asarray(a), rtol=0, atol=3e-5 * sa,
                                   err_msg=f"grad argnum {i}")


def test_kernel_selftest_harness(rng):
    """The bench/tpu_smoke hardware selftest must itself be sound: in
    interpret mode every discriminator (incl. the fused eta-gate one) passes
    against the oracle on CPU."""
    from ttt_video_dit_tpu.utils.selftest import kernel_selftest

    result = kernel_selftest(interpret=True)
    bad = {k: v for k, v in result["checks"].items() if not result["ok"]}
    assert result["ok"], f"selftest discriminators failed: {bad}"
    assert len(result["checks"]) >= 19  # 4 pairs x 4 + 3 gate checks
