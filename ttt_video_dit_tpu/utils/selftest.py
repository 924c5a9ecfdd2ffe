"""Compiled-mode kernel parity self-test.

The CPU test suite can only run the Pallas kernels in interpret mode; these
discriminators run them COMPILED on the real chip and compare against the
lax.scan oracle — the TPU analog of the reference's ``use_kernel=False``
parity mechanism (reference: ttt/models/ssm/ttt_layer.py:338). Shared by
scripts/tpu_smoke.py (manual hardware CI) and ``bench.py`` (runs before
timing, so every driver bench doubles as a hardware parity artifact).

Covers:
- ragged NC (NC % checkpoint_group != 0): the backward kernels' dynamic group
  bound + masked edge-block writes (ops/pallas/ttt_backward.py)
- full/ragged pairs at identical shapes (discriminates masked-edge-write bugs,
  which show ragged >> full, from plain bf16 accumulation noise)
- folded-window splash attention vs per-window naive softmax
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np


def _rel_err(a, b) -> float:
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-8))


def kernel_selftest(log: Optional[Callable[[str], None]] = None, interpret: bool = False) -> dict:
    """Run the compiled-mode discriminators on the current default device.

    Returns {"ok": bool, "checks": {name: rel_err}}. Tolerances: on-chip both
    sides execute every matmul at bf16 precision, so grads get 2e-2 and
    forwards 2e-4 (see scripts/tpu_smoke.py history). ``interpret=True`` runs
    the kernels in the Pallas interpreter (CPU) — used by the test suite to
    validate the selftest harness itself; the splash check needs real
    hardware and is skipped there.
    """
    import jax
    import jax.numpy as jnp

    from ttt_video_dit_tpu.ops import ttt_scan
    from ttt_video_dit_tpu.ops.pallas import ttt_vjp

    checks: dict[str, float] = {}
    ok = True

    def check(name: str, got, want, tol: float) -> None:
        nonlocal ok
        err = _rel_err(got, want)
        checks[name] = err
        good = err <= tol
        ok &= good
        if log:
            log(f"  {name}: rel_err {err:.2e} (tol {tol:.0e}) {'ok' if good else 'FAIL'}")

    rng = np.random.default_rng(0)
    B, H, NC, CS, F = 1, 8, 5, 64, 64
    K = 4
    f = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    XQ, XK, XV = f(B, H, NC, CS, F), f(B, H, NC, CS, F), f(B, H, NC, CS, F)
    eta = jnp.abs(f(B, H, NC, CS)) * 0.01
    lnw, lnb = jnp.abs(f(H, F)) + 0.5, f(H, F) * 0.1
    W1l, b1l = f(B, H, F, F) * 0.02, f(B, H, 1, F) * 0.01
    W1m, b1m = f(B, H, F, 4 * F) * 0.02, f(B, H, 1, 4 * F) * 0.01
    W2m, b2m = f(B, H, 4 * F, F) * 0.02, f(B, H, 1, F) * 0.01

    kern_lin = lambda *a: ttt_vjp.ttt_linear_fused(K, interpret, True, *a)
    kern_mlp = lambda *a: ttt_vjp.ttt_mlp_fused(K, interpret, True, *a)
    for name, kern, oracle, args, nc in (
        ("ttt_linear full", kern_lin, ttt_scan.ttt_linear, (W1l, b1l), 4),
        ("ttt_linear ragged", kern_lin, ttt_scan.ttt_linear, (W1l, b1l), 5),
        ("ttt_mlp full", kern_mlp, ttt_scan.ttt_mlp, (W1m, b1m, W2m, b2m), 4),
        ("ttt_mlp ragged", kern_mlp, ttt_scan.ttt_mlp, (W1m, b1m, W2m, b2m), 5),
    ):
        q, k, v, e = XQ[:, :, :nc], XK[:, :, :nc], XV[:, :, :nc], eta[:, :, :nc]

        def loss_k(q, k, v):
            return jnp.sum(kern(q, k, v, e, lnw, lnb, *args) ** 2)

        def loss_o(q, k, v):
            return jnp.sum(oracle(q, k, v, e, lnw, lnb, *args, K) ** 2)

        got = jax.jit(jax.value_and_grad(loss_k, argnums=(0, 1, 2)))(q, k, v)
        want = jax.jit(jax.value_and_grad(loss_o, argnums=(0, 1, 2)))(q, k, v)
        check(f"{name} fwd", got[0], want[0], 2e-4)
        for g, w, nm in zip(got[1], want[1], ("dq", "dk", "dv")):
            check(f"{name} {nm}", g, w, 2e-2)

    # 12 local heads (48 global under tp=4 — the reference's 63 s shape,
    # /root/reference/configs/train/ttt-mlp/63s.toml:44): no chunk-major
    # backward head group exists, so this exercises the HEAD-major eta
    # layout (G=6, K on the sublane axis — ops/pallas/ttt_backward.py
    # _eta_in) compiled on the real chip, ragged last group included
    # (NC=9, K=8).
    H12, NC12, K12 = 12, 9, 8
    q12, k12, v12 = f(B, H12, NC12, CS, F), f(B, H12, NC12, CS, F), f(B, H12, NC12, CS, F)
    e12 = jnp.abs(f(B, H12, NC12, CS)) * 0.01
    lnw12, lnb12 = jnp.abs(f(H12, F)) + 0.5, f(H12, F) * 0.1
    a12 = (f(B, H12, F, 4 * F) * 0.02, f(B, H12, 1, 4 * F) * 0.01,
           f(B, H12, 4 * F, F) * 0.02, f(B, H12, 1, F) * 0.01)

    def loss_k12(q, k, v):
        return jnp.sum(ttt_vjp.ttt_mlp_fused(K12, interpret, True, q, k, v, e12, lnw12, lnb12, *a12) ** 2)

    def loss_o12(q, k, v):
        return jnp.sum(ttt_scan.ttt_mlp(q, k, v, e12, lnw12, lnb12, *a12, K12) ** 2)

    got = jax.jit(jax.value_and_grad(loss_k12, argnums=(0, 1, 2)))(q12, k12, v12)
    want = jax.jit(jax.value_and_grad(loss_o12, argnums=(0, 1, 2)))(q12, k12, v12)
    check("ttt_mlp h12 g6 fwd", got[0], want[0], 2e-4)
    for g, w, nm in zip(got[1], want[1], ("dq", "dk", "dv")):
        check(f"ttt_mlp h12 g6 {nm}", g, w, 2e-2)

    # Fused eta gate: kernel takes pre-sigmoid logits + eta_scale (fused-
    # preproc mode with rope tables); oracle applies sigmoid*scale in XLA.
    from ttt_video_dit_tpu.ops.rope import interleaved_tables_prefixed, precompute_rope_3d

    gate = f(B, H, NC, CS)
    scale = 0.1 / F / CS
    stl = CS  # one text mini-batch, then video slots
    cos, sin = precompute_rope_3d(F, 8, 8, (NC * CS - stl) // 64 + 1)
    cos_il, sin_il = interleaved_tables_prefixed(cos, sin, stl, NC * CS)
    rc = jnp.asarray(cos_il.reshape(NC, CS, F))
    rs = jnp.asarray(sin_il.reshape(NC, CS, F))

    def _xla_pre(XQr, XKr, XVr):
        l2n = lambda x: x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        rope = lambda x: (x.reshape(B, H, NC, CS, F) * rc + _pair_swap(x.reshape(B, H, NC, CS, F)) * rs)
        XQp, XKp = rope(l2n(XQr)), rope(l2n(XKr))
        t = XVr.reshape(B, H, NC, CS, F) - XKp
        mu = jnp.mean(t, -1, keepdims=True)
        var = jnp.var(t, -1, keepdims=True) * (F / (F - 1))
        th = (t - mu) / (jnp.sqrt(var) + 1e-8)
        XVp = lnw[None, :, None, None] * th + lnb[None, :, None, None] + XKp
        return XQp, XKp, XVp

    def _pair_swap(x):
        x2 = x.reshape(*x.shape[:-1], F // 2, 2)
        return jnp.stack([-x2[..., 1], x2[..., 0]], axis=-1).reshape(x.shape)

    def gate_loss_k(q, k, v, g_):
        out = ttt_vjp.ttt_mlp_fused_pre(K, interpret, scale, False, q, k, v, g_, rc, rs,
                                        lnw, lnb, W1m, b1m, W2m, b2m)
        return jnp.sum(out ** 2)

    def gate_loss_o(q, k, v, g_):
        XQp, XKp, XVp = _xla_pre(q, k, v)
        e = jax.nn.sigmoid(g_) * scale
        out = ttt_scan.ttt_mlp(XQp, XKp, XVp, e, lnw, lnb, W1m, b1m, W2m, b2m, K)
        return jnp.sum(out ** 2)

    got = jax.jit(jax.value_and_grad(gate_loss_k, argnums=(0, 3)))(XQ, XK, XV, gate)
    want = jax.jit(jax.value_and_grad(gate_loss_o, argnums=(0, 3)))(XQ, XK, XV, gate)
    check("ttt_mlp eta-gate fwd", got[0], want[0], 2e-4)
    check("ttt_mlp eta-gate dq", got[1][0], want[1][0], 2e-2)
    check("ttt_mlp eta-gate dgate", got[1][1], want[1][1], 2e-2)

    if interpret:
        return {"ok": ok, "checks": checks}  # splash needs real hardware

    # Folded-window splash vs per-window naive attention (bf16 on chip).
    from ttt_video_dit_tpu.ops.attention import _splash_padded

    C, S, Ha = 3, 4500, 4
    q = jnp.asarray(rng.standard_normal((C, S, Ha, 64)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((C, S, Ha, 64)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((C, S, Ha, 64)), jnp.bfloat16)

    def naive(q, k, v):
        scale = 1.0 / 8.0
        logits = jnp.einsum("bshf,bthf->bhst", q.astype(jnp.float32) * scale, k.astype(jnp.float32))
        return jnp.einsum("bhst,bthf->bshf", jax.nn.softmax(logits, axis=-1), v.astype(jnp.float32))

    got = jax.jit(lambda q, k, v: _splash_padded(q, k, v, block=2048, windows=C))(q, k, v)
    want = jax.jit(naive)(q, k, v)
    check("splash folded-windows fwd", got, want, 2e-2)

    # Splash BACKWARD on hardware: the token-major residual wrapper
    # (ops/attention.py:_splash_kernel) hands rebuilt head-major residuals to
    # the library's dq/dkv Pallas kernels — these grads are the evidence that
    # handoff is wired right on the compiled path, not just in interpret mode.
    ct = jnp.asarray(rng.standard_normal((C, S, Ha, 64)), jnp.float32)
    loss_s = lambda q, k, v: jnp.sum(_splash_padded(q, k, v, block=2048, windows=C).astype(jnp.float32) * ct)
    loss_n = lambda q, k, v: jnp.sum(naive(q, k, v) * ct)
    gs = jax.jit(jax.grad(loss_s, (0, 1, 2)))(q, k, v)
    gn = jax.jit(jax.grad(loss_n, (0, 1, 2)))(q, k, v)
    for name, a, b in zip(("dq", "dk", "dv"), gs, gn):
        check(f"splash folded-windows {name}", a, b, 3e-2)

    return {"ok": ok, "checks": checks}
