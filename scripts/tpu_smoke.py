"""Compiled-mode TPU kernel smoke: value/grad parity at shapes the CPU test
suite can only cover in pallas interpret mode.

Covers (on the real chip, compiled Mosaic):
- ragged NC (NC % checkpoint_group != 0): the backward kernels' dynamic
  group bound + masked edge-block writes (ops/pallas/ttt_backward.py:160-164)
- the fused-preproc path (rope/L2/LN-target recompute in-kernel)
- folded-window splash attention vs per-window naive softmax

Run: python scripts/tpu_smoke.py   (takes a few minutes of compiles)
Exit 0 + "TPU_SMOKE_OK" on success. Intended for hardware CI; results for
this repo are recorded in docs/performance.md.
"""

import os.path as osp
import sys

# Self-contained path setup: appending (not prepending via PYTHONPATH=.)
# keeps /root-style site hooks intact — overriding PYTHONPATH clobbers the
# axon plugin's sitecustomize dir and kills the TPU backend registration.
sys.path.append(osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def _rel_err(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-8))


def check(name, got, want, tol):
    err = _rel_err(got, want)
    status = "ok" if err <= tol else "FAIL"
    print(f"  {name}: rel_err {err:.2e} (tol {tol:.0e}) {status}")
    return err <= tol


def main():
    # The tuned splash blocks need the raised Mosaic scoped-vmem limit every
    # entry point sets; must happen before first device use (utils/tpu_flags).
    from ttt_video_dit_tpu.utils.tpu_flags import ensure_tpu_flags

    ensure_tpu_flags()

    import jax
    import jax.numpy as jnp

    from ttt_video_dit_tpu.ops import ttt_scan
    from ttt_video_dit_tpu.ops.pallas import ttt_linear_kernel, ttt_mlp_kernel

    assert jax.devices()[0].platform == "tpu", "needs a TPU device"
    rng = np.random.default_rng(0)
    ok = True

    # Ragged NC: 5 mini-batches, checkpoint group 4 -> last group has 1.
    B, H, NC, CS, F = 1, 8, 5, 64, 64
    K = 4
    f = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    XQ, XK, XV = f(B, H, NC, CS, F), f(B, H, NC, CS, F), f(B, H, NC, CS, F)
    eta = jnp.abs(f(B, H, NC, CS)) * 0.01
    lnw, lnb = jnp.abs(f(H, F)) + 0.5, f(H, F) * 0.1
    W1l, b1l = f(B, H, F, F) * 0.02, f(B, H, 1, F) * 0.01
    W1m, b1m = f(B, H, F, 4 * F) * 0.02, f(B, H, 1, 4 * F) * 0.01
    W2m, b2m = f(B, H, 4 * F, F) * 0.02, f(B, H, 1, F) * 0.01

    # Both sides run compiled on-chip, where every matmul executes at bf16
    # precision (CLAUDE.md: comparisons tighter than ~1e-2 need CPU), so the
    # grad tolerance is 2e-2; the ragged/full pairs at identical shapes
    # discriminate a masked-edge-write bug (ragged >> full) from plain
    # accumulation noise (ragged ~ full).
    for name, kern, oracle, args, nc in (
        ("ttt_linear full", ttt_linear_kernel.ttt_linear, ttt_scan.ttt_linear, (W1l, b1l), 4),
        ("ttt_linear ragged", ttt_linear_kernel.ttt_linear, ttt_scan.ttt_linear, (W1l, b1l), 5),
        ("ttt_mlp full", ttt_mlp_kernel.ttt_mlp, ttt_scan.ttt_mlp, (W1m, b1m, W2m, b2m), 4),
        ("ttt_mlp ragged", ttt_mlp_kernel.ttt_mlp, ttt_scan.ttt_mlp, (W1m, b1m, W2m, b2m), 5),
    ):
        q, k, v, e = XQ[:, :, :nc], XK[:, :, :nc], XV[:, :, :nc], eta[:, :, :nc]

        def loss_k(q, k, v):
            return jnp.sum(kern(q, k, v, e, lnw, lnb, *args, K) ** 2)

        def loss_o(q, k, v):
            return jnp.sum(oracle(q, k, v, e, lnw, lnb, *args, K) ** 2)

        got = jax.jit(jax.value_and_grad(loss_k, argnums=(0, 1, 2)))(q, k, v)
        want = jax.jit(jax.value_and_grad(loss_o, argnums=(0, 1, 2)))(q, k, v)
        ok &= check(f"{name} fwd", got[0], want[0], 2e-4)
        for g, w, nm in zip(got[1], want[1], ("dq", "dk", "dv")):
            ok &= check(f"{name} {nm}", g, w, 2e-2)

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
    ok &= check("splash folded-windows fwd", got, want, 2e-2)

    print("TPU_SMOKE_OK" if ok else "TPU_SMOKE_FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
