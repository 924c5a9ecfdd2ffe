"""Microbenchmark harness for the hot kernels on real TPU hardware.

Times isolated attention and TTT-scan variants at the 3-second geometry
(S=18048, 16 heads, head_dim 64) so production defaults (splash block sizes,
TTT head groups) can be tuned empirically. All timings fence with a scalar
host readback (through the remote tunnel, block_until_ready returns before
the device finishes — see CLAUDE.md).

Usage: python scripts/microbench.py [--which attn|ttt|all] [--iters 20]
"""

from __future__ import annotations

import argparse
import functools
import time


def fence(x):
    import jax.numpy as jnp

    return float(jnp.sum(x[0] if isinstance(x, (tuple, list)) else x).astype(jnp.float32)[()])


def timeit(fn, args, iters, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / iters


def bench_attention(iters):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ttt_video_dit_tpu.ops import attention as attn_mod

    B, S, H, F = 1, 18048, 16, 64
    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(rng.standard_normal((B, S, H, F)), jnp.bfloat16)
    q, k, v = mk(), mk(), mk()
    flops_fwd = 4 * S * S * H * F  # QK^T + PV

    ref = jax.jit(attn_mod._chunked)(q, k, v)

    def run(tag, fn):
        f = jax.jit(fn)
        err = float(jnp.max(jnp.abs(f(q, k, v).astype(jnp.float32) - ref.astype(jnp.float32)))[()])
        assert err < 0.05, f"{tag}: max diff vs chunked reference {err}"
        t_f = timeit(f, (q, k, v), iters)
        loss = jax.jit(lambda q, k, v: jnp.sum(fn(q, k, v).astype(jnp.float32) ** 2))
        g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
        t_b = timeit(lambda *a: g(*a)[0], (q, k, v), iters)
        print(
            f"attn {tag:34s} fwd {t_f*1e3:7.2f} ms ({flops_fwd/t_f/1e12:5.1f} TF/s)   "
            f"fwd+bwd {t_b*1e3:7.2f} ms ({3.5*flops_fwd/t_b/1e12:5.1f} TF/s eff)",
            flush=True,
        )

    for blk in (1024, 1536, 2048):
        run(f"splash-pad18432-{blk}", functools.partial(attn_mod._splash_padded, block=blk))


def bench_ttt_k_sweep(iters, heads: int = 48):
    """Sweep (checkpoint-group K, backward head-group G): a K that divides
    NC=282 kills the NC pad/slice ops around every kernel call (~21 ms/step
    at d3072), and a smaller K shrinks the backward's in-group stash, which
    may admit a larger G."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ttt_video_dit_tpu.ops.pallas import ttt_backward, ttt_forward

    B, H, CS, F = 1, heads, 64, 64
    NC = 18048 // CS  # 282
    rng = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.bfloat16)

    for K in (6, 8, 16):
        pad = (-NC) % K
        NCp = NC + pad
        XQ, XK, XV = mk(B, H, NCp, CS, F), mk(B, H, NCp, CS, F), mk(B, H, NCp, CS, F)
        eta = jnp.asarray(np.abs(rng.standard_normal((B, H, NCp, CS))) * 0.01, jnp.bfloat16)
        ln_w, ln_b = jnp.ones((H, F), jnp.float32), jnp.zeros((H, F), jnp.float32)
        W1 = jnp.asarray(rng.standard_normal((B, H, F, 4 * F)) * 0.02, jnp.float32)
        b1 = jnp.zeros((B, H, 1, 4 * F), jnp.float32)
        W2 = jnp.asarray(rng.standard_normal((B, H, 4 * F, F)) * 0.02, jnp.float32)
        b2 = jnp.zeros((B, H, 1, F), jnp.float32)
        g = mk(B, H, NCp, CS, F)

        f = jax.jit(
            lambda XQ, XK, XV, eta, K=K: ttt_forward.ttt_mlp_forward(
                XQ, XK, XV, eta, ln_w, ln_b, W1, b1, W2, b2, K, head_group=16
            )[0]
        )
        try:
            t = timeit(f, (XQ, XK, XV, eta), iters)
            print(f"ttt-mlp K={K:2d} pad={pad} fwd G=16: {t*1e3:7.2f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"ttt-mlp K={K:2d} fwd G=16: FAILED {type(e).__name__}: {str(e)[:140]}", flush=True)
            continue

        fwd = jax.jit(
            lambda XQ, XK, XV, eta, K=K: ttt_forward.ttt_mlp_forward(
                XQ, XK, XV, eta, ln_w, ln_b, W1, b1, W2, b2, K, head_group=8
            )
        )
        _, w1_ck, b1_ck, w2_ck, b2_ck = fwd(XQ, XK, XV, eta)
        for G in [G for G in (8, 16, 24) if H % G == 0]:
            b = jax.jit(
                lambda XQ, XK, XV, eta, g, K=K, G=G: ttt_backward.ttt_mlp_backward(
                    XQ, XK, XV, eta, ln_w, ln_b, w1_ck, b1_ck, w2_ck, b2_ck, g, K, head_group=G
                )[0]
            )
            try:
                t = timeit(b, (XQ, XK, XV, eta, g), iters)
                print(f"ttt-mlp K={K:2d} bwd G={G:2d}: {t*1e3:7.2f} ms", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"ttt-mlp K={K:2d} bwd G={G:2d}: FAILED {type(e).__name__}: {str(e)[:140]}", flush=True)


def bench_ttt(iters, heads: int = 16):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ttt_video_dit_tpu.ops.pallas import ttt_backward, ttt_forward

    B, H, CS, F = 1, heads, 64, 64
    NC = 18048 // CS  # 282
    K = 16
    pad = (-NC) % K
    NCp = NC + pad
    rng = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.bfloat16)
    XQ, XK, XV = mk(B, H, NCp, CS, F), mk(B, H, NCp, CS, F), mk(B, H, NCp, CS, F)
    eta = jnp.asarray(np.abs(rng.standard_normal((B, H, NCp, CS))) * 0.01, jnp.bfloat16)
    ln_w = jnp.ones((H, F), jnp.float32)
    ln_b = jnp.zeros((H, F), jnp.float32)
    W1 = jnp.asarray(rng.standard_normal((B, H, F, 4 * F)) * 0.02, jnp.float32)
    b1 = jnp.zeros((B, H, 1, 4 * F), jnp.float32)
    W2 = jnp.asarray(rng.standard_normal((B, H, 4 * F, F)) * 0.02, jnp.float32)
    b2 = jnp.zeros((B, H, 1, F), jnp.float32)
    g = mk(B, H, NCp, CS, F)

    fwd_groups = [G for G in (16, 24, 48) if H % G == 0 and G <= H] or [H]
    for G in fwd_groups:
        f = jax.jit(
            lambda XQ, XK, XV, eta: ttt_forward.ttt_mlp_forward(
                XQ, XK, XV, eta, ln_w, ln_b, W1, b1, W2, b2, K, head_group=G
            )[0]
        )
        try:
            t = timeit(f, (XQ, XK, XV, eta), iters)
            print(f"ttt-mlp fwd  G={G:2d}: {t*1e3:7.2f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"ttt-mlp fwd  G={G:2d}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)

    # Forward once (G=8 known good) to get checkpoints for the backward bench.
    fwd = jax.jit(
        lambda XQ, XK, XV, eta: ttt_forward.ttt_mlp_forward(
            XQ, XK, XV, eta, ln_w, ln_b, W1, b1, W2, b2, K, head_group=8
        )
    )
    _, w1_ck, b1_ck, w2_ck, b2_ck = fwd(XQ, XK, XV, eta)

    for G in [G for G in (8, 12, 16) if H % G == 0]:
        b = jax.jit(
            lambda XQ, XK, XV, eta, g: ttt_backward.ttt_mlp_backward(
                XQ, XK, XV, eta, ln_w, ln_b, w1_ck, b1_ck, w2_ck, b2_ck, g, K, head_group=G
            )[0]
        )
        try:
            t = timeit(b, (XQ, XK, XV, eta, g), iters)
            print(f"ttt-mlp bwd  G={G:2d}: {t*1e3:7.2f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"ttt-mlp bwd  G={G:2d}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--which", default="all", choices=["attn", "ttt", "ksweep", "all"])
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--heads", type=int, default=16)
    args = p.parse_args()

    from ttt_video_dit_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax

    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    if args.which in ("attn", "all"):
        bench_attention(args.iters)
    if args.which in ("ttt", "all"):
        bench_ttt(args.iters, heads=args.heads)
    if args.which == "ksweep":
        bench_ttt_k_sweep(args.iters, heads=args.heads)


if __name__ == "__main__":
    main()
