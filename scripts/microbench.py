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
import os.path as osp
import sys
import time

# Self-contained path setup (append, never PYTHONPATH=. — that clobbers the
# axon plugin's site dir; see CLAUDE.md).
sys.path.append(osp.dirname(osp.dirname(osp.abspath(__file__))))


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


def bench_ttt_token_major(iters, heads: int = 48):
    """Token-major kernel IO vs the head-grouped layout at the flagship
    geometry: (a) kernel alone in each layout, (b) the real pipeline cost —
    token-major stream in/out with the head-major kernel paying its moveaxis
    relayouts vs the token-major kernel paying its in-register transposes."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ttt_video_dit_tpu.ops.pallas import ttt_forward

    B, H, CS, F = 1, heads, 64, 64
    NC = 18048 // CS
    K = 6
    NCp = NC + ((-NC) % K)
    L = NCp * CS
    rng = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.bfloat16)
    Xtm = [mk(B, NCp, CS, H * F) for _ in range(3)]
    eta = jnp.asarray(np.abs(rng.standard_normal((B, H, NCp, CS))) * 0.01, jnp.bfloat16)
    ln_w, ln_b = jnp.ones((H, F), jnp.float32), jnp.zeros((H, F), jnp.float32)
    W1 = jnp.asarray(rng.standard_normal((B, H, F, 4 * F)) * 0.02, jnp.float32)
    b1 = jnp.zeros((B, H, 1, 4 * F), jnp.float32)
    W2 = jnp.asarray(rng.standard_normal((B, H, 4 * F, F)) * 0.02, jnp.float32)
    b2 = jnp.zeros((B, H, 1, F), jnp.float32)
    to_hm = lambda x: jnp.moveaxis(x.reshape(B, NCp, CS, H, F), 3, 1)  # -> [B,H,NC,CS,F]
    to_tm = lambda x: jnp.moveaxis(x, 1, 3).reshape(B, NCp, CS, H * F)

    run = lambda *a: ttt_forward.ttt_mlp_forward(*a, ln_w, ln_b, W1, b1, W2, b2, K, head_group=16)

    hm_in = [to_hm(x) for x in Xtm]
    f_hm = jax.jit(lambda q, k, v, e: run(q, k, v, e)[0])
    f_tm = jax.jit(lambda q, k, v, e: ttt_forward.ttt_mlp_forward(
        q, k, v, e, ln_w, ln_b, W1, b1, W2, b2, K, head_group=16, token_major=True)[0])
    # End-to-end: token-major stream -> kernel -> token-major stream.
    f_hm_pipe = jax.jit(lambda q, k, v, e: to_tm(run(to_hm(q), to_hm(k), to_hm(v), e)[0]))

    for tag, fn, args in (
        ("mlp fwd head-major (kernel only)", f_hm, (*hm_in, eta)),
        ("mlp fwd token-major (kernel only)", f_tm, (*Xtm, eta)),
        ("mlp fwd head-major + relayouts  ", f_hm_pipe, (*Xtm, eta)),
    ):
        try:
            t = timeit(fn, args, iters)
            print(f"{tag}: {t*1e3:7.2f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:140]}", flush=True)

    # Full fused VJP (fwd+bwd) through the production fused-preproc path, in
    # both layouts, token-major stream in/out (what the layer actually runs).
    from ttt_video_dit_tpu.ops.pallas import ttt_vjp
    from ttt_video_dit_tpu.ops.rope import interleaved_tables_prefixed, precompute_rope_3d

    stl = CS
    cos, sin = precompute_rope_3d(F, 30, 45, (L - stl) // 1350 + 1)
    ci, si = interleaved_tables_prefixed(cos, sin, stl, L)
    rc, rs = jnp.asarray(ci.reshape(NCp, CS, F)), jnp.asarray(si.reshape(NCp, CS, F))
    scale = 0.1 / F / CS
    gate = jnp.asarray(rng.standard_normal((B, H, NCp, CS)), jnp.float32)

    loss_hm = lambda q, k, v, g_: jnp.sum(ttt_vjp.ttt_mlp_fused_pre(
        K, False, scale, False, to_hm(q), to_hm(k), to_hm(v), g_, rc, rs,
        ln_w, ln_b, W1, b1, W2, b2).astype(jnp.float32) ** 2)
    loss_tm = lambda q, k, v, g_: jnp.sum(ttt_vjp.ttt_mlp_fused_pre(
        K, False, scale, True, q, k, v, g_, rc, rs,
        ln_w, ln_b, W1, b1, W2, b2).astype(jnp.float32) ** 2)
    for tag, loss in (("mlp vjp head-major + relayouts  ", loss_hm),
                      ("mlp vjp token-major             ", loss_tm)):
        try:
            fn = jax.jit(jax.grad(loss, (0, 1, 2, 3)))
            t = timeit(lambda *a: fn(*a)[0], (*Xtm, gate), max(iters // 2, 3))
            print(f"{tag}: {t*1e3:7.2f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:140]}", flush=True)


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


def bench_loader(n_samples: int = 32, scenes: int = 2):
    """Host-side data-loader throughput: sequential Python (np.load /
    torch.load) vs the native C++ prefetch pool, on production-shaped files
    (3 s posterior [14, 32, 60, 90] f32 ≈ 12 MB + per-scene text [226, 4096]).
    The pool overlaps IO + header parse + (for .pt) pickle decode off the GIL
    across the whole batch."""
    import shutil
    import tempfile
    import time

    import numpy as np

    from ttt_video_dit_tpu.data import native
    from ttt_video_dit_tpu.data.dataset import load_tensor

    if not native.available():
        print("loader: native toolchain unavailable, skipping")
        return

    td = tempfile.mkdtemp(prefix="loaderbench_")
    rng = np.random.default_rng(0)
    try:
        import torch

        paths = {"npy": [], "pt": []}
        for i in range(n_samples):
            vid = rng.standard_normal((14, 32, 60, 90)).astype(np.float32)
            txts = [rng.standard_normal((226, 4096)).astype(np.float32) for _ in range(scenes)]
            group = []
            for j, a in enumerate([vid, *txts]):
                np.save(f"{td}/s{i}_{j}.npy", a)
                torch.save(torch.from_numpy(a), f"{td}/s{i}_{j}.pt")
                group.append(f"{td}/s{i}_{j}")
            paths["npy"].append([g + ".npy" for g in group])
            paths["pt"].append([g + ".pt" for g in group])

        total_mb = n_samples * (vid.nbytes + scenes * txts[0].nbytes) / 2**20
        batch = 8  # in-flight bound, like DataModule's per-batch submit
        for fmt, groups in paths.items():
            # Both paths mimic load_batch faithfully: a batch of samples is
            # loaded and HELD (then stacked/dropped together). Holding is
            # load-bearing for the measurement — every live multi-MB buffer
            # is fresh mmap'd pages, and a drop-each loop recycles one hot
            # arena and looks several times faster than the pipeline ever is.
            t0 = time.perf_counter()
            for s0 in range(0, len(groups), batch):
                held = [
                    load_tensor(p) if fmt == "pt" else np.load(p)
                    for g in groups[s0 : s0 + batch]
                    for p in g
                ]
                del held
            seq = time.perf_counter() - t0

            pool = native.PrefetchPool(num_threads=8)
            try:
                t0 = time.perf_counter()
                for s0 in range(0, len(groups), batch):
                    jobs = [pool.fetch(p) for g in groups[s0 : s0 + batch] for p in g]
                    held = [pool.wait(j) for j in jobs]
                    del held
                par = time.perf_counter() - t0
            finally:
                pool.close()
            print(
                f"loader {fmt}: {total_mb:.0f} MB, sequential batched {total_mb/seq:.0f} MB/s, "
                f"native pool(8, batch {batch}) {total_mb/par:.0f} MB/s ({seq/par:.1f}x)",
                flush=True,
            )
    finally:
        shutil.rmtree(td, ignore_errors=True)


def bench_ckpt(n_tensors: int = 120, mb_each: float = 4.0):
    """State-dict checkpoint read: torch.load + .float().numpy() per tensor
    vs the native nl_pt_dict path (no torch import, tensors land directly in
    numpy buffers). Shape mimics a VAE checkpoint: many few-MB conv kernels."""
    import shutil
    import tempfile
    import time

    import numpy as np

    from ttt_video_dit_tpu.data import native

    if not native.available():
        print("ckpt: native toolchain unavailable, skipping")
        return
    import torch

    td = tempfile.mkdtemp(prefix="ckptbench_")
    try:
        side = int((mb_each * 2**20 / 4) ** 0.5)
        sd = {f"encoder.block{i}.conv.weight": torch.randn(side, side) for i in range(n_tensors)}
        path = f"{td}/vae.pt"
        torch.save({"state_dict": sd}, path)
        total_mb = n_tensors * side * side * 4 / 2**20

        t0 = time.perf_counter()
        ref = torch.load(path, map_location="cpu", weights_only=False)["state_dict"]
        ref_np = {k: v.to(torch.float32).numpy() for k, v in ref.items()}
        t_torch = time.perf_counter() - t0

        t0 = time.perf_counter()
        got = native.load_pt_dict(path)
        t_native = time.perf_counter() - t0

        k0 = next(iter(ref_np))
        np.testing.assert_array_equal(got[f"state_dict.{k0}"], ref_np[k0])
        print(
            f"ckpt .pt dict: {total_mb:.0f} MB, torch.load {total_mb/t_torch:.0f} MB/s, "
            f"native {total_mb/t_native:.0f} MB/s ({t_torch/t_native:.1f}x)",
            flush=True,
        )
    finally:
        shutil.rmtree(td, ignore_errors=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--which", default="all", choices=["attn", "ttt", "ksweep", "tm", "loader", "ckpt", "all"])
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
    if args.which == "tm":
        bench_ttt_token_major(args.iters, heads=args.heads)
    if args.which == "loader":
        bench_loader()
    if args.which == "ckpt":
        bench_ckpt()


if __name__ == "__main__":
    main()
