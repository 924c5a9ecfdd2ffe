"""One-off sweep of splash-attention backward block configs at the flagship
bench geometry (S=18432 padded, 48 heads, head_dim 64, bf16). Times fwd and
fwd+bwd with scalar-readback fencing (see CLAUDE.md on the tunnel).

Usage: python scripts/tune_splash_bwd.py [--iters 10]
"""

from __future__ import annotations

import argparse
import time


def fence(x):
    import jax.numpy as jnp

    leaves = x if isinstance(x, (tuple, list)) else (x,)
    return float(jnp.sum(leaves[0].astype(jnp.float32))[()])


def timeit(fn, args, iters, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--heads", type=int, default=48)
    p.add_argument("--seq", type=int, default=18432)
    args = p.parse_args()

    from ttt_video_dit_tpu.utils.tpu_flags import ensure_tpu_flags

    ensure_tpu_flags()  # 64 MB scoped vmem — same limit the framework runs with

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental.pallas.ops.tpu.splash_attention import splash_attention_kernel as splash
    from jax.experimental.pallas.ops.tpu.splash_attention import splash_attention_mask as mask_lib

    from ttt_video_dit_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    B, S, H, F = 1, args.seq, args.heads, 64
    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(rng.standard_normal((B, H, S, F)), jnp.bfloat16)
    q, k, v = mk(), mk(), mk()
    flops_fwd = 4 * S * S * H * F
    flops_bwd = 10 * S * S * H * F

    def build(tag, fused, bq, bkv, bkvc, bqd, bkvd, bkvdc, bqdq=None, bkvdq=None):
        try:
            mask = mask_lib.MultiHeadMask([mask_lib.FullMask(_shape=(S, S)) for _ in range(H)])
            bs = splash.BlockSizes(
                block_q=bq, block_kv=bkv, block_kv_compute=bkvc,
                block_q_dkv=bqd, block_kv_dkv=bkvd, block_kv_dkv_compute=bkvdc,
                block_q_dq=None if fused else (bqdq or bqd),
                block_kv_dq=None if fused else (bkvdq or bkvdc),
                use_fused_bwd_kernel=fused,
            )
            kern = splash.make_splash_mha(mask=mask, head_shards=1, q_seq_shards=1, block_sizes=bs)

            def f(q, k, v):
                return jax.vmap(kern)(q, k, v)

            def loss(q, k, v):
                return jnp.sum(f(q, k, v).astype(jnp.float32) ** 2)

            fwd = jax.jit(f)
            bwd = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
            t_f = timeit(fwd, (q, k, v), args.iters)
            t_b = timeit(lambda *a: bwd(*a)[0], (q, k, v), max(args.iters // 2, 3))
        except Exception as e:  # noqa: BLE001
            print(f"{tag:44s} FAILED: {str(e)[:120]}", flush=True)
            return
        print(
            f"{tag:44s} fwd {t_f*1e3:7.2f} ms ({flops_fwd/t_f/1e12:5.1f} TF/s)  "
            f"fwd+bwd {t_b*1e3:7.2f} ms (bwd-only est {(t_b-t_f)*1e3:6.1f} ms, {flops_bwd/max(t_b-t_f,1e-9)/1e12:5.1f} TF/s)",
            flush=True,
        )

    # Round 2: forward-block variants (fwd is ~68% of the K=64 ceiling) and
    # larger q_dkv (q2048 beat q1024 by ~1.3% in round 1).
    # build("fwd q1024 kv3072 c512 | bwd q2048", True, 1024, 3072, 512, 2048, 1024, 512)
    # build("fwd q1024 kv2048 c1024 | bwd q2048", True, 1024, 2048, 1024, 2048, 1024, 512)
    # build("fwd q1024 kv2048 c512 | bwd q2048 kv2048", True, 1024, 2048, 512, 2048, 2048, 512)
    # build("fwd q1024 kv2048 c512 | bwd q3072", True, 1024, 2048, 512, 3072, 1024, 512)
    # build("fwd q1024 kv2048 c512 | bwd q2048 kv2048 c1024", True, 1024, 2048, 512, 2048, 2048, 1024)
    # build("fwd q512 kv2048 c512 | bwd q2048", True, 512, 2048, 512, 2048, 1024, 512)

    # Round 3: the scoped-vmem limit is now 64 MB framework-wide
    # (utils/tpu_flags.py) — every earlier sweep ran at the 16 MB default,
    # which rejected fwd blocks past q1024/kv2048. Re-open the fwd space
    # (fwd is the weaker direction: ~75% of the K=64 half-MXU ceiling vs 89%
    # for the fused bwd) and the bwd kv4096 point (larger block_kv_dkv also
    # SHRINKS the fused dQ-partials stack: [S/block_kv_dkv, H, S, F]).
    # Block sizes must divide S=18432 (2^11*9): usable sizes are
    # 512/1024/1536/2048/3072/6144/9216/18432. q2048 fwd == q1024 fwd.
    # Measured so far (64 MB scoped vmem): fwd kv2048c512 56.9 / kv3072c512
    # 55.0 / kv6144c1024 51.8 ms — bigger kv blocks amortize the per-block
    # rescale bookkeeping. bwd q2048kv2048c512 119.2; kv3072c1024 117.4;
    # q3072kv3072 134 (worse).
    # Round-2 results: fwd kv9216c1024 51.4 (best), kv6144c1024 51.8-52.9,
    # kv18432 57.9 (spills), c512/c2048 worse. bwd q1024kv6144c1024 115.8
    # (also 3x smaller dQ-partials stack), q2048kv3072c1024 117.4x2,
    # q2048kv6144c1024 129 (bad). Round 3: confirm the finalists.
    # Round 4: re-confirm at the 63 s folded-window geometry (--heads 84 =
    # 21 windows x 4 heads; grid parallelism is per pseudo-head, so the
    # flagship-tuned blocks may not be optimal there).
    build("A fwd q1024 kv9216 c1024 | bwd q1024 kv6144 c1024", True, 1024, 9216, 1024, 1024, 6144, 1024)
    build("B fwd q1024 kv6144 c1024 | bwd q1024 kv6144 c1024", True, 1024, 6144, 1024, 1024, 6144, 1024)
    build("C fwd q1024 kv9216 c1024 | bwd q2048 kv2048 c512 ", True, 1024, 9216, 1024, 2048, 2048, 512)
    build("D fwd q1024 kv9216 c1024 | bwd q1024 kv3072 c1024", True, 1024, 9216, 1024, 1024, 3072, 1024)
    build("E fwd q1024 kv9216 c1024 | bwd q1536 kv6144 c1024", True, 1024, 9216, 1024, 1536, 6144, 1024)
    build("F fwd q1024 kv9216 c1024 | bwd q1024 kv9216 c1024", True, 1024, 9216, 1024, 1024, 9216, 1024)
    build("G fwd q2048 kv9216 c1024 | bwd q1024 kv6144 c1024", True, 2048, 9216, 1024, 1024, 6144, 1024)
    build("H fwd q1024 kv9216 c2048 | bwd q1024 kv6144 c2048", True, 1024, 9216, 2048, 1024, 6144, 2048)
    build("I fwd q1024 kv18432 c1024 | bwd q1024 kv6144 c1024", True, 1024, 18432, 1024, 1024, 6144, 1024)


if __name__ == "__main__":
    main()
