"""MXU contraction-width microbenchmark: is the splash head_dim-64 ceiling real?

The 18-63 s stages are attention-bound; docs/performance.md claims splash
runs at 84-92 % of a "head_dim-64 half-MXU ceiling" (98.5 TF/s on v5e, i.e.
half the 197 TF/s bf16 peak, because QK^T contracts over F=64 < the 128-deep
systolic array). Round-4 verdict ask 3: attack that ceiling (e.g. pack two
F=64 heads into one F=128 problem) or refute it at the kernel level.

This measures the actual MXU throughput of the two matmul shapes splash is
made of, at splash's own block sizes, outside any attention code:

  QK^T:  [block_q, F] @ [F, block_kv]      (contraction = F)
  PV:    [block_q, block_kv] @ [block_kv, F] (output lane dim = F)

each at F=64 vs F=128 (same FLOPs via doubled block_kv where needed), plus
the fused two-head block-diagonal packing variant
  [block_q, 128] @ [128, 2*block_kv] with zero blocks
that a "pack two heads" splash kernel would execute. If F=64 runs at ~half
the F=128 TF/s, the ceiling is physical (contraction width), and packing —
which must either zero-pad (same wasted MACs) or pollute logits — cannot
beat it. Run on the real chip: `python scripts/microbench_f64.py`.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ttt_video_dit_tpu.utils.tpu_flags import ensure_tpu_flags

ensure_tpu_flags()

import jax
import jax.numpy as jnp
import numpy as np


def bench_matmul(m, k, n, batch=8, inner=400, calls=3):
    """TF/s of batched [m,k]@[k,n] bf16 matmuls.

    The axon tunnel's per-call host readback costs milliseconds — timing one
    matmul per call measures the tunnel, not the MXU (first draft of this
    script reported 0.1 TF/s). So the matmul loops INSIDE one compiled
    program: lax.scan with a carry-dependent input perturbation (defeats
    loop-invariant code motion; the elementwise add is ~1e-4 of the matmul
    FLOPs), one scalar readback per call as the execution fence."""
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((batch, m, k)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((batch, k, n)), jnp.bfloat16)

    @jax.jit
    def run(a, b):
        def body(c, _):
            out = jnp.einsum("bmk,bkn->bmn", a + (c * 1e-20).astype(a.dtype), b,
                             preferred_element_type=jnp.float32)
            return jnp.sum(out) * 1e-30, None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=inner)
        return c

    float(run(a, b))  # compile + warmup (host readback = the only fence)
    t0 = time.perf_counter()
    for _ in range(calls):
        float(run(a, b))
    dt = (time.perf_counter() - t0) / calls
    flops = 2.0 * batch * m * k * n * inner
    return flops / dt / 1e12


def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    BQ, BKV = 1024, 2048  # splash block_q x the fwd kv block granularity
    rows = [
        ("QK^T   F=64  [1024,64]@[64,2048]", BQ, 64, BKV),
        ("QK^T   F=128 [1024,128]@[128,2048]", BQ, 128, BKV),
        ("QK^T   F=256 [1024,256]@[256,2048]", BQ, 256, BKV),
        ("PV     F=64  [1024,2048]@[2048,64]", BQ, BKV, 64),
        ("PV     F=128 [1024,2048]@[2048,128]", BQ, BKV, 128),
        ("2-head blockdiag QK^T [1024,128]@[128,4096]", BQ, 128, 2 * BKV),
    ]
    results = {}
    for name, m, k, n in rows:
        tf = bench_matmul(m, k, n)
        results[name] = tf
        print(f"{name:48s} {tf:7.1f} TF/s", flush=True)

    f64 = results[rows[0][0]]
    f128 = results[rows[1][0]]
    bd = results[rows[5][0]]
    # Block-diagonal packing computes 2x the useful QK FLOPs (half are zero
    # blocks): its USEFUL throughput is half its raw TF/s.
    print(f"\nQK^T F=64 / F=128 ratio: {f64 / f128:.3f} (0.5 = pure contraction-width wall)")
    print(f"2-head block-diag USEFUL TF/s: {bd / 2:.1f} vs direct F=64 {f64:.1f} "
          f"-> packing {'WINS' if bd / 2 > f64 * 1.05 else 'LOSES/TIES'}")


if __name__ == "__main__":
    main()
