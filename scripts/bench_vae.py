"""VAE decode throughput on real hardware at the production geometry.

Sampling's final stage decodes [16, T_lat, 60, 90] scaled latents to
480x720 RGB in 2-latent-frame windows with conv-cache carry between windows
(reference: ttt/models/vae/autoencoder.py:175-197). NEITHER half fits one
v5e at 480x720 in fp32 (decode's first window alone compiles to 31.3 GB of
HBM temps — measured; docs/performance.md "VAE memory budget" has the
encode side) — use SPMD spatial sharding (VideoAutoencoder(mesh=...)) for
full resolution. This script measures single-chip decode throughput at a
fitting geometry (default 240x360 output). Random-init weights: throughput
only.

Usage: python scripts/bench_vae.py [--frames 13] [--iters 3]
Prints one JSON line: seconds per 3-second video and decoded frames/s.
"""

from __future__ import annotations

import argparse
import json
import os.path as osp
import sys
import time

sys.path.append(osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=13, help="latent frames (13 = 3-second video)")
    p.add_argument("--height", type=int, default=30)
    p.add_argument("--width", type=int, default=45)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    from ttt_video_dit_tpu.utils.tpu_flags import ensure_tpu_flags

    ensure_tpu_flags()

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from ttt_video_dit_tpu.models.vae.autoencoder import VideoAutoencoder

    vae = VideoAutoencoder().init_random(jax.random.PRNGKey(0))  # fp32, reference numerics
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal((1, 16, args.frames, args.height, args.width)), jnp.float32)

    fence = lambda x: float(jnp.sum(x.astype(jnp.float32)))  # host readback = the only reliable fence

    t0 = time.perf_counter()
    out = vae.decode_first_stage(z)
    fence(out)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(args.iters):
        fence(vae.decode_first_stage(z))
    dt = (time.perf_counter() - t0) / args.iters

    out_frames = int(out.shape[2])
    print(json.dumps({
        "metric": f"vae_decode_s_per_video_{args.frames}lat_{args.height * 8}x{args.width * 8}",
        "value": round(dt, 3),
        "unit": "s/video",
        "frames_per_s": round(out_frames / dt, 1),
        "out_shape": list(out.shape),
        "compile_s": round(compile_s, 1),
        "device": jax.devices()[0].device_kind,
    }))


if __name__ == "__main__":
    sys.exit(main())
