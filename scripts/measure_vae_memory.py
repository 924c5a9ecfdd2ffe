"""Measure peak HBM for the production VAE encode tile on real hardware.

The reference wraps every VAE conv in SafeConv3d, which splits >2 GB conv
inputs along time (reference: ttt/models/vae/utils.py:72-91) — a workaround
for torch-CUDA conv workspace blowup. XLA convs have no such workspace, so the
TPU constraint is different: the *materialized feature maps* of the 48+1-frame
480x720 encode window (49*480*720*128 ch * 4 B = 8.7 GB each at level 0).
This script measures actual peak HBM for the encode tile so the supported
configurations are recorded instead of guessed.

Usage: python scripts/measure_vae_memory.py [--frames 49] [--height 480]
       [--width 720] [--dtype float32]
"""

from __future__ import annotations

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=49)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=720)
    p.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ttt_video_dit_tpu.models.vae.autoencoder import VideoAutoencoder
    from ttt_video_dit_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}")

    vae = VideoAutoencoder().init_random(jax.random.PRNGKey(0), spatial=64, latent_spatial=8)
    if args.dtype == "bfloat16":
        vae.enc_params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), vae.enc_params)

    x = np.zeros((1, 3, args.frames, args.height, args.width), np.float32)
    try:
        z = vae.encode_first_stage(x, window=48)
        z_sum = float(jnp.sum(z.astype(jnp.float32)))  # fence
        stats = dev.memory_stats() or {}
        peak = stats.get("peak_bytes_in_use", 0)
        print(
            f"OK encode {args.frames}x{args.height}x{args.width} ({args.dtype}): "
            f"latents {z.shape}, peak HBM {peak / 1e9:.2f} GB"
            + ("" if peak else " (no memory_stats from this backend)")
        )
    except Exception as e:  # noqa: BLE001
        print(f"FAILED encode {args.frames}x{args.height}x{args.width} ({args.dtype}): {type(e).__name__}: {str(e)[:400]}")


if __name__ == "__main__":
    main()
