"""Offline VAE precompute: mp4 episodes -> latent posterior tensors.

Counterpart of the reference's data/precomp_video.py:90-243: read each mp4,
validate fps/frame count, encode 480x720 pixel frames in 48+1-frame temporal
tiles through the causal VAE encoder (conv cache carried between tiles), and
save the unregularized posterior [T/4+1, 32, 60, 90] per episode. Idempotent:
existing outputs are shape/range-validated and skipped. Episodes are
partitioned over processes.

Usage:
    python data/precompute_video.py --episode-dir /data/mp4s --save-dir /data/latents \
        --vae-checkpoint /ckpts/vae.pt --video-length 12 --fps 16
"""

from __future__ import annotations

import argparse
import os
import os.path as osp

import numpy as np


def validate_existing(path: str, latent_frames: int) -> bool:
    try:
        arr = np.load(path)
        assert arr.shape == (latent_frames, 32, 60, 90), f"bad shape {arr.shape}"
        assert -10 < arr[:, :16].min() and arr[:, :16].max() < 10, "mean out of range"
        assert -40 < arr[:, 16:].min() and arr[:, 16:].max() < 10, "log var out of range"
        return True
    except Exception:
        return False


def read_video_frames(path: str, expected_fps: int, expected_frames: int) -> np.ndarray:
    import imageio.v2 as imageio

    reader = imageio.get_reader(path, "ffmpeg")
    fps = reader.get_meta_data()["fps"]
    assert abs(fps - expected_fps) < 0.5, f"Video FPS ({fps}) != expected ({expected_fps})"
    frames = np.stack([np.asarray(f) for f in reader])  # [T, H, W, 3] uint8
    reader.close()
    assert frames.shape[0] == expected_frames, f"Wrong number of frames: {frames.shape[0]} != {expected_frames}"
    return frames


def main() -> None:
    import jax

    parser = argparse.ArgumentParser()
    parser.add_argument("--episode-dir", required=True)
    parser.add_argument("--save-dir", required=True)
    parser.add_argument("--vae-checkpoint", required=True)
    parser.add_argument(
        "--video-length", type=int, default=12,
        help="episode length in seconds; episodes must have fps*length+1 frames "
        "(reference: data/precomp_video.py:210)",
    )
    parser.add_argument(
        "--num-frames", type=int, default=None,
        help="explicit pixel frame count; must be a multiple of 48 plus 1 "
        "(overrides --video-length)",
    )
    parser.add_argument("--fps", type=int, default=16)
    parser.add_argument("--process-index", type=int, default=int(os.environ.get("TTT_PROC_ID", "0")))
    parser.add_argument("--process-count", type=int, default=int(os.environ.get("TTT_NUM_PROCS", "1")))
    parser.add_argument(
        "--spatial-shard", action="store_true",
        help="shard each encode window over H across all local devices (SPMD "
        "VAE context parallelism) — divides the ~8.7 GB level-0 feature maps "
        "of a 480x720 window by the device count; required geometry for "
        "480x720 on 16 GB-HBM chips (docs/performance.md)",
    )
    args = parser.parse_args()

    if args.num_frames is None:
        args.num_frames = args.fps * args.video_length + 1
    # The tiled causal encoder consumes windows of (48+1, 48, 48, ...) frames;
    # only T = 48n + 1 tiles exactly (VAE temporal stride 4 -> T/4+1 latents).
    if args.num_frames % 48 != 1:
        parser.error(
            f"--num-frames {args.num_frames} is not 48n+1; episodes must have "
            f"fps*seconds+1 frames (e.g. 193 for 12 s at 16 fps)"
        )

    from ttt_video_dit_tpu.models.vae.autoencoder import VideoAutoencoder
    from ttt_video_dit_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    mesh = None
    if args.spatial_shard:
        from jax.sharding import Mesh

        mesh = Mesh(np.asarray(jax.devices()).reshape(1, -1, 1), ("replica", "fsdp", "tensor"))
    vae = VideoAutoencoder.from_torch_checkpoint(args.vae_checkpoint, mesh=mesh)

    os.makedirs(args.save_dir, exist_ok=True)
    episodes = sorted(v for v in os.listdir(args.episode_dir) if v.endswith(".mp4"))
    episodes = episodes[args.process_index :: args.process_count]
    latent_frames = (args.num_frames - 1) // 4 + 1

    for i, episode in enumerate(episodes):
        save_path = osp.join(args.save_dir, episode.replace(".mp4", ".npy"))
        if osp.exists(save_path) and validate_existing(save_path, latent_frames):
            continue

        frames = read_video_frames(osp.join(args.episode_dir, episode), args.fps, args.num_frames)
        x = frames.astype(np.float32) / 255.0 * 2.0 - 1.0  # [-1, 1]
        x = x.transpose(3, 0, 1, 2)[None]  # [1, 3, T, H, W]
        assert x.shape[1:] == (3, args.num_frames, 480, 720), f"unexpected geometry {x.shape}"

        posterior = np.asarray(vae.encode_first_stage(x, unregularized=True))  # [1, 32, T/4+1, 60, 90]
        out = posterior[0].transpose(1, 0, 2, 3)  # [T/4+1, 32, 60, 90]
        assert out.shape == (latent_frames, 32, 60, 90)
        np.save(save_path, out)
        print(f"[{args.process_index}] {i + 1}/{len(episodes)} {episode} -> {save_path}")


if __name__ == "__main__":
    main()
