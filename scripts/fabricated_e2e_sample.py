"""End-to-end fabricated-5B sample artifact: checkpoint -> storyboard -> mp4.

Round-4 verdict ask 6. Real CogVideoX-5B weights are unreachable here (zero
egress), so this chains the fabricated full-width pipeline end to end and
records throughput + an output checksum, proving the production sampling path
with ZERO torch on the device path (torch runs only in the offline fabrication
step, exactly like the reference's offline conversion):

  1. fabricate HF shards at REAL WIDTH (d3072, 48 heads) ->
     scripts/fabricated_conversion_check.py (the real streaming converter +
     save_pretrained; per-leaf checksums asserted inside)
  2. fabricate a full-architecture VAE decoder checkpoint (torch state_dict
     with the reference's ``decoder.*`` key space — parsed on the sampling
     side by the native C++ .pt loader, models/vae/autoencoder.py:
     load_torch_vae_checkpoint)
  3. run the REAL sample.py on the TPU: storyboard JSON -> T5-less smoke
     conditioning -> 50-step DPM++(2M) ZeroSNR denoise -> native VAE decode
     -> mp4/npz, from the converted checkpoint
  4. record evals/s + output checksum into docs/fabricated_e2e_sample.json

Depth is reduced to fit ONE v5e-16GB (--layers, default 12): 42 L x d3072
is 14.5 GB of bf16 params alone — the 3 s stage samples single-chip only on
95 GB-class hardware (the reference samples on 80 GB H100s; our pod-scale
fit rows live in docs/performance.md). Width, head count, kernels, sampler,
VAE and checkpoint format are all the production 5B configuration.
Match: /root/reference/sample.py:57-99.

Usage:  python scripts/fabricated_e2e_sample.py [--layers 12] [--steps 50]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
import zlib

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def fabricate_vae(path: str) -> int:
    """Reference-shaped VAE decoder checkpoint (decoder.* torch state_dict)
    at the FULL CogVideoX architecture (ch=128, ch_mult (1,2,2,4), 3 res
    blocks, z=16 — config/model_config.py:VaeModelConfig), weights from the
    reference module's own init. Returns the tensor count."""
    import torch

    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    from tests.reference_oracle import REFERENCE_PATH, load_reference

    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    load_reference()
    import torch.distributed
    import ttt.models.vae.cp_enc_dec as ref_vae

    ref_vae.get_context_parallel_group = lambda: None
    ref_vae.get_context_parallel_rank = lambda: 0
    ref_vae.get_context_parallel_group_rank = lambda: 0
    ref_vae.get_context_parallel_world_size = lambda: 1
    if not torch.distributed.is_initialized():
        torch.distributed.get_rank = lambda *a, **k: 0
        torch.distributed.get_world_size = lambda *a, **k: 1

    from ttt_video_dit_tpu.config.model_config import VaeModelConfig

    cfg = VaeModelConfig.get_decoder_config()
    torch.manual_seed(7)
    dec = ref_vae.ContextParallelDecoder3D(cfg, temporal_compress_times=4)
    sd = {f"decoder.{k}": v for k, v in dec.state_dict().items()}
    torch.save({"state_dict": sd}, path)
    return len(sd)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=12)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--workdir", default="/tmp/fab5b_e2e")
    ap.add_argument("--image-height", type=int, default=256)
    ap.add_argument("--image-width", type=int, default=384)
    ap.add_argument("--json-out", default=os.path.join(REPO, "docs", "fabricated_e2e_sample.json"))
    ap.add_argument("--platform", default=None, help="force sample.py backend (cpu for smoke)")
    args = ap.parse_args()

    report = {"layers": args.layers, "dim": 3072, "heads": 48,
              "image": f"{args.image_height}x{args.image_width}",
              "denoise_steps": args.steps}

    # --- 1. DiT checkpoint via the real streaming converter ---------------
    conv_dir = os.path.join(args.workdir, "converted")
    if not os.path.isdir(conv_dir):
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, "scripts/fabricated_conversion_check.py",
             "--layers", str(args.layers), "--dim", "3072",
             "--workdir", args.workdir, "--keep"],
            cwd=REPO, capture_output=True, text=True, timeout=10800,
        )
        print(proc.stdout[-2000:])
        assert proc.returncode == 0, f"conversion failed:\n{proc.stderr[-3000:]}"
        conv_report = json.loads(proc.stdout.strip().splitlines()[-1])
        report["convert"] = {k: conv_report[k] for k in
                             ("hf_tensors", "hf_gib", "mapped", "peak_rss_gib", "ok")}
        report["convert_s"] = round(time.time() - t0, 1)

    # --- 2. VAE checkpoint -------------------------------------------------
    vae_path = os.path.join(args.workdir, "vae.pt")
    if not os.path.exists(vae_path):
        t0 = time.time()
        report["vae_tensors"] = fabricate_vae(vae_path)
        report["vae_fabricate_s"] = round(time.time() - t0, 1)
        print(f"fabricated VAE decoder: {report['vae_tensors']} tensors "
              f"({os.path.getsize(vae_path) / 1024**3:.2f} GiB)", flush=True)

    # --- 3. sample.py on the TPU -------------------------------------------
    out_dir = os.path.join(args.workdir, "out")
    lat_h = args.image_height // 16  # VAE 8x + patch 2 -> model token grid
    lat_w = args.image_width // 16
    # seq = txt + 13*lat_h*lat_w must divide the eval TTT mini-batch (16).
    txt = 496
    assert (txt + 13 * lat_h * lat_w) % 16 == 0
    cmd = [sys.executable, "sample.py",
           "--job.config_file", "configs/eval/ttt-mlp/3s.toml",
           "--eval.input_file", "inputs/example.json",
           "--checkpoint.init_state_dir", conv_dir,
           "--eval.vae_checkpoint_path", vae_path,
           "--model.num_layers", str(args.layers),
           "--model.latent_height", str(lat_h), "--model.latent_width", str(lat_w),
           "--eval.image_height", str(args.image_height),
           "--eval.image_width", str(args.image_width),
           "--eval.txt_maxlen", str(txt),
           "--eval.num_denoising_steps", str(args.steps),
           "--eval.output_dir", out_dir,
           "--job.dump_folder", os.path.join(args.workdir, "dump")]
    if args.platform:
        cmd += ["--job.platform", args.platform]
    print("running:", " ".join(cmd), flush=True)
    t0 = time.time()
    proc = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True, timeout=10800)
    wall = time.time() - t0
    print(proc.stdout[-1500:])
    assert proc.returncode == 0, f"sample.py failed:\nstdout:{proc.stdout[-2000:]}\nstderr:{proc.stderr[-3000:]}"
    report["sample_wall_s"] = round(wall, 1)
    report["evals"] = args.steps + 1

    outs = sorted(os.listdir(out_dir))
    assert outs, "sample.py produced no output"
    out_path = os.path.join(out_dir, outs[0])
    with open(out_path, "rb") as fh:
        crc = zlib.crc32(fh.read())
    report["output"] = outs[0]
    report["output_bytes"] = os.path.getsize(out_path)
    report["output_crc32"] = f"{crc:08x}"
    # Wall time includes the cold jit compile through the tunnel; the pure
    # denoise rate is bench.py --mode sample's job. Still record the ratio.
    report["evals_per_s_incl_compile"] = round(report["evals"] / wall, 3)

    with open(args.json_out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
