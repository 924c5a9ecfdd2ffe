"""Full-scale fabricated weight-conversion run.

Real CogVideoX-5b weights are unreachable in this environment (zero egress),
so this fabricates an HF transformer checkpoint at the TRUE 5B dimensions —
exact tensor names and shapes the reference converter consumes
(reference: ttt/models/cogvideo/weight_conversion/from_hf.py:36-133; the name
space is cross-checked against the reference source by AST in
tests/test_reference_keymap.py) — and streams it through the real pipeline:

    fabricate shards -> convert_hf_checkpoint -> save_pretrained
        -> load_pretrained (unrolled layout)
        -> load_pretrained (scan-stacked layout)

asserting per-leaf checksums across every hop and recording peak RSS (the
conversion streams one tensor at a time, so peak ~= one param pytree).

Usage:
    python scripts/fabricated_conversion_check.py [--layers 42] [--dim 3072] \
        [--workdir /tmp/fab5b] [--keep]

Takes ~10-20 min at full 5B scale on one CPU core; --layers/--dim shrink it
for smoke runs (the CI test runs a reduced geometry, see
tests/test_conversion_and_checkpoint.py).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import resource
import shutil
import sys
import time
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def hf_key_space(num_layers: int, D: int, text_dim: int, time_embed: int,
                 in_ch: int, out_ch: int, head_dim: int):
    """The HF CogVideoX transformer tensor names + shapes our converter maps
    (same table the keymap cross-check test derives from the reference
    converter source)."""
    TE = time_embed
    glob_keys = {
        "patch_embed.proj.weight": (D, in_ch, 2, 2),
        "patch_embed.proj.bias": (D,),
        "patch_embed.text_proj.weight": (D, text_dim),
        "patch_embed.text_proj.bias": (D,),
        "norm_final.weight": (D,),
        "norm_final.bias": (D,),
        "norm_out.norm.weight": (D,),
        "norm_out.norm.bias": (D,),
        "norm_out.linear.weight": (2 * D, TE),
        "norm_out.linear.bias": (2 * D,),
        "proj_out.weight": (2 * 2 * out_ch, D),
        "proj_out.bias": (2 * 2 * out_ch,),
        "time_embedding.linear_1.weight": (TE, D),
        "time_embedding.linear_1.bias": (TE,),
        "time_embedding.linear_2.weight": (TE, TE),
        "time_embedding.linear_2.bias": (TE,),
    }
    per_layer = {
        "attn1.norm_q.weight": (head_dim,),
        "attn1.norm_q.bias": (head_dim,),
        "attn1.norm_k.weight": (head_dim,),
        "attn1.norm_k.bias": (head_dim,),
        "attn1.to_q.weight": (D, D),
        "attn1.to_q.bias": (D,),
        "attn1.to_k.weight": (D, D),
        "attn1.to_k.bias": (D,),
        "attn1.to_v.weight": (D, D),
        "attn1.to_v.bias": (D,),
        "attn1.to_out.0.weight": (D, D),
        "attn1.to_out.0.bias": (D,),
        "ff.net.0.proj.weight": (4 * D, D),
        "ff.net.0.proj.bias": (4 * D,),
        "ff.net.2.weight": (D, 4 * D),
        "ff.net.2.bias": (D,),
        "norm1.linear.weight": (6 * D, TE),
        "norm1.linear.bias": (6 * D,),
        "norm1.norm.weight": (D,),
        "norm1.norm.bias": (D,),
        "norm2.linear.weight": (6 * D, TE),
        "norm2.linear.bias": (6 * D,),
        "norm2.norm.weight": (D,),
        "norm2.norm.bias": (D,),
    }
    keys = dict(glob_keys)
    for i in range(num_layers):
        for name, shape in per_layer.items():
            keys[f"transformer_blocks.{i}.{name}"] = shape
    return keys


def fabricate_shards(hf_dir: str, keys: dict, shard_gib: float = 2.0, seed: int = 0) -> int:
    """Write the fabricated checkpoint as fp16 safetensors shards (HF ships
    multiple ~2-5 GB shards; streaming one shard at a time bounds RSS)."""
    import numpy as np
    from safetensors.numpy import save_file

    os.makedirs(hf_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    shard, shard_bytes, shard_idx, total = {}, 0, 0, 0

    def flush():
        nonlocal shard, shard_bytes, shard_idx
        if shard:
            save_file(shard, os.path.join(hf_dir, f"model-{shard_idx:05d}.safetensors"))
            shard_idx += 1
            shard, shard_bytes = {}, 0

    for key, shape in keys.items():
        arr = (rng.standard_normal(shape) * 0.02).astype(np.float16)
        shard[key] = arr
        shard_bytes += arr.nbytes
        total += arr.nbytes
        if shard_bytes >= shard_gib * 1024**3:
            flush()
    flush()
    return total


def _leaf_checksums(tree):
    import jax
    import numpy as np

    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        out[key] = zlib.crc32(np.ascontiguousarray(np.asarray(leaf)).tobytes())
    return out


def rss_gib() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024**2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=42)
    ap.add_argument("--dim", type=int, default=3072)
    ap.add_argument("--workdir", default="/tmp/fab5b")
    ap.add_argument("--keep", action="store_true", help="keep the workdir artifacts")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from ttt_video_dit_tpu.config.model_config import ModelConfig
    from ttt_video_dit_tpu.models.dit.diffusion import CogVideoX
    from ttt_video_dit_tpu.models.dit.from_hf import convert_hf_checkpoint
    from ttt_video_dit_tpu.training.checkpoint import Checkpointer, save_pretrained
    from ttt_video_dit_tpu.training.setup import init_params

    cfg = ModelConfig.get_preset("5B", "3sec")
    cfg.num_layers = args.layers
    cfg.model_dim = args.dim
    cfg.num_heads = max(1, args.dim // 64)
    cfg.adapter_method = "sft"
    heads = cfg.num_heads

    hf_dir = os.path.join(args.workdir, "hf")
    ckpt_dir = os.path.join(args.workdir, "converted")
    shutil.rmtree(args.workdir, ignore_errors=True)

    report = {"layers": args.layers, "dim": args.dim}
    t0 = time.time()
    keys = hf_key_space(args.layers, args.dim, cfg.text_dim, cfg.time_embed_dim,
                        cfg.in_channels, cfg.out_channels, cfg.head_dim)
    nbytes = fabricate_shards(hf_dir, keys)
    report["hf_tensors"] = len(keys)
    report["hf_gib"] = round(nbytes / 1024**3, 2)
    report["fabricate_s"] = round(time.time() - t0, 1)
    print(f"fabricated {len(keys)} tensors, {report['hf_gib']} GiB fp16", flush=True)

    t0 = time.time()
    model = CogVideoX(cfg)
    params = init_params(model, cfg, mesh=None, rng=jax.random.PRNGKey(0))
    params, n_mapped = convert_hf_checkpoint(hf_dir, params)
    assert n_mapped == len(keys), f"mapped {n_mapped} of {len(keys)} fabricated tensors"
    ref_sums = _leaf_checksums(params)
    report["convert_s"] = round(time.time() - t0, 1)
    report["mapped"] = n_mapped
    report["rss_after_convert_gib"] = round(rss_gib(), 2)
    print(f"converted ({n_mapped} mapped), RSS {report['rss_after_convert_gib']} GiB", flush=True)

    t0 = time.time()
    save_pretrained(ckpt_dir, params)
    report["save_s"] = round(time.time() - t0, 1)

    # --- load back, unrolled layout ---
    t0 = time.time()
    abstract = jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params)
    restored = Checkpointer(args.workdir).load_pretrained(ckpt_dir, abstract)
    got = _leaf_checksums(restored)
    assert got == ref_sums, "unrolled restore: per-leaf checksum mismatch"
    n_leaves = len(got)
    del restored, got
    report["load_unrolled_s"] = round(time.time() - t0, 1)
    print(f"unrolled load OK ({n_leaves} leaves, checksums equal)", flush=True)

    # --- load into the scan-stacked layout ---
    t0 = time.time()
    cfg_scan = dataclasses.replace(cfg, scan_layers=True)
    model_s = CogVideoX(cfg_scan)
    abstract_s = jax.eval_shape(
        lambda r: init_params(model_s, cfg_scan, mesh=None, rng=r), jax.random.PRNGKey(0)
    )
    abstract_s = jax.tree.map(lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype), abstract_s)
    restored_s = Checkpointer(args.workdir).load_pretrained(ckpt_dir, abstract_s)
    # Spot-check the stacked tensors against the unrolled source per layer.
    # The scan model's attention params are bf16 (5B preset dtype), so Orbax
    # casts the f32 checkpoint on restore — compare after the same cast.
    stacked = restored_s["params"]["dit"]["scan_layers"]["scan"]["layer"]
    src_layers = params["params"]["dit"]
    for i in (0, args.layers // 2, args.layers - 1):
        a = np.asarray(stacked["seq_modeling_block"]["attention"]["q"]["kernel"][i])
        b = np.asarray(src_layers[f"layers_{i}"]["seq_modeling_block"]["attention"]["q"]["kernel"])
        assert a.tobytes() == b.astype(a.dtype).tobytes(), f"scan-stacked layer {i} mismatch"
    report["load_scan_s"] = round(time.time() - t0, 1)
    report["peak_rss_gib"] = round(rss_gib(), 2)
    report["n_leaves"] = n_leaves
    report["ok"] = True
    print(json.dumps(report), flush=True)

    if not args.keep:
        shutil.rmtree(args.workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
