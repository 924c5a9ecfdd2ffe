"""HF CogVideoX-5b safetensors -> our flax param pytree.

Counterpart of the reference's weight converter
(reference: ttt/models/cogvideo/weight_conversion/from_hf.py:13-148): the same
explicit key map from diffusers' `transformer_blocks.*` names onto our module
tree, with torch->flax tensor transposes. TTT-layer parameters are left at
their fresh initialization (the reference loads strict=False for the same
reason). Output is written with orbax as a params-only checkpoint that
``Checkpointer.load_pretrained`` consumes.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np


def _set(tree: Dict, path: tuple, value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def map_hf_tensor(key: str, value: np.ndarray):
    """Map one HF tensor name to (our param path, converted array) or None."""
    lin = lambda v: v.transpose(1, 0)  # torch Linear [O, I] -> [I, O]

    base = ("params", "dit")
    if "patch_embed.proj.weight" in key:  # [D, C, 2, 2] -> [2, 2, C, D]
        return base + ("patch_embedding", "vid_proj", "kernel"), value.transpose(2, 3, 1, 0)
    if "patch_embed.proj.bias" in key:
        return base + ("patch_embedding", "vid_proj", "bias"), value
    if "patch_embed.text_proj.weight" in key:
        return base + ("patch_embedding", "text_proj", "kernel"), lin(value)
    if "patch_embed.text_proj.bias" in key:
        return base + ("patch_embedding", "text_proj", "bias"), value

    if "norm_final.weight" in key:
        return base + ("transformer_norm", "scale"), value
    if "norm_final.bias" in key:
        return base + ("transformer_norm", "bias"), value

    if "norm_out.norm.weight" in key:
        return base + ("final_layer", "norm", "scale"), value
    if "norm_out.norm.bias" in key:
        return base + ("final_layer", "norm", "bias"), value
    if "norm_out.linear.weight" in key:
        return base + ("final_layer", "adaLN_modulation", "kernel"), lin(value)
    if "norm_out.linear.bias" in key:
        return base + ("final_layer", "adaLN_modulation", "bias"), value
    if "proj_out.weight" in key:
        return base + ("final_layer", "linear", "kernel"), lin(value)
    if "proj_out.bias" in key:
        return base + ("final_layer", "linear", "bias"), value

    if "time_embedding.linear_1.weight" in key:
        return base + ("time_embed_0", "kernel"), lin(value)
    if "time_embedding.linear_1.bias" in key:
        return base + ("time_embed_0", "bias"), value
    if "time_embedding.linear_2.weight" in key:
        return base + ("time_embed_2", "kernel"), lin(value)
    if "time_embedding.linear_2.bias" in key:
        return base + ("time_embed_2", "bias"), value

    if "transformer_blocks" in key:
        layer = key.split(".")[1]
        L = base + (f"layers_{layer}",)
        blk = L + ("seq_modeling_block",)
        attn = blk + ("attention",)

        table = {
            "attn1.norm_q": attn + ("q_norm",),
            "attn1.norm_k": attn + ("k_norm",),
            "attn1.to_q": attn + ("q",),
            "attn1.to_k": attn + ("k",),
            "attn1.to_v": attn + ("v",),
            "attn1.to_out.0": attn + ("o",),
            "ff.net.0.proj": L + ("mlp", "layer1"),
            "ff.net.2": L + ("mlp", "layer2"),
            "norm1.linear": L + ("pre_seq_adaLN_modulation",),
            "norm1.norm": L + ("pre_seq_layernorm",),
            "norm2.linear": L + ("pre_mlp_adaLN_modulation",),
            "norm2.norm": L + ("pre_mlp_layernorm",),
        }
        for hf_name, path in table.items():
            if f".{hf_name}.weight" in key:
                if "norm" in hf_name.split(".")[-1] or hf_name.endswith("norm"):
                    # LayerNorms: weight -> scale, no transpose.
                    if hf_name in ("attn1.norm_q", "attn1.norm_k", "norm1.norm", "norm2.norm"):
                        return path + ("scale",), value
                return path + ("kernel",), lin(value)
            if f".{hf_name}.bias" in key:
                return path + ("bias",), value
    return None


def _iter_hf_tensors(hf_dir: str):
    """Stream (key, np.ndarray) pairs from a safetensors shard directory —
    ONE tensor materialized at a time, so converting a 10 GB checkpoint
    costs the target pytree plus a single tensor of headroom, never the
    whole source (the reference torch.load's all-at-once state dict is the
    anti-pattern here; reference from_hf.py:36-133)."""
    import glob

    files = sorted(glob.glob(os.path.join(hf_dir, "*.safetensors")))
    assert files, f"no safetensors under {hf_dir}"
    # Pick the backend up front (a mid-stream fallback would re-yield
    # tensors): numpy unless unavailable or the shard holds bf16.
    use_np = True
    try:
        from safetensors.numpy import safe_open as np_open  # type: ignore

        with np_open(files[0], framework="np") as f:
            first = next(iter(f.keys()), None)
            if first is not None:
                f.get_tensor(first)
    except Exception:
        use_np = False

    if use_np:
        for fn in files:
            with np_open(fn, framework="np") as f:
                for key in f.keys():
                    yield key, f.get_tensor(key)
    else:
        import torch
        from safetensors import safe_open  # torch path handles bf16 shards

        for fn in files:
            with safe_open(fn, framework="pt", device="cpu") as f:
                for key in f.keys():
                    yield key, f.get_tensor(key).to(torch.float32).numpy()


def convert_hf_checkpoint(hf_dir: str, init_params, dtype=np.float32):
    """Overlay HF CogVideoX weights onto an initialized param pytree (TTT
    params keep their init). Returns the updated (plain-dict) pytree.
    Source tensors are streamed shard-by-shard (see _iter_hf_tensors)."""
    import jax

    params = jax.tree.map(np.asarray, jax.device_get(init_params))
    # unfreeze to plain dicts
    params = jax.tree_util.tree_map(lambda x: x, params)

    n_mapped = 0
    for key, value in _iter_hf_tensors(hf_dir):
        mapped = map_hf_tensor(key, value.astype(dtype))
        if mapped is None:
            continue
        path, arr = mapped
        # Validate against the existing leaf shape.
        node = params
        for p in path[:-1]:
            node = node[p]
        assert path[-1] in node, f"target leaf missing: {'/'.join(path)}"
        assert node[path[-1]].shape == arr.shape, (
            f"shape mismatch at {'/'.join(path)}: {node[path[-1]].shape} vs {arr.shape}"
        )
        node[path[-1]] = np.ascontiguousarray(arr)
        n_mapped += 1
    return params, n_mapped
