"""Cross-checks both weight converters against the reference converter itself.

The environment has zero egress, so no real CogVideoX-5b safetensors or VAE
.pt checkpoint can pass through the loaders. These tests close the silent
key-map-drift risk instead:

- The HF key fixture is derived *from the reference converter's own source*
  (reference: ttt/models/cogvideo/weight_conversion/from_hf.py:36-133): every
  `"<hf pattern>" in key -> state_dict["<target>"]` pair is extracted by AST,
  expanded over the full 5B layer name space (42 layers, reduced dims), run
  through our ``map_hf_tensor``, and the resulting path is asserted equal,
  name-for-name, to the translation of the reference's target module name.
  If either map drifts, the test fails.
- The VAE loader is exercised with the reference VAE modules' *actual*
  ``state_dict()`` key list saved as a real torch checkpoint file, and every
  converted leaf is asserted to land on our Encoder3D/Decoder3D param tree.
"""

import ast
import os

import jax
import numpy as np
import pytest

from tests.reference_oracle import REFERENCE_PATH, reference_available
from ttt_video_dit_tpu.models.dit.from_hf import map_hf_tensor

needs_reference = pytest.mark.skipif(not reference_available(), reason="reference checkout not available")

_REF_CONVERTER = os.path.join(REFERENCE_PATH, "ttt", "models", "cogvideo", "weight_conversion", "from_hf.py")


def _reference_key_pairs():
    """Extract (hf_pattern, target_template) pairs from the reference
    converter source. Per-layer targets use the placeholder ``{L}``."""
    with open(_REF_CONVERTER, "r", encoding="utf-8") as f:
        tree = ast.parse(f.read())

    pairs = []
    for node in ast.walk(tree):
        if not isinstance(node, ast.If):
            continue
        t = node.test
        if not (
            isinstance(t, ast.Compare)
            and isinstance(t.left, ast.Constant)
            and isinstance(t.left.value, str)
            and len(t.ops) == 1
            and isinstance(t.ops[0], ast.In)
        ):
            continue
        body0 = node.body[0]
        if not (isinstance(body0, ast.Assign) and isinstance(body0.targets[0], ast.Subscript)):
            continue
        sub = body0.targets[0]
        if getattr(sub.value, "id", "") != "state_dict":
            continue
        sl = sub.slice
        if isinstance(sl, ast.Constant):
            target = sl.value
        elif isinstance(sl, ast.JoinedStr):
            target = "".join(
                v.value if isinstance(v, ast.Constant) else "{L}" for v in sl.values
            )
        else:  # pragma: no cover - unexpected converter structure
            continue
        pairs.append((t.left.value, target))
    return pairs


def _translate_ref_target(name: str) -> tuple:
    """Translate a reference module path ("dit.layers.3.seq_modeling_block.q
    .weight") into our flax param path — the fixed, documented naming
    correspondence between the two frameworks."""
    parts = name.split(".")
    out = ["params"]
    i = 0
    while i < len(parts):
        p = parts[i]
        if p == "layers":  # torch ModuleList index -> flax layers_{i}
            out.append(f"layers_{parts[i + 1]}")
            i += 2
        elif p == "time_embed":  # torch Sequential index -> time_embed_{i}
            out.append(f"time_embed_{parts[i + 1]}")
            i += 2
        elif p.endswith("adaLN_modulation") and i + 1 < len(parts) and parts[i + 1] == "1":
            # reference wraps the linear in nn.Sequential(SiLU, Linear)
            out.append(p)
            i += 2
        elif p == "seq_modeling_block" and parts[i + 1] in ("q", "k", "v", "o", "q_norm", "k_norm"):
            # our attention projections live one module deeper
            out.extend([p, "attention"])
            i += 1
        elif i == len(parts) - 1 and p == "weight":
            mod = out[-1]
            is_norm = "norm" in mod.lower() and "adaln" not in mod.lower()
            out.append("scale" if is_norm else "kernel")
            i += 1
        else:
            out.append(p)
            i += 1
    return tuple(out)


def _hf_shape(pattern: str, cfg) -> tuple:
    """Fabricated HF tensor shape for a pattern at reduced dims."""
    D, TD, TE, F = cfg.model_dim, cfg.text_dim, cfg.time_embed_dim, cfg.head_dim
    table = {
        "patch_embed.proj.weight": (D, cfg.in_channels, 2, 2),
        "patch_embed.proj.bias": (D,),
        "patch_embed.text_proj.weight": (D, TD),
        "patch_embed.text_proj.bias": (D,),
        "norm_final.weight": (D,),
        "norm_final.bias": (D,),
        "norm_out.norm.weight": (D,),
        "norm_out.norm.bias": (D,),
        "norm_out.linear.weight": (2 * D, TE),
        "norm_out.linear.bias": (2 * D,),
        "proj_out.weight": (2 * 2 * cfg.out_channels, D),
        "proj_out.bias": (2 * 2 * cfg.out_channels,),
        "time_embedding.linear_1.weight": (TE, D),
        "time_embedding.linear_1.bias": (TE,),
        "time_embedding.linear_2.weight": (TE, TE),
        "time_embedding.linear_2.bias": (TE,),
        "attn1.norm_q.weight": (F,),
        "attn1.norm_q.bias": (F,),
        "attn1.norm_k.weight": (F,),
        "attn1.norm_k.bias": (F,),
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
    if pattern in table:
        return table[pattern]
    if pattern.startswith("attn1.to_"):
        return (D, D) if pattern.endswith("weight") else (D,)
    raise AssertionError(f"unknown HF pattern from reference converter: {pattern}")


@needs_reference
def test_hf_keymap_matches_reference_converter():
    """Every HF key the reference converter maps must be mapped here too,
    onto the name-for-name corresponding module path, over the full 5B layer
    name space (42 layers)."""
    import jax.numpy as jnp

    from tests.test_dit import tiny_config
    from ttt_video_dit_tpu.models.dit.diffusion import CogVideoX

    pairs = _reference_key_pairs()
    # 16 top-level + 24 per-layer patterns in the reference converter; a
    # parse failure (e.g. converter refactor) must fail loudly, not skip.
    assert len(pairs) >= 40, f"only parsed {len(pairs)} key pairs from {_REF_CONVERTER}"

    num_layers = 42  # reference: ttt/models/configs.py:63-68 (5B preset)
    cfg = tiny_config(num_layers=num_layers)
    model = CogVideoX(cfg)
    # eval_shape: the full 42-layer name space without allocating/computing.
    B = 1
    vid = jnp.zeros((B, 13, cfg.in_channels, 8, 8), jnp.float32)
    text = jnp.zeros((B, 1, 8, cfg.text_dim), jnp.float32)
    bounds = (jnp.zeros((B,), jnp.int32), jnp.full((B,), 1000, jnp.int32))
    params = jax.eval_shape(model.init, jax.random.PRNGKey(0), vid, text, jax.random.PRNGKey(1), bounds)

    n_checked = 0
    for pattern, target in pairs:
        if "{L}" in target:
            cases = [
                (f"transformer_blocks.{L}.{pattern}", target.replace("{L}", str(L)))
                for L in range(num_layers)
            ]
        else:
            cases = [(pattern, target)]
        for hf_key, ref_name in cases:
            mapped = map_hf_tensor(hf_key, np.zeros(_hf_shape(pattern, cfg), np.float32))
            assert mapped is not None, f"reference maps {hf_key!r}; our map drops it"
            path, arr = mapped
            expected = _translate_ref_target(ref_name)
            assert path == expected, (
                f"key-map drift at {hf_key!r}: ours {path} vs reference-derived {expected}"
            )
            node = params
            for p in path[:-1]:
                assert p in node, f"{hf_key}: missing node {p} of {path}"
                node = node[p]
            assert path[-1] in node, f"{hf_key}: missing leaf {path}"
            assert node[path[-1]].shape == arr.shape, (
                f"{hf_key}: param {node[path[-1]].shape} vs converted {arr.shape}"
            )
            n_checked += 1
    # 16 top-level + 42 layers x 24 per-layer keys
    assert n_checked == 16 + num_layers * 24


@needs_reference
def test_vae_loader_covers_reference_checkpoint_keys(tmp_path, rng):
    """load_torch_vae_checkpoint must convert the reference VAE's actual
    state_dict key list (saved as a real torch checkpoint) onto our
    Encoder3D/Decoder3D param trees leaf-for-leaf."""
    import torch

    from tests.test_vae import _load_reference_vae_modules, tiny_vae_config
    from ttt_video_dit_tpu.models.vae.autoencoder import load_torch_vae_checkpoint
    from ttt_video_dit_tpu.models.vae.enc_dec import Decoder3D, Encoder3D

    ref_vae = _load_reference_vae_modules()
    cfg = tiny_vae_config(gather_norm=False)

    torch.manual_seed(0)
    ref_enc = ref_vae.ContextParallelEncoder3D(cfg, temporal_compress_times=2)
    ref_dec = ref_vae.ContextParallelDecoder3D(cfg, temporal_compress_times=2)

    sd = {}
    for prefix, module in (("encoder.", ref_enc), ("decoder.", ref_dec)):
        for key, tensor in module.state_dict().items():
            sd[prefix + key] = tensor
    assert len(sd) > 50  # the real key list, not a stub
    ckpt = tmp_path / "vae.pt"
    torch.save({"state_dict": sd}, ckpt)

    enc_tree, dec_tree = load_torch_vae_checkpoint(str(ckpt))

    import jax.numpy as jnp

    def assert_covers(tree, module, frames, in_ch):
        x = jnp.zeros((1, frames, 32, 32, in_ch))
        # `first` must stay a static python bool -> close over it.
        variables = jax.eval_shape(lambda k, a: module.init(k, a, True), jax.random.PRNGKey(0), x)
        want = variables["params"]
        got_leaves = jax.tree.leaves_with_path(tree)
        want_paths = {jax.tree_util.keystr(p): l.shape for p, l in jax.tree.leaves_with_path(want)}
        assert len(got_leaves) == len(want_paths), (
            f"{len(got_leaves)} converted leaves vs {len(want_paths)} params"
        )
        for p, leaf in got_leaves:
            key = jax.tree_util.keystr(p)
            assert key in want_paths, f"converted leaf {key} has no target param"
            assert want_paths[key] == leaf.shape, f"{key}: {want_paths[key]} vs {leaf.shape}"

    assert_covers(enc_tree, Encoder3D(cfg, temporal_compress_times=2), 5, 3)
    assert_covers(dec_tree, Decoder3D(cfg, temporal_compress_times=2), 2, cfg.z_channels)
