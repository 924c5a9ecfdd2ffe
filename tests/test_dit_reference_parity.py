"""End-to-end DiT forward parity against the reference implementation.

Loads ONE set of weights into the reference's ``DiffusionTransformer``
(reference: ttt/models/cogvideo/dit.py:421-505, run on CPU with
use_kernel=False and dynamo disabled) and into this repo's DiT via an explicit
name map, then compares forward outputs at a multi-scene tiny geometry. This
turns "every subcomponent oracle-tested" into "the composition is right":
segment attention + rope + LN-target + interleave + bidirectional TTT + adaLN
+ unpatchify all in one check.
"""

import os

import numpy as np
import pytest

from tests.reference_oracle import REFERENCE_PATH, reference_available

needs_reference = pytest.mark.skipif(not reference_available(), reason="reference checkout not available")

# Tiny multi-scene geometry: 2 scenes, 5 frames (prefix 1 + 2 chunks x 2),
# 4x4 token grid, head_dim 16 != num_heads 4 (catches transposed maps).
TINY = dict(
    model_dim=64,
    num_heads=4,
    num_layers=2,
    mini_batch_size=8,
    latent_height=4,
    latent_width=4,
    compressed_num_frames=5,
    attn_length=2,
    prefix_temporal_length=1,
    text_dim=32,
    time_embed_dim=32,
    scan_checkpoint_group_size=4,
    adapter_method="sft",
)
B, SCENES, TL = 2, 2, 4  # seq = 2*4 + 5*16 = 88, divisible by CS=8


def _load_reference_dit(ssm_layer: str):
    os.environ["TORCHDYNAMO_DISABLE"] = "1"
    from tests.reference_oracle import load_reference

    load_reference()  # stubs wandb/tqdm + inserts the reference path
    import torch

    from ttt.models.configs import ModelConfig as RefModelConfig
    from ttt.models.cogvideo.dit import DiffusionTransformer as RefDiT

    cfg = RefModelConfig(ssm_layer=ssm_layer, **TINY)
    torch.manual_seed(0)
    model = RefDiT(cfg).eval()
    for mod in model.modules():
        if hasattr(mod, "use_kernel"):
            mod.use_kernel = False
    return model


def _map_ref_param(name: str, value: np.ndarray):
    """Reference named_parameter -> (our param path, converted array)."""
    parts = name.split(".")

    # layers.N.rest -> layers_N
    out = []
    i = 0
    while i < len(parts) - 1:  # all but the leaf
        p = parts[i]
        if p == "layers":
            out.append(f"layers_{parts[i + 1]}")
            i += 2
        elif p == "time_embed":
            out.append(f"time_embed_{parts[i + 1]}")
            i += 2
        elif p in ("pre_seq_adaLN_modulation", "pre_mlp_adaLN_modulation", "adaLN_modulation"):
            out.append(p)  # skip the Sequential index (SiLU at 0, Linear at 1)
            i += 2
        elif p in ("q", "k", "v", "o", "q_norm", "k_norm") and out and out[-1] == "seq_modeling_block":
            out.extend(["attention", p])  # ours nests attention projections
            i += 1
        elif p == "ttt" and out and out[-1] == "ssm":
            i += 1  # ours flattens TTTWrapper.ttt into the ssm module
        else:
            out.append(p)
            i += 1

    leaf = parts[-1]
    direct = ("gating_alpha", "W1", "b1", "W2", "b2",
              "learnable_ttt_lr_weight", "learnable_ttt_lr_bias",
              "ttt_norm_weight", "ttt_norm_bias")
    if leaf in direct or out and out[-1] in direct:
        return tuple(out) + (leaf,), value
    if leaf == "weight":
        if value.ndim == 4:  # Conv2d [O, I, kh, kw] -> [kh, kw, I, O]
            return tuple(out) + ("kernel",), value.transpose(2, 3, 1, 0)
        if value.ndim == 2:  # Linear [O, I] -> [I, O]
            return tuple(out) + ("kernel",), value.transpose(1, 0)
        return tuple(out) + ("scale",), value  # LayerNorm
    assert leaf == "bias", f"unhandled leaf {name}"
    return tuple(out) + ("bias",), value


@needs_reference
@pytest.mark.parametrize("ssm_layer", ["ttt_linear", "ttt_mlp"])
def test_full_dit_forward_matches_reference(rng, ssm_layer):
    import jax
    import jax.numpy as jnp
    import torch

    from ttt_video_dit_tpu.config.model_config import ModelConfig
    from ttt_video_dit_tpu.models.dit.dit import DiffusionTransformer

    ref = _load_reference_dit(ssm_layer)

    cfg = ModelConfig(ssm_layer=ssm_layer, use_kernel=False, dtype="float32", **TINY)
    ours = DiffusionTransformer(cfg)

    T, tok_h, tok_w = cfg.compressed_num_frames, cfg.latent_height, cfg.latent_width
    h, w = tok_h * cfg.patch_size, tok_w * cfg.patch_size
    video = rng.standard_normal((B, T, cfg.in_channels, h, w)).astype(np.float32)
    text = rng.standard_normal((B, SCENES, TL, cfg.text_dim)).astype(np.float32)
    timesteps = np.asarray([37.0, 612.0], np.float32)

    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(video), jnp.asarray(text), jnp.asarray(timesteps))
    params = jax.tree.map(np.asarray, jax.device_get(params))

    n_mapped = 0
    for name, tensor in ref.named_parameters():
        path, arr = _map_ref_param(name, tensor.detach().numpy())
        node = params["params"]
        for p in path[:-1]:
            assert p in node, f"missing module {'/'.join(path)} (from {name})"
            node = node[p]
        assert path[-1] in node, f"missing leaf {'/'.join(path)} (from {name})"
        assert node[path[-1]].shape == arr.shape, (
            f"shape mismatch {'/'.join(path)}: ours {node[path[-1]].shape} vs ref {arr.shape}"
        )
        node[path[-1]] = arr
        n_mapped += 1
    # Every one of our params must have been overwritten by a reference param.
    n_ours = len(jax.tree.leaves(params))
    assert n_mapped == n_ours, f"mapped {n_mapped} of {n_ours} params"

    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(video), torch.from_numpy(text), torch.from_numpy(timesteps)
        ).numpy()

    out = np.asarray(ours.apply(params, jnp.asarray(video), jnp.asarray(text), jnp.asarray(timesteps)))

    assert out.shape == ref_out.shape
    scale = np.abs(ref_out).max()
    np.testing.assert_allclose(out, ref_out, rtol=2e-3, atol=2e-3 * scale)
