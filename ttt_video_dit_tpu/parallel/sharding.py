"""Parameter partition rules: param path -> PartitionSpec over the global mesh.

Replaces the reference's per-module DTensor/FSDP wrapping
(reference: ttt/infra/parallelisms.py:92-175) with declarative path rules:

- FSDP (ZeRO-3): every large tensor is sharded over the ``fsdp`` axis; XLA
  inserts the all-gather (forward/backward) and reduce-scatter (grad) exactly
  like FSDP2's per-layer ``fully_shard``.
- TP: attention/TTT projections are additionally sharded over ``tensor`` on
  the head-structured dim, mirroring the reference's Colwise q/k/v/o plan
  (parallelisms.py:106-152); TTT fast-weight states/norms shard on the head
  axis (ttt_layer.py:351-358, 418-427).
- HSDP: the ``replica`` axis never appears in param specs -> params replicated
  across it, gradients all-reduced over it by GSPMD (= FSDP2 hybrid shard).

Rules are first-match-wins regexes over 'a/b/c' param paths. Any axis whose
mesh size does not divide the corresponding dim is dropped (so tiny debug
models still shard what they can).
"""

from __future__ import annotations

import re
from typing import Optional, Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ttt_video_dit_tpu.parallel.mesh import FSDP, TENSOR
from ttt_video_dit_tpu.training.optimizer import path_str

# (regex over path, spec entries per dim). None entries = replicated dims.
PARAM_RULES: Sequence[Tuple[str, Tuple]] = (
    # Attention projections: q/k/v colwise (out dim = heads), o rowwise-style
    # (in dim = heads). kernels are [in, out].
    (r"attention/(q|k|v)/kernel$", (FSDP, TENSOR)),
    (r"attention/o/kernel$", (TENSOR, FSDP)),
    # TTT projections (reference: Colwise wq/wk/wv, Colwise wo).
    (r"ssm/(wq|wk|wv)/kernel$", (FSDP, TENSOR)),
    (r"ssm/wo/kernel$", (TENSOR, FSDP)),
    # TTT fast-weight states / norms / lr gate: sharded on the head axis.
    (r"ssm/(W1|W2)$", (TENSOR, None, None)),
    (r"ssm/(b1|b2)$", (TENSOR, None, None)),
    (r"ssm/ttt_norm_(weight|bias)$", (TENSOR, None)),
    (r"ssm/learnable_ttt_lr_weight$", (TENSOR, None, None)),
    (r"ssm/learnable_ttt_lr_bias$", (TENSOR, None)),
    # MLP: weights replicated over tensor (sequence-parallel MLP, reference:
    # dit.py:56-72) but sharded over fsdp.
    (r"mlp/layer1/kernel$", (FSDP, None)),
    (r"mlp/layer2/kernel$", (None, FSDP)),
    # adaLN / time embed: shard the INPUT dim over fsdp. Out-dim sharding
    # (None, FSDP) made the modulation outputs/grads feature-sharded while
    # the token-broadcast side keeps them batch-sharded, and GSPMD could not
    # convert between the two tilings (transposed device order) without an
    # "Involuntary full rematerialization" replicate-and-reslice on every
    # layer's adaLN grad concat. In-dim sharding contracts the grad einsum
    # over the batch dim both operands already shard — no reshard at all.
    (r"(adaLN_modulation|pre_seq_adaLN_modulation|pre_mlp_adaLN_modulation)/kernel$", (FSDP, None)),
    (r"patch_embedding/vid_proj/kernel$", (None, None, None, FSDP)),
    (r"patch_embedding/text_proj/kernel$", (FSDP, None)),
    (r"time_embed_\d/kernel$", (FSDP, None)),
    (r"final_layer/linear/kernel$", (FSDP, None)),
    # Everything else (biases, LN affines, gates): replicated.
)


def _spec_for(path: str, shape: Tuple[int, ...], mesh: Mesh) -> P:
    entries: Optional[Tuple] = None
    for pattern, spec in PARAM_RULES:
        if re.search(pattern, path):
            entries = spec
            break
    if entries is None:
        # Default: shard the largest dim over fsdp if divisible and big.
        if shape and max(shape) >= 1024:
            axis = int(max(range(len(shape)), key=lambda i: shape[i]))
            entries = tuple(FSDP if i == axis else None for i in range(len(shape)))
        else:
            return P()

    if len(entries) == len(shape) - 1:
        # scan-over-layers stacks params with a leading layer dim; keep the
        # per-layer rule and leave the layer dim unsharded.
        entries = (None,) + tuple(entries)
    if len(entries) != len(shape):
        return P()

    # Drop axes that don't divide the dim (tiny models, odd head counts).
    cleaned = []
    for dim, ax in zip(shape, entries):
        if ax is None or ax not in mesh.axis_names or mesh.shape[ax] <= 1 or dim % mesh.shape[ax] != 0:
            cleaned.append(None)
        else:
            cleaned.append(ax)
    return P(*cleaned)


def param_shardings(params, mesh: Mesh):
    """NamedSharding pytree for a param pytree."""
    return jax.tree_util.tree_map_with_path(
        lambda p, x: NamedSharding(mesh, _spec_for(path_str(p), getattr(x, "shape", ()), mesh)), params
    )


def shard_params(params, mesh: Mesh):
    """Device-put a host param pytree onto the mesh with the rule shardings."""
    shardings = param_shardings(params, mesh)
    return jax.tree.map(lambda x, s: jax.device_put(x, s), params, shardings)
