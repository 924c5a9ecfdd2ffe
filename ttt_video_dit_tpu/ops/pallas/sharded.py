"""shard_map dispatch for the Pallas TTT kernels under a multi-chip mesh.

GSPMD has no partitioning rule for ``pallas_call`` — without this wrapper a
sharded input would be all-gathered and the kernel run replicated on every
chip. The TTT scan is embarrassingly parallel over (batch, heads), exactly how
the reference runs its kernels per TP shard (reference:
ttt/models/ssm/linear_triton.py:268-307 local_map placements), so we shard_map
over the data axes (batch dim) and the tensor axis (head dim) and run the
kernel per shard, no collectives needed.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
from jax.sharding import Mesh, PartitionSpec as P

from ttt_video_dit_tpu.parallel.mesh import FSDP, REPLICA, TENSOR, current_mesh


def _axis_if(mesh: Mesh, name: str, dim_size: int) -> Optional[str]:
    """Use a mesh axis only if it exists, is >1, and divides the dim."""
    if name in mesh.axis_names and mesh.shape[name] > 1 and dim_size % mesh.shape[name] == 0:
        return name
    return None


def local_head_count(H: int) -> int:
    """Heads per shard the TTT kernels will actually see under the ambient
    mesh — mirrors shard_mapped_ttt's tensor-axis decision. Feeds the
    fused-backward support gate (ttt_backward.fused_bwd_supported): the
    group-size legality depends on the LOCAL head count, not the global."""
    mesh = current_mesh()
    if mesh is not None and _axis_if(mesh, TENSOR, H):
        return H // mesh.shape[TENSOR]
    return H


def shard_mapped_ttt(kernel_fn: Callable, n_states: int, n_tables: int = 0,
                     token_major: bool = False):
    """Wrap a TTT kernel call ``kernel_fn(XQ, XK, XV, eta, ln_w, ln_b,
    *states, *tables)`` in shard_map over the ambient mesh (no-op without
    one).

    Batch shards over (replica, fsdp); heads over tensor. States are tiled
    per-batch [B, H, ...]; ln params are [H, F]; rope tables ([NC, CS, F],
    fused-preproc mode) are batch/head-independent and ride replicated.
    With ``token_major``, x tensors are [B, NC, CS, H*F]: the head shard is
    the LAST axis (whole heads per shard since tensor divides H).
    """

    def call(XQ, XK, XV, eta, ln_w, ln_b, *rest):
        mesh = current_mesh()
        if mesh is None or all(mesh.shape[a] <= 1 for a in mesh.axis_names):
            return kernel_fn(XQ, XK, XV, eta, ln_w, ln_b, *rest)

        B, H = XQ.shape[0], ln_w.shape[0]
        data = tuple(a for a in (REPLICA, FSDP) if _axis_if(mesh, a, B)) or None
        # Batch must divide across the *product* of data axes.
        if data is not None:
            prod = 1
            for a in data:
                prod *= mesh.shape[a]
            if B % prod != 0:
                data = None
        tp = _axis_if(mesh, TENSOR, H)

        if data is None and tp is None:
            return kernel_fn(XQ, XK, XV, eta, ln_w, ln_b, *rest)

        x_spec = P(data, None, None, tp) if token_major else P(data, tp, None, None, None)
        eta_spec = P(data, tp, None, None)
        ln_spec = P(tp, None)
        state_spec = P(data, tp, None, None)
        table_spec = P(None, None, None)

        fn = jax.shard_map(
            kernel_fn,
            mesh=mesh,
            in_specs=(x_spec, x_spec, x_spec, eta_spec, ln_spec, ln_spec)
            + (state_spec,) * n_states + (table_spec,) * n_tables,
            out_specs=x_spec,
            check_vma=False,
        )
        return fn(XQ, XK, XV, eta, ln_w, ln_b, *rest)

    return call
