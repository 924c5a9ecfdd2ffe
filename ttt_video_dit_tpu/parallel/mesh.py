"""Global device mesh management.

One 3-axis mesh replaces the reference's NCCL process-group + DeviceMesh
plumbing (reference: ttt/infra/parallelisms.py:27-89):

- ``replica``: HSDP replication axis (maps to DCN across pods),
- ``fsdp``:    parameter/optimizer sharding axis (ZeRO-3 style, over ICI),
- ``tensor``:  head/tensor-parallel axis (over ICI).

The data-parallel batch is sharded over (replica, fsdp) jointly; the
reference's ``effective_rank = rank // tp`` bookkeeping
(reference: ttt/infra/parallelisms.py:46-54) disappears because GSPMD handles
sub-axis placement.
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

REPLICA = "replica"
FSDP = "fsdp"
TENSOR = "tensor"
AXES = (REPLICA, FSDP, TENSOR)

# Batch / activation-batch axes (data parallelism spans replica x fsdp).
DATA = (REPLICA, FSDP)

_current_mesh: contextvars.ContextVar[Optional[Mesh]] = contextvars.ContextVar("ttt_mesh", default=None)


def build_mesh(
    dp_replicate: int = 1,
    dp_sharding: int = -1,
    tp_sharding: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build the global (replica, fsdp, tensor) mesh.

    ``dp_sharding == -1`` infers the fsdp axis from the device count. Axis
    product must equal the number of devices (reference asserts the same for
    its DeviceMesh, ttt/infra/parallelisms.py:65-75).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp_sharding == -1:
        assert n % (dp_replicate * tp_sharding) == 0, (
            f"device count {n} not divisible by replica({dp_replicate}) * tensor({tp_sharding})"
        )
        dp_sharding = n // (dp_replicate * tp_sharding)
    assert dp_replicate * dp_sharding * tp_sharding == n, (
        f"mesh {dp_replicate}x{dp_sharding}x{tp_sharding} != {n} devices"
    )
    dev_array = np.asarray(devices).reshape(dp_replicate, dp_sharding, tp_sharding)
    return Mesh(dev_array, AXES)


@contextlib.contextmanager
def use_mesh(mesh: Mesh):
    """Set the ambient mesh used by :func:`maybe_shard` and sharding rules."""
    token = _current_mesh.set(mesh)
    try:
        yield mesh
    finally:
        _current_mesh.reset(token)


def current_mesh() -> Optional[Mesh]:
    return _current_mesh.get()


def target_platform() -> str:
    """Platform the current computation TARGETS (vs runs on).

    Kernel dispatch must key on this, not ``jax.default_backend()``: a
    device-less AOT compile against a TPU topology (scripts/aot_scale_check.py)
    runs on a CPU host where default_backend() says "cpu" but the ambient
    mesh's devices are detached TPU descriptors — the TPU kernel paths must
    still be taken for the compiled program to be the real one.
    """
    mesh = current_mesh()
    if mesh is not None:
        return mesh.devices.flat[0].platform
    return jax.default_backend()


def shard_boundary(x):
    """Shard a ``[B, L, D]`` activation that a rematted scan/group boundary
    will SAVE: batch over (replica, fsdp), and the tensor axis on the token
    dim when it divides — else on the feature dim.

    The fallback is load-bearing at 63 s under tp=4: the video stream is
    341,550 tokens (253 frames x 1350), divisible by 2 but not 4, so the
    token-axis constraint silently dropped (maybe_shard's divisibility
    guard) and the 42-layer scan boundary save materialized as an
    UNSHARDED bf16[42, 1, 341550, 3072] = 82 GiB slab on every chip of a
    v5p-128 (docs/aot_scale_r5.json, row A pre-fix). The feature dim D is a
    multiple of every practical tp width, so the save always shrinks by tp;
    GSPMD re-gathers features at the layer entry over ICI (same volume the
    sequence-parallel layout already moves)."""
    mesh = current_mesh()
    if mesh is None:
        return x
    tp = mesh.shape.get(TENSOR, 1)
    if tp > 1 and x.shape[1] % tp != 0 and x.shape[-1] % tp == 0:
        return maybe_shard(x, DATA, None, TENSOR)
    return maybe_shard(x, DATA, TENSOR, None)


def maybe_shard(x, *spec):
    """Apply a sharding constraint if an ambient mesh is set; no-op otherwise.

    Axis names not present in the mesh (or with size 1) are dropped from the
    spec, and — like the param partition rules — so is any entry whose mesh
    axes do not evenly divide the corresponding array dim (e.g. the 63 s
    window-token axis of 17,550 under tp=4), so the same model code runs
    unsharded on one chip and sharded on a pod. ``spec`` entries may be axis
    names, tuples of axis names, or None.
    """
    mesh = current_mesh()
    if mesh is None:
        return x

    def _filter(entry, dim):
        if entry is None:
            return None
        names = entry if isinstance(entry, tuple) else (entry,)
        names = tuple(nm for nm in names if nm in mesh.axis_names and mesh.shape[nm] > 1)
        if not names:
            return None
        size = int(np.prod([mesh.shape[nm] for nm in names]))
        if dim % size != 0:
            return None
        return names if len(names) > 1 else names[0]

    assert len(spec) == len(x.shape), (spec, x.shape)
    pspec = P(*(_filter(e, d) for e, d in zip(spec, x.shape)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, pspec))
