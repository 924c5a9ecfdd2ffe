"""Hoist-proof dtype conversion for scan-over-layers params.

Under scan-over-layers, every transformer-layer weight is a slice of a
stacked ``[L, ...]`` fp32 array, converted to bf16 inside the loop body by
the flax Dense modules. XLA:TPU rewrites that per-iteration
``convert(dynamic-slice(stack))`` into ``dynamic-slice(convert(stack))`` and
hoists the convert out of the while loop — materializing a full bf16 copy of
every stacked param as an HLO temp (~1 GB at d3072×4L: a dozen 72 MB
``bf16[4,3072,3072]`` convert/copy temps in the OOM dump; this is what made
4-layer scan-layers exceed HBM by 921 MB on one v5e). The rewrite walks
straight through ``lax.optimization_barrier`` (measured — the barrier pins
nothing here), so the only reliable fence is an op XLA cannot see into: a
Pallas kernel.

``opaque_convert`` is that fence: an elementwise convert expressed as a
``pallas_call`` with a custom VJP (backward is a plain ``astype`` of the
cotangent — the bf16 cotangent per iteration is immediately accumulated into
the stacked grad output, so there is nothing to hoist on that side). The
kernel is only used where the problem exists — TPU backend, single device
(``pallas_call`` cannot be partitioned by GSPMD; on a sharded mesh the
stacked params are sharded and the hoisted copy is proportionally small, so
plain ``astype`` is both required and acceptable).

Reference parallel: the reference stacks layers as Python modules and never
faces this (ttt/models/cogvideo/dit.py builds an nn.ModuleList); the hazard
is specific to the compiled-scan design.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# Per-block f32 budget for the row-tiled grid (in + out comfortably inside
# scoped VMEM at its default limit).
_BLOCK_BYTES = 8 * 1024 * 1024

# Tests flip this to run the kernel in interpret mode on CPU.
_INTERPRET = False


def _convert_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...].astype(o_ref.dtype)


def _row_block(rows: int, cols: int, itemsize: int) -> int:
    """Largest multiple-of-8 divisor of ``rows`` whose block fits the budget
    (the lane axis rides as the full dim, which Mosaic always accepts; only
    the sublane axis needs the divisible-by-8-or-full rule). Falls back to
    the whole array when no tiling divides evenly."""
    budget = max(8, _BLOCK_BYTES // max(cols * itemsize, 1))
    best = 0
    for br in range(8, rows + 1, 8):
        if rows % br == 0 and br <= budget:
            best = br
    return best or rows


@functools.lru_cache(maxsize=64)
def _pallas_convert(shape: tuple, src: str, dst: str, interpret: bool):
    rows, cols = shape
    br = _row_block(rows, cols, 4)
    return pl.pallas_call(
        _convert_kernel,
        grid=(rows // br,),
        in_specs=[pl.BlockSpec((br, cols), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((br, cols), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.dtype(dst)),
        interpret=interpret,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _opaque(x, dst: str, src: str):
    return _pallas_convert(x.shape, src, dst, _INTERPRET)(x)


def _opaque_fwd(x, dst: str, src: str):
    return _opaque(x, dst, src), None


def _opaque_bwd(dst: str, src: str, _res, g):
    return (g.astype(src),)


_opaque.defvjp(_opaque_fwd, _opaque_bwd)


def _eligible(x, dtype) -> bool:
    shape_ok = (
        x.ndim == 2
        and x.dtype == jnp.float32
        and jnp.dtype(dtype) == jnp.bfloat16
    )
    if _INTERPRET:  # tests force the kernel path on CPU
        return shape_ok
    return shape_ok and jax.default_backend() == "tpu" and len(jax.devices()) == 1


def opaque_convert(x, dtype):
    """Convert ``x`` to ``dtype`` through a Pallas kernel when that blocks a
    harmful XLA hoist (TPU, single chip, fp32→bf16 2-D weight); otherwise a
    plain ``astype``. Differentiable; numerically identical to ``astype``."""
    if x.dtype == jnp.dtype(dtype):
        return x
    if not _eligible(x, dtype):
        return x.astype(dtype)
    return _opaque(x, jnp.dtype(dtype).name, jnp.dtype(x.dtype).name)
