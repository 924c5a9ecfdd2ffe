"""3D rotary position embeddings over (frame, height, width) latent grids.

One implementation serves both consumers, which in the reference are two
separate codepaths with identical math: the attention block's
``Rotary3DPositionEmbedding`` (reference: ttt/models/cogvideo/utils.py:363-437,
interleaved-pair real form) and the TTT layer's complex-valued
``precompute_freqs_cis_3d`` / ``apply_rotary_emb``
(reference: ttt/models/ssm/utils.py:9-108). Both rotate adjacent pairs
``(x[2i], x[2i+1])`` by angles drawn from temporal/height/width frequency
bands of sizes ``d/8, 3d/16, 3d/16`` (in pairs), concatenated per position in
``(t, h, w)`` row-major order.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=16)
def precompute_rope_3d(head_dim: int, height: int, width: int, num_frames: int, theta: float = 10000.0):
    """Returns (cos, sin) as *numpy* float32 arrays of shape
    [num_frames * height * width, head_dim // 2]. Numpy (not jnp) so the
    lru_cache never captures a traced value; they become jit constants at the
    point of use."""
    dim_t = head_dim // 4
    dim_h = head_dim // 8 * 3
    dim_w = head_dim // 8 * 3

    freqs_t = 1.0 / (theta ** (np.arange(0, dim_t, 2)[: dim_t // 2].astype(np.float32) / dim_t))
    freqs_h = 1.0 / (theta ** (np.arange(0, dim_h, 2)[: dim_h // 2].astype(np.float32) / dim_h))
    freqs_w = 1.0 / (theta ** (np.arange(0, dim_w, 2)[: dim_w // 2].astype(np.float32) / dim_w))

    ang_t = np.arange(num_frames, dtype=np.float32)[:, None] * freqs_t[None, :]  # [T, d/8]
    ang_h = np.arange(height, dtype=np.float32)[:, None] * freqs_h[None, :]  # [H, 3d/16]
    ang_w = np.arange(width, dtype=np.float32)[:, None] * freqs_w[None, :]  # [W, 3d/16]

    # Broadcast-concatenate to [T, H, W, d/2] then flatten (t h w) row-major.
    T, H, W = num_frames, height, width
    ang = np.concatenate(
        [
            np.broadcast_to(ang_t[:, None, None, :], (T, H, W, ang_t.shape[-1])),
            np.broadcast_to(ang_h[None, :, None, :], (T, H, W, ang_h.shape[-1])),
            np.broadcast_to(ang_w[None, None, :, :], (T, H, W, ang_w.shape[-1])),
        ],
        axis=-1,
    ).reshape(T * H * W, -1)

    return np.cos(ang), np.sin(ang)


def apply_rope(x, cos, sin, seq_axis: int = -2):
    """Rotate adjacent feature pairs of ``x`` by the given angles.

    x: [..., D] with the sequence dimension at ``seq_axis``; cos/sin:
    [L', D/2] with L' >= x.shape[seq_axis] (sliced). Computation runs in
    float32 and is cast back to x.dtype. Supporting an arbitrary ``seq_axis``
    lets callers keep the token-major [B, L, H, F] layout — transposing to
    [B, H, L, F] first materializes ~0.3 ms layout-copy HLOs per tensor on
    TPU (measured: ~20 ms/step at the 3 s bench geometry)."""
    seq_axis = seq_axis % x.ndim
    L, D = x.shape[seq_axis], x.shape[-1]
    shape = [1] * (x.ndim + 1)
    shape[seq_axis], shape[-2] = L, D // 2
    cos = jnp.asarray(cos[:L], jnp.float32).reshape(shape)
    sin = jnp.asarray(sin[:L], jnp.float32).reshape(shape)

    xr = x.astype(jnp.float32).reshape(*x.shape[:-1], D // 2, 2)
    x1, x2 = xr[..., 0:1], xr[..., 1:2]
    out = jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)
    return out.reshape(x.shape).astype(x.dtype)
