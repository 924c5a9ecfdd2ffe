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
def _rope_freq_bands(head_dim: int, theta: float):
    """Tiny per-band inverse-frequency vectors (numpy, safe to cache)."""
    dim_t = head_dim // 4
    dim_h = head_dim // 8 * 3
    dim_w = head_dim // 8 * 3
    freqs_t = 1.0 / (theta ** (np.arange(0, dim_t, 2)[: dim_t // 2].astype(np.float32) / dim_t))
    freqs_h = 1.0 / (theta ** (np.arange(0, dim_h, 2)[: dim_h // 2].astype(np.float32) / dim_h))
    freqs_w = 1.0 / (theta ** (np.arange(0, dim_w, 2)[: dim_w // 2].astype(np.float32) / dim_w))
    return freqs_t, freqs_h, freqs_w


def precompute_rope_3d(head_dim: int, height: int, width: int, num_frames: int, theta: float = 10000.0):
    """Returns (cos, sin), float32 [num_frames * height * width, head_dim // 2].

    Built with on-device jnp ops (iota-style broadcasts over tiny cached
    frequency vectors), NOT materialized numpy: a concrete table becomes a
    multi-MB literal constant at every jit use site (~24 copies x 4.5 MB of
    program payload at the 3 s geometry, which crushed remote-compile
    transports). As traced ops they are folded once by XLA at compile time.
    Never cache the returned (possibly traced) arrays."""
    freqs_t, freqs_h, freqs_w = _rope_freq_bands(head_dim, theta)

    ang_t = jnp.arange(num_frames, dtype=jnp.float32)[:, None] * freqs_t[None, :]  # [T, d/8]
    ang_h = jnp.arange(height, dtype=jnp.float32)[:, None] * freqs_h[None, :]  # [H, 3d/16]
    ang_w = jnp.arange(width, dtype=jnp.float32)[:, None] * freqs_w[None, :]  # [W, 3d/16]

    # Broadcast-concatenate to [T, H, W, d/2] then flatten (t h w) row-major.
    T, H, W = num_frames, height, width
    ang = jnp.concatenate(
        [
            jnp.broadcast_to(ang_t[:, None, None, :], (T, H, W, ang_t.shape[-1])),
            jnp.broadcast_to(ang_h[None, :, None, :], (T, H, W, ang_h.shape[-1])),
            jnp.broadcast_to(ang_w[None, None, :, :], (T, H, W, ang_w.shape[-1])),
        ],
        axis=-1,
    ).reshape(T * H * W, -1)

    return jnp.cos(ang), jnp.sin(ang)


@functools.lru_cache(maxsize=4)
def _pair_rotation_matrix(D: int) -> np.ndarray:
    """[D, D] constant with (x @ R)[2i] = -x[2i+1], (x @ R)[2i+1] = x[2i]."""
    R = np.zeros((D, D), np.float32)
    idx = np.arange(0, D, 2)
    R[idx + 1, idx] = -1.0
    R[idx, idx + 1] = 1.0
    return R


def _interleave_pairs(table, L: int):
    """[L', D/2] -> [L, D] with out[:, 2i] == out[:, 2i+1] == table[:, i]."""
    rep = np.repeat if isinstance(table, np.ndarray) else jnp.repeat
    return rep(table[:L], 2, axis=-1)


def apply_rope(x, cos, sin, seq_axis: int = -2):
    """Rotate adjacent feature pairs of ``x`` by the given angles.

    x: [..., D] with the sequence dimension at ``seq_axis``; cos/sin:
    [L', D/2] with L' >= x.shape[seq_axis] (sliced). Supporting an arbitrary
    ``seq_axis`` lets callers keep the token-major [B, L, H, F] layout.

    TPU-native formulation: ``out = x * cos_il + (x @ R) * sin_il`` with
    interleaved (lane-duplicated) tables and a constant +-1 pair-swap matrix
    ``R`` on the MXU. The pair swap is exact in bf16 and the combine runs in
    f32, so numerics match the naive interleaved form — but there is no
    stride-2 lane slicing, which made XLA pick sequence-minor layouts for the
    f32 intermediates and spend ~1 ms/tensor on layout copies (measured at
    the 3 s bench geometry, ~25 ms/step across the q/k rope sites)."""
    seq_axis = seq_axis % x.ndim
    L, D = x.shape[seq_axis], x.shape[-1]
    shape = [1] * x.ndim
    shape[seq_axis], shape[-1] = L, D
    cos_il = jnp.asarray(_interleave_pairs(cos, L), jnp.float32).reshape(shape)
    sin_il = jnp.asarray(_interleave_pairs(sin, L), jnp.float32).reshape(shape)

    x_rot = x @ jnp.asarray(_pair_rotation_matrix(D), x.dtype)
    out = x.astype(jnp.float32) * cos_il + x_rot.astype(jnp.float32) * sin_il
    return out.astype(x.dtype)


def interleaved_tables_prefixed(cos, sin, prefix: int, total_len: int):
    """[total_len, D] lane-duplicated (interleaved) cos/sin tables with
    identity rows (cos=1, sin=0) for the first ``prefix`` positions — the
    table form consumed by the fused in-kernel rope
    (ops/pallas/ttt_forward._fused_preproc). jnp ops: see precompute_rope_3d
    on why tables must stay traced rather than become per-site literals."""
    Dh = cos.shape[-1]
    L_vid = total_len - prefix
    cos_p = jnp.concatenate([jnp.ones((prefix, Dh), jnp.float32), jnp.asarray(cos[:L_vid], jnp.float32)], axis=0)
    sin_p = jnp.concatenate([jnp.zeros((prefix, Dh), jnp.float32), jnp.asarray(sin[:L_vid], jnp.float32)], axis=0)
    return jnp.repeat(cos_p, 2, axis=-1), jnp.repeat(sin_p, 2, axis=-1)


def apply_rope_prefixed(x, cos, sin, prefix: int, seq_axis: int = 1):
    """Rope with the first ``prefix`` sequence positions left unrotated
    (text tokens). Equivalent to
    ``concat([x[:, :prefix], apply_rope(x[:, prefix:])])`` but applied as one
    fused elementwise pass using identity-angle prefix rows — the slice +
    concat form materializes two extra full-tensor copies per call."""
    seq_axis = seq_axis % x.ndim
    L_vid = x.shape[seq_axis] - prefix
    Dh = x.shape[-1] // 2
    if isinstance(cos, np.ndarray):
        cos_p = np.concatenate([np.ones((prefix, Dh), np.float32), cos[:L_vid]], axis=0)
        sin_p = np.concatenate([np.zeros((prefix, Dh), np.float32), sin[:L_vid]], axis=0)
    else:
        cos_p = jnp.concatenate([jnp.ones((prefix, Dh), jnp.float32), cos[:L_vid]], axis=0)
        sin_p = jnp.concatenate([jnp.zeros((prefix, Dh), jnp.float32), sin[:L_vid]], axis=0)
    return apply_rope(x, cos_p, sin_p, seq_axis)
