"""Interleaved text/video sequence layout for the global TTT scan.

The DiT keeps the sequence as [all text scenes || all video tokens]; the TTT
scan instead wants temporal order [text_0, video_0, text_1, video_1, ...] so
the fast-weight state sees each scene's prompt immediately before its frames
(reference: ttt/models/ssm/ttt_layer.py:157-217). The first scene absorbs the
remainder frames (``init_offset``); all offsets are static Python ints, so
these are pure reshape/concat ops under jit.
"""

from __future__ import annotations

import jax.numpy as jnp

from ttt_video_dit_tpu.models.sequence import SequenceMetadata


def interleave(x, meta: SequenceMetadata):
    """[..., L, E] with L = seq_text_length + num_video_tokens, laid out as
    [text_0..text_{C-1}, video] -> [text_0, video_0, ..., text_{C-1}, video_{C-1}].

    Works on any rank as long as the token axis is -2.
    """
    if not meta.is_multiscene:
        return x
    TL, C = meta.text_length, meta.num_chunks
    stl = meta.seq_text_length

    text = x[..., :stl, :]
    video = x[..., stl:, :]

    video_init = meta.init_offset - TL  # video tokens in the first scene
    video_base = meta.base_offset - TL  # video tokens per later scene

    pieces = []
    for i in range(C):
        t = text[..., i * TL : (i + 1) * TL, :]
        if i == 0:
            v = video[..., :video_init, :]
        else:
            start = video_init + (i - 1) * video_base
            v = video[..., start : start + video_base, :]
        pieces.append(t)
        pieces.append(v)
    return jnp.concatenate(pieces, axis=-2)


def undo_interleave(x, meta: SequenceMetadata):
    """Inverse of :func:`interleave` (reference: ttt/models/ssm/ttt_layer.py:188-217)."""
    if not meta.is_multiscene:
        return x
    TL, C = meta.text_length, meta.num_chunks

    texts, videos = [], []
    for i in range(C):
        if i == 0:
            start, end = 0, meta.init_offset
        else:
            start = meta.init_offset + (i - 1) * meta.base_offset
            end = meta.init_offset + i * meta.base_offset
        scene = x[..., start:end, :]
        texts.append(scene[..., :TL, :])
        videos.append(scene[..., TL:, :])
    return jnp.concatenate(texts + videos, axis=-2)


def reverse_text_chunks(text, num_chunks: int):
    """Reverse the order of per-scene text blocks (keeping token order within a
    scene) — used to mirror the reversed video for the reverse TTT direction
    (reference: ttt/models/cogvideo/dit.py:213-217)."""
    B, L, E = text.shape
    return jnp.flip(text.reshape(B, num_chunks, L // num_chunks, E), axis=1).reshape(B, L, E)
