"""Interleaved text/video sequence layout for the global TTT scan.

The DiT keeps the sequence as [all text scenes || all video tokens]; the TTT
scan instead wants temporal order [text_0, video_0, text_1, video_1, ...] so
the fast-weight state sees each scene's prompt immediately before its frames
(reference: ttt/models/ssm/ttt_layer.py:157-217). The first scene absorbs the
remainder frames (``init_offset``); all offsets are static Python ints, so
these are pure reshape/concat ops under jit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ttt_video_dit_tpu.models.sequence import SequenceMetadata


def _interleave_impl(x, meta: SequenceMetadata, reverse: bool = False):
    """[..., L, E] with L = seq_text_length + num_video_tokens, laid out as
    [text_0..text_{C-1}, video] -> [text_0, video_0, ..., text_{C-1}, video_{C-1}].

    With ``reverse=True`` this composes the reverse-direction sequence prep
    (text scenes in reverse order, video token-flipped — reference:
    ttt/models/cogvideo/dit.py:213-217,224-266) with the interleave into ONE
    slice/flip/concat pass: the output equals
    ``interleave(concat([reverse_text_chunks(text), flip(video)]))`` without
    materializing the flipped intermediate. For single-scene sequences the
    reverse form is ``[text, flip(video)]``.

    Works on any rank as long as the token axis is -2.
    """
    if not meta.is_multiscene:
        if not reverse:
            return x
        stl = meta.seq_text_length
        return jnp.concatenate(
            [x[..., :stl, :], jnp.flip(x[..., stl:, :], axis=-2)], axis=-2
        )
    TL, C = meta.text_length, meta.num_chunks
    stl = meta.seq_text_length

    text = x[..., :stl, :]
    video = x[..., stl:, :]
    Lv = x.shape[-2] - stl

    video_init = meta.init_offset - TL  # video tokens in the first scene
    video_base = meta.base_offset - TL  # video tokens per later scene

    pieces = []
    for i in range(C):
        ti = (C - 1 - i) if reverse else i
        t = text[..., ti * TL : (ti + 1) * TL, :]
        n = video_init if i == 0 else video_base
        start = 0 if i == 0 else video_init + (i - 1) * video_base
        if reverse:
            # Scene i of the reversed layout holds flip(video)[start:start+n]
            # == flip(video[Lv-start-n : Lv-start]).
            v = jnp.flip(video[..., Lv - start - n : Lv - start, :], axis=-2)
        else:
            v = video[..., start : start + n, :]
        pieces.append(t)
        pieces.append(v)
    return jnp.concatenate(pieces, axis=-2)


def _undo_interleave_impl(x, meta: SequenceMetadata, reverse: bool = False):
    """Inverse of :func:`interleave` for the same ``reverse`` flag
    (reference: ttt/models/ssm/ttt_layer.py:188-217); with ``reverse=True``
    the output is back in the ORIGINAL [text_0..text_{C-1}, video] layout."""
    if not meta.is_multiscene:
        if not reverse:
            return x
        stl = meta.seq_text_length
        return jnp.concatenate(
            [x[..., :stl, :], jnp.flip(x[..., stl:, :], axis=-2)], axis=-2
        )
    TL, C = meta.text_length, meta.num_chunks

    texts, videos = [], []
    for i in range(C):
        if i == 0:
            start, end = 0, meta.init_offset
        else:
            start = meta.init_offset + (i - 1) * meta.base_offset
            end = meta.init_offset + i * meta.base_offset
        scene = x[..., start:end, :]
        t, v = scene[..., :TL, :], scene[..., TL:, :]
        if reverse:
            v = jnp.flip(v, axis=-2)
        texts.append(t)
        videos.append(v)
    if reverse:
        # Scene i carried text chunk C-1-i and the (C-1-i)-from-the-end video
        # slice; reading scenes back-to-front restores original order.
        texts, videos = texts[::-1], videos[::-1]
    return jnp.concatenate(texts + videos, axis=-2)


# interleave / undo_interleave are exact inverse PERMUTATIONS of the token
# axis, so each one's VJP is the other applied to the cotangent. Left to
# autodiff, XLA transposes the concat-of-slices into a sum of ~2C padded
# cotangents ("pad_add" fusions — ~30 ms/step at the 21-scene 63 s geometry,
# plus the grad reductions they entangle with); the custom VJP replaces that
# with the inverse's clean slice/flip/concat pass. Values and gradients are
# bit-identical (a permutation's transpose IS its inverse).


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def interleave(x, meta: SequenceMetadata, reverse: bool = False):
    return _interleave_impl(x, meta, reverse)


def _interleave_fwd(x, meta, reverse):
    return _interleave_impl(x, meta, reverse), None


def _interleave_bwd(meta, reverse, _, g):
    return (_undo_interleave_impl(g, meta, reverse),)


interleave.defvjp(_interleave_fwd, _interleave_bwd)
interleave.__doc__ = _interleave_impl.__doc__


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def undo_interleave(x, meta: SequenceMetadata, reverse: bool = False):
    return _undo_interleave_impl(x, meta, reverse)


def _undo_interleave_fwd(x, meta, reverse):
    return _undo_interleave_impl(x, meta, reverse), None


def _undo_interleave_bwd(meta, reverse, _, g):
    return (_interleave_impl(g, meta, reverse),)


undo_interleave.defvjp(_undo_interleave_fwd, _undo_interleave_bwd)
undo_interleave.__doc__ = _undo_interleave_impl.__doc__


def reverse_text_chunks(text, num_chunks: int):
    """Reverse the order of per-scene text blocks (keeping token order within a
    scene) — used to mirror the reversed video for the reverse TTT direction
    (reference: ttt/models/cogvideo/dit.py:213-217)."""
    B, L, E = text.shape
    return jnp.flip(text.reshape(B, num_chunks, L // num_chunks, E), axis=1).reshape(B, L, E)
