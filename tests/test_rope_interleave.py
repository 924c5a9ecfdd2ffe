"""3D rope parity vs the reference (torch oracle) and interleave layout tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ttt_video_dit_tpu.models.sequence import SequenceMetadata
from ttt_video_dit_tpu.models.ttt.interleave import interleave, reverse_text_chunks, undo_interleave
from ttt_video_dit_tpu.ops.rope import apply_rope, precompute_rope_3d

from tests.reference_oracle import load_reference, reference_available

needs_reference = pytest.mark.skipif(not reference_available(), reason="reference checkout not available")


@needs_reference
def test_rope_matches_reference_ttt_path(rng):
    """Our rope == reference complex-valued apply_rotary_emb
    (reference: ttt/models/ssm/utils.py:9-108)."""
    import torch

    _, ref_ssm = load_reference()
    F, H_lat, W_lat, T = 64, 4, 6, 3
    L = T * H_lat * W_lat
    xq = rng.standard_normal((2, L, 3, F)).astype(np.float32)  # [B, L, H, F]
    xk = rng.standard_normal((2, L, 3, F)).astype(np.float32)

    freqs_cis = ref_ssm.precompute_freqs_cis_3d(F, H_lat, W_lat, T, 10000.0)
    rq, rk = ref_ssm.apply_rotary_emb(torch.tensor(xq), torch.tensor(xk), freqs_cis=freqs_cis)

    cos, sin = precompute_rope_3d(F, H_lat, W_lat, T, 10000.0)
    # apply_rope expects [..., L, F]: move heads before tokens.
    oq = np.asarray(jnp.moveaxis(apply_rope(jnp.moveaxis(jnp.asarray(xq), 2, 1), cos, sin), 1, 2))
    ok = np.asarray(jnp.moveaxis(apply_rope(jnp.moveaxis(jnp.asarray(xk), 2, 1), cos, sin), 1, 2))

    np.testing.assert_allclose(oq, rq.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(ok, rk.numpy(), rtol=1e-5, atol=1e-5)


@needs_reference
def test_rope_matches_reference_attention_path(rng):
    """Our rope == reference Rotary3DPositionEmbedding (interleaved real form,
    reference: ttt/models/cogvideo/utils.py:363-437)."""
    import torch

    ref_cog, _ = load_reference()
    F, H_lat, W_lat, T = 32, 5, 3, 4
    rot = ref_cog.Rotary3DPositionEmbedding(H_lat, W_lat, T, F, theta=10000)

    L = T * H_lat * W_lat
    x = rng.standard_normal((2, 3, L, F)).astype(np.float32)  # [B, H, L, F]
    ref_out = rot(torch.tensor(x)).numpy()

    cos, sin = precompute_rope_3d(F, H_lat, W_lat, T, 10000.0)
    ours = np.asarray(apply_rope(jnp.asarray(x), cos, sin))
    np.testing.assert_allclose(ours, ref_out, rtol=1e-5, atol=1e-5)


def _meta(text_length=3, num_frames=7, num_chunks=3, tokens_per_frame=2):
    return SequenceMetadata(
        text_length=text_length,
        num_frames=num_frames,
        num_chunks=num_chunks,
        tokens_per_frame=tokens_per_frame,
        latent_height=2,
        latent_width=2,
    )


def test_interleave_round_trip(rng):
    meta = _meta()
    L = meta.seq_text_length + meta.num_video_tokens
    x = jnp.asarray(rng.standard_normal((2, L, 5)).astype(np.float32))
    out = undo_interleave(interleave(x, meta), meta)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_interleave_layout():
    """Token-level check of the interleaved order, including the first scene
    absorbing the remainder frames (reference: cogvideo/utils.py:16-26)."""
    meta = _meta(text_length=2, num_frames=7, num_chunks=3, tokens_per_frame=1)
    # frames_per_chunk = 2, extra = 1 -> first scene has 3 frames.
    stl = meta.seq_text_length  # 6
    L = stl + 7
    # Tokens labeled: text scene i token j -> 100*i + j; video frame f -> 200+f
    labels = np.array([100, 101, 110, 111, 120, 121] + [200 + f for f in range(7)], np.float32)
    labels[2:4] = [110, 111]
    labels[4:6] = [120, 121]
    x = jnp.asarray(labels.reshape(1, L, 1))
    out = np.asarray(interleave(x, meta)).reshape(-1)
    expected = [100, 101, 200, 201, 202, 110, 111, 203, 204, 120, 121, 205, 206]
    np.testing.assert_array_equal(out, expected)


@pytest.mark.parametrize("reverse", [False, True])
@pytest.mark.parametrize("multiscene", [False, True])
def test_interleave_custom_vjp_matches_autodiff(rng, reverse, multiscene):
    """interleave/undo_interleave carry custom VJPs (the inverse permutation
    applied to the cotangent — XLA otherwise transposes the concat-of-slices
    into a ~2C-way pad+add soup, ~30 ms/step at the 63 s geometry). A
    permutation's transpose IS its inverse, so gradients must equal plain
    autodiff through the implementation bit-for-bit."""
    from ttt_video_dit_tpu.models.ttt.interleave import _interleave_impl, _undo_interleave_impl

    meta = _meta(num_chunks=3 if multiscene else 1, num_frames=7 if multiscene else 4)
    L = meta.seq_text_length + meta.num_video_tokens
    x = jnp.asarray(rng.standard_normal((2, L, 5)).astype(np.float32))
    ct = jnp.asarray(rng.standard_normal((2, L, 5)).astype(np.float32))

    for fn, impl in ((interleave, _interleave_impl), (undo_interleave, _undo_interleave_impl)):
        out, vjp = jax.vjp(lambda t: fn(t, meta, reverse), x)
        out_i, vjp_i = jax.vjp(lambda t: impl(t, meta, reverse), x)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(out_i))
        np.testing.assert_array_equal(np.asarray(vjp(ct)[0]), np.asarray(vjp_i(ct)[0]))


def test_reverse_text_chunks():
    x = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 6, 2))  # 3 chunks of 2 tokens
    out = np.asarray(reverse_text_chunks(x, 3)).reshape(6, 2)
    expected = np.arange(12, dtype=np.float32).reshape(3, 2, 2)[::-1].reshape(6, 2)
    np.testing.assert_array_equal(out, expected)
    # Involution
    np.testing.assert_array_equal(np.asarray(reverse_text_chunks(reverse_text_chunks(x, 3), 3)), np.asarray(x))


def test_rope_prefixed_matches_slice_concat(rng):
    """apply_rope_prefixed == concat([x[:, :p], apply_rope(x[:, p:])]) — the
    identity-prefix rows must leave text tokens untouched."""
    import jax.numpy as jnp

    from ttt_video_dit_tpu.ops.rope import apply_rope, apply_rope_prefixed, precompute_rope_3d

    cos, sin = precompute_rope_3d(32, 4, 4, 3)
    x = jnp.asarray(rng.standard_normal((2, 54, 3, 32)), jnp.float32)  # 6 text + 48 video
    ref = jnp.concatenate([x[:, :6], apply_rope(x[:, 6:], cos, sin, seq_axis=1)], axis=1)
    out = apply_rope_prefixed(x, cos, sin, 6, seq_axis=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out[:, :6]), np.asarray(x[:, :6]))


def _reverse_prep(x, meta):
    """The pre-round-3 explicit reverse prep (reference:
    ttt/models/cogvideo/dit.py:230-242): reversed text-scene order +
    token-flipped video, in the [text, video] layout."""
    stl = meta.seq_text_length
    text = x[..., :stl, :]
    if meta.is_multiscene:
        B, L, E = text.shape
        text = jnp.flip(text.reshape(B, meta.num_chunks, L // meta.num_chunks, E), axis=1).reshape(B, L, E)
    return jnp.concatenate([text, jnp.flip(x[..., stl:, :], axis=-2)], axis=-2)


def test_interleave_reverse_composes_prep(rng):
    """interleave(x, meta, reverse=True) == interleave(reverse_prep(x), meta)
    — the composed gather must equal the two-step form it replaced."""
    for meta in (_meta(), _meta(text_length=2, num_frames=7, num_chunks=1, tokens_per_frame=3)):
        L = meta.seq_text_length + meta.num_video_tokens
        x = jnp.asarray(rng.standard_normal((2, L, 5)).astype(np.float32))
        composed = interleave(x, meta, reverse=True)
        two_step = interleave(_reverse_prep(x, meta), meta)
        np.testing.assert_array_equal(np.asarray(composed), np.asarray(two_step))


def test_interleave_reverse_round_trip(rng):
    """undo_interleave(·, reverse=True) inverts interleave(·, reverse=True)
    back to the ORIGINAL layout (no separate un-flip pass)."""
    for meta in (_meta(), _meta(text_length=2, num_frames=7, num_chunks=1, tokens_per_frame=3)):
        L = meta.seq_text_length + meta.num_video_tokens
        x = jnp.asarray(rng.standard_normal((2, L, 5)).astype(np.float32))
        out = undo_interleave(interleave(x, meta, reverse=True), meta, reverse=True)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_layer_composed_reverse_matches_explicit_prep(rng):
    """TTTLayer(x, meta, reverse=True) == unprep(TTTLayer(prep(x), meta)) —
    the composed reverse direction reproduces the explicit flip/concat path
    (values AND grads), on the scan-oracle path and the fused-preproc
    interpret path, single- and multi-scene."""
    import jax

    from ttt_video_dit_tpu.config.model_config import ModelConfig
    from ttt_video_dit_tpu.models.ttt.layer import TTTLayer
    from ttt_video_dit_tpu.ops.pallas import ttt_mlp_kernel

    metas = [
        SequenceMetadata(text_length=8, num_frames=7, num_chunks=3,
                         tokens_per_frame=16, latent_height=8, latent_width=8),
        SequenceMetadata(text_length=8, num_frames=3, num_chunks=1,
                         tokens_per_frame=16, latent_height=8, latent_width=8),
    ]
    cfg_kw = dict(
        model_dim=64, num_heads=4, num_layers=1, ssm_layer="ttt_mlp",
        mini_batch_size=8, latent_height=8, latent_width=8, text_dim=32,
        time_embed_dim=32, scan_checkpoint_group_size=4, dtype="float32",
    )
    cfgs = [ModelConfig(use_kernel=False, **cfg_kw),
            ModelConfig(use_kernel=True, fuse_ttt_preproc=True, **cfg_kw)]

    ttt_mlp_kernel._FORCE_INTERPRET, saved = True, ttt_mlp_kernel._FORCE_INTERPRET
    try:
        for meta in metas:
            L = meta.seq_text_length + meta.num_video_tokens
            x = jnp.asarray(rng.standard_normal((2, L, 64)), jnp.float32)
            # Position-dependent loss weight: a permutation-invariant loss
            # (e.g. sum of squares) would not catch output-layout mistakes.
            w = jnp.asarray(rng.standard_normal((2, L, 64)), jnp.float32)
            for cfg in cfgs:
                layer = TTTLayer(cfg)
                params = layer.init(jax.random.PRNGKey(0), x, meta)

                def loss_new(p):
                    return jnp.sum(layer.apply(p, x, meta, reverse=True) * w)

                def loss_old(p):
                    out = layer.apply(p, _reverse_prep(x, meta), meta)
                    return jnp.sum(_reverse_prep(out, meta) * w)  # prep is an involution

                v_new, g_new = jax.value_and_grad(loss_new)(params)
                v_old, g_old = jax.value_and_grad(loss_old)(params)
                np.testing.assert_allclose(float(v_new), float(v_old), rtol=1e-5)
                for (ka, a), (kb, b) in zip(
                    jax.tree_util.tree_flatten_with_path(g_old)[0],
                    jax.tree_util.tree_flatten_with_path(g_new)[0],
                ):
                    assert str(ka) == str(kb)
                    scale = max(float(jnp.max(jnp.abs(a))), 1e-6)
                    np.testing.assert_allclose(
                        np.asarray(b), np.asarray(a), rtol=0, atol=5e-5 * scale,
                        err_msg=f"{ka} kernel={cfg.use_kernel} chunks={meta.num_chunks}")
    finally:
        ttt_mlp_kernel._FORCE_INTERPRET = saved
