"""Pallas TTT kernels under a multi-device mesh: shard_map dispatch parity
(interpret mode, 8 virtual CPU devices)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ttt_video_dit_tpu.ops import ttt_scan
from ttt_video_dit_tpu.ops.pallas import ttt_mlp_kernel
from ttt_video_dit_tpu.parallel.mesh import build_mesh, use_mesh

B, H, NC, CS, F = 2, 4, 4, 16, 32


def _inputs(rng):
    shp = (B, H, NC, CS, F)
    return (
        jnp.asarray(rng.standard_normal(shp), jnp.float32),
        jnp.asarray(rng.standard_normal(shp), jnp.float32),
        jnp.asarray(rng.standard_normal(shp), jnp.float32),
        jnp.asarray(rng.uniform(0.001, 0.01, (B, H, NC, CS)), jnp.float32),
        jnp.asarray(rng.standard_normal((H, F)), jnp.float32),
        jnp.asarray(rng.standard_normal((H, F)), jnp.float32),
        jnp.asarray(0.02 * rng.standard_normal((B, H, F, 4 * F)), jnp.float32),
        jnp.zeros((B, H, 1, 4 * F), jnp.float32),
        jnp.asarray(0.02 * rng.standard_normal((B, H, 4 * F, F)), jnp.float32),
        jnp.zeros((B, H, 1, F), jnp.float32),
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_mlp_kernel_under_mesh_matches_oracle(rng, monkeypatch):
    monkeypatch.setattr(ttt_mlp_kernel, "_FORCE_INTERPRET", True)
    args = _inputs(rng)
    oracle = ttt_scan.ttt_mlp(*args, checkpoint_group_size=2)

    mesh = build_mesh(dp_replicate=2, dp_sharding=2, tp_sharding=2)
    with use_mesh(mesh):
        out = jax.jit(lambda *a: ttt_mlp_kernel.ttt_mlp(*a, checkpoint_group_size=2))(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(oracle), rtol=2e-4, atol=2e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_mlp_kernel_grads_under_mesh(rng, monkeypatch):
    monkeypatch.setattr(ttt_mlp_kernel, "_FORCE_INTERPRET", True)
    args = _inputs(rng)
    mesh = build_mesh(dp_replicate=2, dp_sharding=2, tp_sharding=2)

    loss_o = lambda *a: jnp.sum(ttt_scan.ttt_mlp(*a, checkpoint_group_size=2) ** 2)
    go = jax.grad(loss_o, argnums=(0, 4, 6))(*args)

    with use_mesh(mesh):
        loss_k = lambda *a: jnp.sum(ttt_mlp_kernel.ttt_mlp(*a, checkpoint_group_size=2) ** 2)
        gk = jax.jit(jax.grad(loss_k, argnums=(0, 4, 6)))(*args)

    for a, b in zip(gk, go):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3)

@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_maybe_shard_drops_non_dividing_axes():
    """maybe_shard must drop spec entries whose mesh axes do not evenly
    divide the array dim — like the param rules do — so geometry-dependent
    token counts (e.g. the 63 s window-token axis of 17,550 under tp=4)
    degrade to replicated instead of an invalid constraint."""
    from ttt_video_dit_tpu.parallel.mesh import DATA, TENSOR, maybe_shard

    mesh = build_mesh(dp_replicate=2, dp_sharding=2, tp_sharding=2)
    x = jnp.zeros((8, 17550, 16))  # 17550 % 2 = 0 -> sharded
    y = jnp.zeros((8, 8775, 16))   # 8775 % 2 = 1 -> dropped to replicated
    with use_mesh(mesh):
        xs = jax.jit(lambda a: maybe_shard(a, DATA, TENSOR, None))(x)
        ys = jax.jit(lambda a: maybe_shard(a, DATA, TENSOR, None))(y)
    assert "tensor" in str(xs.sharding.spec), xs.sharding
    assert "tensor" not in str(ys.sharding.spec), ys.sharding
    # Batch axis still sharded in both.
    assert "replica" in str(ys.sharding.spec) and "fsdp" in str(ys.sharding.spec)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_shard_boundary_token_or_feature_fallback(rng):
    """The scan/group boundary save must ALWAYS shed its tp factor: token
    axis when tp divides it, else the feature axis. Regression for the 63 s
    tp=4 AOT OOM (341,550 tokens % 4 != 0 silently dropped the constraint
    and replicated an 82 GiB slab per chip — docs/aot_scale_r5.json row A
    pre-fix)."""
    from ttt_video_dit_tpu.parallel.mesh import shard_boundary

    def at(spec, i):
        return spec[i] if i < len(spec) else None

    mesh = build_mesh(dp_replicate=1, dp_sharding=2, tp_sharding=4)
    with use_mesh(mesh):
        # Tokens divide tp=4: token-axis (sequence-parallel) sharding.
        x = jnp.zeros((2, 8, 16))
        spec = jax.jit(shard_boundary)(x).sharding.spec
        assert at(spec, 1) == "tensor" and at(spec, 2) is None, spec
        # Tokens % 4 != 0 (the 63 s case scaled down): feature axis takes tp.
        y = jnp.zeros((2, 6, 16))
        spec = jax.jit(shard_boundary)(y).sharding.spec
        assert at(spec, 1) is None and at(spec, 2) == "tensor", spec
        # Neither axis divides: batch-only (graceful drop, no crash).
        z = jnp.zeros((2, 6, 18))
        jax.jit(shard_boundary)(z).block_until_ready()


def test_ttt_layer_entry_stream_is_sharding_constrained(rng):
    """The [B, L, D] stream at TTT-layer entry (the QKVO/lr-gate fan-out)
    must carry an explicit sharding constraint: without one, the lr-gate
    einsum's backward d(hidden_states) = d(eta).lr_weight contracts over the
    tensor-sharded head axis and GSPMD materializes the cotangent REPLICATED
    in f32 — a 4.03 GiB/chip slab that OOM'd the 63 s v5e-256 tp8 AOT row
    (docs/aot_scale_r5.json; models/ttt/layer.py)."""
    import re

    from ttt_video_dit_tpu.config.model_config import ModelConfig
    from ttt_video_dit_tpu.models.sequence import SequenceMetadata
    from ttt_video_dit_tpu.models.ttt.layer import TTTLayer

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    meta = SequenceMetadata(text_length=8, num_frames=4, num_chunks=1,
                            tokens_per_frame=16, latent_height=8, latent_width=8)
    cfg = ModelConfig(
        model_dim=64, num_heads=4, num_layers=1, ssm_layer="ttt_mlp",
        mini_batch_size=8, latent_height=8, latent_width=8, text_dim=32,
        time_embed_dim=32, scan_checkpoint_group_size=4, dtype="float32",
        use_kernel=False,
    )
    layer = TTTLayer(cfg)
    L = meta.seq_text_length + meta.num_video_tokens
    x = jnp.asarray(rng.standard_normal((2, L, 64)), jnp.float32)
    params = layer.init(jax.random.PRNGKey(0), x, meta)

    mesh = build_mesh(dp_replicate=1, dp_sharding=4, tp_sharding=2)
    with use_mesh(mesh):
        loss = lambda p, x: jnp.sum(layer.apply(p, x, meta) ** 2)
        ir = jax.jit(jax.grad(loss)).lower(params, x).as_text()

    # The isolated layer has exactly one 3-D [B, L, D] stream — the entry
    # fan-out (projections/eta reshape to 4-D/5-D before their constraints),
    # so any constraint on tensor<2x{L}x64> is the entry one.
    pat = re.compile(
        r'(?:sdy\.sharding_constraint|mhlo\.sharding)[^\n]*tensor<2x%dx64x' % L
    )
    assert pat.search(ir), (
        "TTT-layer-entry [B, L, D] stream has no sharding constraint in the "
        "lowered grad — the 63s v5e-256 replicated-cotangent regression"
    )
