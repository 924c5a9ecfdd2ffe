"""scan-over-layers == unrolled layer loop, with stack_layer_params bridging
the two param layouts (compile-time feature for deep stacks; see
models/dit/dit.py LayerStack)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ttt_video_dit_tpu.config.model_config import ModelConfig
from ttt_video_dit_tpu.models.dit.dit import DiffusionTransformer, stack_layer_params


@pytest.mark.parametrize("remat", [False, True])
def test_scan_layers_matches_unrolled(rng, remat):
    kw = dict(
        model_dim=64,
        num_heads=4,
        num_layers=3,
        ssm_layer="ttt_mlp",
        mini_batch_size=8,
        latent_height=4,
        latent_width=4,
        compressed_num_frames=5,
        attn_length=2,
        text_dim=32,
        time_embed_dim=32,
        scan_checkpoint_group_size=2,
        use_kernel=False,
        dtype="float32",
        remat_transformer_layers=remat,
    )
    loop_model = DiffusionTransformer(ModelConfig(scan_layers=False, **kw))
    scan_model = DiffusionTransformer(ModelConfig(scan_layers=True, **kw))

    B, scenes, TL = 1, 2, 4
    vid = jnp.asarray(rng.standard_normal((B, 5, 16, 8, 8)), jnp.float32)
    text = jnp.asarray(rng.standard_normal((B, scenes, TL, 32)), jnp.float32)
    ts = jnp.asarray([123.0], jnp.float32)

    params = loop_model.init(jax.random.PRNGKey(0), vid, text, ts)
    stacked = dict(params["params"])
    stacked = {"params": stack_layer_params(stacked, 3)}

    out_loop = loop_model.apply(params, vid, text, ts)
    out_scan = scan_model.apply(stacked, vid, text, ts)
    np.testing.assert_allclose(np.asarray(out_scan), np.asarray(out_loop), rtol=1e-5, atol=1e-5)

    # Gradients flow through the scanned stack too.
    g = jax.grad(lambda p: scan_model.apply(p, vid, text, ts).sum())(stacked)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)

    # scan init produces the same (stacked) tree structure.
    scan_init = scan_model.init(jax.random.PRNGKey(0), vid, text, ts)
    assert jax.tree_util.tree_structure(scan_init) == jax.tree_util.tree_structure(stacked)

    # The scan body pre-converts its 2-D Dense kernels through the opaque
    # Pallas convert (dit.py:_make_scan_param_pin) so XLA cannot hoist a
    # whole-stack bf16 convert out of the while loop (921 MB over HBM at
    # d3072x4L on v5e). With a bf16 config the pin routes kernels through
    # ops/pallas/convert.py (interpret mode here, forced eligible on CPU);
    # outputs must match the plain-astype model bit-for-bit.
    import ttt_video_dit_tpu.ops.pallas.convert as conv_mod

    cfg_bf16 = ModelConfig(scan_layers=True, **{**kw, "dtype": "bfloat16"})
    model_bf16 = DiffusionTransformer(cfg_bf16)
    out_plain = model_bf16.apply(stacked, vid, text, ts)
    old = conv_mod._INTERPRET
    conv_mod._INTERPRET = True
    try:
        jaxpr = str(jax.make_jaxpr(lambda p: model_bf16.apply(p, vid, text, ts).sum())(stacked))
        assert "convert_kernel" in jaxpr or "pallas_call" in jaxpr
        out_pin = model_bf16.apply(stacked, vid, text, ts)
    finally:
        conv_mod._INTERPRET = old
        conv_mod._pallas_convert.cache_clear()
    np.testing.assert_array_equal(np.asarray(out_pin), np.asarray(out_plain))
