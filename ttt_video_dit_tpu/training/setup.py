"""Model/optimizer/state initialization on the global mesh.

Replaces the reference's meta-device construct -> DTensor-ify -> FSDP-wrap ->
to_empty -> re-init-buffers dance (reference: train.py:65-83,
ttt/infra/parallelisms.py:92-196): here we ``jax.eval_shape`` the init to get
abstract shapes, derive NamedShardings from the partition rules, and run the
jitted initializer with those output shardings — parameters materialize
directly sharded on the mesh, no host round-trip.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ttt_video_dit_tpu.config.model_config import ModelConfig
from ttt_video_dit_tpu.models.dit.diffusion import CogVideoX
from ttt_video_dit_tpu.parallel.mesh import DATA, maybe_shard, use_mesh
from ttt_video_dit_tpu.parallel.sharding import param_shardings
from ttt_video_dit_tpu.training.optimizer import partition_params
from ttt_video_dit_tpu.training.train_step import TrainState


def example_batch_shapes(cfg: ModelConfig, batch_size: int, text_length: int = 498):
    """Shapes of one training batch for this model config.

    Video latents are [B, T, C, latent_pixels_h, latent_pixels_w]; note
    cfg.latent_height/width are the *token-grid* dims (latent pixels / patch),
    matching the reference's convention (reference: configs.py:35-37 vs
    dit.py:459).
    """
    T = cfg.compressed_num_frames
    h = cfg.latent_height * cfg.patch_size
    w = cfg.latent_width * cfg.patch_size
    scenes = cfg.num_chunks
    return dict(
        vid=(batch_size, T, cfg.in_channels, h, w),
        text=(batch_size, scenes, text_length, cfg.text_dim),
    )


def make_example_batch(cfg: ModelConfig, batch_size: int, text_length: int = 498, seed: int = 0):
    shapes = example_batch_shapes(cfg, batch_size, text_length)
    rng = np.random.default_rng(seed)
    return dict(
        vid=jnp.asarray(rng.standard_normal(shapes["vid"]), jnp.float32),
        text=jnp.asarray(rng.standard_normal(shapes["text"]), jnp.float32),
        sigma_lo=jnp.zeros((batch_size,), jnp.int32),
        sigma_hi=jnp.full((batch_size,), cfg.sigma_interval, jnp.int32),
    )


def batch_shardings(mesh: Mesh) -> Dict[str, NamedSharding]:
    data = tuple(ax for ax in DATA if mesh.shape.get(ax, 1) > 1) or None
    return dict(
        vid=NamedSharding(mesh, P(data)),
        text=NamedSharding(mesh, P(data)),
        sigma_lo=NamedSharding(mesh, P(data)),
        sigma_hi=NamedSharding(mesh, P(data)),
    )


def make_global_batch(
    host_batch: Dict[str, Any],
    shardings: Dict[str, NamedSharding],
    process_count: int = 1,
) -> Dict[str, jax.Array]:
    """Assemble globally-sharded device arrays from per-process host shards.

    Each process passes its *contiguous* shard of the global batch (size
    global_bs / process_count); ``jax.make_array_from_process_local_data``
    stitches the shards into one global array laid out per ``shardings``.
    Single-host (process_count=1) degenerates to a plain sharded device_put.
    TPU equivalent of the reference's effective-rank batch partitioning
    (reference: train.py:126, ttt/infra/parallelisms.py:46-54).
    """
    out = {}
    for k, v in host_batch.items():
        v = np.asarray(v)
        sharding = shardings.get(k, shardings["vid"])
        global_shape = (v.shape[0] * process_count, *v.shape[1:])
        out[k] = jax.make_array_from_process_local_data(sharding, v, global_shape)
    return out


def init_params(model: CogVideoX, cfg: ModelConfig, mesh: Optional[Mesh], rng, text_length: int = 498):
    """Initialize params, sharded per the partition rules if a mesh is given."""
    shapes = example_batch_shapes(cfg, batch_size=1, text_length=text_length)
    vid = jnp.zeros(shapes["vid"], jnp.float32)
    text = jnp.zeros(shapes["text"], jnp.float32)
    bounds = (jnp.zeros((1,), jnp.int32), jnp.full((1,), cfg.sigma_interval, jnp.int32))

    def init_fn(key):
        return model.init(key, vid, text, jax.random.PRNGKey(0), bounds)

    if mesh is None:
        return jax.jit(init_fn)(rng)

    abstract = jax.eval_shape(init_fn, rng)
    shardings = param_shardings(abstract, mesh)
    with use_mesh(mesh):
        return jax.jit(init_fn, out_shardings=shardings)(rng)


def create_train_state(params, tx, adapter_method: str) -> TrainState:
    trainable, frozen = partition_params(params, adapter_method)
    opt_state = tx.init(trainable)
    return TrainState(step=jnp.zeros((), jnp.int32), trainable=trainable, frozen=frozen, opt_state=opt_state)
