"""T5 text encoding with scene special tokens.

Counterpart of the reference's T5 loading/encoding
(reference: ttt/models/cogvideo/sampler.py:79-101, 162-194): loads a local T5
encoder (HF transformers), registers the <start_scene>/<end_scene> special
tokens (resizing embeddings), and encodes prompts to fixed-length embeddings.

Two backends:

- ``FlaxT5TextEncoder`` — the TPU-native default: FlaxT5EncoderModel executed
  as one jitted XLA program on the accelerator. Given a directory with flax
  weights (``flax_model.msgpack``), no torch import happens anywhere on this
  path; torch-only directories are converted through ``from_pt`` once.
- ``T5TextEncoder`` — torch-cpu fallback (host execution), kept for parity
  testing and environments without flax weights.

``load_text_encoder`` picks flax whenever possible. Imports of transformers
are deferred so the core framework has no hard dependency on it.

Both backends follow the reference's conventions exactly: padding to
``max_length`` with NO attention mask passed (padded positions attend — HF
defaults the mask to all-ones in both frameworks), truncation at maxlen, and
freshly-initialized rows for the two scene tokens.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from ttt_video_dit_tpu.models.dit.sampler import SCENE_END_TOKEN, SCENE_START_TOKEN


def _load_tokenizer(model_dir: str):
    from transformers import AutoTokenizer

    tokenizer = AutoTokenizer.from_pretrained(model_dir)
    tokenizer.add_special_tokens(
        {"additional_special_tokens": [SCENE_END_TOKEN, SCENE_START_TOKEN]}
    )
    return tokenizer


def _tokenize(tokenizer, prompts: List[Optional[str]], maxlen: int) -> np.ndarray:
    prompts = [p if p is not None else "" for p in prompts]
    inputs = tokenizer(
        prompts,
        truncation=True,
        max_length=maxlen,
        padding="max_length",
        return_tensors="np",
    )
    return np.asarray(inputs["input_ids"], np.int32)


class T5TextEncoder:
    """torch-cpu host path (reference-equivalent)."""

    def __init__(self, model_dir: str, dtype: str = "float32"):
        from transformers import T5EncoderModel

        self.tokenizer = _load_tokenizer(model_dir)
        self.encoder = T5EncoderModel.from_pretrained(model_dir)
        self.encoder.resize_token_embeddings(len(self.tokenizer))
        self.encoder.eval()

    def encode_ids(self, ids: np.ndarray) -> np.ndarray:
        import torch

        with torch.no_grad():
            out = self.encoder(input_ids=torch.from_numpy(np.asarray(ids, np.int64)))
        return out.last_hidden_state.to(torch.float32).numpy()

    def encode(self, prompts: List[Optional[str]], maxlen: int) -> np.ndarray:
        """Encode prompts to [num_scenes, maxlen, hidden] float32. ``None``
        prompts encode as empty strings (negative-prompt default)."""
        return self.encode_ids(_tokenize(self.tokenizer, prompts, maxlen))


class FlaxT5TextEncoder:
    """TPU-native path: one jitted XLA program per (batch, maxlen) shape."""

    def __init__(self, model_dir: str, dtype: str = "float32"):
        import jax
        import jax.numpy as jnp
        from transformers import FlaxT5EncoderModel

        self.tokenizer = _load_tokenizer(model_dir)
        from_pt = not _has_flax_weights(model_dir)
        self.model = FlaxT5EncoderModel.from_pretrained(
            model_dir, dtype=jnp.dtype(dtype), from_pt=from_pt
        )
        self._resize_token_embeddings(len(self.tokenizer))

        module = self.model.module

        def forward(params, ids):
            out = module.apply({"params": params}, input_ids=ids)
            return out.last_hidden_state.astype(jnp.float32)

        self._jit_forward = jax.jit(forward)

    def _resize_token_embeddings(self, new_size: int) -> None:
        """Append freshly-initialized rows for added tokens (HF flax models
        have no resize_token_embeddings). Init matches T5's embedding init:
        normal(0, 1) scaled by the config initializer_factor."""
        import jax
        import jax.numpy as jnp

        params = self.model.params
        emb = params["shared"]["embedding"]
        old, d = emb.shape
        if new_size <= old:
            return
        factor = getattr(self.model.config, "initializer_factor", 1.0)
        rows = factor * jax.random.normal(jax.random.PRNGKey(0), (new_size - old, d), jnp.float32)
        params["shared"]["embedding"] = jnp.concatenate([emb, rows.astype(emb.dtype)])
        self.model.params = params
        self.model.config.vocab_size = new_size

    def encode_ids(self, ids: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp

        return np.asarray(self._jit_forward(self.model.params, jnp.asarray(ids, jnp.int32)))

    def encode(self, prompts: List[Optional[str]], maxlen: int) -> np.ndarray:
        return self.encode_ids(_tokenize(self.tokenizer, prompts, maxlen))


def _has_flax_weights(model_dir: str) -> bool:
    return any(
        os.path.exists(os.path.join(model_dir, f))
        for f in ("flax_model.msgpack", "flax_model.msgpack.index.json")
    )


def load_text_encoder(model_dir: str, dtype: str = "float32", backend: str = "auto"):
    """Pick the text-encoder backend.

    ``auto``: flax (on-device) when the directory carries flax weights,
    torch-cpu otherwise. ``flax`` forces the device path (converting torch
    weights through from_pt if needed); ``torch`` forces the host path."""
    if backend == "torch":
        return T5TextEncoder(model_dir, dtype)
    if backend == "flax" or _has_flax_weights(model_dir):
        return FlaxT5TextEncoder(model_dir, dtype)
    return T5TextEncoder(model_dir, dtype)
