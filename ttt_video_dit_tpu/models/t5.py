"""T5 text encoding with scene special tokens.

Counterpart of the reference's T5 loading/encoding
(reference: ttt/models/cogvideo/sampler.py:79-101, 162-194): loads a local T5
encoder (HF transformers), registers the <start_scene>/<end_scene> special
tokens (resizing embeddings), and encodes prompts to fixed-length embeddings.

Runs the encoder with torch-cpu or flax depending on availability; output is
numpy, consumed by the jitted sampler. Import of transformers is deferred so
the core framework has no hard dependency on it.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from ttt_video_dit_tpu.models.dit.sampler import SCENE_END_TOKEN, SCENE_START_TOKEN


class T5TextEncoder:
    def __init__(self, model_dir: str, dtype: str = "float32"):
        from transformers import T5EncoderModel, T5Tokenizer

        self.tokenizer = T5Tokenizer.from_pretrained(model_dir)
        self.encoder = T5EncoderModel.from_pretrained(model_dir)
        self.tokenizer.add_special_tokens(
            {"additional_special_tokens": [SCENE_END_TOKEN, SCENE_START_TOKEN]}
        )
        self.encoder.resize_token_embeddings(len(self.tokenizer))
        self.encoder.eval()

    def encode(self, prompts: List[Optional[str]], maxlen: int) -> np.ndarray:
        """Encode prompts to [num_scenes, maxlen, hidden] float32. ``None``
        prompts encode as empty strings (negative-prompt default)."""
        import torch

        prompts = [p if p is not None else "" for p in prompts]
        inputs = self.tokenizer(
            prompts,
            truncation=True,
            max_length=maxlen,
            padding="max_length",
            return_tensors="pt",
        )
        with torch.no_grad():
            out = self.encoder(input_ids=inputs["input_ids"])
        return out.last_hidden_state.to(torch.float32).numpy()
