"""Flax-vs-torch T5 text encoder parity + the no-torch flax path.

The reference runs T5 on-device (reference: ttt/models/cogvideo/sampler.py:
79-101); our TPU-native path is FlaxT5EncoderModel under jit. These tests
build a tiny random T5 encoder (saved to disk like a real model dir) and
check embedding parity between backends, the scene-token resize, and that a
flax-weights directory never imports torch.
"""

import json
import subprocess
import sys

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")

from ttt_video_dit_tpu.models.dit.sampler import SCENE_END_TOKEN, SCENE_START_TOKEN


def _make_tiny_t5_dir(tmp_path):
    """A tiny random T5 encoder + fast tokenizer saved as a model dir."""
    import torch
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace
    from transformers import T5Config, T5EncoderModel

    d = tmp_path / "tiny-t5"
    d.mkdir()

    words = ["<pad>", "</s>", "<unk>", "a", "cat", "sat", "on", "the", "mat", "dog", "ran"]
    tok = Tokenizer(WordLevel({w: i for i, w in enumerate(words)}, unk_token="<unk>"))
    tok.pre_tokenizer = Whitespace()
    tok.save(str(d / "tokenizer.json"))
    (d / "tokenizer_config.json").write_text(
        json.dumps(
            {
                "tokenizer_class": "PreTrainedTokenizerFast",
                "pad_token": "<pad>",
                "eos_token": "</s>",
                "unk_token": "<unk>",
            }
        )
    )

    torch.manual_seed(0)
    cfg = T5Config(
        vocab_size=len(words),
        d_model=32,
        d_kv=8,
        d_ff=64,
        num_layers=2,
        num_heads=4,
        dropout_rate=0.0,
    )
    T5EncoderModel(cfg).save_pretrained(d)
    return d


def test_flax_matches_torch(tmp_path):
    from ttt_video_dit_tpu.models.t5 import FlaxT5TextEncoder, T5TextEncoder

    d = _make_tiny_t5_dir(tmp_path)
    torch_enc = T5TextEncoder(str(d))
    flax_enc = FlaxT5TextEncoder(str(d))  # from_pt conversion

    prompts = ["the cat sat on the mat", "a dog ran"]
    maxlen = 12
    got = flax_enc.encode(prompts, maxlen)
    want = torch_enc.encode(prompts, maxlen)
    assert got.shape == want.shape == (2, maxlen, 32)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    # Scene tokens tokenize to single (added) ids on both backends and
    # produce finite embeddings from the resized rows.
    s = f"{SCENE_START_TOKEN}the cat{SCENE_END_TOKEN}"
    ids_f = flax_enc.tokenizer(s)["input_ids"]
    ids_t = torch_enc.tokenizer(s)["input_ids"]
    assert ids_f == ids_t
    assert max(ids_f) >= 11  # an added-token id beyond the base vocab
    out = flax_enc.encode([s], maxlen)
    assert np.isfinite(out).all()


def test_auto_backend_prefers_flax_and_needs_no_torch(tmp_path):
    from ttt_video_dit_tpu.models.t5 import FlaxT5TextEncoder, load_text_encoder

    d = _make_tiny_t5_dir(tmp_path)
    # Write flax weights next to the torch ones.
    FlaxT5TextEncoder(str(d)).model.save_pretrained(d)
    enc = load_text_encoder(str(d))
    assert type(enc).__name__ == "FlaxT5TextEncoder"

    # Prove the flax-weights path never imports torch: poison the import in
    # a subprocess and encode end-to-end.
    script = f"""
import sys
sys.modules["torch"] = None  # any 'import torch' now raises ImportError
import jax; jax.config.update("jax_platforms", "cpu")
from ttt_video_dit_tpu.models.t5 import load_text_encoder
enc = load_text_encoder({str(d)!r})
assert type(enc).__name__ == "FlaxT5TextEncoder", type(enc).__name__
out = enc.encode(["the cat sat"], 8)
assert out.shape == (1, 8, 32), out.shape
print("NO_TORCH_OK")
"""
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "NO_TORCH_OK" in proc.stdout
