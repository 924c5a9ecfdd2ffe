"""Offline T5 precompute: scene annotations -> fixed-length text embeddings.

Counterpart of the reference's data/precomp_text.py: T5 (with the
<start_scene>/<end_scene> special tokens registered) encodes every annotation
to a fixed max length, in four token-mode variants ("", "start", "end",
"both") so the curriculum stages can pick the transition-token framing they
need (reference: precomp_text.py:123-137).

Usage:
    python data/precompute_text.py --t5-dir /ckpts/t5 --input-jsonl ann.jsonl \
        --output-path /data/textemb --max-length 493 --video-length 3
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from ttt_video_dit_tpu.models.dit.sampler import SCENE_END_TOKEN, SCENE_START_TOKEN

TOKEN_MODES = ("", "both", "start", "end")


def apply_token_mode(text: str, mode: str) -> str:
    if mode in ("both", "start"):
        text = SCENE_START_TOKEN + text
    if mode in ("both", "end"):
        text = text + SCENE_END_TOKEN
    return text


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--t5-dir", required=True)
    parser.add_argument("--t5-backend", default="auto", choices=["auto", "flax", "torch"])
    parser.add_argument("--input-jsonl", required=True)
    parser.add_argument("--output-path", required=True)
    parser.add_argument("--max-length", type=int, default=493)
    parser.add_argument("--video-length", type=int, default=3)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--text-key", default="text", help="annotation field holding the prompt")
    parser.add_argument("--name-key", default="name", help="annotation field holding the output file stem")
    args = parser.parse_args()

    from ttt_video_dit_tpu.models.t5 import load_text_encoder

    encoder = load_text_encoder(args.t5_dir, backend=args.t5_backend)

    with open(args.input_jsonl) as f:
        annotations = [json.loads(line) for line in f if line.strip()]

    for mode in TOKEN_MODES:
        suffix = f"-{mode}" if mode else ""
        out_dir = os.path.join(args.output_path, f"{args.video_length}s-{args.max_length}{suffix}")
        os.makedirs(out_dir, exist_ok=True)
        for start in range(0, len(annotations), args.batch_size):
            chunk = annotations[start : start + args.batch_size]
            texts = [apply_token_mode(a[args.text_key], mode) for a in chunk]
            embs = encoder.encode(texts, args.max_length)  # [B, max_length, E]
            for ann, emb in zip(chunk, embs):
                assert emb.shape[0] == args.max_length
                np.save(os.path.join(out_dir, f"{ann[args.name_key]}_txt_emb.npy"), emb.astype(np.float32))
        print(f"token_mode={mode!r}: wrote {len(annotations)} embeddings to {out_dir}")


if __name__ == "__main__":
    main()
