"""CLI: convert HF CogVideoX-5b safetensors into a params-only orbax
checkpoint for this framework (counterpart of reference
ttt/models/cogvideo/weight_conversion/from_hf.py).

Usage:
    python scripts/convert_from_hf.py --hf-dir /ckpts/CogVideoX-5b/transformer \
        --output /ckpts/ttt-tpu/cogvideox-5b-init --ssm-layer ttt_mlp
"""

from __future__ import annotations

import argparse


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--hf-dir", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--ssm-layer", default="ttt_mlp", choices=["ttt_mlp", "ttt_linear"])
    parser.add_argument("--size", default="5B")
    parser.add_argument("--video-length", default="3sec")
    args = parser.parse_args()

    import jax

    from ttt_video_dit_tpu.config.model_config import ModelConfig
    from ttt_video_dit_tpu.models.dit.diffusion import CogVideoX
    from ttt_video_dit_tpu.models.dit.from_hf import convert_hf_checkpoint
    from ttt_video_dit_tpu.training.checkpoint import save_pretrained
    from ttt_video_dit_tpu.training.setup import init_params

    cfg = ModelConfig.get_preset(args.size, args.video_length)
    cfg.ssm_layer = args.ssm_layer
    cfg.adapter_method = "sft"
    model = CogVideoX(cfg)

    print("initializing model (TTT params keep this init)...")
    params = init_params(model, cfg, mesh=None, rng=jax.random.PRNGKey(0))
    params, n_mapped = convert_hf_checkpoint(args.hf_dir, params)
    print(f"mapped {n_mapped} HF tensors")
    save_pretrained(args.output, params)
    print(f"saved params-only checkpoint to {args.output}")


if __name__ == "__main__":
    main()
