"""TTT-Video-DiT TPU: a TPU-native (JAX/XLA/Pallas) framework for finetuning
CogVideoX-style diffusion transformers with Test-Time-Training (TTT) layers for
video style transfer and context extension (3s -> 63s).

This is a ground-up TPU-first re-design with the capabilities of the reference
repo `test-time-training/ttt-video-dit` (PyTorch/Triton/ThunderKittens on H100):

- One global ``jax.sharding.Mesh(("replica", "fsdp", "tensor"))`` replaces
  NCCL process groups + FSDP2 + DTensor TP (reference:
  ttt/infra/parallelisms.py).
- A single jitted functional train step with NamedShardings replaces
  ``apply_parallelisms`` / meta-device materialization (reference: train.py).
- ``jax.checkpoint`` policies replace the six bespoke remat flags
  (reference: ttt/models/configs.py:49-55).
- ``jax.lax.scan`` + Pallas TPU kernels replace the Triton TTT-linear and
  ThunderKittens TTT-MLP sequential-scan kernels (reference:
  ttt/models/ssm/kernels/*, ttt-tk/).
- Orbax replaces torch DCP checkpointing (reference: ttt/infra/checkpoint.py).
"""

__version__ = "0.1.0"
