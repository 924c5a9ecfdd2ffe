"""Orbax checkpointing: model + optimizer + data-sampler + metadata.

Replaces the reference's torch DCP checkpointer
(reference: ttt/infra/checkpoint.py:29-111) with Orbax over sharded arrays.
Same state tuple: model params, optimizer state, step, data-sampler state, and
run metadata (e.g. the wandb run id carried through resume); same
directory-per-step layout (``checkpoint/step-N`` equivalent) with auto-detect
of the latest step.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import orbax.checkpoint as ocp

from ttt_video_dit_tpu.training.train_step import TrainState


class Checkpointer:
    def __init__(self, directory: str, max_to_keep: Optional[int] = None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True)
        self.manager = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: TrainState, sampler_state: Dict[str, Any], metadata: Dict[str, Any]):
        self.manager.save(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(state),
                sampler=ocp.args.JsonSave(sampler_state),
                metadata=ocp.args.JsonSave(metadata),
            ),
        )

    def wait(self):
        self.manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(self, step: int, abstract_state: TrainState):
        """Restore at ``step`` (-1 = latest). ``abstract_state`` provides
        shapes/shardings (e.g. from jax.eval_shape over the init)."""
        if step == -1:
            step = self.latest_step()
            assert step is not None, f"no checkpoint found under {self.directory}"
        restored = self.manager.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(abstract_state),
                sampler=ocp.args.JsonRestore(),
                metadata=ocp.args.JsonRestore(),
            ),
        )
        return step, restored["state"], restored["sampler"], restored["metadata"]

    def load_pretrained(self, path: str, abstract_params):
        """Model-params-only load (stage-to-stage curriculum handoff /
        converted pretrained weights; reference: checkpoint.py:47-59).

        If the checkpoint's transformer-layer layout differs from the target
        model's (unrolled ``layers_i`` vs scan-stacked ``scan_layers``), the
        restore is retried against the alternate layout and converted — so
        HF-converted (unrolled) weights load into a ``--model.scan_layers``
        run and scan-trained checkpoints load into unrolled eval models."""
        ckptr = ocp.StandardCheckpointer()
        path = os.path.abspath(path)
        try:
            restored = ckptr.restore(path, abstract_params)
        except Exception:
            swapped = _swap_layer_layout(abstract_params)
            if swapped is None:
                raise
            alt_template, convert = swapped
            restored = convert(ckptr.restore(path, alt_template))
        # Commit the weights to device ONCE. Orbax restores a sharding-less
        # template (single-chip sampling) as HOST numpy, and numpy jit
        # arguments are re-staged on EVERY call — at 5B width that is ~8.6 GB
        # of host->device traffic per denoise eval, which through the TPU
        # tunnel ran at ~2.6 GB/min and piled up staged host buffers until
        # the OOM killer fired (observed twice at 63 s e2e sampling). A
        # no-op for sharded restores (already committed jax.Arrays).
        return jax.device_put(restored)


def _swap_layer_layout(abstract_params):
    """Build (alt_template, convert) translating between the unrolled
    (``layers_i``) and scan-stacked (``scan_layers/scan/layer``) DiT param
    layouts. Returns None when the tree contains neither layout."""

    def walk(node):
        if not isinstance(node, dict):
            return None
        if "scan_layers" in node:  # target stacked <- checkpoint unrolled
            stacked = node["scan_layers"]["scan"]["layer"]
            L = jax.tree.leaves(stacked)[0].shape[0]
            per_layer = jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape[1:], x.dtype), stacked)
            alt = {k: v for k, v in node.items() if k != "scan_layers"}
            alt.update({f"layers_{i}": per_layer for i in range(L)})

            def convert(restored):
                from ttt_video_dit_tpu.models.dit.dit import stack_layer_params

                return stack_layer_params(restored, L)

            return alt, convert
        if "layers_0" in node:  # target unrolled <- checkpoint stacked
            L = sum(1 for k in node if k.startswith("layers_"))
            alt = {k: v for k, v in node.items() if not k.startswith("layers_")}
            alt["scan_layers"] = {
                "scan": {
                    "layer": jax.tree.map(
                        lambda x: jax.ShapeDtypeStruct((L, *x.shape), x.dtype), node["layers_0"]
                    )
                }
            }

            def convert(restored):
                stacked = restored.pop("scan_layers")["scan"]["layer"]
                for i in range(L):
                    restored[f"layers_{i}"] = jax.tree.map(lambda x, _i=i: jnp.asarray(x[_i]), stacked)
                return restored

            return alt, convert
        for key, child in node.items():
            got = walk(child)
            if got is not None:
                alt_child, convert_child = got
                alt = {k: (alt_child if k == key else v) for k, v in node.items()}

                def convert(restored, _key=key, _c=convert_child):
                    restored[_key] = _c(restored[_key])
                    return restored

                return alt, convert
        return None

    return walk(abstract_params)


def save_pretrained(path: str, params) -> None:
    """Write a params-only checkpoint (the artifact ``load_pretrained`` reads)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params)
    ckptr.wait_until_finished()
