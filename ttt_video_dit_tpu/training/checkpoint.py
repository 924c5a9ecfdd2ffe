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
        converted pretrained weights; reference: checkpoint.py:47-59)."""
        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(os.path.abspath(path), abstract_params)


def save_pretrained(path: str, params) -> None:
    """Write a params-only checkpoint (the artifact ``load_pretrained`` reads)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params)
    ckptr.wait_until_finished()
