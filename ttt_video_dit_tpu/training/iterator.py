"""Training iterator: step loop with EMA timing, interval checkpointing, and
timeout-aware pre-wallclock checkpointing.

Port of the reference's ``TrainingIterator``
(reference: ttt/infra/train_iterator.py:12-188). The reference all-reduces a
MAX over per-rank elapsed-time predicates; under the single-controller SPMD
runtime every process shares the controller clock, so the predicate is local
(the 6-minute margin absorbs process-start skew on multi-host).
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Optional


class TrainingIterator:
    SAVE_TIME_MARGIN_S = 6 * 60

    def __init__(
        self,
        start_step: int,
        num_steps: int,
        checkpoint_interval: int = 0,
        timeout_minutes: int = 0,
        on_checkpoint: Optional[Callable[[int, bool], None]] = None,
        desc: str = "train",
    ):
        self.step = start_step
        self.num_steps = num_steps
        self.checkpoint_interval = checkpoint_interval
        self.timeout_minutes = timeout_minutes
        self.on_checkpoint = on_checkpoint
        self.desc = desc

        self._start_time = time.monotonic()
        self._last_step_time: Optional[float] = None
        self._ema_step_s: Optional[float] = None
        self._timeout_saved = False
        self.metrics: Dict[str, float] = {}

    # -- timing ------------------------------------------------------------
    def _update_ema(self) -> None:
        now = time.monotonic()
        if self._last_step_time is not None:
            dt = now - self._last_step_time
            self._ema_step_s = dt if self._ema_step_s is None else 0.9 * self._ema_step_s + 0.1 * dt
        self._last_step_time = now

    @property
    def ema_step_seconds(self) -> Optional[float]:
        return self._ema_step_s

    # -- checkpoint policy -------------------------------------------------
    def _should_timeout_save(self) -> bool:
        if self.timeout_minutes <= 0 or self._timeout_saved or self._ema_step_s is None:
            return False
        elapsed = time.monotonic() - self._start_time
        remaining = self.timeout_minutes * 60 - elapsed
        return remaining < self._ema_step_s + self.SAVE_TIME_MARGIN_S

    def _maybe_checkpoint(self) -> None:
        if self.on_checkpoint is None:
            return
        interval_due = self.checkpoint_interval > 0 and self.step % self.checkpoint_interval == 0
        timeout_due = self._should_timeout_save()
        if interval_due or timeout_due:
            self.on_checkpoint(self.step, timeout_due)
            if timeout_due:
                self._timeout_saved = True

    # -- iteration ---------------------------------------------------------
    def __iter__(self):
        while self.step < self.num_steps:
            self.step += 1
            self._update_ema()
            yield self.step
            self._maybe_checkpoint()
        # Final checkpoint at completion.
        if self.on_checkpoint is not None and self.checkpoint_interval > 0 and self.step % self.checkpoint_interval != 0:
            self.on_checkpoint(self.step, False)

    def add_metric(self, name: str, value: float) -> None:
        self.metrics[name] = value
