"""Orbax pytree checkpointing.

Replaces the reference's full-model HDF5 ModelCheckpoint
(Keras-2.0.8/keras/callbacks.py:335, weights.{epoch}-{loss}.hdf5 every epoch)
with step-indexed orbax checkpoints of the FULL train state — params, BN
statistics, optimizer (momentum) state, and RNG — so resume is exact, unlike
the reference where optimizer state is saved but never restored across stages
(SURVEY.md §5 checkpoint/resume).

Best-checkpoint retention replicates ModelCheckpoint's monitor semantics
(callbacks.py:335-430: monitor='loss', save_best_only, mode='min'): alongside
the rolling max_to_keep newest states, a separate single-slot manager under
``<dir>/best`` keeps the state with the lowest monitored loss, so a 6000-epoch
run whose loss degrades late still ends with its best model recoverable.

Cross-stage transfer (2D checkpoint seeding the hybrid, etc.) is handled
offline by hdenseunet_tpu/weights/convert.py, not by runtime loader hacks
(reference topology.py:2590-2630 by_gpu/two_model/by_flag dispatch).
"""
from __future__ import annotations

import math
from pathlib import Path

import orbax.checkpoint as ocp

_BEST_SUBDIR = "best"


class Checkpointer:
    def __init__(self, directory, *, max_to_keep: int = 5, keep_best: bool = True):
        self.dir = Path(directory).absolute()
        self.dir.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.dir,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )
        self._best_mgr = None
        if keep_best:
            # Single-slot manager: orbax's best_fn GC keeps only the lowest-
            # loss step, regardless of save order (correct across resumes).
            self._best_mgr = ocp.CheckpointManager(
                self.dir / _BEST_SUBDIR,
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=1,
                    create=True,
                    best_fn=lambda m: m["loss"],
                    best_mode="min",
                    keep_checkpoints_without_metrics=False,
                ),
            )
        # In-memory IO gate only — correctness does not depend on it because
        # the best manager's own best_fn GC would evict a worse save anyway.
        self._best_seen = self._initial_best()

    def _initial_best(self) -> float:
        if self._best_mgr is None:
            return math.inf
        step = self._best_mgr.best_step()
        if step is None:
            return math.inf
        try:
            m = self._best_mgr.metrics(step)
            return float(m["loss"]) if m else math.inf
        except Exception:
            return math.inf

    def save(self, step: int, train_state, metric: float | None = None):
        """Save `train_state` at `step`; if `metric` (monitored loss) improves
        on the best seen, also refresh the best-slot checkpoint."""
        self._mgr.save(step, args=ocp.args.StandardSave(train_state))
        if (
            self._best_mgr is not None
            and metric is not None
            and math.isfinite(metric)
            and metric < self._best_seen
        ):
            self._best_seen = float(metric)
            self._best_mgr.save(
                step,
                args=ocp.args.StandardSave(train_state),
                metrics={"loss": float(metric)},
            )

    def restore_latest(self, template):
        """Restore the newest checkpoint shaped like `template`, or None."""
        step = self._mgr.latest_step()
        if step is None:
            return None
        return self._mgr.restore(step, args=ocp.args.StandardRestore(template))

    def restore_best(self, template):
        """Restore the lowest-monitored-loss checkpoint, or None if no save
        ever carried a metric (falls back to None, NOT to newest — callers
        that want a fallback chain should try restore_latest themselves)."""
        if self._best_mgr is None:
            return None
        step = self._best_mgr.best_step()
        if step is None:
            return None
        return self._best_mgr.restore(step, args=ocp.args.StandardRestore(template))

    def best_step(self):
        if self._best_mgr is None:
            return None
        return self._best_mgr.best_step()

    def wait(self):
        self._mgr.wait_until_finished()
        if self._best_mgr is not None:
            self._best_mgr.wait_until_finished()

    def all_steps(self):
        return list(self._mgr.all_steps())
