"""Orbax pytree checkpointing.

Replaces the reference's full-model HDF5 ModelCheckpoint
(Keras-2.0.8/keras/callbacks.py:335, weights.{epoch}-{loss}.hdf5 every epoch)
with step-indexed orbax checkpoints of the FULL train state — params, BN
statistics, optimizer (momentum) state, and RNG — so resume is exact, unlike
the reference where optimizer state is saved but never restored across stages
(SURVEY.md §5 checkpoint/resume).

Cross-stage transfer (2D checkpoint seeding the hybrid, etc.) is handled
offline by hdenseunet_tpu/weights/convert.py, not by runtime loader hacks
(reference topology.py:2590-2630 by_gpu/two_model/by_flag dispatch).
"""
from __future__ import annotations

from pathlib import Path

import orbax.checkpoint as ocp


class Checkpointer:
    def __init__(self, directory):
        self.dir = Path(directory).absolute()
        self.dir.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.dir,
            options=ocp.CheckpointManagerOptions(max_to_keep=5, create=True),
        )

    def save(self, step: int, train_state):
        self._mgr.save(step, args=ocp.args.StandardSave(train_state))

    def restore_latest(self, template):
        """Restore the newest checkpoint shaped like `template`, or None."""
        step = self._mgr.latest_step()
        if step is None:
            return None
        return self._mgr.restore(step, args=ocp.args.StandardRestore(template))

    def wait(self):
        self._mgr.wait_until_finished()

    def all_steps(self):
        return list(self._mgr.all_steps())
