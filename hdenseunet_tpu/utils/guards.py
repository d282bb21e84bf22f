"""Failure detection for long training runs.

The reference has none: ``TerminateOnNaN`` exists unused
(Keras-2.0.8/keras/callbacks.py:230) and a crash means a by-hand restart
(SURVEY.md §5). Here:

* :class:`NaNGuard` — inspects the (host-fetched) loss stream; raises after
  the first non-finite loss with recent-history context, so the orbax
  checkpoint written before the failure is the resume point;
* :func:`check_pytree_finite` — one-shot parameter audit (post-restore or
  pre-export) that names every offending leaf instead of failing late.
"""
from __future__ import annotations

import math

import jax
import numpy as np


class NaNGuard:
    def __init__(self, history: int = 20):
        self.history = history
        self._recent: list[float] = []

    def check(self, loss: float, step: int) -> None:
        v = float(loss)
        if math.isfinite(v):
            self._recent.append(v)
            if len(self._recent) > self.history:
                self._recent.pop(0)
            return
        ctx = ", ".join(f"{x:.4f}" for x in self._recent[-5:])
        raise FloatingPointError(
            f"non-finite loss {v} at step {step}; last finite losses: [{ctx}]. "
            f"Resume from the latest checkpoint with a lower LR."
        )


def check_pytree_finite(tree, name: str = "params") -> None:
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if not np.all(np.isfinite(arr)):
            bad.append(jax.tree_util.keystr(path))
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: {bad[:10]}")
