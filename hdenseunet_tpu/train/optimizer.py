"""Optimizer with staged freezing.

SGD + Nesterov momentum, numerically equivalent to the reference's Keras SGD
(Keras-2.0.8/keras/optimizers.py:130-194: v = m*v - lr*g; p += m*v - lr*g,
which optax's `trace(nesterov=True)` reproduces up to the v = -lr*u
substitution).

Staged freezing replaces the reference's `trainable=False` layer flags
(denseunet3d.py:222-224, hybridnet.py:210-212) with an optax multi_transform:
frozen leaves get `set_to_zero` (no update, no momentum buffer), trainable
leaves get SGD. The trainable sets per stage come from
models.hybrid.trainable_predicate.
"""
from __future__ import annotations

import jax
import optax

from ..models import hybrid


def sgd_nesterov(lr: float, momentum: float = 0.9, nesterov: bool = True):
    return optax.sgd(lr, momentum=momentum, nesterov=nesterov)


def trainable_labels(params, arch: str):
    """Label pytree: 'train' | 'freeze' per leaf, following the stage recipe."""
    pred = hybrid.trainable_predicate(arch)
    return {
        name: {leaf: ("train" if pred(name, leaf) else "freeze") for leaf in leaves}
        for name, leaves in params.items()
    }


def make_optimizer(params, arch: str, lr: float, momentum: float = 0.9, nesterov: bool = True):
    """(tx, labels) for the given training stage ('2d' | '3dpart' | 'end2end')."""
    labels = trainable_labels(params, arch)
    tx = optax.multi_transform(
        {
            "train": sgd_nesterov(lr, momentum, nesterov),
            "freeze": optax.set_to_zero(),
        },
        labels,
    )
    return tx, labels


def count_trainable(params, labels) -> int:
    total = 0
    for name, leaves in params.items():
        for leaf, arr in leaves.items():
            if labels[name][leaf] == "train":
                total += int(arr.size)
    return total
