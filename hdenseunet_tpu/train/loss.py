"""Weighted 3-class cross-entropy losses (reference loss.py).

The reference computes softmax -> log -> clip(1e-10) -> per-class boolean
gather -> weighted concat -> mean (loss.py:5-25). Gathers produce dynamic
shapes, which XLA cannot compile; here the identical quantity is computed with
static shapes as a weight-lookup times log-softmax:

    loss = -(1/N) * sum_i  w[y_i] * max(log p_{y_i}, log 1e-10)

(every pixel belongs to exactly one class, so the reference's concat of the
three gathered vectors has exactly N elements and its mean equals the weighted
per-pixel mean above — including the clip).

The hybrid variant first drops the two boundary z-slices from the loss
(reference loss.py:6-7: `y[:, :, :, 1:7, :]`), implemented as a mask so shapes
stay static for any depth.

Under data parallelism these reductions are computed over the *global* batch:
the batch arrays are sharded over the mesh 'data' axis and XLA lowers the sums
to psum collectives over ICI, which reproduces the reference's single-graph
multi-tower loss (utils2/multi_gpu.py:64-69) exactly.
"""
from __future__ import annotations

import jax.numpy as jnp

DEFAULT_CLASS_WEIGHTS = (0.78, 0.65, 8.57)  # bg / liver / tumor (loss.py:23)


def weighted_crossentropy_2d(logits, labels, weights=DEFAULT_CLASS_WEIGHTS):
    """2D-stage loss (reference loss.py:27-46 weighted_crossentropy_2ddense).

    logits: (B, H, W, C) float; labels: (B, H, W) or (B, H, W, 1) int.
    Dispatches to the fused Pallas reduction (ops.wce) on TPU.
    """
    from ..ops.wce import weighted_ce

    if labels.ndim == logits.ndim:
        labels = labels[..., 0]
    c = logits.shape[-1]
    flat_logits = logits.reshape(-1, c)
    flat_labels = labels.reshape(-1).astype(jnp.int32)
    mask = jnp.ones(flat_labels.shape, jnp.float32)
    return weighted_ce(flat_logits, flat_labels, mask, tuple(weights))


def weighted_crossentropy_hybrid(logits, labels, weights=DEFAULT_CLASS_WEIGHTS):
    """Hybrid-stage loss (reference loss.py:5-25): boundary z-slices excluded.

    logits: (B, H, W, D, C); labels: (B, H, W, D) or (B, H, W, D, 1) int.
    """
    from ..ops.wce import weighted_ce

    if labels.ndim == logits.ndim:
        labels = labels[..., 0]
    d = logits.shape[3]
    c = logits.shape[-1]
    z = jnp.arange(d)
    zmask = ((z >= 1) & (z < d - 1)).astype(jnp.float32)  # loss.py:6-7 for d=8
    mask = jnp.broadcast_to(zmask[None, None, None, :], labels.shape)
    return weighted_ce(
        logits.reshape(-1, c),
        labels.reshape(-1).astype(jnp.int32),
        mask.reshape(-1),
        tuple(weights),
    )
