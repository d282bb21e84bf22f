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

import jax
import jax.numpy as jnp

DEFAULT_CLASS_WEIGHTS = (0.78, 0.65, 8.57)  # bg / liver / tumor (loss.py:23)
_LOG_CLIP = -23.025850929940457  # ln(1e-10), parity with loss.py:12


def weighted_crossentropy_2d(logits, labels, weights=DEFAULT_CLASS_WEIGHTS):
    """2D-stage loss (reference loss.py:27-46 weighted_crossentropy_2ddense).

    logits: (B, H, W, C) float; labels: (B, H, W) or (B, H, W, 1) int.
    """
    if labels.ndim == logits.ndim:
        labels = labels[..., 0]
    labels = labels.astype(jnp.int32)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    logp = jnp.maximum(logp, _LOG_CLIP)
    picked = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    w = jnp.asarray(weights, jnp.float32)[labels]
    return -jnp.mean(w * picked)


def weighted_crossentropy_hybrid(logits, labels, weights=DEFAULT_CLASS_WEIGHTS):
    """Hybrid-stage loss (reference loss.py:5-25): boundary z-slices excluded.

    logits: (B, H, W, D, C); labels: (B, H, W, D) or (B, H, W, D, 1) int.
    """
    if labels.ndim == logits.ndim:
        labels = labels[..., 0]
    labels = labels.astype(jnp.int32)
    d = logits.shape[3]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    logp = jnp.maximum(logp, _LOG_CLIP)
    picked = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    w = jnp.asarray(weights, jnp.float32)[labels]
    z = jnp.arange(d)
    mask = ((z >= 1) & (z < d - 1)).astype(jnp.float32)  # loss.py:6-7 for d=8
    mask = mask[None, None, None, :]
    total = jnp.sum(w * picked * mask)
    count = jnp.sum(jnp.broadcast_to(mask, picked.shape))
    return -total / count
