"""Loss parity vs a direct numpy replication of the reference algorithm
(loss.py:5-46: softmax -> log -> clip -> per-class gather -> weighted concat
-> mean)."""
import numpy as np
import jax.numpy as jnp

from hdenseunet_tpu.train.loss import (
    weighted_crossentropy_2d,
    weighted_crossentropy_hybrid,
)

W = (0.78, 0.65, 8.57)


def _reference_loss(logits, labels):
    """Numpy mirror of reference loss.py:27-46 (gather formulation)."""
    lg = logits.reshape(-1, 3).astype(np.float64)
    y = labels.reshape(-1)
    e = np.exp(lg - lg.max(axis=1, keepdims=True))
    sm = e / e.sum(axis=1, keepdims=True)
    logp = np.log(np.clip(sm, 1e-10, 1.0))
    parts = []
    for cls, w in enumerate(W):
        parts.append(w * logp[y == cls, cls])
    return -np.concatenate(parts).mean()


def test_2d_loss_matches_reference_gather_formulation(rng_np):
    logits = rng_np.standard_normal((2, 8, 8, 3)).astype(np.float32) * 3
    labels = rng_np.integers(0, 3, (2, 8, 8, 1)).astype(np.int16)
    ours = float(weighted_crossentropy_2d(jnp.asarray(logits), jnp.asarray(labels)))
    ref = _reference_loss(logits, labels)
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_2d_loss_clip_active_for_extreme_logits():
    # one pixel with a hugely wrong prediction: prob ~ 0 -> clipped at 1e-10
    logits = np.zeros((1, 1, 1, 3), np.float32)
    logits[0, 0, 0] = [60.0, -60.0, 0.0]
    labels = np.ones((1, 1, 1, 1), np.int16)
    ours = float(weighted_crossentropy_2d(jnp.asarray(logits), jnp.asarray(labels)))
    np.testing.assert_allclose(ours, -0.65 * np.log(1e-10), rtol=1e-6)


def test_hybrid_loss_masks_boundary_slices(rng_np):
    logits = rng_np.standard_normal((2, 4, 4, 8, 3)).astype(np.float32)
    labels = rng_np.integers(0, 3, (2, 4, 4, 8, 1)).astype(np.int16)
    ours = float(weighted_crossentropy_hybrid(jnp.asarray(logits), jnp.asarray(labels)))
    # reference slices z 1:7 before flattening (loss.py:6-7)
    ref = _reference_loss(logits[:, :, :, 1:7, :], labels[:, :, :, 1:7, :])
    np.testing.assert_allclose(ours, ref, rtol=1e-5)

    # corrupting boundary slices must not change the loss
    logits2 = logits.copy()
    logits2[:, :, :, 0, :] = 999.0
    logits2[:, :, :, 7, :] = -999.0
    ours2 = float(weighted_crossentropy_hybrid(jnp.asarray(logits2), jnp.asarray(labels)))
    np.testing.assert_allclose(ours2, ours, rtol=1e-6)
