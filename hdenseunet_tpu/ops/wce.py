"""Fused weighted cross-entropy kernel (reference loss.py, device-side).

Computes  L = -Σ_i m_i · w[y_i] · max(log p_i[y_i], ln 1e-10)  /  Σ_i m_i
over N pixels with C=3 classes and an inclusion mask m (all-ones for the 2D
stage; z-boundary mask for the hybrid stage, loss.py:6-7).

Layout: pixels ride the TPU *lane* axis (128-wide) and the 3 classes ride
sublanes — a (C=3→8, N) transposed view — so the class reduction is a cheap
8-sublane op and no lane is wasted on channel padding. One VMEM pass emits
per-tile partial (Σ m·w·logp, Σ m) pairs; the scalar division happens outside.
The backward pass is the closed form
    dL/dlogits_i = m_i·w_i·g_i·(softmax_i - onehot_{y_i}) / Σm
(g_i = 0 where the clip is active), supplied via custom_vjp so the kernel is
usable inside jitted, differentiated train steps.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dispatch import use_pallas

_LOG_CLIP = -23.025850929940457  # ln(1e-10), parity with reference loss.py:12
_LANES = 128
_TILE_N = 2048  # lanes per grid step (multiple of 128)


def _wce_kernel(lt_ref, y_ref, m_ref, w_ref, sums_ref, *, c: int):
    """lt: (8, TN) logits^T (rows >= c are -inf pad); y/m: (1, TN); w: (1, 8)."""
    lt = lt_ref[:].astype(jnp.float32)  # (8, TN)
    y = y_ref[:]  # (1, TN) int32
    m = m_ref[:].astype(jnp.float32)  # (1, TN)

    mx = jnp.max(lt, axis=0, keepdims=True)  # (1, TN)
    ex = jnp.exp(lt - mx)
    denom = jnp.sum(ex, axis=0, keepdims=True)  # padded rows hold exp(-inf)=0
    logp = lt - mx - jnp.log(denom)  # (8, TN)

    rows = jax.lax.broadcasted_iota(jnp.int32, logp.shape, 0)
    onehot = (rows == y).astype(jnp.float32)  # broadcast (8,TN) vs (1,TN)
    picked = jnp.sum(jnp.where(rows == y, logp, 0.0), axis=0, keepdims=True)
    picked = jnp.maximum(picked, _LOG_CLIP)

    w = w_ref[:]  # (1, 8) float32
    wy = jnp.sum(jnp.where(rows == y, w.reshape(8, 1), 0.0), axis=0, keepdims=True)

    del onehot, c
    # output tile is (1, 8, 128) per grid step — mosaic requires the last two
    # block dims be (8k, 128k). Row 0 lane 0 carries Σ m·w·logp, row 0 lane 1
    # carries Σ m; everything else is zero.
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 8, _LANES), 2)
    row = jax.lax.broadcasted_iota(jnp.int32, (1, 8, _LANES), 1)
    s = jnp.sum(m * wy * picked)
    cnt = jnp.sum(m)
    vals = jnp.where(lane == 0, s, jnp.where(lane == 1, cnt, 0.0))
    sums_ref[:] = jnp.where(row == 0, vals, 0.0)


def _wce_forward_pallas(logits2, labels1, mask1, weights, *, interpret=False):
    """logits2: (N, C); labels1/mask1: (N,). Returns (sum_wlogp, sum_mask)."""
    n, c = logits2.shape
    assert c <= 8, c
    n_pad = (-n) % _TILE_N
    npad = n + n_pad

    lt = jnp.full((8, npad), -jnp.inf, jnp.float32)
    lt = lt.at[:c, :n].set(logits2.astype(jnp.float32).T)
    # padded lanes: route to class 0 with mask 0 (excluded from both sums);
    # give them a finite logit so log-softmax stays NaN-free
    lt = lt.at[0, n:].set(0.0)
    y = jnp.zeros((1, npad), jnp.int32).at[0, :n].set(labels1.astype(jnp.int32))
    m = jnp.zeros((1, npad), jnp.float32).at[0, :n].set(mask1.astype(jnp.float32))
    w = jnp.zeros((1, 8), jnp.float32).at[0, :c].set(jnp.asarray(weights, jnp.float32))

    grid = (npad // _TILE_N,)
    sums = pl.pallas_call(
        functools.partial(_wce_kernel, c=c),
        out_shape=jax.ShapeDtypeStruct((grid[0], 8, _LANES), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, _TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 8, _LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(lt, y, m, w)
    total = jnp.sum(sums, axis=(0, 1))
    return total[0], total[1]


def _wce_xla(logits2, labels1, mask1, weights):
    logp = jax.nn.log_softmax(logits2.astype(jnp.float32), axis=-1)
    logp = jnp.maximum(logp, _LOG_CLIP)
    picked = jnp.take_along_axis(logp, labels1[:, None], axis=-1)[:, 0]
    w = jnp.asarray(weights, jnp.float32)[labels1]
    m = mask1.astype(jnp.float32)
    return jnp.sum(m * w * picked), jnp.sum(m)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def weighted_ce(logits2, labels1, mask1, weights, interpret=False):
    """Masked weighted CE over flat (N, C) logits. Differentiable.

    Equals train.loss.weighted_crossentropy_* after the caller flattens and
    builds the mask; those wrappers dispatch here.
    """
    if (use_pallas() or interpret) and logits2.shape[-1] <= 8:
        s, cnt = _wce_forward_pallas(
            logits2, labels1, mask1, weights, interpret=interpret
        )
    else:
        s, cnt = _wce_xla(logits2, labels1.astype(jnp.int32), mask1, weights)
    return -s / cnt


def _fwd(logits2, labels1, mask1, weights, interpret):
    loss = weighted_ce(logits2, labels1, mask1, weights, interpret)
    return loss, (logits2, labels1, mask1)


def _bwd(weights, interpret, res, g):
    logits2, labels1, mask1 = res
    labels1 = labels1.astype(jnp.int32)
    logp = jax.nn.log_softmax(logits2.astype(jnp.float32), axis=-1)
    p = jnp.exp(logp)
    onehot = jax.nn.one_hot(labels1, logits2.shape[-1], dtype=jnp.float32)
    picked = jnp.take_along_axis(logp, labels1[:, None], axis=-1)[:, 0]
    live = (picked > _LOG_CLIP).astype(jnp.float32)  # clip kills the gradient
    w = jnp.asarray(weights, jnp.float32)[labels1]
    m = mask1.astype(jnp.float32)
    cnt = jnp.sum(m)
    coeff = (m * w * live / cnt)[:, None]
    dlogits = g * coeff * (p - onehot)
    return (dlogits.astype(logits2.dtype), None, None)


weighted_ce.defvjp(_fwd, _bwd)
