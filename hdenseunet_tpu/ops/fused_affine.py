"""Fused per-channel affine (+ReLU): one VMEM pass for BN∘Scale[∘ReLU].

At inference every BatchNormalization in this model uses frozen statistics,
so BN is an affine y = x*a1 + b1; the reference's Caffe-style checkpoints pair
it with a separate Scale affine y = x*a2 + b2 (lib/custom_layers.py), and a
ReLU follows (densenet.py:109-136 conv blocks). Algebraically that is ONE
per-channel affine + clamp:

    relu((x*a1 + b1)*a2 + b2)  ==  relu(x*A + B),  A = a1*a2, B = b1*a2 + b2

Two execution paths:

* XLA (DEFAULT, measured faster): the folded affine+ReLU is a 3-op elementwise
  chain that XLA fuses into the producing/consuming convolutions' epilogues —
  zero extra HBM passes. Measured on v5e (benchmarks/profile_inference.py):
  routing this through the standalone Pallas kernel instead DOUBLED the
  DenseNet encoder's time (163 ms -> 80 ms for 36x512^2 stacks when removed),
  because a separate kernel forces a full read+write of every activation.
* Pallas kernel (explicit ``dispatch.set_backend('pallas')`` only): kept as a
  studied counter-example and for interpret-mode parity/grad tests.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dispatch import forced_pallas

_TILE_ROWS = 512


def _kernel(x_ref, scale_ref, shift_ref, out_ref, *, relu: bool):
    y = x_ref[:] * scale_ref[:] + shift_ref[:]
    if relu:
        y = jnp.maximum(y, jnp.zeros((), y.dtype))
    out_ref[:] = y


def _affine_relu_pallas(x2, scale, shift, *, relu: bool, interpret: bool = False):
    """x2: (N, C); scale/shift: (1, C) broadcast across rows."""
    n, c = x2.shape
    tile = min(_TILE_ROWS, n)
    grid = (pl.cdiv(n, tile),)
    return pl.pallas_call(
        functools.partial(_kernel, relu=relu),
        out_shape=jax.ShapeDtypeStruct((n, c), x2.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2, scale, shift)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _affine_relu_2d(x2, scale, shift, relu: bool, interpret: bool):
    """Differentiable fused affine(+ReLU) over (N, C) rows.

    Pallas has no reverse-mode autodiff, so the backward pass is supplied
    explicitly (plain XLA — it is a fully-fusable elementwise+reduce chain):
        dx = g·mask·a,  da = Σ g·mask·x,  db = Σ g·mask,  mask = [y > 0].
    Gradients w.r.t. the folded (a, b) flow back through ``fold_bn_scale`` to
    the raw BN/Scale parameters via ordinary autodiff, so training through the
    frozen-stats fused path (hybrid 3dpart/end2end) works on real TPUs.
    """
    return _affine_relu_pallas(x2, scale, shift, relu=relu, interpret=interpret)


def _affine_relu_2d_fwd(x2, scale, shift, relu: bool, interpret: bool):
    y = _affine_relu_pallas(x2, scale, shift, relu=relu, interpret=interpret)
    return y, (x2, scale, y)


def _affine_relu_2d_bwd(relu: bool, interpret: bool, res, g):
    x2, scale, y = res
    if relu:
        g = jnp.where(y > 0, g, jnp.zeros((), g.dtype))
    dx = g * scale
    gf = g.astype(jnp.float32)
    dscale = jnp.sum(gf * x2.astype(jnp.float32), axis=0, keepdims=True)
    dshift = jnp.sum(gf, axis=0, keepdims=True)
    return dx, dscale.astype(scale.dtype), dshift.astype(scale.dtype)


_affine_relu_2d.defvjp(_affine_relu_2d_fwd, _affine_relu_2d_bwd)


def affine_relu(x, scale, shift, *, relu: bool = True, interpret: bool = False):
    """relu(x * scale + shift) with per-channel (last-axis) scale/shift.

    x: (..., C); scale/shift: (C,). Default = plain XLA ops (fused into conv
    epilogues — see module docstring for the v5e measurement); the Pallas
    kernel runs only under an explicit set_backend('pallas') or interpret.
    Differentiable on both paths (custom VJP backs the Pallas kernel).
    """
    scale = scale.astype(x.dtype)
    shift = shift.astype(x.dtype)
    if not (forced_pallas() or interpret):
        y = x * scale + shift
        return jnp.maximum(y, 0) if relu else y
    c = x.shape[-1]
    orig_shape = x.shape
    x2 = x.reshape(-1, c)
    out = _affine_relu_2d(x2, scale.reshape(1, c), shift.reshape(1, c), relu, interpret)
    return out.reshape(orig_shape)


def fold_bn_scale(gamma_bn, beta_bn, mean, var, gamma_s, beta_s, eps):
    """Fold frozen-BN + Scale into one per-channel (A, B) pair (float32)."""
    inv = jax.lax.rsqrt(var.astype(jnp.float32) + eps) * gamma_bn.astype(jnp.float32)
    a1 = inv
    b1 = beta_bn.astype(jnp.float32) - mean.astype(jnp.float32) * inv
    a = a1 * gamma_s.astype(jnp.float32)
    b = b1 * gamma_s.astype(jnp.float32) + beta_s.astype(jnp.float32)
    return a, b
