"""Functional layer kit (NHWC / NDHWC, static shapes, XLA-friendly).

TPU-native replacement for the subset of the vendored Keras layer library the
reference exercises (SURVEY.md §2b row B10): Conv2D/Conv3D, Max/AveragePooling,
UpSampling (nearest), ZeroPadding (folded into explicit conv/pool padding),
BatchNormalization (three freeze modes), the custom per-channel Scale affine
(reference lib/custom_layers.py:10-69), Dropout, and Lambda-style slicing
(done with plain jnp ops at the model level).

Numerical-parity notes vs the reference:
* Encoder convs are ZeroPadding2D + VALID conv (reference densenet.py:44-51,
  :131-132) — implemented as explicit symmetric lax.conv padding, which is
  bit-identical.
* MaxPooling after ZeroPadding pads with *zeros*, not -inf. Inputs are
  post-ReLU (>= 0) and every window contains at least one real pixel, so
  zero-padding == -inf-padding here; we still pad explicitly with zeros to be
  exact (see tests/test_layers.py).
* Decoder convs use TF 'SAME' padding (densenet.py:71 etc.) — implemented with
  the TF asymmetric-split rule (extra padding goes to bottom/right).
* BatchNorm matches Keras-2.0.8 semantics (normalization.py:114-188): biased
  batch variance, moving = momentum*moving + (1-momentum)*batch, default
  epsilon 1e-3 (encoder BNs pass 1.1e-5 explicitly), and a *frozen* mode
  replicating `momentum=1, trainable=False, training=False`
  (hybridnet.py:211 et al.): moving stats are always used and never updated.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import ad_checkpoint, lax

from ..core.module import Ctx

# ---------------------------------------------------------------------------
# padding helpers
# ---------------------------------------------------------------------------


def _norm_tuple(v, n):
    if isinstance(v, int):
        return (v,) * n
    return tuple(int(x) for x in v)


def _same_pads(size, kernel, stride):
    """TF 'SAME' padding split for one spatial dim (extra pad at the end)."""
    if size % stride == 0:
        total = max(kernel - stride, 0)
    else:
        total = max(kernel - (size % stride), 0)
    return (total // 2, total - total // 2)


def _conv_padding(x_spatial, kernel, stride, padding):
    """Resolve padding to an explicit per-dim (lo, hi) list.

    padding: 'same' | int | tuple of ints (symmetric explicit zero-pad, i.e.
    Keras ZeroPaddingND followed by a VALID conv).
    """
    n = len(x_spatial)
    if padding == "same":
        return [_same_pads(x_spatial[i], kernel[i], stride[i]) for i in range(n)]
    if padding == "valid":
        return [(0, 0)] * n
    pads = _norm_tuple(padding, n)
    return [(p, p) for p in pads]


# ---------------------------------------------------------------------------
# convolutions
# ---------------------------------------------------------------------------

_DIMNUMS = {2: ("NHWC", "HWIO", "NHWC"), 3: ("NDHWC", "DHWIO", "NDHWC")}


def conv(
    ctx: Ctx,
    x,
    name: str,
    features: int,
    kernel,
    *,
    stride=1,
    padding="same",
    use_bias: bool = True,
    init: str = "glorot_uniform",
):
    """N-d convolution over channels-last input (N=2 or 3 spatial dims)."""
    ndim = x.ndim - 2
    kernel = _norm_tuple(kernel, ndim)
    stride = _norm_tuple(stride, ndim)
    cin = int(x.shape[-1])
    w = ctx.param(name, "kernel", kernel + (cin, features), init)
    pads = _conv_padding(x.shape[1:-1], kernel, stride, padding)
    if getattr(ctx, "flops", None) is not None:
        # analytic accounting hook (utils/flops.py): 2 * out_elements * K * Cin
        out_sp = [
            (x.shape[1 + i] + pads[i][0] + pads[i][1] - kernel[i]) // stride[i] + 1
            for i in range(ndim)
        ]
        f = (
            2.0 * int(x.shape[0]) * float(np.prod(out_sp)) * features
            * float(np.prod(kernel)) * cin
        )
        ctx.flops[0] += f
        table = getattr(ctx, "flop_table", None)
        if table is not None:
            table[name] = table.get(name, 0.0) + f
    y = lax.conv_general_dilated(
        x.astype(ctx.compute_dtype),
        w.astype(ctx.compute_dtype),
        window_strides=stride,
        padding=pads,
        dimension_numbers=_DIMNUMS[ndim],
    )
    if use_bias:
        b = ctx.param(name, "bias", (features,), "zeros")
        y = y + b.astype(y.dtype)
    # offerable residual for the selective remat policy
    # (TrainConfig.remat_policy='convs', core.module.maybe_remat): identity
    # outside jax.checkpoint; under the policy, conv outputs are saved and
    # only the elementwise chains rematerialize.
    return ad_checkpoint.checkpoint_name(y, "conv_out")


def conv2d(ctx, x, name, features, kernel, **kw):
    assert x.ndim == 4, x.shape
    return conv(ctx, x, name, features, kernel, **kw)


def conv3d(ctx, x, name, features, kernel, **kw):
    assert x.ndim == 5, x.shape
    return conv(ctx, x, name, features, kernel, **kw)


# ---------------------------------------------------------------------------
# normalization
# ---------------------------------------------------------------------------


def batch_norm(
    ctx: Ctx,
    x,
    name: str,
    *,
    eps: float = 1e-3,
    momentum: float = 0.99,
    frozen: bool = False,
):
    """Keras-2.0.8-semantics channel-last BatchNormalization.

    frozen=True replicates the reference's hybrid-stage BN freeze
    (`momentum=1, trainable=False`, called with `training=False` —
    hybridnet.py:211, denseunet3d.py:223): inference statistics always, no
    state updates. Whether gamma/beta receive gradients is decided by the
    optimizer's trainable mask, not here (functionally equivalent to Keras
    `trainable=False` since the stats path is already frozen).
    """
    c = int(x.shape[-1])
    gamma = ctx.param(name, "gamma", (c,), "ones")
    beta = ctx.param(name, "beta", (c,), "zeros")
    mov_mean = ctx.stat(name, "moving_mean", (c,), 0.0)
    mov_var = ctx.stat(name, "moving_variance", (c,), 1.0)

    if ctx.train and not frozen:
        axes = tuple(range(x.ndim - 1))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axes)
        var = jnp.var(xf, axes)  # biased, like tf.nn.moments
        ctx.put_stat(name, "moving_mean", momentum * mov_mean + (1.0 - momentum) * mean)
        ctx.put_stat(
            name, "moving_variance", momentum * mov_var + (1.0 - momentum) * var
        )
    else:
        mean, var = mov_mean, mov_var

    # Per-channel affine folded in float32, applied in the tensor's own dtype:
    # keeps the elementwise chain single-width in bfloat16 mode (upcasting the
    # whole tensor to f32 would double HBM traffic through the BN->Scale->ReLU
    # chain in front of every conv).
    inv = lax.rsqrt(var + eps) * gamma
    shift = beta - mean * inv
    return x * inv.astype(x.dtype) + shift.astype(x.dtype)


def bn_scale_relu(
    ctx: Ctx,
    x,
    bn_name: str,
    scale_name: str,
    *,
    eps: float = 1e-3,
    momentum: float = 0.99,
    frozen: bool = False,
    relu_after: bool = True,
):
    """BN -> Scale -> [ReLU], the chain in front of every encoder conv
    (reference densenet.py:109-136, denseunet3d.py:40-47).

    When the BN statistics path is frozen/inference, both affines fold into a
    single per-channel (A, B) pair applied in ONE fused pass
    (ops.fused_affine — Pallas on TPU). In training mode with live stats the
    three ops run separately so the batch-statistics update semantics are
    untouched.
    """
    if ctx.train and not frozen:
        y = batch_norm(ctx, x, bn_name, eps=eps, momentum=momentum, frozen=False)
        y = scale(ctx, y, scale_name)
        return relu(y) if relu_after else y

    from ..ops.fused_affine import affine_relu, fold_bn_scale

    c = int(x.shape[-1])
    gamma_bn = ctx.param(bn_name, "gamma", (c,), "ones")
    beta_bn = ctx.param(bn_name, "beta", (c,), "zeros")
    mean = ctx.stat(bn_name, "moving_mean", (c,), 0.0)
    var = ctx.stat(bn_name, "moving_variance", (c,), 1.0)
    gamma_s = ctx.param(scale_name, "gamma", (c,), "ones")
    beta_s = ctx.param(scale_name, "beta", (c,), "zeros")
    a, b = fold_bn_scale(gamma_bn, beta_bn, mean, var, gamma_s, beta_s, eps)
    return affine_relu(x, a, b, relu=relu_after)


def scale(ctx: Ctx, x, name: str):
    """Per-channel affine `out = gamma*x + beta` (reference lib/custom_layers.py:63-69).

    Companion to BN for the Caffe-converted DenseNet-161 weights, which store
    normalization statistics (BN) and the learned affine (Scale) separately.
    """
    c = int(x.shape[-1])
    gamma = ctx.param(name, "gamma", (c,), "ones")
    beta = ctx.param(name, "beta", (c,), "zeros")
    return x * gamma.astype(x.dtype) + beta.astype(x.dtype)


# ---------------------------------------------------------------------------
# pooling / resizing
# ---------------------------------------------------------------------------


def max_pool(x, window, stride, pad=0):
    """Max pool with explicit *zero* padding (Keras ZeroPaddingND + VALID pool)."""
    ndim = x.ndim - 2
    window = _norm_tuple(window, ndim)
    stride = _norm_tuple(stride, ndim)
    pads = _norm_tuple(pad, ndim)
    if any(pads):
        cfg = [(0, 0)] + [(p, p) for p in pads] + [(0, 0)]
        x = jnp.pad(x, cfg, mode="constant")
    dims = (1,) + window + (1,)
    strides = (1,) + stride + (1,)
    return lax.reduce_window(x, -jnp.inf, lax.max, dims, strides, "VALID").astype(
        x.dtype
    )


def avg_pool(x, window, stride):
    """VALID average pool (reference transition blocks, densenet.py:164)."""
    ndim = x.ndim - 2
    window = _norm_tuple(window, ndim)
    stride = _norm_tuple(stride, ndim)
    dims = (1,) + window + (1,)
    strides = (1,) + stride + (1,)
    summed = lax.reduce_window(
        x.astype(jnp.float32), 0.0, lax.add, dims, strides, "VALID"
    )
    return (summed / float(np.prod(window))).astype(x.dtype)


def upsample_nearest(x, factors):
    """Nearest-neighbor upsample = UpSampling2D/3D (backend resize_images
    tensorflow_backend.py:1739 / resize_volumes :1776)."""
    ndim = x.ndim - 2
    factors = _norm_tuple(factors, ndim)
    for axis, f in enumerate(factors, start=1):
        if f != 1:
            x = jnp.repeat(x, f, axis=axis)
    return x


# ---------------------------------------------------------------------------
# misc
# ---------------------------------------------------------------------------


def relu(x):
    return jnp.maximum(x, 0)


def dropout(ctx: Ctx, x, rate: float):
    """Inverted dropout, active only in train mode (Keras core.py Dropout)."""
    if not ctx.train or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(ctx.next_rng(), keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)
