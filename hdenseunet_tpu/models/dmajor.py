"""D-major execution of the 3D branch: tensors laid out (B, D, H, W, C).

Motivation (BENCH_NOTES.md round-3 per-op campaign): the canonical
(B, H, W, D, C) layout puts the CT depth D in the memory tile's second-minor
position, and mid-network D is 2-4 against the (8,128)/(16,128) TPU tile —
padding every activation byte 2-8x. Re-ordering to (B, D, H, W, C) keeps
(W, C) minor (both large and aligned); measured up to 1.7x faster on the big
decoder convs (up1), but SLOWER on the encoder's small-spatial 1x1x1 ops —
so the layout is selected per graph segment by the model, not globally.

Parameter names and shapes are byte-identical to the canonical path
(layers.conv3d): the kernel is stored (kh, kw, kz, Cin, F) and transposed to
(kz, kh, kw, Cin, F) at trace time, so checkpoints and the HDF5 converter are
unaffected. Exact: same multiply-accumulate set, only the XLA layout differs.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

from ..core.module import Ctx
from . import layers as L


def fold(x):
    """(B, H, W, D, C) -> (B, D, H, W, C)."""
    return jnp.transpose(x, (0, 3, 1, 2, 4))


def unfold(xd):
    """(B, D, H, W, C) -> (B, H, W, D, C)."""
    return jnp.transpose(xd, (0, 2, 3, 1, 4))


def conv3d(
    ctx: Ctx,
    xd,
    name,
    features,
    kernel,
    *,
    stride=1,
    padding="same",
    use_bias=True,
    init="glorot_uniform",
):
    """3D conv on (B, D, H, W, C) input, canonical (kh, kw, kz, Cin, F) param."""
    kh, kw, kz = L._norm_tuple(kernel, 3)
    sh, sw, sz = L._norm_tuple(stride, 3)
    cin = int(xd.shape[-1])
    w = ctx.param(name, "kernel", (kh, kw, kz, cin, features), init)

    # resolve padding in the canonical (H, W, D) order, then reorder
    sizes_hwd = (xd.shape[2], xd.shape[3], xd.shape[1])
    pad_arg = padding if isinstance(padding, (str, int)) else tuple(padding)
    pads_hwd = L._conv_padding(sizes_hwd, (kh, kw, kz), (sh, sw, sz), pad_arg)
    pads = [pads_hwd[2], pads_hwd[0], pads_hwd[1]]

    if getattr(ctx, "flops", None) is not None:
        out_sp = [
            (sizes_hwd[i] + pads_hwd[i][0] + pads_hwd[i][1] - (kh, kw, kz)[i])
            // (sh, sw, sz)[i]
            + 1
            for i in range(3)
        ]
        f = (
            2.0 * int(xd.shape[0]) * float(np.prod(out_sp)) * features
            * float(kh * kw * kz) * cin
        )
        ctx.flops[0] += f
        table = getattr(ctx, "flop_table", None)
        if table is not None:
            table[name] = table.get(name, 0.0) + f

    y = lax.conv_general_dilated(
        xd.astype(ctx.compute_dtype),
        jnp.transpose(w, (2, 0, 1, 3, 4)).astype(ctx.compute_dtype),
        window_strides=(sz, sh, sw),
        padding=pads,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    if use_bias:
        b = ctx.param(name, "bias", (features,), "zeros")
        y = y + b.astype(y.dtype)
    return y


def max_pool(xd, window, stride, pad=0):
    """Zero-padded VALID max pool; window/stride/pad in canonical (H, W, D)."""
    wh, ww, wz = L._norm_tuple(window, 3)
    sh, sw, sz = L._norm_tuple(stride, 3)
    ph, pw, pz = L._norm_tuple(pad, 3)
    return L.max_pool(xd, (wz, wh, ww), (sz, sh, sw), pad=(pz, ph, pw))


def avg_pool(xd, window, stride):
    wh, ww, wz = L._norm_tuple(window, 3)
    sh, sw, sz = L._norm_tuple(stride, 3)
    return L.avg_pool(xd, (wz, wh, ww), (sz, sh, sw))


def upsample_nearest(xd, factors):
    fh, fw, fz = L._norm_tuple(factors, 3)
    return L.upsample_nearest(xd, (fz, fh, fw))
