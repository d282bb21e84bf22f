"""z-folded execution of the 3D branch: every op runs on (B*D, H, W, C).

Motivation (BENCH_NOTES.md round-2 analysis): XLA's TPU lowering of
3-spatial-dim convolutions is ~3x slower than the equivalent work expressed
as 2-spatial-dim convolutions — and the 3D DenseNet branch is ~2/3 of the
hybrid's inference FLOPs. This module re-expresses each 3D op exactly on a
z-folded layout, where the CT depth axis rides the batch dimension (the same
fold the hybrid already uses to feed its 2D branch, hybridnet.py:385-396):

* ``conv3d``: a (kh, kw, kz) convolution becomes ONE native 2D convolution
  whose output channels pack the kz z-taps (kernel (kh, kw, Cin, kz*F)),
  followed by kz z-shifted adds. Identical multiply-accumulate set — the
  result differs from the direct conv only by floating-point summation
  order. Bonus: packing taps raises MXU lane occupancy when F < 128
  (e.g. the growth-32 encoder convs: 32 -> 96 output lanes).
* 1x1x1 convs, (2,2,1)/(3,3,3) pools and (2,2,1) upsamples are pure 2D ops
  under the fold; (2,2,2) ops additionally reshape the folded batch axis.
* BN / Scale / ReLU / Dropout / concat are elementwise or channel-wise and
  need no translation (BN batch statistics reduce over the same element set).

The fold is exact up to reassociation; `tests/test_models.py` checks folded
vs direct agreement on every op and on the full 3D graph. Parameter names
and shapes are byte-identical to the direct path (the tap-packed kernel is
derived from the canonical (kh,kw,kz,Cin,F) parameter at trace time), so
checkpoints and the HDF5 converter are unaffected.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

from ..core.module import Ctx
from . import layers as L

# one-shot tap-packed conv intermediates above this size run window-by-window
# (lax.map) instead; ~1 GiB keeps the full-preset 512^2 decoder and the
# 7-tap stem inside a v5e-1's HBM alongside the volume score buffers
_MAX_PACK_BYTES = 1 << 30


def fold(x):
    """(B, H, W, D, C) -> ((B*D, H, W, C), B, D)."""
    b, h, w, d, c = x.shape
    xf = jnp.transpose(x, (0, 3, 1, 2, 4)).reshape(b * d, h, w, c)
    return xf, b, d


def unfold(xf, b, d):
    """(B*D, H, W, C) -> (B, H, W, D, C)."""
    bd, h, w, c = xf.shape
    assert bd == b * d, (xf.shape, b, d)
    return jnp.transpose(xf.reshape(b, d, h, w, c), (0, 2, 3, 1, 4))


def _z_pads(depth, kz, stride_z, padding):
    if padding == "same":
        out = -(-depth // stride_z)  # ceil
        total = max((out - 1) * stride_z + kz - depth, 0)
        return total // 2, total - total // 2
    if padding == "valid":
        return 0, 0
    # explicit padding: int or per-axis tuple, same grammar as layers.conv3d
    p = L._norm_tuple(padding, 3)[2]
    return p, p


def conv3d(
    ctx: Ctx,
    xf,
    b,
    d,
    name,
    features,
    kernel,
    *,
    stride=1,
    padding="same",
    use_bias=True,
    init="glorot_uniform",
):
    """Z-folded 3D conv. Returns (yf, new_depth).

    Same parameter (name, 'kernel', (kh,kw,kz,Cin,F)) as layers.conv3d, so
    both paths share checkpoints. FLOPs are accounted as the direct conv's
    useful FLOPs (the strided stem recomputes skipped z rows; that overhead
    is execution detail, not model work).
    """
    kh, kw, kz = L._norm_tuple(kernel, 3)
    sh, sw, sz = L._norm_tuple(stride, 3)
    cin = int(xf.shape[-1])
    w = ctx.param(name, "kernel", (kh, kw, kz, cin, features), init)

    pad_hw = (
        padding if isinstance(padding, (str, int)) else tuple(padding)[:2]
    )
    pads_hw = L._conv_padding(xf.shape[1:3], (kh, kw), (sh, sw), pad_hw)
    pz_lo, pz_hi = _z_pads(d, kz, sz, padding)
    d_out = (d + pz_lo + pz_hi - kz) // sz + 1

    if getattr(ctx, "flops", None) is not None:
        out_sp_hw = [
            (xf.shape[1 + i] + pads_hw[i][0] + pads_hw[i][1] - (kh, kw)[i])
            // (sh, sw)[i]
            + 1
            for i in range(2)
        ]
        f = (
            2.0 * b * float(np.prod(out_sp_hw)) * d_out * features
            * float(kh * kw * kz) * cin
        )
        ctx.flops[0] += f
        table = getattr(ctx, "flop_table", None)
        if table is not None:
            table[name] = table.get(name, 0.0) + f

    # pack the kz z-taps into output channels of one native 2D conv
    w = w.astype(ctx.compute_dtype)
    wp = jnp.concatenate([w[:, :, t] for t in range(kz)], axis=-1)  # (kh,kw,cin,kz*F)
    xc = xf.astype(ctx.compute_dtype)

    def one_shot(x4, nb):
        """Packed conv + z-shifted adds for nb batch elements of depth d."""
        y = lax.conv_general_dilated(
            x4,
            wp,
            window_strides=(sh, sw),
            padding=pads_hw,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        hh, ww = y.shape[1], y.shape[2]
        if kz == 1 and sz == 1:
            return y
        # out[:, dz] = sum_t y_t[:, sz*dz + t - pz_lo]   (zero beyond edges)
        y5 = y.reshape(nb, d, hh, ww, kz, features)
        if pz_lo or pz_hi:
            y5 = jnp.pad(y5, ((0, 0), (pz_lo, pz_hi), (0, 0), (0, 0), (0, 0), (0, 0)))
        out = None
        for t in range(kz):
            sl = lax.slice_in_dim(y5, t, t + sz * (d_out - 1) + 1, stride=sz, axis=1)
            part = sl[:, :, :, :, t]
            out = part if out is None else out + part
        return out.reshape(nb * d_out, hh, ww, features)

    # The packed intermediate holds kz*F channels at ALL d z-positions. At
    # full window batches and large spatial sizes (the 7-tap stem, the 512^2
    # decoder convs) that is multi-GB; bound it by mapping window-by-window
    # (lax.map over the batch axis) and, when one window alone exceeds the
    # bound (e.g. batch-1 decode at 512^2), by chunking along output-z with
    # a kz-1 input halo — same arithmetic either way, bounded live memory.
    hw_out = [
        (xf.shape[1 + i] + pads_hw[i][0] + pads_hw[i][1] - (kh, kw)[i])
        // (sh, sw)[i]
        + 1
        for i in range(2)
    ]
    itemsize = jnp.dtype(ctx.compute_dtype).itemsize
    per_window = (
        (d + pz_lo + pz_hi) * int(np.prod(hw_out)) * kz * features * itemsize
    )
    pack_bytes = b * per_window

    def z_chunked():
        """Output-z computed in equal chunks of dc positions via lax.map;
        each chunk's packed conv reads its sz*(dc-1)+kz input slices (zero
        z-padding applied up-front — z rides the 2D conv's batch axis, so a
        zero input slice yields a zero conv output, matching one_shot's
        post-conv padding)."""
        x5 = xc.reshape(b, d, *xc.shape[1:])
        if pz_lo or pz_hi:
            x5 = jnp.pad(x5, ((0, 0), (pz_lo, pz_hi)) + ((0, 0),) * 3)
        per_z = b * int(np.prod(hw_out)) * kz * features * itemsize
        dc = 1
        for cand in range(1, d_out + 1):
            if d_out % cand == 0 and (sz * (cand - 1) + kz) * per_z <= _MAX_PACK_BYTES:
                dc = cand
        din = sz * (dc - 1) + kz
        starts = jnp.arange(d_out // dc, dtype=jnp.int32) * (sz * dc)

        def chunk(z0):
            xs = lax.dynamic_slice_in_dim(x5, z0, din, axis=1)
            xs4 = xs.reshape(b * din, *xs.shape[2:])
            y = lax.conv_general_dilated(
                xs4,
                wp,
                window_strides=(sh, sw),
                padding=pads_hw,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            hh, ww = y.shape[1], y.shape[2]
            y6 = y.reshape(b, din, hh, ww, kz, features)
            out_c = None
            for t in range(kz):
                sl = lax.slice_in_dim(y6, t, t + sz * (dc - 1) + 1, stride=sz, axis=1)
                part = sl[:, :, :, :, t]
                out_c = part if out_c is None else out_c + part
            return out_c  # (b, dc, h', w', F)

        out6 = lax.map(chunk, starts)  # (n_chunks, b, dc, h', w', F)
        out6 = jnp.moveaxis(out6, 0, 1)  # (b, n_chunks, dc, h', w', F)
        return out6.reshape(b * d_out, *out6.shape[3:])

    if kz > 1 and pack_bytes > _MAX_PACK_BYTES:
        if b > 1 and per_window <= _MAX_PACK_BYTES:
            x6 = xc.reshape(b, d, *xc.shape[1:])
            out = lax.map(lambda xw: one_shot(xw, 1), x6)  # (b, d_out, h', w', F)
            out = out.reshape(b * d_out, *out.shape[2:])
        else:
            out = z_chunked()
    else:
        out = one_shot(xc, b)
    if use_bias:
        bias = ctx.param(name, "bias", (features,), "zeros")
        out = out + bias.astype(out.dtype)
    return out, d_out


def max_pool(xf, b, d, window, stride, pad=0):
    """Z-folded 3D max pool (zero-padded, VALID), returns (yf, new_depth)."""
    wh, ww_, wz = L._norm_tuple(window, 3)
    sh, sw, sz = L._norm_tuple(stride, 3)
    ph, pw, pz = L._norm_tuple(pad, 3)
    y = L.max_pool(xf, (wh, ww_), (sh, sw), pad=(ph, pw))
    if wz == 1 and sz == 1:
        return y, d
    d_out = (d + 2 * pz - wz) // sz + 1
    hh, ww2, c = y.shape[1:]
    y5 = y.reshape(b, d, hh, ww2, c)
    if pz:
        # zero padding (Keras ZeroPadding3D semantics, matching layers.max_pool)
        y5 = jnp.pad(y5, ((0, 0), (pz, pz), (0, 0), (0, 0), (0, 0)))
    out = None
    for t in range(wz):
        sl = lax.slice_in_dim(y5, t, t + sz * (d_out - 1) + 1, stride=sz, axis=1)
        out = sl if out is None else jnp.maximum(out, sl)
    return out.reshape(b * d_out, hh, ww2, c), d_out


def avg_pool(xf, b, d, window, stride):
    """Z-folded 3D average pool (VALID), returns (yf, new_depth)."""
    wh, ww_, wz = L._norm_tuple(window, 3)
    sh, sw, sz = L._norm_tuple(stride, 3)
    y = L.avg_pool(xf, (wh, ww_), (sh, sw))
    if wz == 1 and sz == 1:
        return y, d
    assert (wz, sz) == (2, 2), (wz, sz)
    d_out = d // 2
    hh, ww2, c = y.shape[1:]
    y6 = y.reshape(b, d_out, 2, hh, ww2, c)
    out = (
        (y6[:, :, 0].astype(jnp.float32) + y6[:, :, 1].astype(jnp.float32)) / 2.0
    ).astype(y.dtype)
    return out.reshape(b * d_out, hh, ww2, c), d_out


def upsample_nearest(xf, b, d, factors):
    """Z-folded nearest upsample, returns (yf, new_depth)."""
    fh, fw, fz = L._norm_tuple(factors, 3)
    y = L.upsample_nearest(xf, (fh, fw))
    if fz == 1:
        return y, d
    hh, ww2, c = y.shape[1:]
    y5 = y.reshape(b, d, hh, ww2, c)
    y5 = jnp.repeat(y5, fz, axis=1)
    return y5.reshape(b * d * fz, hh, ww2, c), d * fz
