"""Space-to-depth execution of the 3D stem's stride-2 convolution.

The reference 3D stem (denseunet3d.py:128: Conv3D 96 filters, 7x7x7,
stride 2, on a 4-channel input) starves the MXU: with Cin=4 the contraction
dimension is 4 per kernel tap, and the op measured 13.9 TF/s = 9% of its
analytic roofline (BENCH_NOTES.md round-3 campaign). Decomposing the
stride-2 conv into its 2^3 parity phases — each output reads the 8 parity
subgrids through a dense 4x4x4 stride-1 kernel — stacks the phases into
channels (Cin 4 -> 32, contraction 1372 -> 2048 MXU-aligned zero-padded
taps) and measured 6.79 ms vs 39.9 ms (5.9x, 55% of roofline) at the real
stem shape.

Exact modulo float-summation order (the added taps are zeros): same
multiply-accumulate set as the direct conv, canonical parameter layout
(kh, kw, kz, Cin, F) — the phase packing of BOTH the input and the kernel
happens at trace time with differentiable reshape/transpose/pad ops, so
checkpoints, the HDF5 converter, and training gradients are unaffected.

y[o] = sum_p w[p] x[st*o + p - pad]; writing p = st*q + r the inner sum
regroups by parity r into sum_r sum_q w[st*q+r] x_r[o+q], where
x_r[m] = x_padded[st*m + r] — a VALID stride-1 conv over the channel-
stacked x_r with the (q, r)-indexed repacked kernel.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

from ..core.module import Ctx
from . import layers as L


def conv3d_s2d(
    ctx: Ctx,
    x,
    name,
    features,
    kernel,
    *,
    stride=2,
    padding=3,
    use_bias=False,
    init="glorot_uniform",
    kernel_perm=(0, 1, 2),
):
    """Stride-2 3D conv via parity phase decomposition.

    x: (B, S1, S2, S3, C) with spatial dims in ANY order; ``kernel_perm``
    maps the canonical (kh, kw, kz) parameter axes onto x's spatial order
    ((0,1,2) for canonical (H,W,D) tensors, (2,0,1) for d-major (D,H,W)).
    Parameter shape/layout identical to layers.conv3d.
    """
    kk = L._norm_tuple(kernel, 3)
    st = L._norm_tuple(stride, 3)
    pd = L._norm_tuple(padding, 3)
    assert st == (2, 2, 2), f"s2d decomposition is for stride 2, got {st}"
    cin = int(x.shape[-1])
    w = ctx.param(name, "kernel", kk + (cin, features), init)

    # canonical -> x's spatial order
    kk = tuple(kk[a] for a in kernel_perm)
    pd = tuple(pd[a] for a in kernel_perm)
    w = jnp.transpose(w, tuple(kernel_perm) + (3, 4))

    if getattr(ctx, "flops", None) is not None:
        # model FLOPs of the original conv (the zero taps added by phase
        # packing are execution detail, not model work)
        out_sp_f = [
            (int(x.shape[1 + i]) + 2 * pd[i] - kk[i]) // 2 + 1 for i in range(3)
        ]
        f = (
            2.0 * int(x.shape[0]) * float(np.prod(out_sp_f)) * features
            * float(np.prod(kk)) * cin
        )
        ctx.flops[0] += f
        table = getattr(ctx, "flop_table", None)
        if table is not None:
            table[name] = table.get(name, 0.0) + f

    kq = tuple((k + 1) // 2 for k in kk)
    out_sp, halves = [], []
    cfg = [(0, 0)] * 5
    for ax in range(3):
        s_in = int(x.shape[1 + ax])
        o_n = (s_in + 2 * pd[ax] - kk[ax]) // 2 + 1
        need = 2 * (o_n - 1) + kk[ax]  # highest padded index read + 1
        half = max(-(-need // 2), o_n - 1 + kq[ax])
        cfg[1 + ax] = (pd[ax], half * 2 - s_in - pd[ax])
        out_sp.append(o_n)
        halves.append(half)
    xp = jnp.pad(x, cfg)

    # input phases: (B, 2h1, 2h2, 2h3, C) -> (B, h1, h2, h3, 8*C) with the
    # channel order (r1, r2, r3, c), r = parity per axis
    b = x.shape[0]
    h1, h2, h3 = halves
    xs = xp.reshape(b, h1, 2, h2, 2, h3, 2, cin)
    xs = jnp.transpose(xs, (0, 1, 3, 5, 2, 4, 6, 7))
    xs = xs.reshape(b, h1, h2, h3, 8 * cin)

    # kernel phases: pad each tap axis to 2*kq, split (q, r), merge
    # (r1, r2, r3, cin) into the input-channel axis in the same order
    wp = jnp.pad(
        w, [(0, 2 * kq[i] - kk[i]) for i in range(3)] + [(0, 0), (0, 0)]
    )
    ws = wp.reshape(kq[0], 2, kq[1], 2, kq[2], 2, cin, features)
    ws = jnp.transpose(ws, (0, 2, 4, 1, 3, 5, 6, 7))
    ws = ws.reshape(kq[0], kq[1], kq[2], 8 * cin, features)

    y = lax.conv_general_dilated(
        xs.astype(ctx.compute_dtype),
        ws.astype(ctx.compute_dtype),
        window_strides=(1, 1, 1),
        padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    y = y[:, : out_sp[0], : out_sp[1], : out_sp[2], :]
    if use_bias:
        bia = ctx.param(name, "bias", (features,), "zeros")
        y = y + bia.astype(y.dtype)
    return y
