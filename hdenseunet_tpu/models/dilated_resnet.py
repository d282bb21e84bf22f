"""3D dilated residual encoder-decoder (reference hybridnet.py:426-585
`dilated_resnet`).

Present in the reference as a defined-but-unused alternative architecture; kept
here for capability parity. The reference version has no layer names (Keras
auto-naming) and no released checkpoint, so names here are deterministic
`dr_*` identifiers.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from ..core.module import Ctx, init as module_init
from . import layers as L


def _conv(ctx, x, name, ch, kernel=3, dilation=1):
    """3D 'same' conv with kernel_initializer='normal' (reference default)."""
    cin = int(x.shape[-1])
    k = (kernel,) * 3
    w = ctx.param(name, "kernel", k + (cin, ch), "normal")
    pads = [((kernel - 1) * dilation // 2,) * 2 for _ in range(3)]
    y = lax.conv_general_dilated(
        x.astype(ctx.compute_dtype),
        w.astype(ctx.compute_dtype),
        window_strides=(1, 1, 1),
        padding=[tuple(p) for p in pads],
        rhs_dilation=(dilation,) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    b = ctx.param(name, "bias", (ch,), "zeros")
    return y + b.astype(y.dtype)


def _res_block(ctx, x, name, ch):
    """conv-bn-relu-conv-bn + 1x1-conv-bn shortcut, add, relu
    (reference hybridnet.py:434-442 pattern)."""
    y = _conv(ctx, x, f"{name}_c1", ch, 3)
    y = L.batch_norm(ctx, y, f"{name}_bn1")
    y = L.relu(y)
    y = _conv(ctx, y, f"{name}_c2", ch, 3)
    y = L.batch_norm(ctx, y, f"{name}_bn2")
    s = _conv(ctx, x, f"{name}_proj", ch, 1)
    s = L.batch_norm(ctx, s, f"{name}_bnp")
    return L.relu(s + y)


def _dilated_block(ctx, x, name, ch=512):
    """Two dilation-2 convs with identity residual (hybridnet.py:472-478)."""
    y = _conv(ctx, x, f"{name}_c1", ch, 3, dilation=2)
    y = L.batch_norm(ctx, y, f"{name}_bn1")
    y = L.relu(y)
    y = _conv(ctx, y, f"{name}_c2", ch, 3, dilation=2)
    y = L.batch_norm(ctx, y, f"{name}_bn2")
    return L.relu(x + y)


def _up_merge(ctx, x_up, x_skip, name, ch):
    """Upsample (2,2,1) and add a BN'd 1x1 projection of the skip
    (hybridnet.py:503-506 pattern)."""
    up = L.upsample_nearest(x_up, (2, 2, 1))
    p = _conv(ctx, x_skip, f"{name}_proj", ch, 1)
    p = L.batch_norm(ctx, p, f"{name}_bn")
    return p + up


def apply(ctx: Ctx, x, *, num_classes: int = 2, widths=(64, 128, 256, 512)):
    """Forward pass. x: (B, H, W, D, C), H and W divisible by 16.

    ``widths``: channel counts of the four scales (reference hard-codes
    64/128/256/512, hybridnet.py:428-470); smaller values serve tests and the
    NumPy-oracle parity check (tests/keras_oracle.py::dilated_resnet).
    """
    assert x.ndim == 5 and x.shape[1] % 16 == 0 and x.shape[2] % 16 == 0, x.shape
    w0, w1, w2, w3 = widths
    c1 = _conv(ctx, x, "dr_stem", w0, 3)
    c1 = L.batch_norm(ctx, c1, "dr_stem_bn")
    ac0 = L.relu(c1)
    p1 = L.max_pool(ac0, (2, 2, 1), (2, 2, 1))

    res1 = _res_block(ctx, p1, "dr_res1", w1)
    p2 = L.max_pool(res1, (2, 2, 1), (2, 2, 1))
    res2 = _res_block(ctx, p2, "dr_res2", w2)
    p3 = L.max_pool(res2, (2, 2, 1), (2, 2, 1))
    res3 = _res_block(ctx, p3, "dr_res3", w3)
    delres = _dilated_block(ctx, res3, "dr_dil1", w3)

    p4 = L.max_pool(delres, (2, 2, 1), (2, 2, 1))
    res3_4 = _res_block(ctx, p4, "dr_res4", w3)
    delres2 = _dilated_block(ctx, res3_4, "dr_dil2", w3)

    sum4 = _up_merge(ctx, delres2, delres, "dr_up0", w3)
    res4_1 = _res_block(ctx, sum4, "dr_res5", w3)
    delres3 = _dilated_block(ctx, res4_1, "dr_dil3", w3)

    sum4_1 = _up_merge(ctx, delres3, res2, "dr_up1", w3)
    res4 = _res_block(ctx, sum4_1, "dr_res6", w2)
    sum6 = _up_merge(ctx, res4, res1, "dr_up2", w2)
    res5 = _res_block(ctx, sum6, "dr_res7", w1)
    sum8 = _up_merge(ctx, res5, ac0, "dr_up3", w1)
    res6 = _res_block(ctx, sum8, "dr_res8", w0)

    return _conv(ctx, res6, "dr_head", num_classes, 1)


def init(rng, *, input_size=224, input_cols=8, channels=1, batch=1, **kwargs):
    example = jnp.zeros((batch, input_size, input_size, input_cols, channels), jnp.float32)
    return module_init(apply, rng, example, **kwargs)
