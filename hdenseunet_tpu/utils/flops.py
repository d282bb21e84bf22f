"""Analytic FLOP accounting (convolutions — >99.9% of this workload's math).

Counts are derived by abstractly tracing the REAL model apply functions
(``jax.eval_shape``, zero FLOPs executed) with a counting hook in
``models.layers.conv``, so they track the actual graph — no hand-maintained
architecture tables to drift. Used by bench.py to report MFU
(model FLOP/s / peak chip FLOP/s) next to the latency headline.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.module import Ctx

# bf16 peak TFLOP/s per chip by device_kind substring (public TPU specs)
PEAK_BF16_TFLOPS = {
    "v5 lite": 197.0,  # v5e
    "v5e": 197.0,
    "v4": 275.0,
    "v5p": 459.0,
    "v5": 459.0,  # v5p reports 'TPU v5'
    "v6 lite": 918.0,  # Trillium / v6e
    "v6e": 918.0,
}


def peak_flops_per_chip(default_tflops: float = 197.0) -> float:
    """Best-effort bf16 peak for jax.devices()[0] (override: env BENCH_PEAK_TFLOPS)."""
    import os

    env = os.environ.get("BENCH_PEAK_TFLOPS")
    if env:
        return float(env) * 1e12
    kind = jax.devices()[0].device_kind.lower()
    for key, tf in PEAK_BF16_TFLOPS.items():
        if key in kind:
            return tf * 1e12
    return default_tflops * 1e12


def conv_flops(apply_fn, *example_shapes, **apply_kwargs) -> float:
    """Total conv FLOPs of one forward pass of ``apply_fn(ctx, *args)``.

    ``example_shapes``: (shape, dtype) tuples or plain shape tuples (f32).
    """
    args = [
        jax.ShapeDtypeStruct(s, jnp.float32) if isinstance(s, tuple) else s
        for s in example_shapes
    ]
    ctx = Ctx(record=True)
    ctx.flops = [0.0]
    jax.eval_shape(lambda *a: apply_fn(ctx, *a, **apply_kwargs), *args)
    return ctx.flops[0]


def hybrid_window_batch_flops(
    *,
    x: int,
    y: int,
    cols: int,
    wb: int,
    n_stacks_2d: int,
    preset: str = "full",
    num_classes: int = 3,
    arch: str = "end2end",
) -> float:
    """Conv FLOPs of ONE window-batch body of the device scorer.

    ``n_stacks_2d``: 2D slice-stacks actually computed per batch — wb*cols for
    the plain kernel, (wb-1)*stride + cols - 2 + 2*wb with in-batch dedup
    (infer/device_pipeline._score_volume_dedup2d).
    """
    from ..models import denseunet2d, denseunet3d
    from ..models.hybrid import hff_head

    f2d = conv_flops(
        denseunet2d.apply,
        (1, x, y, 3),
        bn_frozen=True,
        decoder_dropout=0.0,
        num_classes=num_classes,
        **denseunet2d.PRESETS[preset],
    )

    def tail(ctx, input3d, fea2d):
        feat3d, _ = denseunet3d.apply(
            ctx, input3d, num_classes=num_classes, **denseunet3d.PRESETS[preset]
        )
        return hff_head(ctx, feat3d, fea2d, arch=arch, num_classes=num_classes)

    feat_width = denseunet2d.PRESETS[preset].get(
        "decoder_widths", (768, 384, 96, 96, 64)
    )[-1]
    f3d = conv_flops(
        tail,
        (wb, x, y, cols, 1 + num_classes),
        (wb, x, y, cols, feat_width),
    )
    return n_stacks_2d * f2d + f3d
