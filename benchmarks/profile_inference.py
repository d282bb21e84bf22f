"""Per-segment inference profiler: attribute the volume latency to components.

Times each compute segment of the device-resident scorer on the real chip and
reports achieved TFLOP/s vs the analytic conv FLOPs (utils/flops.py) and the
chip's bf16 peak — the breakdown the headline s/volume metric can't show.

Segments:
  matmul-peak  sanity ceiling: big bf16 GEMM (what the chip can actually do)
  2d-full      2D DenseUNet-167 forward, dedup-batch shape (36 stacks @512^2)
  2d-encoder   encoder only (dense blocks; decoder cost = full - encoder)
  3d-hff       3D DenseNet + HFF head on one window batch (8 windows)
  volume       the full committed scorer (headline config)

Timing protocol for the tunneled dev box: per-dispatch relay overhead here is
~1-2 s with multi-second noise, so the repetition loop lives INSIDE one
compiled program (lax.fori_loop whose input depends on the carry — the
loop-carried data dependence stops XLA hoisting the loop-invariant model
call), and the per-iteration time is the slope between a k-small and a k-big
program, each timed as min over reps of one dispatch + scalar fetch
(jax.block_until_ready is a no-op on this backend). Run EXCLUSIVELY.

Usage: python benchmarks/profile_inference.py [--size 512] [--wb 8] [--reps 2]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--wb", type=int, default=8)
    ap.add_argument("--z", type=int, default=192)
    ap.add_argument("--preset", default="full")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--k", type=int, default=8, help="k-big inner iterations")
    ap.add_argument("--segments", default="matmul,2d-full,2d-encoder,3d-hff,volume")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from hdenseunet_tpu.core.config import InferConfig
    from hdenseunet_tpu.core.module import Ctx
    from hdenseunet_tpu.models import denseunet2d, denseunet3d, hybrid
    from hdenseunet_tpu.models.hybrid import hff_head
    from hdenseunet_tpu.utils import flops as F

    size, wb = args.size, args.wb
    dtype = jnp.dtype(args.dtype)
    peak = F.peak_flops_per_chip()
    segments = args.segments.split(",")

    def slope_time(scalar_fn, inputs, k_big=args.k, k_small=1, reps=args.reps):
        """Per-iteration seconds of scalar_fn(*inputs, jitter) via in-program
        repetition: one fori_loop dispatch per measurement; slope between the
        k_small- and k_big-iteration programs; min over reps (relay noise is
        one-sided)."""

        def make(k):
            @jax.jit
            def g(*xs):
                def body(i, acc):
                    # acc-dependent jitter = loop-carried dependence: the model
                    # call cannot be hoisted out of the loop
                    return acc + scalar_fn(*xs, jitter=acc * 1e-30)
                return lax.fori_loop(0, k, body, jnp.float32(0.0))
            return g

        g_small, g_big = make(k_small), make(k_big)

        def run(g):
            t0 = time.perf_counter()
            _ = float(g(*inputs))  # scalar fetch = sync
            return time.perf_counter() - t0

        run(g_small), run(g_big)  # compile both
        ts = min(run(g_small) for _ in range(reps))
        tb = min(run(g_big) for _ in range(reps))
        return max((tb - ts) / (k_big - k_small), 1e-9)

    def report(name, seconds, fl):
        print(
            json.dumps(
                {
                    "segment": name,
                    "seconds": round(seconds, 4),
                    "tflop": round(fl / 1e12, 3),
                    "achieved_tflops": round(fl / seconds / 1e12, 1),
                    "pct_peak": round(100 * fl / seconds / peak, 1),
                }
            ),
            flush=True,
        )

    if "matmul" in segments:
        n = 8192
        a = jnp.asarray(np.random.default_rng(0).normal(0, 1, (n, n)), dtype)
        b = jnp.asarray(np.random.default_rng(1).normal(0, 1, (n, n)), dtype)

        def mm(a, b, *, jitter):
            return jnp.sum(((a + jitter.astype(dtype)) @ b).astype(jnp.float32))

        report("matmul-peak", slope_time(mm, (a, b), k_big=32), 2.0 * n**3)

    cfg = InferConfig(input_size=size, window_batch=wb)
    stride, cols = cfg.window_stride, cfg.input_cols
    n_stacks = (wb - 1) * stride + cols - 2 + 2 * wb  # dedup batch 2D load

    params, bn_state = hybrid.init(
        jax.random.key(0), input_size=size, input_cols=cols, batch=1,
        arch="end2end", preset=args.preset,
    )
    kw2d = denseunet2d.PRESETS[args.preset]
    kw3d = denseunet3d.PRESETS[args.preset]
    rng = np.random.default_rng(0)

    if "2d-full" in segments or "2d-encoder" in segments:
        stacks = jnp.asarray(
            rng.normal(0, 60, (n_stacks, size, size, 3)).astype(np.float32), dtype
        )

        def f2d(p, s, x, *, jitter):
            ctx = Ctx(p, s, train=False, compute_dtype=dtype)
            feat, logits = denseunet2d.apply(
                ctx, x + jitter.astype(dtype), bn_frozen=True,
                decoder_dropout=0.0, **kw2d,
            )
            return jnp.sum(logits.astype(jnp.float32)) + jnp.sum(
                feat.astype(jnp.float32)
            )

        def fenc(p, s, x, *, jitter):
            ctx = Ctx(p, s, train=False, compute_dtype=dtype)
            feat, _ = denseunet2d.encoder(ctx, x + jitter.astype(dtype), frozen=True, **{
                k: v for k, v in kw2d.items() if k in ("blocks", "growth")
            })
            return jnp.sum(feat.astype(jnp.float32))

        fl_full = n_stacks * F.conv_flops(
            denseunet2d.apply, (1, size, size, 3), bn_frozen=True,
            decoder_dropout=0.0, **kw2d,
        )
        fl_enc = n_stacks * F.conv_flops(
            denseunet2d.encoder, (1, size, size, 3), frozen=True,
            **{k: v for k, v in kw2d.items() if k in ("blocks", "growth")},
        )
        if "2d-full" in segments:
            t = slope_time(f2d, (params, bn_state, stacks))
            report("2d-full", t, fl_full)
        if "2d-encoder" in segments:
            te = slope_time(fenc, (params, bn_state, stacks))
            report("2d-encoder", te, fl_enc)

    if "3d-hff" in segments:
        feat_width = kw2d.get("decoder_widths", (768, 384, 96, 96, 64))[-1]
        in3d = jnp.asarray(
            rng.normal(0, 1, (wb, size, size, cols, 4)).astype(np.float32), dtype
        )
        fea2d = jnp.asarray(
            rng.normal(0, 1, (wb, size, size, cols, feat_width)).astype(np.float32),
            dtype,
        )

        def f3d(p, s, x, fea, *, jitter):
            ctx = Ctx(p, s, train=False, compute_dtype=dtype)
            feat3d, _ = denseunet3d.apply(ctx, x + jitter.astype(dtype), **kw3d)
            out = hff_head(ctx, feat3d, fea, arch="end2end")
            return jnp.sum(out.astype(jnp.float32))

        def tail_fl(ctx, x, fea):
            feat3d, _ = denseunet3d.apply(ctx, x, **kw3d)
            return hff_head(ctx, feat3d, fea, arch="end2end")

        fl3d = F.conv_flops(
            tail_fl, (wb, size, size, cols, 4), (wb, size, size, cols, feat_width)
        )
        t3 = slope_time(f3d, (params, bn_state, in3d, fea2d))
        report("3d-hff", t3, fl3d)

    if "volume" in segments:
        from hdenseunet_tpu.infer.device_pipeline import DeviceVolumeScorer

        scorer = DeviceVolumeScorer(
            params, bn_state, cfg, arch="end2end", preset=args.preset,
            compute_dtype=args.dtype, z_bucket=64,
        )
        vol = rng.normal(0.0, 60.0, (size, size, args.z)).astype(np.float32)
        mini_z, maxi_z = int(args.z * 0.2), int(args.z * 0.8)
        scorer.summarize(vol, mini_z, maxi_z)  # compile
        times = []
        for _ in range(max(2, args.reps)):
            t0 = time.perf_counter()
            scorer.summarize(vol, mini_z, maxi_z)
            times.append(time.perf_counter() - t0)
        flv = scorer.estimate_flops(vol.shape, mini_z, maxi_z)
        report("volume(e2e incl h2d)", min(times), flv)


if __name__ == "__main__":
    main()
