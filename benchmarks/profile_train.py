"""Per-segment roofline campaign for the TRAIN step (VERDICT r3 item 3b).

Round 3 profiled inference per-op and found the 3D branch at its per-op
rooflines; the train step (fwd + bwd + SGD on the 2D stage, the weakest
compute number in the repo at 8.6% MFU) has had no such attribution. This
script measures, via the in-program loop-carried slope protocol (the only
signal that survives this host's relay noise):

  fwd        forward loss only (value, no grad)
  fwdbwd     forward + full backward (scalar = sum over ALL grad leaves, so
             no part of the backward can be dead-code-eliminated)
  scopes     full = model + weighted CE loss; encoder = DenseNet-161 encoder
             with an L2 pseudo-loss (bwd through the dense blocks only)
  policies   none / full / convs (TrainConfig.remat_policy) for fwdbwd

MFU accounting matches bench.py: model FLOPs = fwd + 2x fwd for bwd; remat
recompute is execution detail, not model work. Segment attribution:
decoder+loss cost ~= full - encoder at equal kind/policy.

Run EXCLUSIVELY (1-core host rule). Usage:
    python benchmarks/profile_train.py [--batch 8] [--size 224]
        [--probes fwd:none,fwdbwd:none,fwdbwd:full,fwdbwd:convs]
        [--scopes full,encoder] [--reps 3] [--cpu]
"""
from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--preset", default="full")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--target-s", type=float, default=4.0)
    ap.add_argument("--probes", default="fwd:none,fwdbwd:none,fwdbwd:full,fwdbwd:convs")
    ap.add_argument("--scopes", default="full,encoder")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from hdenseunet_tpu.core.module import Ctx
    from hdenseunet_tpu.models import denseunet2d
    from hdenseunet_tpu.train.loss import weighted_crossentropy_2d
    from hdenseunet_tpu.utils.flops import conv_flops, peak_flops_per_chip

    print(f"devices: {jax.devices()}", flush=True)
    dtype = jnp.dtype(args.dtype)
    peak = peak_flops_per_chip()
    B, S = args.batch, args.size
    PRE = denseunet2d.PRESETS[args.preset]

    t0 = time.perf_counter()
    params, state = denseunet2d.init(jax.random.key(0), input_size=S, **PRE)
    print(f"init {time.perf_counter() - t0:.1f}s", flush=True)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (B, S, S, 3)).astype(np.float32), dtype)
    labels = jnp.asarray(rng.integers(0, 3, (B, S, S)), jnp.int32)
    weights = (0.78, 0.65, 8.57)

    enc_kw = dict(
        blocks=PRE.get("blocks", denseunet2d.ENC_BLOCKS),
        growth=PRE.get("growth", denseunet2d.GROWTH_RATE),
    )

    # analytic model FLOPs (fwd) for MFU rows
    fwd_full = conv_flops(
        denseunet2d.apply, (B, S, S, 3), bn_frozen=False, decoder_dropout=0.0, **PRE
    )
    fwd_enc = conv_flops(
        lambda ctx, xx, **kw: denseunet2d.encoder(ctx, xx, **enc_kw)[0],
        (B, S, S, 3),
    )

    def scalar_fn(kind: str, scope: str, policy: str):
        remat = policy != "none"
        rpol = policy if policy != "none" else "full"

        def loss_from(p, xj):
            ctx = Ctx(
                p, state, train=True, rng=jax.random.key(1), compute_dtype=dtype,
                remat=remat, remat_policy=rpol,
            )
            if scope == "encoder":
                feat, _ = denseunet2d.encoder(ctx, xj, **enc_kw)
                f32 = feat.astype(jnp.float32)
                return jnp.sum(f32 * f32) / f32.size
            _, logits = denseunet2d.apply(ctx, xj, decoder_dropout=0.0, **PRE)
            return weighted_crossentropy_2d(logits, labels, weights)

        def f(p, xx, *, jitter):
            xj = xx + jitter.astype(xx.dtype)
            if kind == "fwd":
                return loss_from(p, xj).astype(jnp.float32)
            g = jax.grad(loss_from)(p, xj)
            return sum(
                jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(g)
            )

        return f

    def runner(f, k):
        @jax.jit
        def g(p, xx):
            def body(i, acc):
                return acc + f(p, xx, jitter=acc * 1e-30) * 1e-6
            return lax.fori_loop(0, k, body, jnp.float32(0.0))

        def run():
            t0 = time.perf_counter()
            v = float(g(params, x))
            assert np.isfinite(v)
            return time.perf_counter() - t0

        return run

    def slope(f, k_small, k_big, reps):
        # interleaved endpoints (round 5): both programs sample the same
        # relay weather, slope from endpoint minima — sequential endpoints
        # measured negative slopes through 2026-08-19's multi-second
        # dispatch noise (see bench.hardened_slope)
        rs, rb = runner(f, k_small), runner(f, k_big)
        rs(), rb()  # compile + warm
        ts, tb = [], []
        for _ in range(reps):
            ts.append(rs())
            tb.append(rb())
        return max((min(tb) - min(ts)) / (k_big - k_small), 1e-9)

    def slope_auto(f):
        rs, rb = runner(f, 1), runner(f, 8)
        rs(), rb()  # compile + warm
        t1, t8 = rs(), rb()
        per = max((t8 - t1) / 7, 1e-4)
        k_big = int(np.clip(np.ceil(args.target_s / per), 16, 4096))
        # keep the big dispatch under ~80 s (a 130 s dispatch crashed the
        # TPU worker, BENCH_NOTES round-4): bound with the amortized
        # per-iteration time, which includes dispatch overhead and so
        # over-estimates the true per-iteration cost — a safe cap even when
        # the two-point estimate above is noise-floored
        per_hi = max(t8 / 8.0, 1e-4)
        k_big = min(k_big, max(16, int(80.0 / per_hi)))
        return slope(f, max(1, k_big // 8), k_big, args.reps)

    for scope in args.scopes.split(","):
        fl_fwd = fwd_enc if scope == "encoder" else fwd_full
        for probe in args.probes.split(","):
            kind, policy = probe.split(":")
            t = slope_auto(scalar_fn(kind, scope, policy))
            model_fl = fl_fwd * (1.0 if kind == "fwd" else 3.0)
            print(
                json.dumps(
                    {
                        "scope": scope, "kind": kind, "policy": policy,
                        "ms": round(t * 1e3, 2),
                        "ms_per_slice": round(t * 1e3 / B, 3),
                        "model_tflops": round(model_fl / 1e12, 3),
                        "tflops": round(model_fl / t / 1e12, 1),
                        "mfu": round(model_fl / t / peak, 4),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
