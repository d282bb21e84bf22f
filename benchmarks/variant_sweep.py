"""Model-level A/B sweep of InferConfig perf variants on the real volume.

Measures the full serving program (DeviceVolumeScorer.compute_seconds — the
relay-immune loop-carried slope protocol, identical program to bench.py's
compute metric) for each requested combination of the round-3 levers:

  base      committed defaults (hwdc layout, s2d stem since round 4, unroll 1)
  direct    stem_s2d=False    (the pre-round-4 direct 7^3 stride-2 stem — the
            adjudication baseline for any future stem A/B)
  dhwc      layout3d='dhwc'   (d-major 3D branch + HFF head, models/dmajor.py)
  s2d       stem_s2d=True     (space-to-depth stem, models/s2d.py — identical
            to `base` since the round-4 default flip; kept for A/A sanity)
  dhwc+s2d  both
  unroll2   batch_unroll=2    (window-batch lax.scan unroll — lets XLA overlap
            batch i+1's 2D encoder with batch i's 3D tail)

All variants are bit-identical or exact-modulo-reassociation vs base (parity
tests in tests/test_models.py / test_infer.py); this script only decides
which becomes the committed default. Run EXCLUSIVELY (1-core host rule).

Usage: python benchmarks/variant_sweep.py [--variants base,dhwc,...]
       [--z 192] [--size 512] [--preset full] [--reps 2]
"""
from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import numpy as np


VARIANTS = {
    "base": {},
    "direct": {"stem_s2d": False},
    "dhwc": {"layout3d": "dhwc"},
    "s2d": {"stem_s2d": True},
    "dhwc+s2d": {"layout3d": "dhwc", "stem_s2d": True},
    "unroll2": {"batch_unroll": 2},
    "s2d+u2": {"stem_s2d": True, "batch_unroll": 2},
    "all3": {"layout3d": "dhwc", "stem_s2d": True, "batch_unroll": 2},
    # window-batch probes: wb=16 OOM'd pre-round-3 (24.8 G / 15.75 G HBM);
    # the z-cropped score buffer may have changed the ceiling
    "wb4": {"window_batch": 4},
    "wb12": {"window_batch": 12},
    "wb16": {"window_batch": 16},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="base,s2d,dhwc,dhwc+s2d,unroll2")
    ap.add_argument("--z", type=int, default=192)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--preset", default="full")
    ap.add_argument("--reps", type=int, default=2)
    # slope endpoints: wider spacing divides relay noise by (k_big - k_small);
    # k_big=5 puts ~3 volumes of extra on-chip work between the endpoints
    ap.add_argument("--k-small", type=int, default=1)
    ap.add_argument("--k-big", type=int, default=3)
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend (script smoke test)")
    ap.add_argument(
        "--interleave", action="store_true",
        help="compile every variant first, then round-robin the timed reps "
        "across variants so each samples the same relay weather (the "
        "sequential default confounds variant order with weather drift). "
        "Caveat: every variant's device-resident params/wire copies and "
        "compiled k-rep programs stay alive through the timed reps — extra "
        "HBM pressure absent from production; keep variant sets small near "
        "the wb=8 ceiling",
    )
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from hdenseunet_tpu.core.config import InferConfig
    from hdenseunet_tpu.infer.device_pipeline import DeviceVolumeScorer
    from hdenseunet_tpu.models import hybrid

    print(f"devices: {jax.devices()}", flush=True)
    size, z = args.size, args.z
    cols = 8

    t0 = time.perf_counter()
    params, bn_state = hybrid.init(
        jax.random.key(0), input_size=size, input_cols=cols, batch=1,
        arch="end2end", preset=args.preset,
    )
    print(f"init {time.perf_counter() - t0:.1f}s", flush=True)

    rng = np.random.default_rng(0)
    vol = rng.normal(0.0, 50.0, (size, size, z)).astype(np.float32)
    # liver z-range: same fractions bench.py times, so s/vol here is directly
    # comparable to the headline's compute_s_per_volume
    mini_z, maxi_z = int(z * 0.2), int(z * 0.8)

    def make_scorer(name):
        over = VARIANTS[name]
        cfg = InferConfig(input_size=size, input_cols=cols, **over)
        # match bench.py's production configuration exactly (f32 scoring at
        # 512^2 x wb=8 OOMs a v5e-1; the headline runs bf16 + 64-slice
        # buckets — z_bucket=64 pins that even if the library default moves)
        return DeviceVolumeScorer(
            params, bn_state, cfg, arch="end2end", preset=args.preset,
            compute_dtype="bfloat16", z_bucket=64,
        )

    results = {}
    if args.interleave:
        timers = {}
        for name in args.variants.split(","):
            t0 = time.perf_counter()
            try:
                scorer = make_scorer(name)
                timed = scorer.compute_timer(vol, mini_z, maxi_z)
                timed(args.k_small), timed(args.k_big)  # compile + warm
            except Exception as e:  # e.g. wb12/wb16 HBM OOM — record, keep going
                msg = str(e).splitlines()[0] if str(e) else type(e).__name__
                print(f"{name:10s} FAILED after {time.perf_counter() - t0:.0f}s: "
                      f"{msg[:160]}", flush=True)
                continue
            timers[name] = timed
            print(f"{name:10s} compiled+warm in {time.perf_counter() - t0:.0f}s",
                  flush=True)
        t_small = {n: [] for n in timers}
        t_big = {n: [] for n in timers}
        for rep in range(args.reps):
            for n, timed in timers.items():
                t_small[n].append(timed(args.k_small))
            for n, timed in timers.items():
                t_big[n].append(timed(args.k_big))
            print(f"rep {rep}: " + "  ".join(
                f"{n}: t{args.k_small}={t_small[n][-1]:.2f} "
                f"t{args.k_big}={t_big[n][-1]:.2f}" for n in timers), flush=True)
        for n in timers:
            # clamp like DeviceVolumeScorer.compute_seconds: relay noise can
            # push the raw slope <= 0, which would poison the ratio print
            s = max(
                (min(t_big[n]) - min(t_small[n])) / (args.k_big - args.k_small),
                1e-9,
            )
            results[n] = s
            print(f"{n:10s} compute_s/vol={s:7.3f}  "
                  f"t{args.k_small}={['%.2f' % t for t in sorted(t_small[n])]} "
                  f"t{args.k_big}={['%.2f' % t for t in sorted(t_big[n])]}",
                  flush=True)
    else:
        for name in args.variants.split(","):
            scorer = make_scorer(name)
            t0 = time.perf_counter()
            try:
                d = scorer.compute_seconds(
                    vol, mini_z, maxi_z, reps=args.reps, detail=True,
                    k_small=args.k_small, k_big=args.k_big,
                )
            except Exception as e:  # e.g. wb12/wb16 HBM OOM — record, keep sweeping
                msg = str(e).splitlines()[0] if str(e) else type(e).__name__
                print(f"{name:10s} FAILED after {time.perf_counter() - t0:.0f}s: "
                      f"{msg[:160]}", flush=True)
                continue
            wall = time.perf_counter() - t0
            results[name] = d["seconds"]
            print(
                f"{name:10s} compute_s/vol={d['seconds']:7.3f}  "
                f"slopes={['%.3f' % s for s in d['slopes']]}  "
                f"t1={['%.2f' % t for t in d['t_small']]} "
                f"t3={['%.2f' % t for t in d['t_big']]}  wall={wall:.0f}s",
                flush=True,
            )

    base = results.get("base")
    if base is not None and base > 1e-8:
        for name, s in results.items():
            print(f"{name:10s} {s:7.3f} s/vol  {base / s:5.2f}x vs base")


if __name__ == "__main__":
    main()
