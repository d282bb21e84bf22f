"""Attribute the labelmask collect path: d2h fetch vs unpack vs postprocess.

bench.py round-5 measured pipelined_s_per_volume 47-60 s — 4-5x the
single-volume digest headline — on a host whose d2h moves ~0.1-0.2 MB/s
(BENCH_NOTES hard-environment rules). The collect path is the only serving
stage that fetches a volume-sized buffer (the 2-bit packed z-cropped
labelmask, X*Y*zw/4 bytes), so the suspects are (a) that d2h, (b) the host
unpack + full-extent restore, (c) scipy postprocess (CC + dilation + holes).

This probe times each stage separately on the REAL serving program and also
reports the packed buffer's occupancy (fraction of nonzero bytes and of
nonzero (8,128)-aligned xy tiles) — the number that decides whether a
lossless sparse-tile wire (fetch only nonzero tiles) can shrink (a).

Run EXCLUSIVELY (1-core host rule).

Usage: python benchmarks/collect_attrib.py [--reps 3] [--z 192] [--size 512]
       [--preset full] [--cpu]
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
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--z", type=int, default=192)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--preset", default="full")
    ap.add_argument("--tile", type=int, default=64, help="xy tile edge for occupancy stats")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from hdenseunet_tpu.core.config import InferConfig
    from hdenseunet_tpu.infer import postprocess
    from hdenseunet_tpu.infer.device_pipeline import DeviceVolumeScorer, _unpack2bits
    from hdenseunet_tpu.models import hybrid

    print(f"devices: {jax.devices()}", flush=True)
    size, z = args.size, args.z
    cfg = InferConfig(input_size=size)

    t0 = time.perf_counter()
    params, bn_state = hybrid.init(
        jax.random.key(0), input_size=size, input_cols=cfg.input_cols,
        batch=1, arch="end2end", preset=args.preset,
    )
    print(f"init {time.perf_counter() - t0:.1f}s", flush=True)

    scorer = DeviceVolumeScorer(
        params, bn_state, cfg, arch="end2end", preset=args.preset,
        compute_dtype="bfloat16", z_bucket=64,
    )
    rng = np.random.default_rng(0)
    vol = rng.normal(0.0, 60.0, (size, size, z)).astype(np.float32)
    mini_z, maxi_z = int(z * 0.2), int(z * 0.8)
    ext_mask = np.zeros(vol.shape, bool)
    ext_mask[64:-64, 64:-64, mini_z:maxi_z] = True

    t0 = time.perf_counter()
    handle = scorer.labelmask_async(vol, mini_z, maxi_z)
    print(f"compile+dispatch {time.perf_counter() - t0:.1f}s", flush=True)

    rows = {"dispatch": [], "fetch": [], "unpack": [], "postprocess": []}
    packed = buf = labelmask = None
    for _ in range(args.reps):
        t0 = time.perf_counter()
        handle = scorer.labelmask_async(vol, mini_z, maxi_z)
        rows["dispatch"].append(time.perf_counter() - t0)

        dev, meta = handle
        t0 = time.perf_counter()
        packed = np.asarray(dev)  # the volume-sized d2h
        rows["fetch"].append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        buf = _unpack2bits(packed)
        labelmask = np.zeros((meta["x0"], meta["y0"], meta["z_full"]), np.uint8)
        labelmask[:, :, meta["z_lo"] : meta["z_lo"] + meta["z"]] = buf[
            : meta["x0"], : meta["y0"], : meta["z"]
        ]
        rows["unpack"].append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        out = postprocess.compose_from_masks(labelmask >= 1, labelmask >= 3, ext_mask)
        rows["postprocess"].append(time.perf_counter() - t0)
        print("  " + "  ".join(f"{k}={rows[k][-1]:.2f}s" for k in rows), flush=True)

    nz_bytes = float(np.count_nonzero(packed)) / packed.size
    t = args.tile
    xt, yt = packed.shape[0] // t, packed.shape[1] // t
    tiles = packed[: xt * t, : yt * t].reshape(xt, t, yt, t, -1)
    nz_tiles = float(np.count_nonzero(tiles.any(axis=(1, 3, 4)))) / (xt * yt)
    print(
        json.dumps(
            {
                "metric": "collect_attrib",
                **{k: round(min(v), 3) for k, v in rows.items()},
                "wire_mb": round(packed.nbytes / 1e6, 2),
                "d2h_mb_s": round(packed.nbytes / 1e6 / max(min(rows["fetch"]), 1e-9), 3),
                "occupancy_bytes": round(nz_bytes, 4),
                f"occupancy_tiles_{t}": round(nz_tiles, 4),
                "label_frac": round(float(np.count_nonzero(labelmask)) / labelmask.size, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
