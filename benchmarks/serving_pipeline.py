"""Multi-volume serving benchmark: pipelined vs synchronous dispatch.

Measures the production `predict_directory` loop (infer/predictor.py) over a
small batch of full-size volumes, comparing

  serial     dispatch -> collect per volume (no overlap; what the loop did
             before round 3)
  pipelined  volume i+1's h2d + program dispatch are enqueued before volume
             i's result is fetched (predictor.dispatch/collect), so the host
             link and the chip work concurrently across volumes — the
             committed default of predict_directory.

Both paths write byte-identical labelmaps (tests/test_infer.py::
test_predict_directory_pipelined_matches_segment); this script only measures
the wall-clock difference, which matters for the reference's 70-volume test
sweep (test.py:44). Run EXCLUSIVELY (1-core host rule, BENCH_NOTES.md).

Usage: python benchmarks/serving_pipeline.py [--volumes 3] [--z 192]
       [--size 512] [--preset full] [--modes pipelined,serial]
"""
from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--volumes", type=int, default=3)
    ap.add_argument("--z", type=int, default=192)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--preset", default="full")
    ap.add_argument("--modes", default="pipelined,serial")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend (script smoke test)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from hdenseunet_tpu.core.config import Config
    from hdenseunet_tpu.data import nifti
    from hdenseunet_tpu.infer.predictor import VolumePredictor, predict_directory
    from hdenseunet_tpu.models import hybrid

    print(f"devices: {jax.devices()}", flush=True)
    size, z, n = args.size, args.z, args.volumes

    cfg = Config()
    cfg.model.preset = args.preset
    cfg.model.input_size = size
    cfg.infer.input_size = size
    cfg.model.compute_dtype = "bfloat16"

    t0 = time.perf_counter()
    params, bn_state = hybrid.init(
        jax.random.key(0), input_size=size, input_cols=cfg.infer.input_cols,
        batch=1, arch="end2end", preset=args.preset,
    )
    print(f"init {time.perf_counter() - t0:.1f}s", flush=True)

    rng = np.random.default_rng(0)
    tmp = Path(tempfile.mkdtemp(prefix="serve_bench_"))
    data_dir, mask_dir, out_dir = tmp / "d", tmp / "m", tmp / "o"
    data_dir.mkdir(), mask_dir.mkdir()
    vols, masks = [], []
    for i in range(n):
        vol = rng.normal(0.0, 60.0, (size, size, z)).astype(np.float32)
        mask = np.zeros(vol.shape, np.uint8)
        mask[64:-64, 64:-64, int(z * 0.2) : int(z * 0.8)] = 1
        nifti.write(data_dir / f"test-volume-{i}.nii", vol)
        nifti.write(mask_dir / f"test-volume-{i}-ori.nii", mask)
        vols.append(vol), masks.append(mask)

    predictor = VolumePredictor(params, bn_state, cfg, arch="end2end")
    # warmup: compile every shape bucket once (both modes reuse the cache)
    t0 = time.perf_counter()
    predictor.segment(vols[0], masks[0])
    print(f"compile+first volume {time.perf_counter() - t0:.1f}s", flush=True)

    results = {}
    for mode in args.modes.split(","):
        t0 = time.perf_counter()
        if mode == "pipelined":
            predict_directory(
                params, bn_state, cfg,
                data_dir=data_dir, liver_mask_dir=mask_dir,
                save_dir=out_dir, num_volumes=n, arch="end2end",
                log=lambda *a, **k: None,
            )
        else:
            for i in range(n):
                predictor.segment(vols[i], masks[i])
        dt = (time.perf_counter() - t0) / n
        results[mode] = dt
        print(f"{mode:10s} {dt:.2f} s/volume over {n} volumes", flush=True)

    line = {
        "metric": "serving_s_per_volume",
        "volumes": n,
        **{k: round(v, 3) for k, v in results.items()},
    }
    if "serial" in results and "pipelined" in results:
        line["overlap_speedup"] = round(results["serial"] / results["pipelined"], 3)
    print(json.dumps(line))


if __name__ == "__main__":
    main()
