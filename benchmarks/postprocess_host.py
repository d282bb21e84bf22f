"""Host postprocess A/B: native C++ core vs scipy at full serving size.

The pipelined serving floor is host-side (BENCH_NOTES.md "Round-5
serving-path attribution": 38-64 s of scipy morphology + 23 s d2h per
512x512x192 volume). native/postprocess.cpp replaces the three hot ops with
O(N) passes; this harness times the full `compose_from_masks` (CC x2, dilate,
fill x3 — the exact serving compose) on both paths, on both content regimes:

* speckle — random-weight bench case, tens of thousands of components (CC
  worst case, the regime the driver bench exercises);
* blob — real-checkpoint case, one liver-like component with a cavity.

Run EXCLUSIVELY (1-core host; anything concurrent inflates both sides).

    python benchmarks/postprocess_host.py [--z 192] [--reps 2]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hdenseunet_tpu import native  # noqa: E402
from hdenseunet_tpu.infer import postprocess  # noqa: E402


def cases(z: int):
    rng = np.random.default_rng(0)
    shape = (512, 512, z)

    liver = rng.random(shape) < 0.067  # bench-measured nonzero occupancy
    tumor = liver & (rng.random(shape) < 0.2)
    ext = np.zeros(shape, np.uint8)
    ext[64:-64, 64:-64, z // 5 : 4 * z // 5] = 1
    yield "speckle", liver, tumor, ext

    liver = np.zeros(shape, bool)
    liver[96:416, 128:448, z // 6 : 5 * z // 6] = True
    liver[200:280, 220:300, z // 3 : z // 2] = False  # cavity -> hole
    tumor = np.zeros(shape, bool)
    tumor[240:300, 260:330, z // 4 : z // 2] = True
    yield "blob", liver, tumor, ext


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--z", type=int, default=192)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    assert native.pp_available(), "C++ toolchain required for the A/B"
    for name, liver, tumor, ext in cases(args.z):
        row = {"case": name, "z": args.z}
        for path, env in (("native", ""), ("scipy", "scipy")):
            os.environ["HDENSEUNET_HOST_POSTPROCESS"] = env
            ts = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                out = postprocess.compose_from_masks(liver, tumor, ext)
                ts.append(time.perf_counter() - t0)
            row[path + "_s"] = round(min(ts), 2)
            row[path + "_sum"] = int(out.sum())  # cheap cross-path checksum
        assert row["native_sum"] == row["scipy_sum"], row
        row["speedup"] = round(row["scipy_s"] / max(row["native_s"], 1e-9), 1)
        print(row, flush=True)
    os.environ.pop("HDENSEUNET_HOST_POSTPROCESS", None)


if __name__ == "__main__":
    main()
