"""Internal benchmark: host sampler feed rate (samples/sec) vs chip demand.

The reference fed its trainer from a 14-thread crop pool + 3 enqueuer workers
(train_2ddense.py:119-122, keras/utils/data_utils.py:530). The TPU framework's
equivalent is CropSampler.batches(threads=N) (counter-based deterministic
RNG, hdenseunet_tpu/data/sampler.py). This benchmark measures sustained
samples/sec per thread count against the chips' measured training consumption
(~570 slices/s/chip for the 2D stage at batch 8 @ 224^2 bf16 — BENCH_NOTES.md),
i.e. a v5e-8 pod needs ~4.5k samples/s from the host.

Prints one JSON line per configuration. Note this repo's CI host has ONE core
— thread scaling numbers are only meaningful on multi-core hosts; the 1-core
rate bounds per-sample cost.

Usage: python benchmarks/sampler_throughput.py [--threads 1,8] [--mode 2d]
"""
from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--threads", default="1,4,8")
    ap.add_argument("--mode", default="2d", choices=["2d", "hybrid"])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--input-size", type=int, default=224)
    ap.add_argument("--batches", type=int, default=24)
    ap.add_argument("--shape", default="512,512,96", help="synthetic volume shape")
    ap.add_argument("--data", default=None, help="existing prepared dir (else synthetic)")
    args = ap.parse_args()

    from hdenseunet_tpu.data import preprocess
    from hdenseunet_tpu.data.sampler import CropSampler

    if args.data:
        root = args.data
    else:
        root = Path(tempfile.mkdtemp(prefix="sampler_bench_"))
        shape = tuple(int(s) for s in args.shape.split(","))
        preprocess.synthesize(root, num_volumes=3, shape=shape, seed=0)

    ds = preprocess.PreparedDataset(root)
    per_batch = args.batch

    for threads in (int(t) for t in args.threads.split(",")):
        s = CropSampler(
            ds, mode=args.mode, input_size=args.input_size, input_cols=8, seed=0
        )
        gen = s.batches(per_batch, threads=threads)
        next(gen)  # warm the mmap/page cache + pool
        t0 = time.perf_counter()
        for _ in range(args.batches):
            next(gen)
        dt = time.perf_counter() - t0
        gen.close()
        rate = args.batches * per_batch / dt
        print(
            json.dumps(
                {
                    "metric": "sampler_throughput",
                    "mode": args.mode,
                    "threads": threads,
                    "value": round(rate, 1),
                    "unit": "samples/s",
                    "native": s.use_native,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
