"""Internal benchmark: training-step throughput (not the driver headline).

Measures the jitted data-parallel train step for each stage on whatever
devices are visible, with synthetic batches (no disk IO), reporting
slices/sec/chip — BASELINE.md's training-side metric.

Usage (run from the repo root; PYTHONPATH breaks the axon plugin):
    python benchmarks/train_throughput.py [--arch 2d] [--batch 8] [--steps 20]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="2d", choices=["2d", "3dpart", "end2end"])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--input-size", type=int, default=224)
    ap.add_argument("--input-cols", type=int, default=8)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--preset", default="full")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--steps-per-dispatch", type=int, default=1)
    args = ap.parse_args()

    import jax

    from hdenseunet_tpu.core.config import Config
    from hdenseunet_tpu.core.mesh import batch_sharding, make_mesh
    from hdenseunet_tpu.data.sampler import synthetic_batches
    from hdenseunet_tpu.train import trainer

    cfg = Config()
    cfg.model.preset = args.preset
    cfg.model.input_size = args.input_size
    cfg.model.input_cols = args.input_cols
    cfg.model.compute_dtype = args.dtype
    cfg.train.arch = args.arch
    cfg.train.batch = args.batch
    cfg.train.remat = not args.no_remat

    mesh = make_mesh()
    ts, tx, _ = trainer.create_train_state(None, cfg, args.arch)
    k = max(1, args.steps_per_dispatch)
    bsh = batch_sharding(mesh)

    mode = "2d" if args.arch == "2d" else "hybrid"
    gen = synthetic_batches(
        mode=mode, batch=args.batch, input_size=args.input_size,
        input_cols=args.input_cols,
    )
    if k > 1:
        from jax.sharding import NamedSharding, PartitionSpec

        from hdenseunet_tpu.core.mesh import DATA_AXIS

        step = trainer.make_multi_step(tx, cfg, mesh, args.arch, k=k)
        stacked = trainer.stack_batches([next(gen) for _ in range(k)])
        db = {
            key: jax.device_put(v, NamedSharding(mesh, PartitionSpec(None, DATA_AXIS)))
            for key, v in stacked.items()
        }
    else:
        step = trainer.make_train_step(tx, cfg, mesh, args.arch)
        batch = next(gen)
        db = {key: jax.device_put(v, bsh) for key, v in batch.items()}

    ts, loss = step(ts, db)  # compile
    print(f"compiled; warmup loss {float(np.asarray(loss).ravel()[-1]):.4f}", flush=True)

    n_dispatch = max(1, args.steps // k)
    t0 = time.perf_counter()
    for _ in range(n_dispatch):
        ts, loss = step(ts, db)
    final = float(np.asarray(loss).ravel()[-1])  # scalar d2h forces sync
    dt = (time.perf_counter() - t0) / (n_dispatch * k)
    assert np.isfinite(final)

    n_dev = jax.device_count()
    slices = args.batch * (1 if args.arch == "2d" else args.input_cols)
    print(
        f"arch={args.arch} batch={args.batch} size={args.input_size} "
        f"dtype={args.dtype} remat={cfg.train.remat} devices={n_dev}: "
        f"{dt * 1e3:.1f} ms/step, {slices / dt / n_dev:.1f} slices/sec/chip"
    )


if __name__ == "__main__":
    main()
