"""Internal benchmark: training-step throughput (not the driver headline).

Measures the jitted data-parallel train step for each stage on whatever
devices are visible, with synthetic batches (no disk IO), reporting
slices/sec/chip — BASELINE.md's training-side metric.

Two modes (the reference always chains — Keras train_on_batch feeds the
updated weights into the next step, training.py:1715):

* default (chained): each dispatch consumes the previous dispatch's output
  TrainState — the honest end-to-end training number;
* --unchained: every dispatch reuses the initial state — isolates pure step
  compute from the state-feedback cost (on this image's tunneled backend the
  feedback path round-trips the host link and dominates; on direct-attached
  TPU hosts the two modes measure the same, see BENCH_NOTES.md).

Protocol: min over --reps repetitions of the timed loop, run exclusively.

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
    ap.add_argument(
        "--unchained", action="store_true",
        help="reuse the initial TrainState every dispatch (pure step compute)",
    )
    ap.add_argument("--reps", type=int, default=3)
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

    ts0 = ts
    ts, loss = step(ts, db)  # compile
    print(f"compiled; warmup loss {float(np.asarray(loss).ravel()[-1]):.4f}", flush=True)

    n_dispatch = max(1, args.steps // k)

    def run_loop():
        t = ts0
        t0 = time.perf_counter()
        for _ in range(n_dispatch):
            if args.unchained:
                _, loss = step(ts0, db)
            else:
                t, loss = step(t, db)
        final = float(np.asarray(loss).ravel()[-1])  # scalar d2h forces sync
        assert np.isfinite(final)
        return (time.perf_counter() - t0) / (n_dispatch * k)

    dt = min(run_loop() for _ in range(max(1, args.reps)))

    n_dev = jax.device_count()
    slices = args.batch * (1 if args.arch == "2d" else args.input_cols)
    mode = "unchained" if args.unchained else "chained"
    print(
        f"arch={args.arch} batch={args.batch} size={args.input_size} "
        f"dtype={args.dtype} remat={cfg.train.remat} k={k} mode={mode} "
        f"devices={n_dev}: {dt * 1e3:.1f} ms/step, "
        f"{slices / dt / n_dev:.1f} slices/sec/chip (min over {args.reps} reps)"
    )


if __name__ == "__main__":
    main()
