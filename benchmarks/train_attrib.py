"""One-session reconciliation of the training-throughput story.

Round-3 left three contradictory train numbers on record (VERDICT r3 item 3):
BENCH_NOTES' 28 ms/step remat (round-1 protocol), round-2's CHAINED
36.9 ms/step, and round-3's driver-captured multi-step-scan slope of
49.9 ms/step — impossible if the scan slope were pure compute (compute-only
must be <= chained). This script measures every protocol in ONE process on
the same state/batch so the numbers are finally comparable:

  fixed      unchained single dispatch: step(ts0, db) every time — per-step
             wall time includes ONE dispatch round-trip (the round-1 number)
  chained    Python loop, each dispatch consumes the previous TrainState —
             the reference's always-chained protocol (training.py:1715)
  scan-slope K chained steps inside ONE dispatch (trainer.make_multi_step,
             lax.scan); per-step = slope between k-small and k-big programs —
             dispatch latency cancels; any residual above `fixed` is real
             per-step cost INSIDE the scan (carry copies, scheduling)
  scan-total t(k_big)/k_big — amortized per-step including one dispatch

each for remat policy in {none, full, convs} (TrainConfig.remat_policy:
'convs' saves conv outputs and recomputes only the elementwise chains), and
optionally with state donation (--donate: donates the TrainState buffers to
the dispatch — measured pathological through round-1's tunnel, fine on
direct-attached hosts; re-probed here because the pathology did not
reproduce in round 2).

Run EXCLUSIVELY (1-core host rule). Usage:
    python benchmarks/train_attrib.py [--policies none,full,convs]
        [--batch 8] [--size 224] [--steps 20] [--reps 3] [--donate] [--cpu]
"""
from __future__ import annotations

import argparse
import dataclasses
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--policies", default="none,full,convs")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--preset", default="full")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--k-small", type=int, default=4)
    ap.add_argument("--k-big", type=int, default=12)
    ap.add_argument("--donate", action="store_true",
                    help="also probe donate_state=True variants")
    ap.add_argument("--no-fixed", action="store_true",
                    help="skip the fixed (unchained) protocol — measured "
                    "pathological on the tunneled backend (2026-08-19: "
                    "10.9 s/step; up to 20 independent full output "
                    "TrainStates in flight thrash the allocator)")
    ap.add_argument("--no-scan", action="store_true",
                    help="skip the scan-slope/scan-total protocols (the "
                    "k=12 donate-variant compile crashed the TPU worker "
                    "on 2026-08-19)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from jax.sharding import NamedSharding, PartitionSpec

    from hdenseunet_tpu.core.config import Config
    from hdenseunet_tpu.core.mesh import DATA_AXIS, batch_sharding, make_mesh
    from hdenseunet_tpu.data.sampler import synthetic_batches
    from hdenseunet_tpu.train import trainer

    print(f"devices: {jax.devices()}", flush=True)

    base_cfg = Config()
    base_cfg.model.preset = args.preset
    base_cfg.model.input_size = args.size
    base_cfg.model.compute_dtype = "bfloat16"
    base_cfg.train.arch = "2d"
    base_cfg.train.batch = args.batch

    mesh = make_mesh()
    ts0, tx, _ = trainer.create_train_state(None, base_cfg, "2d")
    gen = synthetic_batches(mode="2d", batch=args.batch, input_size=args.size)
    bsh = batch_sharding(mesh)
    db = {k: jax.device_put(v, bsh) for k, v in next(gen).items()}
    stacked_sh = NamedSharding(mesh, PartitionSpec(None, DATA_AXIS))

    def stacked(k):
        return {
            kk: jax.device_put(
                np.broadcast_to(np.asarray(v), (k,) + v.shape).copy(), stacked_sh
            )
            for kk, v in db.items()
        }

    def sync(loss):
        v = float(np.asarray(loss).ravel()[-1])
        assert np.isfinite(v)
        return v

    # fresh on-device copy of the initial state in ONE dispatch — donating
    # variants consume their input buffers, and ts0 must survive every probe
    def _copy_leaf(x):
        import jax.numpy as jnp

        if jnp.issubdtype(x.dtype, jax.dtypes.prng_key):
            return jax.random.wrap_key_data(jax.random.key_data(x) + 0)
        return x + 0

    copy_state = jax.jit(lambda t: jax.tree.map(_copy_leaf, t))

    def cfg_for(policy: str, donate: bool) -> Config:
        cfg = dataclasses.replace(base_cfg)
        cfg.train = dataclasses.replace(
            base_cfg.train,
            remat=policy != "none",
            remat_policy=policy if policy != "none" else "full",
            donate_state=donate,
        )
        return cfg

    rows = []
    for policy in args.policies.split(","):
        for donate in ([False, True] if args.donate else [False]):
            tag = policy + ("+donate" if donate else "")
            cfg = cfg_for(policy, donate)
            step = trainer.make_train_step(tx, cfg, mesh, "2d")

            # --- fixed (unchained): needs donation OFF to reuse ts0 -------
            fixed = float("nan")
            if not donate and not args.no_fixed:
                sync(step(ts0, db)[1])  # compile
                def loop_fixed():
                    t0 = time.perf_counter()
                    for _ in range(args.steps):
                        _, loss = step(ts0, db)
                    sync(loss)
                    return (time.perf_counter() - t0) / args.steps
                fixed = min(loop_fixed() for _ in range(args.reps))

            # --- chained Python loop --------------------------------------
            start = copy_state(ts0) if donate else ts0
            ts_c, loss = step(start, db)  # compile (first donated use eats the copy)
            sync(loss)
            def loop_chained():
                t = copy_state(ts0) if donate else ts_c
                t0 = time.perf_counter()
                for _ in range(args.steps):
                    t, loss = step(t, db)
                sync(loss)
                return (time.perf_counter() - t0) / args.steps
            chained = min(loop_chained() for _ in range(args.reps))
            del ts_c

            # --- scan slope + total ---------------------------------------
            if args.no_scan:
                rows.append((tag, fixed, chained, float("nan"), float("nan")))
                print(
                    f"{tag:12s} fixed={fixed * 1e3:7.1f}  "
                    f"chained={chained * 1e3:7.1f} ms/step (scan skipped)",
                    flush=True,
                )
                continue

            def run_k(k):
                multi = trainer.make_multi_step(tx, cfg, mesh, "2d", k=k)
                data = stacked(k)
                def once():
                    ts_in = copy_state(ts0) if donate else ts0
                    t0 = time.perf_counter()
                    _, losses = multi(ts_in, data)
                    sync(losses)
                    return time.perf_counter() - t0
                once()  # compile + warm
                return min(once() for _ in range(args.reps))

            t_small = run_k(args.k_small)
            t_big = run_k(args.k_big)
            slope = (t_big - t_small) / (args.k_big - args.k_small)
            total = t_big / args.k_big

            rows.append((tag, fixed, chained, slope, total))
            print(
                f"{tag:12s} fixed={fixed * 1e3:7.1f}  chained={chained * 1e3:7.1f}  "
                f"scan-slope={slope * 1e3:7.1f}  scan-total(k={args.k_big})="
                f"{total * 1e3:7.1f} ms/step", flush=True,
            )

    n_dev = jax.device_count()
    print(f"\nbatch={args.batch} size={args.size} bf16, {n_dev} device(s); "
          f"slices/s/chip = {args.batch}/(ms/step)/{n_dev}*1000")
    for tag, fixed, chained, slope, total in rows:
        print(f"{tag:12s} fixed={fixed*1e3:6.1f} chained={chained*1e3:6.1f} "
              f"slope={slope*1e3:6.1f} total={total*1e3:6.1f} ms/step  "
              f"(chained => {args.batch/chained/n_dev:6.1f} slices/s/chip)")


if __name__ == "__main__":
    main()
