"""Headline benchmark: full-volume H-DenseUNet inference + training step.

Times the production serving path (BASELINE.json config 5) on one chip: a
512x512xZ CT volume is placed on device ONCE, then the reference's entire
sliding-window algorithm (stride-2 z-windows through the full hybrid —
2D DenseUNet-167 branch + 3D DenseNet branch + HFF head — softmax, edge-slice
drop, multiplicity-weighted overlap averaging, lib/funcs.py:4-52) runs as one
compiled XLA program in bfloat16; only a 3-scalar digest leaves the device.

Two latency numbers (this host tunnels the TPU through a stdio relay whose
per-dispatch latency wanders 36 ms-2 s within a day, BENCH_NOTES.md):

* ``value`` — end-to-end s/volume, min over BENCH_REPS dispatches: the honest
  serving cost on THIS host (includes volume h2d + one dispatch round-trip).
* ``compute_s_per_volume`` — relay-immune device compute: the whole serving
  program repeated k times inside ONE dispatch with a loop-carried dependence;
  per-volume time is the slope between the k=1 and k=3 programs
  (DeviceVolumeScorer.compute_seconds). Dispatch latency and h2d cancel in
  the slope, so this number tracks chip-side regressions through any relay
  weather. ``compute_spread`` = (max-min)/min over the slope replicas.

Training metrics ride the same JSON line (driver-visible, BASELINE.md's
">=5x slices/s/chip" target): chained 2D-stage step — each dispatch consumes
the previous dispatch's TrainState, the reference's always-chained protocol
(training.py:1715) — batch 8 @ 224^2 bf16 with remat, min over reps of a
20-step loop. train_mfu counts model FLOPs (fwd + 2x fwd for bwd; remat
recompute is execution detail, not model work). ``train_compute_ms_per_step``
is the relay-immune twin: K chained steps inside ONE dispatch (lax.scan,
trainer.make_multi_step), per-step time = slope between k=4 and k=12
programs — dispatch latency cancels exactly as in the inference compute
metric.

``h2d_s``/``dispatch_s`` attribute the gap between ``value`` and
``compute_s_per_volume``: a timed device_put of a buffer with the wire's
exact shape/dtype, and a timed no-op dispatch round-trip — so
value ~= compute + h2d + dispatch is checkable per round.

Baseline: the reference repo publishes no timing (SURVEY.md §6). The paper
behind it (TMI 2018, linked at reference README.md:6) reports end-to-end
inference on the order of 10^2 s/volume on a Titan Xp; BASELINE.md fixes the
comparison number at 100 s/volume. vs_baseline = baseline_sec / measured_sec.

Prints ONE JSON line with all metrics (the driver records the line verbatim).

Env knobs (local smoke runs off-TPU):
  BENCH_PRESET=tiny    shrink the model (default: full reference layout)
  BENCH_Z=192          simulated volume depth (default 192 — a median liver CT)
  BENCH_REPS=5         timed end-to-end repetitions
  BENCH_COMPUTE=1      also run the in-program slope protocol (default on)
  BENCH_COMPUTE_REPS=3 slope endpoint repetitions
  BENCH_TRAIN=1        also measure the chained train step (default on)
  BENCH_UNROLL=N       window-batch loop unroll (default InferConfig default)
  BENCH_CPU=1          force the CPU backend (script smoke test off-TPU)
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

BASELINE_SEC_PER_VOLUME = 100.0


def measure_train(preset: str) -> dict:
    """Chained 2D-stage train step: ms/step, slices/s/chip, train MFU."""
    import jax

    from hdenseunet_tpu.core.config import Config
    from hdenseunet_tpu.core.mesh import batch_sharding, make_mesh
    from hdenseunet_tpu.data.sampler import synthetic_batches
    from hdenseunet_tpu.models import denseunet2d
    from hdenseunet_tpu.train import trainer
    from hdenseunet_tpu.utils.flops import conv_flops, peak_flops_per_chip

    batch = int(os.environ.get("BENCH_TRAIN_BATCH", "8"))
    size = 224 if preset == "full" else 64
    steps = int(os.environ.get("BENCH_TRAIN_STEPS", "20"))
    reps = int(os.environ.get("BENCH_TRAIN_REPS", "3"))

    cfg = Config()
    cfg.model.preset = preset
    cfg.model.input_size = size
    cfg.model.compute_dtype = "bfloat16"
    cfg.train.arch = "2d"
    cfg.train.batch = batch
    cfg.train.remat = True

    mesh = make_mesh()
    ts0, tx, _ = trainer.create_train_state(None, cfg, "2d")
    step = trainer.make_train_step(tx, cfg, mesh, "2d")
    gen = synthetic_batches(mode="2d", batch=batch, input_size=size)
    bsh = batch_sharding(mesh)
    db = {k: jax.device_put(v, bsh) for k, v in next(gen).items()}

    _, loss = step(ts0, db)  # compile
    assert np.isfinite(float(np.asarray(loss).ravel()[-1]))

    def loop():
        t = ts0
        t0 = time.perf_counter()
        for _ in range(steps):
            t, loss = step(t, db)
        final = float(np.asarray(loss).ravel()[-1])  # scalar d2h = sync
        assert np.isfinite(final)
        return (time.perf_counter() - t0) / steps

    dt = min(loop() for _ in range(reps))

    # Relay-immune compute number: K chained steps inside ONE dispatch
    # (lax.scan over a stacked batch, trainer.make_multi_step — numerically
    # identical to K sequential steps); per-step time is the slope between a
    # k-small and a k-big program, so dispatch latency + h2d cancel, same
    # protocol as the inference compute metric.
    k_small, k_big = 4, 12

    def run_k(k):
        multi = trainer.make_multi_step(tx, cfg, mesh, "2d", k=k)
        stacked_sh = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(None, "data")
        )
        stacked = {
            kk: jax.device_put(np.broadcast_to(np.asarray(v), (k,) + v.shape).copy(), stacked_sh)
            for kk, v in db.items()
        }
        _, losses = multi(ts0, stacked)  # compile + warm
        assert np.isfinite(float(np.asarray(losses).ravel()[-1]))
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            _, losses = multi(ts0, stacked)
            float(np.asarray(losses).ravel()[-1])  # scalar d2h = sync
            best = min(best, time.perf_counter() - t0)
        return best

    dt_c = (run_k(k_big) - run_k(k_small)) / (k_big - k_small)

    fwd = conv_flops(
        denseunet2d.apply, (batch, size, size, 3), bn_frozen=False,
        decoder_dropout=0.0, **denseunet2d.PRESETS[preset],
    )
    peak = peak_flops_per_chip() * jax.device_count()
    return {
        "train_ms_per_step": round(dt * 1e3, 2),
        "train_slices_per_s_chip": round(batch / dt / jax.device_count(), 1),
        "train_mfu": round(3.0 * fwd / dt / peak, 4),
        "train_compute_ms_per_step": round(dt_c * 1e3, 2),
        "train_compute_slices_per_s_chip": round(
            batch / dt_c / jax.device_count(), 1
        ),
        "train_compute_mfu": round(3.0 * fwd / dt_c / peak, 4),
    }


def main():
    import jax

    if os.environ.get("BENCH_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")

    from hdenseunet_tpu.core.config import InferConfig
    from hdenseunet_tpu.infer.device_pipeline import DeviceVolumeScorer
    from hdenseunet_tpu.models import hybrid

    preset = os.environ.get("BENCH_PRESET", "full")
    z = int(os.environ.get("BENCH_Z", "192"))
    reps = int(os.environ.get("BENCH_REPS", "5"))
    size = 512 if preset == "full" else 64

    train_metrics = {}
    if os.environ.get("BENCH_TRAIN", "1") == "1":
        train_metrics = measure_train(preset)

    cfg_kw = dict(
        input_size=size,
        window_batch=int(os.environ.get("BENCH_WINDOW_BATCH", "8")),
    )
    if os.environ.get("BENCH_UNROLL"):
        cfg_kw["batch_unroll"] = int(os.environ["BENCH_UNROLL"])
    cfg = InferConfig(**cfg_kw)

    params, bn_state = hybrid.init(
        jax.random.key(0),
        input_size=size,
        input_cols=cfg.input_cols,
        batch=1,
        arch="end2end",
        preset=preset,
    )
    scorer = DeviceVolumeScorer(
        params, bn_state, cfg, arch="end2end", preset=preset,
        compute_dtype="bfloat16", z_bucket=64,
        shared_2d=os.environ.get("BENCH_SHARED2D", "0") == "1",
    )

    rng = np.random.default_rng(0)
    vol = rng.normal(0.0, 60.0, (size, size, z)).astype(np.float32)
    mini_z, maxi_z = int(z * 0.2), int(z * 0.8)

    # warmup: compile + one full pass (also pre-stages params on device)
    scorer.summarize(vol, mini_z, maxi_z)

    # the tunneled device shows heavy run-to-run noise (9.6-16.7 s measured
    # for identical work); min over reps estimates the true serving cost
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        digest = scorer.summarize(vol, mini_z, maxi_z)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    assert np.all(np.isfinite(digest)), digest

    compute_metrics = {}
    if os.environ.get("BENCH_COMPUTE", "1") == "1":
        d = scorer.compute_seconds(
            vol, mini_z, maxi_z,
            k_small=1, k_big=int(os.environ.get("BENCH_COMPUTE_K", "3")),
            reps=int(os.environ.get("BENCH_COMPUTE_REPS", "3")),
            detail=True,
        )
        sl = d["slopes"]
        compute_metrics = {
            "compute_s_per_volume": round(d["seconds"], 3),
            "compute_spread": round((max(sl) - min(sl)) / max(min(sl), 1e-9), 3),
        }

    # Attribution of the end-to-end headline (value ~= compute + h2d +
    # dispatch, checkable per round): time the h2d of a buffer with the wire's
    # exact shape/dtype, and one no-op dispatch round-trip. Each timed region
    # necessarily includes one dispatch+scalar-fetch to sync, so h2d_s
    # overstates the pure copy by ~dispatch_s.
    import jax.numpy as jnp

    p = scorer.plan(vol.shape, mini_z, maxi_z)
    zw = min(p["zp"], -(-p["z"] // scorer._WIRE_BUCKET) * scorer._WIRE_BUCKET)
    host_wire = np.zeros((size, size, zw), np.float32).astype(jnp.dtype("bfloat16"))
    noop = jax.jit(lambda s: s * 1.0000001)
    s0 = jnp.float32(1.0)
    float(noop(s0))  # compile

    def t_dispatch():
        t0 = time.perf_counter()
        float(noop(s0))
        return time.perf_counter() - t0

    def t_h2d():
        t0 = time.perf_counter()
        dev = jax.device_put(host_wire)
        float(jnp.asarray(dev[0, 0, 0]))  # force the copy to complete
        return time.perf_counter() - t0

    attrib = {
        "dispatch_s": round(min(t_dispatch() for _ in range(3)), 3),
        "h2d_s": round(min(t_h2d() for _ in range(3)), 3),
        "wire_mb": round(host_wire.nbytes / 1e6, 1),
    }

    # MFU: analytic conv FLOPs the compiled program executes (incl. weight-0
    # padding windows) / time / chip bf16 peak — the perf-regression metric
    # the latency headline alone can't provide through +-40% tunnel noise
    from hdenseunet_tpu.utils.flops import peak_flops_per_chip

    flops = scorer.estimate_flops(vol.shape, mini_z, maxi_z)
    peak = peak_flops_per_chip() * jax.device_count()
    if compute_metrics:
        compute_metrics["compute_mfu"] = round(
            flops / compute_metrics["compute_s_per_volume"] / peak, 4
        )
    print(
        json.dumps(
            {
                "metric": "hybrid_inference_volume_latency",
                "value": round(dt, 3),
                "unit": "s/volume",
                "vs_baseline": round(BASELINE_SEC_PER_VOLUME / max(dt, 1e-9), 2),
                "model_tflops": round(flops / 1e12, 2),
                "achieved_tflops": round(flops / dt / 1e12, 2),
                "mfu": round(flops / dt / peak, 4),
                **compute_metrics,
                **attrib,
                **train_metrics,
            }
        )
    )


if __name__ == "__main__":
    main()
