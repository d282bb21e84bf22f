"""Headline benchmark: full-volume H-DenseUNet inference + training step.

Times the production serving path (BASELINE.json config 5) on one chip: a
512x512xZ CT volume is placed on device ONCE, then the reference's entire
sliding-window algorithm (stride-2 z-windows through the full hybrid —
2D DenseUNet-167 branch + 3D DenseNet branch + HFF head — softmax, edge-slice
drop, multiplicity-weighted overlap averaging, lib/funcs.py:4-52) runs as one
compiled XLA program in bfloat16; only a 3-scalar digest leaves the device.

Latency numbers (this host tunnels the TPU through a stdio relay whose
per-dispatch latency wanders 36 ms-2 s within a day, BENCH_NOTES.md):

* ``value`` — end-to-end s/volume, min over BENCH_REPS dispatches: the honest
  single-volume serving cost on THIS host (volume h2d + one dispatch
  round-trip + device compute).
* ``pipelined_s_per_volume`` — amortized s/volume over BENCH_PIPELINE_VOLUMES
  volumes through the production pipelined loop (predictor.dispatch/collect:
  volume i+1's h2d + dispatch enqueue before volume i's result is fetched, so
  host link, postprocess, and chip overlap) — the honest analog of the
  reference's 70-volume test sweep (test.py:44).
* ``compute_s_per_volume`` — relay-immune device compute: the whole serving
  program repeated k times inside ONE dispatch with a loop-carried dependence;
  per-volume time is the slope between the k=1 and k=BENCH_COMPUTE_K programs.
  Dispatch latency and h2d cancel in the slope, so this number tracks
  chip-side regressions through any relay weather.

Slope protocol (hardened in round 5 — round 4 published a negative train
slope and a 3x-inflated compute number from un-interleaved endpoints):
both endpoint programs are compiled+warmed up front, then round-robined for
>= BENCH_COMPUTE_REPS timed reps each so both sample the same relay weather;
the slope comes from the endpoint MINIMA (relay noise is additive-positive,
so minima converge). Guards: the minima must be monotone (t_big > t_small);
on violation one full retry rep-set is merged in, and if still violated the
JSON carries ``compute_unreliable: true`` (or ``train_compute_unreliable``)
INSTEAD of a garbage number. ``*_spread`` = worst endpoint (max-min)/min.

Training metrics ride the same JSON line (driver-visible, BASELINE.md's
">=5x slices/s/chip" target): chained 2D-stage step — each dispatch consumes
the previous dispatch's TrainState, the reference's always-chained protocol
(training.py:1715) — batch 8 @ 224^2 bf16 with remat, min over reps of a
20-step loop. train_mfu counts model FLOPs (fwd + 2x fwd for bwd; remat
recompute is execution detail, not model work). ``train_compute_ms_per_step``
is the relay-immune twin: K chained steps inside ONE dispatch (lax.scan,
trainer.make_multi_step), slope between the k=4 and k=64 programs under the
same hardened protocol.

``h2d_s``/``dispatch_s`` attribute the gap between ``value`` and
``compute_s_per_volume``: a timed device_put of a buffer with the wire's
exact shape/dtype, and a timed no-op dispatch round-trip. ``decomp_gap_s`` =
value - (compute + h2d + dispatch); each component is a min over reps taken
at different instants of relay weather and h2d_s itself includes ~1 dispatch
round-trip (its sync), so gaps within ~(1 dispatch + 20% of value) are
measurement skew, not a real inconsistency.

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
  BENCH_COMPUTE_K=5    big slope endpoint (k reps/dispatch; <=9 proven safe)
  BENCH_COMPUTE_REPS=8 timed reps per slope endpoint (interleaved)
  BENCH_TRAIN=1        also measure the chained train step (default on)
  BENCH_TRAIN_SLOPE_REPS=8  timed reps per train slope endpoint
  BENCH_TRAIN_K_SMALL/K_BIG  train slope endpoints (default 4 / 64)
  BENCH_PIPELINE=1     also measure the pipelined multi-volume loop (default on)
  BENCH_PIPELINE_VOLUMES=3  volumes in the pipelined loop
  BENCH_UNROLL=N       window-batch loop unroll (default InferConfig default)
  BENCH_CPU=1          force the CPU backend (script smoke test off-TPU)
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_SEC_PER_VOLUME = 100.0


def _note(msg: str) -> None:
    """Progress marker on stderr (the driver records stdout only)."""
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def hardened_slope(timed_small, timed_big, k_small: int, k_big: int, reps: int):
    """Interleaved min-over-reps slope with monotonicity guards.

    ``timed_small``/``timed_big`` run the two endpoint programs (already
    compiled + warm) and return wall seconds. Endpoints are round-robined so
    both sample the same relay weather; the slope is computed from the
    endpoint minima. If the minima are non-monotone (slope <= 0), one full
    retry rep-set is merged in; if still violated, ``unreliable`` is True and
    the caller must not publish the number (VERDICT r4 item 1).
    """
    t_small: list[float] = []
    t_big: list[float] = []

    def rounds(n):
        for _ in range(n):
            t_small.append(timed_small())
            t_big.append(timed_big())

    rounds(reps)
    if min(t_big) <= min(t_small):
        rounds(reps)  # one retry: merged minima
    slope = (min(t_big) - min(t_small)) / (k_big - k_small)

    def spread(ts):
        return (max(ts) - min(ts)) / max(min(ts), 1e-9)

    return {
        "slope": slope,
        "unreliable": slope <= 0.0,
        "spread": max(spread(t_small), spread(t_big)),
        "t_small_min": min(t_small),
        "t_big_min": min(t_big),
    }


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
    slope_reps = int(os.environ.get("BENCH_TRAIN_SLOPE_REPS", "8"))

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

    _note("train: compiling chained step")
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

    _note("train: chained loops")
    dt = min(loop() for _ in range(reps))

    # Relay-immune compute number: K chained steps inside ONE dispatch
    # (lax.scan over a stacked batch, trainer.make_multi_step — numerically
    # identical to K sequential steps); per-step time is the slope between
    # the k=4 and k=28 programs under the hardened interleaved protocol (see
    # module docstring) — dispatch latency + h2d cancel in the slope. The
    # span is 24 steps (~0.9 s of marginal on-chip work) because scan-program
    # dispatches measured multi-second overheads on 2026-08-19; a span-8
    # signal (~0.3 s) sat below that day's noise floor (scan compile time is
    # k-independent — the body compiles once).
    # k=4 vs 64: 60 steps ≈ 2 s of marginal on-chip work. The span-24 run of
    # 2026-08-19 came back non-monotone (t_small 5.03 > t_big 4.67 minima)
    # under a ~5 s scan-dispatch floor — the guard correctly published
    # train_compute_unreliable, but a wider span resolves where that one
    # could not. Scan compile is k-independent (body compiles once); the
    # k=64 dispatch is ~2.5 s of chip work, far under the ~130 s worker
    # crash threshold (BENCH_NOTES round-4).
    k_small, k_big = (
        int(os.environ.get("BENCH_TRAIN_K_SMALL", "4")),
        int(os.environ.get("BENCH_TRAIN_K_BIG", "64")),
    )
    stacked_sh = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(None, "data")
    )

    def make_timed(k):
        multi = trainer.make_multi_step(tx, cfg, mesh, "2d", k=k)
        stacked = {
            kk: jax.device_put(
                np.broadcast_to(np.asarray(v), (k,) + v.shape).copy(), stacked_sh
            )
            for kk, v in db.items()
        }

        def timed():
            t0 = time.perf_counter()
            _, losses = multi(ts0, stacked)
            final = float(np.asarray(losses).ravel()[-1])  # scalar d2h = sync
            assert np.isfinite(final)
            return time.perf_counter() - t0

        timed()  # compile + warm
        return timed

    _note(f"train: compiling scan endpoints k={k_small},{k_big}")
    timed_small, timed_big = make_timed(k_small), make_timed(k_big)
    _note("train: interleaved slope reps")
    sl = hardened_slope(timed_small, timed_big, k_small, k_big, slope_reps)

    fwd = conv_flops(
        denseunet2d.apply, (batch, size, size, 3), bn_frozen=False,
        decoder_dropout=0.0, **denseunet2d.PRESETS[preset],
    )
    peak = peak_flops_per_chip() * jax.device_count()
    out = {
        "train_ms_per_step": round(dt * 1e3, 2),
        "train_slices_per_s_chip": round(batch / dt / jax.device_count(), 1),
        "train_mfu": round(3.0 * fwd / dt / peak, 4),
        "train_compute_spread": round(sl["spread"], 3),
    }
    if sl["unreliable"]:
        out["train_compute_unreliable"] = True
        out["train_compute_t_small_s"] = round(sl["t_small_min"], 3)
        out["train_compute_t_big_s"] = round(sl["t_big_min"], 3)
    else:
        dt_c = sl["slope"]
        out.update(
            {
                "train_compute_ms_per_step": round(dt_c * 1e3, 2),
                "train_compute_slices_per_s_chip": round(
                    batch / dt_c / jax.device_count(), 1
                ),
                "train_compute_mfu": round(3.0 * fwd / dt_c / peak, 4),
            }
        )
    return out


def measure_pipelined(params, bn_state, icfg, preset: str, vol, mini_z, maxi_z):
    """Amortized s/volume through the production pipelined serving loop."""
    from hdenseunet_tpu.core.config import Config
    from hdenseunet_tpu.infer.predictor import VolumePredictor

    nvol = int(os.environ.get("BENCH_PIPELINE_VOLUMES", "3"))
    cfg = Config()
    cfg.model.preset = preset
    cfg.model.input_size = icfg.input_size
    cfg.model.compute_dtype = "bfloat16"
    cfg.infer = icfg
    pred = VolumePredictor(params, bn_state, cfg, arch="end2end")

    mask = np.zeros(vol.shape, np.uint8)
    mask[64:-64, 64:-64, mini_z:maxi_z] = 1

    # warm: compiles the packed-labelmask program for this shape bucket and
    # runs one full dispatch+collect (incl. host postprocess)
    lm = pred.segment(vol, mask)
    assert lm.shape == vol.shape and lm.dtype == np.uint8

    t0 = time.perf_counter()
    inflight = None
    for _ in range(nvol):
        handle = pred.dispatch(vol, mask)
        if inflight is not None:
            pred.collect(inflight)
        inflight = handle
    pred.collect(inflight)
    dt = (time.perf_counter() - t0) / nvol
    return {
        "pipelined_s_per_volume": round(dt, 3),
        "pipelined_volumes": nvol,
        "pipelined_vs_baseline": round(BASELINE_SEC_PER_VOLUME / max(dt, 1e-9), 2),
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

    # every phase is fenced: a device fault in one phase (e.g. a TPU worker
    # crash mid-dispatch) must degrade that phase to an *_error flag, not
    # wipe the whole driver-visible JSON line (round-5 scoreboard rule)
    train_metrics = {}
    if os.environ.get("BENCH_TRAIN", "1") == "1":
        try:
            train_metrics = measure_train(preset)
        except Exception as e:
            _note(f"train phase failed: {type(e).__name__}: {e}")
            train_metrics = {"train_error": True}

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
    _note("infer: compiling serving program (warmup)")
    scorer.summarize(vol, mini_z, maxi_z)
    _note("infer: timed end-to-end reps")

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
      try:
        k_small = 1
        k_big = int(os.environ.get("BENCH_COMPUTE_K", "5"))
        c_reps = int(os.environ.get("BENCH_COMPUTE_REPS", "8"))
        timed = scorer.compute_timer(vol, mini_z, maxi_z)
        _note(f"infer: compiling slope endpoints k={k_small},{k_big}")
        timed(k_small), timed(k_big)  # compile + warm both endpoint programs
        _note("infer: interleaved slope reps")
        sl = hardened_slope(
            lambda: timed(k_small), lambda: timed(k_big), k_small, k_big, c_reps
        )
        compute_metrics = {
            "compute_spread": round(sl["spread"], 3),
            "compute_t_small_s": round(sl["t_small_min"], 3),
            "compute_t_big_s": round(sl["t_big_min"], 3),
            "compute_k_big": k_big,
        }
        if sl["unreliable"]:
            compute_metrics["compute_unreliable"] = True
        else:
            compute_metrics["compute_s_per_volume"] = round(sl["slope"], 3)

      except Exception as e:
        _note(f"compute-slope phase failed: {type(e).__name__}: {e}")
        compute_metrics = {"compute_error": True}

    # Attribution of the end-to-end headline (value ~= compute + h2d +
    # dispatch, decomp_gap_s below): time the h2d of a buffer with the wire's
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
    if "compute_s_per_volume" in compute_metrics:
        attrib["decomp_gap_s"] = round(
            dt
            - (
                compute_metrics["compute_s_per_volume"]
                + attrib["h2d_s"]
                + attrib["dispatch_s"]
            ),
            3,
        )

    pipe_metrics = {}
    if os.environ.get("BENCH_PIPELINE", "1") == "1" and not scorer.shared_2d:
        _note("pipelined multi-volume loop")
        try:
            pipe_metrics = measure_pipelined(
                params, bn_state, cfg, preset, vol, mini_z, maxi_z
            )
        except Exception as e:
            _note(f"pipelined phase failed: {type(e).__name__}: {e}")
            pipe_metrics = {"pipelined_error": True}

    # MFU: analytic conv FLOPs the compiled program executes (incl. weight-0
    # padding windows) / time / chip bf16 peak — the perf-regression metric
    # the latency headline alone can't provide through +-40% tunnel noise
    from hdenseunet_tpu.utils.flops import peak_flops_per_chip

    flops = scorer.estimate_flops(vol.shape, mini_z, maxi_z)
    peak = peak_flops_per_chip() * jax.device_count()
    if "compute_s_per_volume" in compute_metrics:
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
                **pipe_metrics,
                **train_metrics,
            }
        )
    )


if __name__ == "__main__":
    main()
