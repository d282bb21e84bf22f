"""Round-5 TPU measurement campaign: one init, four probes, one JSON each.

Through the stdio relay, ``hybrid.init`` + first compiles cost 10-20 min per
process; this script front-loads them ONCE and then runs, in order:

  pipeline   serial vs pipelined serving over N in-memory volumes
             (VolumePredictor.segment vs dispatch/collect; the committed
             device_postprocess default applies) — VERDICT r4 item 3.
  collect    per-stage attribution of the new collect path (dispatch, d2h
             fetch + residual host work) — the follow-up to collect_attrib's
             38-64 s host-postprocess finding.
  h2d        does device_put overlap an in-flight dispatch? (VERDICT item 4)
  wb12       window_batch=12 compute slope vs the wb=8 default under the
             hardened interleaved protocol; OOM-guarded (VERDICT item 6).

Each probe prints one ``{"metric": ...}`` JSON line; a crash in one probe
does not abort the rest. Run EXCLUSIVELY (1-core host rule, BENCH_NOTES).

Usage: python benchmarks/r5_campaign.py [--probes pipeline,collect,h2d,wb12]
       [--volumes 5] [--z 192] [--size 512] [--preset full] [--cpu]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
import traceback

sys.path.insert(0, ".")

import numpy as np


def _note(msg):
    print(f"[campaign {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def probe_pipeline(env, n):
    from hdenseunet_tpu.core.config import Config
    from hdenseunet_tpu.infer.predictor import VolumePredictor

    cfg = Config()
    cfg.model.preset = env["preset"]
    cfg.model.input_size = env["size"]
    cfg.infer.input_size = env["size"]
    cfg.model.compute_dtype = "bfloat16"
    pred = VolumePredictor(env["params"], env["bn_state"], cfg, arch="end2end")

    rng = np.random.default_rng(0)
    vols, masks = [], []
    for i in range(n):
        vols.append(
            rng.normal(0.0, 60.0, (env["size"], env["size"], env["z"])).astype(
                np.float32
            )
        )
        m = np.zeros(vols[-1].shape, np.uint8)
        m[64:-64, 64:-64, int(env["z"] * 0.2) : int(env["z"] * 0.8)] = 1
        masks.append(m)

    _note("pipeline: warmup (compile)")
    out = pred.segment(vols[0], masks[0])
    assert out.dtype == np.uint8

    _note("pipeline: serial")
    t0 = time.perf_counter()
    for i in range(n):
        pred.segment(vols[i], masks[i])
    serial = (time.perf_counter() - t0) / n

    _note("pipeline: pipelined")
    t0 = time.perf_counter()
    inflight = None
    for i in range(n):
        h = pred.dispatch(vols[i], masks[i])
        if inflight is not None:
            pred.collect(inflight)
        inflight = h
    pred.collect(inflight)
    pipelined = (time.perf_counter() - t0) / n

    print(
        json.dumps(
            {
                "metric": "serving_s_per_volume",
                "volumes": n,
                "serial": round(serial, 3),
                "pipelined": round(pipelined, 3),
                "overlap_speedup": round(serial / max(pipelined, 1e-9), 3),
                "device_postprocess": True,
            }
        ),
        flush=True,
    )
    return {"pred": pred, "vol": vols[0], "mask": masks[0]}


def probe_collect(env, carry):
    from hdenseunet_tpu.core.config import Config
    from hdenseunet_tpu.infer.predictor import VolumePredictor

    if carry:
        pred, vol, mask = carry["pred"], carry["vol"], carry["mask"]
    else:
        cfg = Config()
        cfg.model.preset = env["preset"]
        cfg.model.input_size = env["size"]
        cfg.infer.input_size = env["size"]
        cfg.model.compute_dtype = "bfloat16"
        pred = VolumePredictor(env["params"], env["bn_state"], cfg, arch="end2end")
        rng = np.random.default_rng(0)
        vol = rng.normal(0.0, 60.0, (env["size"], env["size"], env["z"])).astype(
            np.float32
        )
        mask = np.zeros(vol.shape, np.uint8)
        mask[64:-64, 64:-64, int(env["z"] * 0.2) : int(env["z"] * 0.8)] = 1
        pred.segment(vol, mask)  # compile

    rows = {"dispatch": [], "fetch_plus_host": []}
    for _ in range(3):
        t0 = time.perf_counter()
        h = pred.dispatch(vol, mask)
        rows["dispatch"].append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        out = pred.collect(h)
        rows["fetch_plus_host"].append(time.perf_counter() - t0)
        _note(
            "collect: dispatch=%.2fs fetch+host=%.2fs"
            % (rows["dispatch"][-1], rows["fetch_plus_host"][-1])
        )
    assert out.dtype == np.uint8
    print(
        json.dumps(
            {
                "metric": "collect_attrib_devicepp",
                **{k: round(min(v), 3) for k, v in rows.items()},
                "label_frac": round(float(np.count_nonzero(out)) / out.size, 4),
            }
        ),
        flush=True,
    )


def probe_h2d(env):
    import jax
    import jax.numpy as jnp

    from hdenseunet_tpu.core.config import InferConfig
    from hdenseunet_tpu.infer.device_pipeline import DeviceVolumeScorer

    cfg = InferConfig(input_size=env["size"])
    scorer = DeviceVolumeScorer(
        env["params"], env["bn_state"], cfg, arch="end2end", preset=env["preset"],
        compute_dtype="bfloat16", z_bucket=64,
    )
    rng = np.random.default_rng(0)
    vol = rng.normal(0.0, 60.0, (env["size"], env["size"], env["z"])).astype(np.float32)
    mini_z, maxi_z = int(env["z"] * 0.2), int(env["z"] * 0.8)
    timed = scorer.compute_timer(vol, mini_z, maxi_z)
    _note("h2d: compile serving program")
    timed(1)

    p = scorer.plan(vol.shape, mini_z, maxi_z)
    zw = min(p["zp"], -(-p["z"] // scorer._WIRE_BUCKET) * scorer._WIRE_BUCKET)
    host_wire = np.zeros((env["size"], env["size"], zw), np.float32).astype(
        jnp.dtype("bfloat16")
    )

    def sync(dev):
        float(jnp.asarray(dev[0, 0, 0]))

    def t_h2d():
        t0 = time.perf_counter()
        sync(jax.device_put(host_wire))
        return time.perf_counter() - t0

    def t_both():
        t0 = time.perf_counter()
        dev = jax.device_put(host_wire)  # enqueue upload FIRST
        timed(1)  # full serving dispatch + digest fetch
        sync(dev)
        return time.perf_counter() - t0

    sync(jax.device_put(host_wire))  # warm transfer path
    rows = {"h2d": [], "compute": [], "both": []}
    for _ in range(5):
        rows["h2d"].append(t_h2d())
        rows["compute"].append(timed(1))
        rows["both"].append(t_both())
        _note("h2d: " + "  ".join(f"{k}={rows[k][-1]:.2f}s" for k in rows))
    h2d, comp, both = (min(rows[k]) for k in ("h2d", "compute", "both"))
    print(
        json.dumps(
            {
                "metric": "h2d_overlap",
                "h2d_s": round(h2d, 3),
                "compute_s": round(comp, 3),
                "both_s": round(both, 3),
                "serialized_sum_s": round(h2d + comp, 3),
                "overlap_frac": round(
                    (h2d + comp - both) / max(min(h2d, comp), 1e-9), 3
                ),
                "wire_mb": round(host_wire.nbytes / 1e6, 1),
            }
        ),
        flush=True,
    )
    return scorer, vol, mini_z, maxi_z


def probe_wb12(env, base_scorer, vol, mini_z, maxi_z):
    from bench import hardened_slope
    from hdenseunet_tpu.core.config import InferConfig
    from hdenseunet_tpu.infer.device_pipeline import DeviceVolumeScorer

    cfg12 = InferConfig(input_size=env["size"], window_batch=12)
    _note("wb12: building scorer (compile-or-OOM probe)")
    scorer12 = DeviceVolumeScorer(
        env["params"], env["bn_state"], cfg12, arch="end2end", preset=env["preset"],
        compute_dtype="bfloat16", z_bucket=64,
    )
    out = {"metric": "wb12_probe", "wb8_s": None, "wb12_s": None}
    timed12 = scorer12.compute_timer(vol, mini_z, maxi_z)
    timed12(1)  # compile — the OOM point if there is one
    _note("wb12: compiled; interleaved wb8-vs-wb12 k=1 reps")
    timed8 = base_scorer.compute_timer(vol, mini_z, maxi_z)
    timed8(1)
    # same hardened idea, but endpoints are VARIANTS at equal k: report the
    # two k=1..3 slopes so dispatch noise cancels within each variant
    s8 = hardened_slope(lambda: timed8(1), lambda: timed8(3), 1, 3, 6)
    s12 = hardened_slope(lambda: timed12(1), lambda: timed12(3), 1, 3, 6)
    out["wb8_s"] = None if s8["unreliable"] else round(s8["slope"], 3)
    out["wb12_s"] = None if s12["unreliable"] else round(s12["slope"], 3)
    out["wb8_spread"] = round(s8["spread"], 3)
    out["wb12_spread"] = round(s12["spread"], 3)
    print(json.dumps(out), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--probes", default="pipeline,collect,h2d,wb12")
    ap.add_argument("--volumes", type=int, default=5)
    ap.add_argument("--z", type=int, default=192)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--preset", default="full")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from hdenseunet_tpu.models import hybrid

    print(f"devices: {jax.devices()}", flush=True)
    _note("init params")
    t0 = time.perf_counter()
    from hdenseunet_tpu.core.config import InferConfig

    cfg = InferConfig(input_size=args.size)
    params, bn_state = hybrid.init(
        jax.random.key(0), input_size=args.size, input_cols=cfg.input_cols,
        batch=1, arch="end2end", preset=args.preset,
    )
    _note(f"init {time.perf_counter() - t0:.1f}s")
    env = dict(
        params=params, bn_state=bn_state, size=args.size, z=args.z,
        preset=args.preset,
    )

    probes = args.probes.split(",")
    carry = None
    h2d_out = None
    for name in probes:
        _note(f"=== probe {name} ===")
        try:
            if name == "pipeline":
                carry = probe_pipeline(env, args.volumes)
            elif name == "collect":
                probe_collect(env, carry)
            elif name == "h2d":
                h2d_out = probe_h2d(env)
            elif name == "wb12":
                if h2d_out is None:
                    raise RuntimeError("wb12 needs the h2d probe's scorer first")
                probe_wb12(env, *h2d_out)
        except Exception:
            traceback.print_exc()
            print(json.dumps({"metric": name, "error": True}), flush=True)


if __name__ == "__main__":
    main()
