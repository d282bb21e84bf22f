"""Does volume h2d overlap device compute on this backend? (VERDICT r4 item 4)

The single-volume headline pays ~1.6-6.3 s of volume upload (h2d_s) on top of
~3.3 s of device compute. Whether that upload can hide behind compute decides
which lever matters: if the backend already overlaps `device_put` with an
in-flight dispatch, the cross-volume pipelining of predict_directory (volume
i+1's upload enqueued before volume i's result is fetched) removes the wire
cost from the amortized s/volume and no kernel restructuring is needed; if
uploads serialize with dispatches, only chunked in-volume overlap could help.

Three timed regions, min over reps, using the REAL serving program (the
scorer's k=1 compute_timer program, wire already device-resident) and a host
wire buffer of the exact serving shape/dtype:

  h2d      device_put(host_wire) + scalar fetch (the sync)
  compute  one k=1 serving dispatch + digest fetch
  both     device_put enqueued FIRST, then the serving dispatch + fetch, then
           the upload synced.  both ~= max(h2d, compute) => overlapped;
           both ~= h2d + compute => serialized.

overlap_frac = (h2d + compute - both) / min(h2d, compute): 1.0 = full
overlap, 0.0 = fully serialized. Run EXCLUSIVELY (1-core host rule).

Usage: python benchmarks/h2d_overlap.py [--reps 5] [--z 192] [--size 512]
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
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--z", type=int, default=192)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--preset", default="full")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from hdenseunet_tpu.core.config import InferConfig
    from hdenseunet_tpu.infer.device_pipeline import DeviceVolumeScorer
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

    timed = scorer.compute_timer(vol, mini_z, maxi_z)
    timed(1)  # compile + warm (its wire is device-resident inside the timer)

    p = scorer.plan(vol.shape, mini_z, maxi_z)
    zw = min(p["zp"], -(-p["z"] // scorer._WIRE_BUCKET) * scorer._WIRE_BUCKET)
    host_wire = np.zeros((size, size, zw), np.float32).astype(jnp.dtype("bfloat16"))
    print(f"wire {host_wire.nbytes / 1e6:.1f} MB", flush=True)

    def sync(dev):
        float(jnp.asarray(dev[0, 0, 0]))

    def t_h2d():
        t0 = time.perf_counter()
        dev = jax.device_put(host_wire)
        sync(dev)
        return time.perf_counter() - t0

    def t_both():
        t0 = time.perf_counter()
        dev = jax.device_put(host_wire)  # enqueue the upload first
        timed(1)  # full serving dispatch + digest fetch
        sync(dev)  # then sync the upload
        return time.perf_counter() - t0

    sync(jax.device_put(host_wire))  # warm any transfer-path setup
    rows = {"h2d": [], "compute": [], "both": []}
    for _ in range(args.reps):  # round-robin: same relay weather for all three
        rows["h2d"].append(t_h2d())
        rows["compute"].append(timed(1))
        rows["both"].append(t_both())
        print(
            "  " + "  ".join(f"{k}={rows[k][-1]:.2f}s" for k in rows), flush=True
        )

    h2d, comp, both = (min(rows[k]) for k in ("h2d", "compute", "both"))
    overlap_frac = (h2d + comp - both) / max(min(h2d, comp), 1e-9)
    print(
        json.dumps(
            {
                "metric": "h2d_overlap",
                "h2d_s": round(h2d, 3),
                "compute_s": round(comp, 3),
                "both_s": round(both, 3),
                "serialized_sum_s": round(h2d + comp, 3),
                "overlap_frac": round(overlap_frac, 3),
                "wire_mb": round(host_wire.nbytes / 1e6, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
