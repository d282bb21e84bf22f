"""End-to-end volume segmentation driver (reference test.py:39-115).

Per test volume the reference rebuilds the whole model, reloads weights,
recompiles, predicts window-by-window, then clears the TF session
(test.py:48-51, :69). Here the model function is jit-compiled ONCE and reused
across all volumes; only the (cheap) host accumulation is per-volume.
"""
from __future__ import annotations

import time
from pathlib import Path

import numpy as np

from ..core.config import Config
from ..data import nifti
from . import postprocess
from .sliding_window import WindowPredictor


class VolumePredictor:
    """params + config -> callable volume segmenter."""

    def __init__(self, params, bn_state, cfg: Config, *, arch: str = "end2end", mesh=None):
        self.cfg = cfg
        if cfg.infer.device_resident:
            from .device_pipeline import DeviceVolumeScorer

            self.windows = DeviceVolumeScorer(
                params,
                bn_state,
                cfg.infer,
                arch=arch,
                preset=cfg.model.preset,
                compute_dtype=cfg.model.compute_dtype,
                num_classes=cfg.model.num_classes,
                mesh=mesh,
            )
        else:
            self.windows = WindowPredictor(
                params,
                bn_state,
                cfg.infer,
                arch=arch,
                preset=cfg.model.preset,
                compute_dtype=cfg.model.compute_dtype,
                num_classes=cfg.model.num_classes,
                mesh=mesh,
            )

    def segment(self, vol: np.ndarray, ext_liver_mask: np.ndarray) -> np.ndarray:
        """(CT volume, external liver mask) -> uint8 labelmap {0 bg,1 liver,2 tumor}."""
        return self.collect(self.dispatch(vol, ext_liver_mask))

    def dispatch(self, vol: np.ndarray, ext_liver_mask: np.ndarray):
        """Upload + enqueue one volume's scoring program WITHOUT fetching.

        JAX dispatch is asynchronous: this returns as soon as the program is
        enqueued, so the caller can overlap the next volume's h2d + dispatch
        with this one's device execution and d2h (predict_directory's
        pipelined loop). Pair with :meth:`collect`.
        """
        icfg = self.cfg.infer
        img = np.asarray(vol, np.float32) - icfg.mean  # test.py:55
        mask, z_lo, z_hi = postprocess.liver_mask_extent(ext_liver_mask)
        if icfg.device_resident:
            if getattr(icfg, "device_postprocess", False):
                # the CC postprocess rides the device (device_postprocess.py);
                # the wire carries the FINAL {0,1,2} labelmap
                handle = self.windows.labelmask_async(
                    img, z_lo, z_hi, ext_mask=mask
                )
                return ("final", handle, None)
            handle = self.windows.labelmask_async(img, z_lo, z_hi)
            return ("packed", handle, mask)
        liver_prob, tumor_prob = self.windows.predict_volume(img, z_lo, z_hi)
        return ("probs", (liver_prob, tumor_prob), mask)

    def collect(self, handle) -> np.ndarray:
        """Fetch a dispatched volume's result and postprocess to a labelmap."""
        kind, payload, mask = handle
        icfg = self.cfg.infer
        if kind == "final":
            return self.windows.labelmask_collect(payload)
        if kind == "packed":
            packed = self.windows.labelmask_collect(payload)
            return postprocess.compose_from_masks(packed >= 1, packed >= 3, mask)
        liver_prob, tumor_prob = payload
        return postprocess.compose_labelmap(
            liver_prob,
            tumor_prob,
            mask,
            thres_liver=icfg.thres_liver,
            thres_tumor=icfg.thres_tumor,
        )


class TiledPredictor:
    """Volume segmenter over the x/y/z-tiled scorer (reference
    predict_window_mulgpu analog) — for in-plane extents too large for
    full-frame windows. Same postprocess as VolumePredictor."""

    def __init__(self, params, bn_state, cfg: Config, *, tile: int, arch: str = "end2end"):
        from .device_pipeline import TiledVolumeScorer

        self.cfg = cfg
        self.scorer = TiledVolumeScorer(
            params,
            bn_state,
            cfg.infer,
            tile=tile,
            arch=arch,
            preset=cfg.model.preset,
            compute_dtype=cfg.model.compute_dtype,
            num_classes=cfg.model.num_classes,
        )

    def segment(self, vol: np.ndarray, ext_liver_mask: np.ndarray) -> np.ndarray:
        icfg = self.cfg.infer
        img = np.asarray(vol, np.float32) - icfg.mean
        mask, _, _ = postprocess.liver_mask_extent(ext_liver_mask)
        liver_prob, tumor_prob = self.scorer.predict_volume(img)
        return postprocess.compose_labelmap(
            liver_prob,
            tumor_prob,
            mask,
            thres_liver=icfg.thres_liver,
            thres_tumor=icfg.thres_tumor,
        )


def predict_directory(
    params,
    bn_state,
    cfg: Config,
    *,
    data_dir,
    liver_mask_dir,
    save_dir,
    num_volumes: int | None = None,
    arch: str = "end2end",
    tiled: int | None = None,
    log=print,
):
    """Segment ``test-volume-{i}.nii`` files, write labelmaps, report timing.

    Mirrors the reference CLI loop (test.py:44-115: volume ``{id}.nii`` +
    external mask ``{id}-ori.nii`` -> ``test-segmentation-{id}.nii``).
    """
    data_dir = Path(data_dir)
    mask_dir = Path(liver_mask_dir)
    out_dir = Path(save_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    if tiled:
        predictor = TiledPredictor(params, bn_state, cfg, tile=tiled, arch=arch)
    else:
        predictor = VolumePredictor(params, bn_state, cfg, arch=arch)

    n = num_volumes if num_volumes is not None else cfg.data.num_test_volumes
    times = []

    # two overlaps (the reference reloaded model + weights per volume,
    # test.py:48-51):
    # * the next volume's NIfTI read/decompress rides a loader thread;
    # * with the device-resident scorer, volume i+1's h2d + dispatch are
    #   enqueued BEFORE volume i's result is fetched (async JAX dispatch),
    #   so the host link and the chip work concurrently across volumes.
    from concurrent.futures import ThreadPoolExecutor

    def load(i):
        vol, hdr = nifti.read(_find(data_dir, i))
        mask, _ = nifti.read(_find(mask_dir, i, suffix="-ori"))
        return vol, hdr, np.asarray(mask)

    pipelined = not tiled and cfg.infer.device_resident
    inflight = None  # (handle, hdr, shape, index)
    last_done = time.perf_counter()

    def finish(entry):
        nonlocal last_done
        handle, hdr, shape, idx = entry
        labelmap = predictor.collect(handle)
        now = time.perf_counter()
        dt = now - last_done
        last_done = now
        times.append(dt)
        nifti.write(out_dir / f"test-segmentation-{idx}.nii", labelmap, hdr)
        log(f"volume {idx}: {shape} segmented in {dt:.2f}s")

    with ThreadPoolExecutor(max_workers=1) as pool:
        pending = pool.submit(load, 0) if n else None
        for i in range(n):
            vol, hdr, mask = pending.result()
            pending = pool.submit(load, i + 1) if i + 1 < n else None
            if pipelined:
                handle = predictor.dispatch(vol, mask)
                if inflight is not None:
                    finish(inflight)
                inflight = (handle, hdr, vol.shape, i)
            else:
                t0 = time.perf_counter()
                labelmap = predictor.segment(vol, mask)
                dt = time.perf_counter() - t0
                times.append(dt)
                nifti.write(out_dir / f"test-segmentation-{i}.nii", labelmap, hdr)
                log(f"volume {i}: {vol.shape} segmented in {dt:.2f}s")
        if inflight is not None:
            finish(inflight)
    if times:
        log(f"mean {np.mean(times):.2f}s/volume over {len(times)} volumes")
    return times


def _find(root: Path, index: int, suffix: str = ""):
    for stem in (f"test-volume-{index}{suffix}", f"{index}{suffix}"):
        for ext in (".nii", ".nii.gz"):
            p = root / (stem + ext)
            if p.exists():
                return p
    raise FileNotFoundError(f"{root}/[test-volume-]{index}{suffix}.nii[.gz]")
