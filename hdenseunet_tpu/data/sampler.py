"""Liver/tumor-guided crop sampler + augmentation (host-side, numpy).

Re-implements the reference's training sampler recipe
(train_2ddense.py:40-126 / train_hybrid.py:40-133) as a vectorized,
reproducible (explicit ``np.random.Generator``) component:

* random isotropic in-plane scale U(0.8, 1.2) of the crop window (:48-50);
* a random liver- or tumor-voxel *center*, clamped so the crop stays inside
  the liver bounding box dilated by 3 voxels (:53-63; box dilation
  train_2ddense.py:151-156);
* 50/50 liver- vs tumor-guided choice (`np.random.randint(0,6) < 3`), with
  liver-guided forced for the 13 tumor-free volumes (:39, :111-117);
* mean subtraction (:65), one of 8 flip/rot90 augmentations (:67-94) — note
  the reference's case 5/6 (fliplr+rot90) equal compositions of other cases
  and case 2 == case 2; the exact 8-way distribution is preserved;
* resize back to (input_size, input_size, z): cubic for image, nearest for
  mask (:96-97). z-extent is never resized (cols == input_cols before and
  after), so this is a per-slice 2D resize — done with one cv2 INTER_CUBIC /
  INTER_NEAREST call treating z as channels (~20x faster than the
  reference's skimage 3-D spline call).

2D stage: crops are (H, W, 3) slabs, label = center slice (:97 returns
``cropp_tumor[:, :, 1]``).
Hybrid stage: crops are (H, W, D=input_cols) sub-volumes with full masks;
batches missing any of the 3 classes are rejected (train_hybrid.py:127-132).

Parallel feeding (reference: a fresh 14-thread crop pool per batch,
train_2ddense.py:119-122, plus 3 multiprocessing enqueuer workers,
data_utils.py:530): ``batches(batch, threads=N)`` crops samples on a
persistent thread pool (``DataConfig.crop_threads``) with a *counter-based*
RNG — each sample's stream is derived from (seed, sample_index, attempt), so
the produced batches are bit-identical for any thread count >= 1
(tests/test_data.py::test_parallel_batches_deterministic); ``threads=None``
selects the legacy sequential stream instead. The hot per-sample
work (mmap'd crop read, cv2 resize, or the native C++ kernel) releases the
GIL, so the pool scales on multi-core hosts; benchmarks/sampler_throughput.py
measures samples/s versus the chips' measured training consumption.
"""
from __future__ import annotations

import numpy as np

try:  # cv2 is the fast path; scipy fallback keeps the module dependency-light
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False

from scipy import ndimage

from ..core.config import DataConfig
from .preprocess import PreparedDataset


def resize_2d_stack(
    vol: np.ndarray,
    out_hw: tuple[int, int],
    *,
    nearest: bool,
    backend: str = "cv2",
) -> np.ndarray:
    """Resize (H, W, Z) -> (out_h, out_w, Z), z untouched.

    Cubic (image) / nearest (mask) like reference train_2ddense.py:96-97,
    which calls skimage.transform.resize(order=3/'constant' resp.
    order=0/'edge', preserve_range=True). Backends (DataConfig.resize_backend):

    * 'spline' — scipy.ndimage.zoom with grid_mode=True, the same
      B-spline-interpolation family skimage.resize uses (skimage itself is not
      in this image); order 3 mode 'constant' for images, order 0 mode
      'nearest' (== skimage 'edge') for masks — the reference-exact choice;
    * 'cv2' — INTER_CUBIC (Catmull-Rom family) / INTER_NEAREST, ~20x faster.
      A *different cubic family* from the spline path: the delta is measured
      by tests/test_data.py::test_resize_backend_deviation_quantified and is
      far below the sampler's own augmentation noise.
    """
    h, w = out_hw
    if vol.shape[:2] == (h, w):
        return vol
    if backend == "cv2" and _HAS_CV2 and vol.shape[2] <= 128:
        interp = cv2.INTER_NEAREST if nearest else cv2.INTER_CUBIC
        out = cv2.resize(np.ascontiguousarray(vol), (w, h), interpolation=interp)
        if out.ndim == 2:
            out = out[:, :, None]
        return out
    zoom = (h / vol.shape[0], w / vol.shape[1], 1.0)
    order = 0 if nearest else 3
    return ndimage.zoom(
        vol, zoom, order=order, mode="nearest" if nearest else "grid-constant",
        grid_mode=True,
    )


_FLIP_CASES = 8
_MAX_BATCH_RETRIES = 16


def apply_flip_rot(img: np.ndarray, mask: np.ndarray, case: int):
    """One of the reference's 8 augmentation cases (train_2ddense.py:67-94).

    Cases operate on the leading two (in-plane) axes; z rides along.
    """
    if case == 1:
        img, mask = np.flipud(img), np.flipud(mask)
    elif case == 2:
        img, mask = np.fliplr(img), np.fliplr(mask)
    elif case == 3:
        img = np.rot90(img, 1, (1, 0))
        mask = np.rot90(mask, 1, (1, 0))
    elif case == 4:
        img = np.rot90(img, 3, (1, 0))
        mask = np.rot90(mask, 3, (1, 0))
    elif case == 5:
        img = np.rot90(np.fliplr(img), 1, (1, 0))
        mask = np.rot90(np.fliplr(mask), 1, (1, 0))
    elif case == 6:
        img = np.rot90(np.fliplr(img), 3, (1, 0))
        mask = np.rot90(np.fliplr(mask), 3, (1, 0))
    elif case == 7:
        img = np.fliplr(np.flipud(img))
        mask = np.fliplr(np.flipud(mask))
    return img, mask


class CropSampler:
    """Stateful sampler over a :class:`PreparedDataset`.

    ``mode='2d'`` yields ((H,W,3) slab, (H,W) center-slice label);
    ``mode='hybrid'`` yields ((H,W,D) sub-volume, (H,W,D) label volume).
    """

    def __init__(
        self,
        dataset: PreparedDataset,
        cfg: DataConfig | None = None,
        *,
        mode: str = "2d",
        input_size: int = 224,
        input_cols: int = 8,
        seed: int = 0,
        use_native: bool | None = None,
    ):
        assert mode in ("2d", "hybrid"), mode
        self.ds = dataset
        self.cfg = cfg or DataConfig()
        self.mode = mode
        self.input_size = int(input_size)
        self.cols = 3 if mode == "2d" else int(input_cols)
        self.seed = int(seed)
        self.rng = np.random.default_rng(seed)
        self._cache: dict[int, tuple] = {}
        if use_native is None:
            from .. import native

            use_native = native.available()
        # the native C++ kernel is bit-compatible with the cv2 backend only
        self.use_native = bool(use_native) and self.cfg.resize_backend == "cv2"

    # -- per-volume cached metadata ---------------------------------------
    def _meta(self, i: int):
        if i not in self._cache:
            c = self.ds.coords(i)
            shape = np.asarray(self.ds.volume(i).shape, np.int64)
            d = self.cfg.box_dilation
            mn = np.maximum(c["box_min"] - d, 0)
            mx = np.minimum(shape, c["box_max"] + d)  # exclusive-ish, per reference
            self._cache[i] = (c["liver"], c["tumor"], mn, mx)
        return self._cache[i]

    def _pick_center(self, i: int, rng: np.random.Generator) -> np.ndarray:
        liver, tumor, _, _ = self._meta(i)
        tumor_free = i in self.cfg.tumor_free_volumes
        use_liver = (
            tumor_free
            or len(tumor) == 0
            or rng.random() < self.cfg.liver_sample_prob
        )
        coords = liver if use_liver else tumor
        if len(coords) == 0:
            # degenerate volume: fall back to its geometric center
            shape = np.asarray(self.ds.volume(i).shape)
            return shape // 2
        return coords[rng.integers(0, len(coords))]

    def sample_one(
        self,
        volume_index: int | None = None,
        rng: np.random.Generator | None = None,
    ):
        """One (image, label) crop, augmented and resized.

        ``rng`` defaults to the sampler's sequential stream; parallel callers
        pass a per-sample counter-derived generator (see :meth:`sample_at`).
        """
        rng = self.rng if rng is None else rng
        i = (
            int(rng.integers(0, len(self.ds)))
            if volume_index is None
            else volume_index
        )
        i = self.ds.indices[i % len(self.ds.indices)]
        img = self.ds.volume(i)
        seg = self.ds.segmentation(i)
        _, _, mn, mx = self._meta(i)
        shape = np.asarray(img.shape, np.int64)

        scale = rng.uniform(*self.cfg.scale_range)
        # window never exceeds the volume (the reference assumes 512^2 in-plane
        # and crashes on smaller volumes); the resize below restores input_size.
        deps = min(int(self.input_size * scale), int(shape[0]))
        rows = min(int(self.input_size * scale), int(shape[1]))
        cols = self.cols
        assert shape[2] >= cols, f"volume z-extent {shape[2]} < window depth {cols}"
        cen = self._pick_center(i, rng)

        # clamp center so the window sits inside the dilated box where it fits,
        # inside the volume always (reference train_2ddense.py:53-63; the
        # reference can produce empty slices when box < window — fixed here by
        # clamping against the volume bounds as the outer constraint).
        half = np.array([deps // 2, rows // 2, cols // 2])
        size = np.array([deps, rows, cols])
        lo = np.clip(np.minimum(np.maximum(mn + half, cen), mx - half - 1), half, shape - (size - half))
        a, b, c = (int(v) for v in lo)

        origin = (a - deps // 2, b - rows // 2, c - cols // 2)
        case = int(rng.integers(0, _FLIP_CASES))

        sl = tuple(slice(o, o + s) for o, s in zip(origin, (deps, rows, cols)))
        if self.use_native:
            # fused C++ mean-subtract+augment+resize (hdenseunet_tpu/native):
            # one call, bit-compatible with the cv2 path below
            # (tests/test_native.py). The crop itself stays numpy so mmap'd
            # volumes only materialize the cropped region.
            from .. import native

            crop_img, crop_seg = native.crop_aug_resize(
                np.ascontiguousarray(img[sl], np.float32),
                np.ascontiguousarray(seg[sl], np.int16),
                (0, 0, 0),
                (deps, rows, cols),
                mean=self.cfg.mean,
                flip_case=case,
                out_size=self.input_size,
            )
        else:
            crop_img = np.asarray(img[sl], np.float32) - self.cfg.mean
            crop_seg = np.asarray(seg[sl])
            crop_img, crop_seg = apply_flip_rot(crop_img, crop_seg, case)
            out_hw = (self.input_size, self.input_size)
            backend = self.cfg.resize_backend
            crop_img = resize_2d_stack(crop_img, out_hw, nearest=False, backend=backend)
            crop_seg = resize_2d_stack(
                crop_seg.astype(np.int16), out_hw, nearest=True, backend=backend
            )

        if self.mode == "2d":
            return crop_img, crop_seg[:, :, 1]
        return crop_img, crop_seg

    def sample_at(self, index: int, attempt: int = 0):
        """Sample #index with a counter-derived RNG.

        The stream is a pure function of (seed, index, attempt), so results
        are bit-identical no matter which thread computes them or in what
        order — the determinism contract of the parallel feed path.
        """
        rng = np.random.default_rng(
            np.random.SeedSequence((self.seed, int(index), int(attempt)))
        )
        return self.sample_one(rng=rng)

    def _assemble(self, pairs, *, force: bool = False):
        """Stack (img, label) pairs into a batch dict.

        Returns None for a hybrid batch missing one of the 3 classes
        (reference train_hybrid.py:127-132) unless ``force``.
        """
        image = np.stack([p[0] for p in pairs]).astype(np.float32)
        label = np.stack([p[1] for p in pairs]).astype(np.int32)
        if self.mode == "hybrid":
            image = image[..., None]
            if not force and not all((label == c).any() for c in range(3)):
                return None
        return {"image": image, "label": label}

    def sample_batch(self, batch: int):
        """Assemble a global batch as a dict of stacked arrays.

        2d:     image (B,H,W,3)        label (B,H,W)
        hybrid: image (B,H,W,D,1)      label (B,H,W,D)  — re-drawn until all
        three classes are present (reference train_hybrid.py:127-132), with a
        bounded retry so degenerate datasets can't hang the loop.
        """
        for _attempt in range(_MAX_BATCH_RETRIES):
            pairs = [self.sample_one() for _ in range(batch)]
            out = self._assemble(pairs)
            if out is not None:
                return out
        return self._assemble(pairs, force=True)

    def batches(self, batch: int, threads: int | None = None):
        """Infinite batch generator (reference generate_arrays_from_file).

        ``threads >= 1`` crops samples on a persistent pool (the reference's
        14-thread-pool + 3-enqueuer-worker role, train_2ddense.py:119-122,
        data_utils.py:530) with counter-based RNG: the batch sequence is
        bit-identical for every thread count, including 1. Only
        ``threads=None`` keeps the legacy sequential ``self.rng`` stream
        (a different stream by construction).
        """
        if threads is not None and threads >= 1:
            yield from self._parallel_batches(batch, max(1, threads))
            return
        while True:
            yield self.sample_batch(batch)

    def _parallel_batches(self, batch: int, threads: int, lookahead: int = 2):
        """Deterministic multi-threaded batch producer.

        Keeps ``lookahead`` future batches' samples in flight so the pool
        stays busy across batch boundaries; hybrid class-rejection re-draws
        the same index range at attempt+1 (still deterministic).
        """
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        ex = ThreadPoolExecutor(max_workers=threads, thread_name_prefix="crop")

        def submit(start, attempt):
            return [ex.submit(self.sample_at, start + j, attempt) for j in range(batch)]

        pending: deque = deque()
        next_start = 0
        try:
            for _ in range(lookahead + 1):
                pending.append((next_start, 0, submit(next_start, 0)))
                next_start += batch
            while True:
                start, attempt, futs = pending.popleft()
                pairs = [f.result() for f in futs]
                out = self._assemble(pairs)
                if out is None and attempt + 1 < _MAX_BATCH_RETRIES:
                    pending.appendleft((start, attempt + 1, submit(start, attempt + 1)))
                    continue
                if out is None:
                    out = self._assemble(pairs, force=True)
                pending.append((next_start, 0, submit(next_start, 0)))
                next_start += batch
                yield out
        finally:
            ex.shutdown(wait=False, cancel_futures=True)


def synthetic_batches(
    *, mode="2d", batch=2, input_size=224, input_cols=8, seed=0, classes=3
):
    """Random batches with the training pipeline's exact shapes/dtypes.

    For benchmarks and tests that need the device path without LiTS on disk.
    """
    rng = np.random.default_rng(seed)
    while True:
        if mode == "2d":
            image = rng.normal(0, 60, (batch, input_size, input_size, 3)).astype(np.float32)
            label = rng.integers(0, classes, (batch, input_size, input_size), dtype=np.int32)
        else:
            image = rng.normal(0, 60, (batch, input_size, input_size, input_cols, 1)).astype(np.float32)
            label = rng.integers(0, classes, (batch, input_size, input_size, input_cols), dtype=np.int32)
        yield {"image": image, "label": label}
