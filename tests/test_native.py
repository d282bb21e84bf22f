"""Native (C++) sampler core vs the numpy/cv2 oracle path."""
import numpy as np
import pytest

from hdenseunet_tpu import native
from hdenseunet_tpu.data import preprocess, sampler

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain / native build failed"
)


@pytest.fixture(scope="module")
def vol_seg():
    rng = np.random.default_rng(0)
    vol = rng.normal(0, 100, (40, 36, 16)).astype(np.float32)
    seg = rng.integers(0, 3, (40, 36, 16)).astype(np.int16)
    return vol, seg


@pytest.mark.parametrize("case", range(8))
def test_crop_aug_exact_vs_numpy(vol_seg, case):
    vol, seg = vol_seg
    a, b, c = 5, 4, 3
    deps, rows, cols = 24, 20, 3
    ci = vol[a : a + deps, b : b + rows, c : c + cols] - 48.0
    cs = seg[a : a + deps, b : b + rows, c : c + cols]
    pi, ps = sampler.apply_flip_rot(ci, cs, case)
    ni, ns = native.crop_aug(
        vol, seg, (a, b, c), (deps, rows, cols), mean=48.0, flip_case=case
    )
    np.testing.assert_array_equal(pi, ni)
    np.testing.assert_array_equal(ps, ns)


@pytest.mark.parametrize("case", range(8))
def test_fused_resize_matches_cv2(vol_seg, case):
    cv2 = pytest.importorskip("cv2")
    vol, seg = vol_seg
    origin, size = (2, 2, 1), (30, 30, 3)
    pi, ps = sampler.apply_flip_rot(
        vol[2:32, 2:32, 1:4] - 48.0, seg[2:32, 2:32, 1:4], case
    )
    ref_img = cv2.resize(np.ascontiguousarray(pi), (48, 48), interpolation=cv2.INTER_CUBIC)
    ref_seg = cv2.resize(np.ascontiguousarray(ps), (48, 48), interpolation=cv2.INTER_NEAREST)
    ni, ns = native.crop_aug_resize(
        vol, seg, origin, size, mean=48.0, flip_case=case, out_size=48
    )
    np.testing.assert_allclose(ni, ref_img, atol=1e-3)
    np.testing.assert_array_equal(ns, ref_seg)


def test_sampler_native_and_python_agree(tmp_path):
    """CropSampler with use_native on/off produces identical batches
    (same seed drives identical random choices)."""
    root = preprocess.synthesize(tmp_path / "p", num_volumes=2, shape=(72, 72, 20), seed=2)
    ds = preprocess.PreparedDataset(root)
    a = sampler.CropSampler(ds, mode="2d", input_size=48, seed=5, use_native=True)
    b = sampler.CropSampler(ds, mode="2d", input_size=48, seed=5, use_native=False)
    ba = a.sample_batch(4)
    bb = b.sample_batch(4)
    np.testing.assert_allclose(ba["image"], bb["image"], atol=1e-3)
    np.testing.assert_array_equal(ba["label"], bb["label"])


def test_native_faster_than_python(tmp_path):
    """The point of the native core: beat the numpy/cv2 chain per sample."""
    import time

    root = preprocess.synthesize(tmp_path / "p", num_volumes=1, shape=(128, 128, 24), seed=3)
    ds = preprocess.PreparedDataset(root)

    def bench(use_native):
        s = sampler.CropSampler(ds, mode="hybrid", input_size=96, seed=1, use_native=use_native)
        s.sample_one()  # warm caches
        t0 = time.perf_counter()
        for _ in range(20):
            s.sample_one()
        return time.perf_counter() - t0

    t_native = bench(True)
    t_python = bench(False)
    # only assert it's not pathologically slower; report via -s if curious
    assert t_native < t_python * 1.5, (t_native, t_python)
