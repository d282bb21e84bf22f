"""Data subsystem tests: NIfTI IO, offline prep, guided sampler, prefetch."""
import numpy as np
import pytest
from scipy import ndimage

from hdenseunet_tpu.core.config import DataConfig
from hdenseunet_tpu.data import nifti, preprocess, sampler
from hdenseunet_tpu.data.pipeline import PrefetchIterator


# ---------------------------------------------------------------------------
# NIfTI IO
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("suffix", [".nii", ".nii.gz"])
@pytest.mark.parametrize("dtype", [np.float32, np.int16, np.uint8])
def test_nifti_roundtrip(tmp_path, suffix, dtype):
    rng = np.random.default_rng(0)
    vol = (rng.normal(0, 100, (17, 13, 9))).astype(dtype)
    path = tmp_path / f"v{suffix}"
    nifti.write(path, vol)
    back, hdr = nifti.read(path)
    assert back.dtype == np.dtype(dtype)
    np.testing.assert_array_equal(back, vol)
    assert hdr.dim == vol.shape


def test_nifti_header_passthrough(tmp_path):
    vol = np.zeros((4, 5, 6), np.int16)
    hdr = nifti.NiftiHeader.identity(vol.shape, vol.dtype, pixdim=(0.7, 0.7, 2.5))
    nifti.write(tmp_path / "a.nii", vol, hdr)
    _, hdr2 = nifti.read(tmp_path / "a.nii")
    np.testing.assert_allclose(hdr2.pixdim[:3], (0.7, 0.7, 2.5), rtol=1e-6)


def test_nifti_scl_slope_applied(tmp_path):
    """scl_slope/inter rescaling on read (like nibabel get_fdata)."""
    vol = np.arange(24, dtype=np.int16).reshape(2, 3, 4)
    nifti.write(tmp_path / "a.nii", vol)
    # patch slope/inter into the header bytes (offset 112)
    import struct

    raw = bytearray((tmp_path / "a.nii").read_bytes())
    struct.pack_into("<2f", raw, 112, 2.0, 10.0)
    (tmp_path / "a.nii").write_bytes(bytes(raw))
    back, _ = nifti.read(tmp_path / "a.nii")
    np.testing.assert_allclose(back, vol * 2.0 + 10.0)


# ---------------------------------------------------------------------------
# preprocessing
# ---------------------------------------------------------------------------


def test_clip_hu():
    v = np.array([-1000.0, -200.0, 0.0, 250.0, 3000.0])
    out = preprocess.clip_hu(v)
    np.testing.assert_array_equal(out, [-200, -200, 0, 250, 250])
    assert out.dtype == np.float32


def test_extract_coords_box():
    seg = np.zeros((10, 10, 10), np.int16)
    seg[2:5, 3:6, 4:7] = 1
    seg[3, 4, 5] = 2
    c = preprocess.extract_coords(seg)
    np.testing.assert_array_equal(c["box_min"], [2, 3, 4])
    np.testing.assert_array_equal(c["box_max"], [4, 5, 6])
    assert len(c["tumor"]) == 1
    np.testing.assert_array_equal(c["tumor"][0], [3, 4, 5])
    # liver coords are label==1 voxels only (reference generate_livertxt
    # semantics, preprocessing.py:21-39): the tumor voxel is excluded
    assert len(c["liver"]) == 3 * 3 * 3 - 1


def test_preprocess_run_from_nii(tmp_path):
    """run() over raw .nii files reproduces preprocessing.py's outputs."""
    raw = tmp_path / "raw"
    raw.mkdir()
    rng = np.random.default_rng(1)
    vol = rng.normal(0, 300, (20, 20, 12)).astype(np.float32)
    seg = np.zeros((20, 20, 12), np.int16)
    seg[5:15, 5:15, 3:9] = 1
    seg[8:10, 8:10, 5:7] = 2
    nifti.write(raw / "volume-0.nii", vol)
    nifti.write(raw / "segmentation-0.nii", seg)
    out = tmp_path / "prep"
    preprocess.run(raw, out, num_volumes=1, log=lambda *_: None)
    ds = preprocess.PreparedDataset(out)
    assert len(ds) == 1
    v = ds.volume(0)
    assert v.min() >= -200 and v.max() <= 250
    np.testing.assert_array_equal(ds.segmentation(0), seg)
    c = ds.coords(0)
    np.testing.assert_array_equal(c["box_min"], [5, 5, 3])


# ---------------------------------------------------------------------------
# sampler
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def prep_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("prep")
    preprocess.synthesize(root, num_volumes=2, shape=(80, 80, 24), seed=3)
    return root


def test_sampler_2d_shapes_and_classes(prep_dir):
    ds = preprocess.PreparedDataset(prep_dir)
    s = sampler.CropSampler(ds, mode="2d", input_size=48, seed=0)
    batch = s.sample_batch(4)
    assert batch["image"].shape == (4, 48, 48, 3)
    assert batch["label"].shape == (4, 48, 48)
    assert batch["image"].dtype == np.float32
    assert batch["label"].dtype == np.int32
    assert set(np.unique(batch["label"])) <= {0, 1, 2}
    # mean subtraction: synthetic background ~ -100 HU, minus mean 48
    assert batch["image"].min() < -100


def test_sampler_hybrid_all_classes_present(prep_dir):
    """Hybrid batches are re-drawn until all 3 classes appear
    (reference train_hybrid.py:127-132)."""
    ds = preprocess.PreparedDataset(prep_dir)
    s = sampler.CropSampler(ds, mode="hybrid", input_size=48, input_cols=8, seed=0)
    batch = s.sample_batch(2)
    assert batch["image"].shape == (2, 48, 48, 8, 1)
    assert batch["label"].shape == (2, 48, 48, 8)
    assert set(np.unique(batch["label"])) == {0, 1, 2}


def test_sampler_reproducible(prep_dir):
    ds = preprocess.PreparedDataset(prep_dir)
    a = sampler.CropSampler(ds, mode="2d", input_size=32, seed=7).sample_batch(2)
    b = sampler.CropSampler(ds, mode="2d", input_size=32, seed=7).sample_batch(2)
    np.testing.assert_array_equal(a["image"], b["image"])
    np.testing.assert_array_equal(a["label"], b["label"])


def test_parallel_batches_deterministic(prep_dir):
    """batches(threads=N) is bit-identical for every N (counter-based RNG):
    thread scheduling can never change the training data stream."""
    ds = preprocess.PreparedDataset(prep_dir)

    def take(threads, n=3, mode="2d"):
        s = sampler.CropSampler(ds, mode=mode, input_size=32, input_cols=8, seed=11)
        gen = s.batches(2, threads=threads)
        out = [next(gen) for _ in range(n)]
        gen.close()
        return out

    for mode in ("2d", "hybrid"):
        a = take(1, mode=mode)
        for threads in (2, 5):
            b = take(threads, mode=mode)
            for x, y in zip(a, b):
                np.testing.assert_array_equal(x["image"], y["image"])
                np.testing.assert_array_equal(x["label"], y["label"])


def test_sample_at_matches_parallel_stream(prep_dir):
    """The parallel batch stream is exactly [sample_at(0), sample_at(1), ...]."""
    ds = preprocess.PreparedDataset(prep_dir)
    s = sampler.CropSampler(ds, mode="2d", input_size=32, seed=4)
    gen = s.batches(2, threads=3)
    batch0 = next(gen)
    gen.close()
    x0, _ = s.sample_at(0)
    x1, _ = s.sample_at(1)
    np.testing.assert_array_equal(batch0["image"][0], x0)
    np.testing.assert_array_equal(batch0["image"][1], x1)


def test_sampler_tumor_free_volume_uses_liver(prep_dir):
    """Volumes listed tumor-free always sample liver-guided crops
    (reference train_2ddense.py:39, :111-117)."""
    ds = preprocess.PreparedDataset(prep_dir)
    cfg = DataConfig(tumor_free_volumes=(0, 1))
    s = sampler.CropSampler(ds, cfg, mode="2d", input_size=32, seed=0)
    for _ in range(8):
        s.sample_one()  # must not raise even with tumor sampling disabled


def test_resize_backend_deviation_quantified():
    """Quantify the cv2 (Catmull-Rom) vs spline (skimage-family, reference
    train_2ddense.py:96-97) cubic-resize deviation: tiny relative to the HU
    dynamic range, and the two agree exactly on constant regions."""
    rng = np.random.default_rng(0)
    img = rng.normal(0.0, 60.0, (180, 200, 3)).astype(np.float32)
    smooth = ndimage.gaussian_filter(img, (6, 6, 0)).astype(np.float32)

    a = sampler.resize_2d_stack(smooth, (224, 224), nearest=False, backend="cv2")
    b = sampler.resize_2d_stack(smooth, (224, 224), nearest=False, backend="spline")
    assert a.shape == b.shape == (224, 224, 3)
    rng_hu = smooth.max() - smooth.min()
    full = np.abs(a - b)
    interior = full[8:-8, 8:-8]
    print(
        f"cv2 vs spline cubic resize: interior max {interior.max():.4f} "
        f"({interior.max() / rng_hu:.2%} of range), border max {full.max():.4f} "
        f"({full.max() / rng_hu:.2%}) — the reference's mode='constant' treats "
        f"outside-crop as 0 HU while cv2 replicates the edge row"
    )
    # away from the crop border the two cubic families track closely; the
    # deviation is a one-support-width frame at the crop edge
    assert interior.max() / rng_hu < 0.05, interior.max() / rng_hu

    # nearest-mask path: both backends must preserve the label alphabet
    seg = (smooth[..., :1] > 0).astype(np.int16) + (smooth[..., 1:2] > 30).astype(np.int16)
    ma = sampler.resize_2d_stack(seg, (224, 224), nearest=True, backend="cv2")
    mb = sampler.resize_2d_stack(seg, (224, 224), nearest=True, backend="spline")
    assert set(np.unique(ma)) <= set(np.unique(seg))
    assert set(np.unique(mb)) <= set(np.unique(seg))
    # nearest-neighbor grids differ by at most the label boundary pixels
    assert (ma != mb).mean() < 0.05


def test_box_mode_deviation_quantified():
    """box_labels='liver' is the reference-exact box (label==1 support,
    preprocessing.py:63-75); 'any' is the opt-in superset. Quantify the delta
    on a volume with tumor voxels outside the label-1 support."""
    seg = np.zeros((40, 40, 20), np.int16)
    seg[10:30, 12:28, 5:15] = 1
    seg[14:20, 14:20, 7:12] = 2  # tumor inside liver
    seg[31:34, 20:22, 9:11] = 2  # label-noise tumor outside liver support
    exact = preprocess.extract_coords(seg, box_labels="liver")
    superset = preprocess.extract_coords(seg, box_labels="any")
    np.testing.assert_array_equal(exact["box_min"], [10, 12, 5])
    np.testing.assert_array_equal(exact["box_max"], [29, 27, 14])
    np.testing.assert_array_equal(superset["box_min"], [10, 12, 5])
    np.testing.assert_array_equal(superset["box_max"], [33, 27, 14])
    delta = np.abs(superset["box_max"] - exact["box_max"]).max()
    print(f"box superset delta: {delta} voxels on this fixture")
    # liver coordinate list is label==1 only in BOTH modes (the reference's
    # LiverPixels semantics); tumor list is label==2
    assert (seg[tuple(exact["liver"].T)] == 1).all()
    assert (seg[tuple(exact["tumor"].T)] == 2).all()
    np.testing.assert_array_equal(exact["liver"], superset["liver"])


def test_flip_rot_cases_bijective():
    """All 8 augmentation cases are label-preserving permutations."""
    rng = np.random.default_rng(0)
    img = rng.normal(size=(6, 6, 3))
    mask = rng.integers(0, 3, (6, 6, 3))
    for case in range(8):
        i2, m2 = sampler.apply_flip_rot(img, mask, case)
        assert sorted(i2.ravel()) == sorted(img.ravel())
        assert np.bincount(m2.ravel(), minlength=3).tolist() == np.bincount(
            mask.ravel(), minlength=3
        ).tolist()


def test_resize_2d_stack_nearest_preserves_labels():
    rng = np.random.default_rng(0)
    m = rng.integers(0, 3, (30, 30, 3)).astype(np.int16)
    out = sampler.resize_2d_stack(m, (48, 48), nearest=True)
    assert out.shape == (48, 48, 3)
    assert set(np.unique(out)) <= set(np.unique(m))


# ---------------------------------------------------------------------------
# prefetch
# ---------------------------------------------------------------------------


def test_prefetch_iterator_order_and_exhaustion():
    it = PrefetchIterator(iter(range(10)), depth=3)
    assert list(it) == list(range(10))


def test_prefetch_iterator_propagates_errors():
    def gen():
        yield 1
        raise RuntimeError("boom")

    it = PrefetchIterator(gen(), depth=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="boom"):
        next(it)
        next(it)
