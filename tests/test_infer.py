"""Inference subsystem tests: window grid, averaging semantics, postprocess,
metrics, and the end-to-end volume path on the tiny hybrid."""
import numpy as np
import pytest

import jax

from hdenseunet_tpu.core.config import Config, InferConfig
from hdenseunet_tpu.infer import metrics, postprocess
from hdenseunet_tpu.infer.predictor import VolumePredictor
from hdenseunet_tpu.infer.sliding_window import WindowPredictor, window_starts
from hdenseunet_tpu.models import hybrid


# ---------------------------------------------------------------------------
# window grid (reference lib/funcs.py:19-28)
# ---------------------------------------------------------------------------


def _reference_starts(z, mini_z, maxi_z, cfg):
    """Direct transcription of the reference loop for oracle comparison."""
    cols, stride = cfg.input_cols, cfg.window_stride
    right = int(min(z, maxi_z + 10) - cols)
    left = max(0, min(mini_z - 5, right))
    out = []
    for c in range(left, right + stride, stride):
        out.append(z - cols if c > z - cols else c)
    return out


@pytest.mark.parametrize(
    "z,lo,hi", [(64, 10, 50), (40, 0, 39), (32, 20, 31), (100, 90, 99), (8, 0, 7)]
)
def test_window_starts_match_reference(z, lo, hi):
    cfg = InferConfig()
    assert window_starts(z, lo, hi, cfg) == _reference_starts(z, lo, hi, cfg)


def test_window_starts_cover_liver_interior():
    cfg = InferConfig()
    starts = window_starts(80, 20, 60, cfg)
    covered = set()
    for s in starts:
        covered.update(range(s + 1, s + cfg.input_cols - 1))
    assert set(range(21, 60)) <= covered


# ---------------------------------------------------------------------------
# sliding-window averaging semantics
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tiny_hybrid():
    params, bn_state = hybrid.init(
        jax.random.key(0), input_size=32, input_cols=8, batch=1, preset="tiny"
    )
    return params, bn_state


def _naive_reference_accumulate(predict_one, vol, starts, cols, num=3):
    """Reference accumulation loop (funcs.py:24-48), one window at a time."""
    x, y, z = vol.shape
    score = np.zeros((x, y, z, num), np.float32)
    score_num = np.zeros((x, y, z, num), np.int16)
    for s in starts:
        probs = predict_one(vol[:, :, s : s + cols])  # (x,y,cols-2,num)
        score[:, :, s + 1 : s + cols - 1, :] += probs
        score_num[:, :, s + 1 : s + cols - 1, :] += 1
    score = score / (score_num + 1e-4)
    return score[..., num - 2], score[..., num - 1]


def test_batched_matches_naive_accumulation(tiny_hybrid):
    """Batched multi-window scoring == the reference's one-window-at-a-time
    loop, including duplicate clamped windows at the z boundary."""
    params, bn_state = tiny_hybrid
    cfg = InferConfig(input_size=32, input_cols=8, window_batch=3)
    rng = np.random.default_rng(0)
    vol = rng.normal(0, 50, (32, 32, 20)).astype(np.float32)

    wp = WindowPredictor(params, bn_state, cfg, preset="tiny")
    liver_b, tumor_b = wp.predict_volume(vol, 2, 18)

    def predict_one(window):
        return wp._score_batch(window[None, ..., None].astype(np.float32))[0]

    starts = window_starts(20, 2, 18, cfg)
    liver_n, tumor_n = _naive_reference_accumulate(predict_one, vol, starts, 8)
    np.testing.assert_allclose(liver_b, liver_n, atol=1e-5)
    np.testing.assert_allclose(tumor_b, tumor_n, atol=1e-5)


def test_window_probs_are_softmax(tiny_hybrid):
    params, bn_state = tiny_hybrid
    cfg = InferConfig(input_size=32, input_cols=8, window_batch=1)
    wp = WindowPredictor(params, bn_state, cfg, preset="tiny")
    win = np.random.default_rng(1).normal(0, 50, (1, 32, 32, 8, 1)).astype(np.float32)
    probs = wp._score_batch(win)
    assert probs.shape == (1, 32, 32, 6, 3)  # edge z-slices dropped
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)


# ---------------------------------------------------------------------------
# postprocess (reference test.py:70-115)
# ---------------------------------------------------------------------------


def test_largest_component():
    m = np.zeros((10, 10, 4), bool)
    m[0:2, 0:2] = True  # 16 voxels
    m[5:9, 5:9] = True  # 64 voxels
    cc = postprocess.largest_component(m)
    assert cc.sum() == 64
    assert not cc[0, 0, 0] and cc[6, 6, 0]
    assert postprocess.largest_component(np.zeros((3, 3, 3), bool)).sum() == 0


def test_largest_component_full_connectivity():
    """skimage measure.label's default (reference test.py:84-104) is FULL
    connectivity: 26-connected in 3D. Two diagonally-touching blobs are ONE
    component there; orthogonal-only labeling would split them and pick the
    wrong 'largest' here (round-1 advisor medium)."""
    m = np.zeros((12, 12, 12), bool)
    # blob A (27 voxels) diagonally touching blob B (27 voxels) at one corner
    m[0:3, 0:3, 0:3] = True
    m[3:6, 3:6, 3:6] = True
    # separate blob C (32 voxels): bigger than either half, smaller than A+B
    m[8:12, 8:12, 8:10] = True
    cc = postprocess.largest_component(m)
    assert cc.sum() == 54  # A+B merged under 26-connectivity
    assert cc[0, 0, 0] and cc[5, 5, 5] and not cc[9, 9, 9]

    # 2D: 8-connectivity merges diagonal pixels
    m2 = np.zeros((6, 6), bool)
    m2[0, 0] = m2[1, 1] = m2[2, 2] = True
    m2[4:6, 0:2] = True  # 4-voxel orthogonal blob
    assert postprocess.largest_component(m2).sum() == 4
    m2[3, 3] = m2[4, 4] = True  # diagonal chain now 5 long
    assert postprocess.largest_component(m2).sum() == 5


def test_compose_labelmap_semantics():
    shape = (24, 24, 10)
    liver_prob = np.zeros(shape, np.float32)
    tumor_prob = np.zeros(shape, np.float32)
    ext = np.zeros(shape, np.int16)
    liver_prob[4:20, 4:20, 2:8] = 0.9  # big liver blob
    liver_prob[0:2, 0:2, 0:2] = 0.8  # small spurious blob -> dropped by CC
    tumor_prob[8:12, 8:12, 4:6] = 0.95  # tumor inside liver
    tumor_prob[22:24, 22:24, 8:10] = 0.95  # tumor outside ext mask -> dropped
    ext[3:21, 3:21, 1:9] = 1

    out = postprocess.compose_labelmap(liver_prob, tumor_prob, ext)
    assert out.dtype == np.uint8
    assert out[10, 10, 5] == 2  # tumor kept
    assert out[5, 5, 3] == 1  # liver kept
    assert out[0, 0, 0] == 0  # spurious CC removed
    assert out[23, 23, 9] == 0  # tumor outside external mask removed


def test_tumor_forces_liver_label():
    """test.py:77: liver |= tumor before CC."""
    shape = (16, 16, 6)
    liver_prob = np.zeros(shape, np.float32)
    tumor_prob = np.zeros(shape, np.float32)
    tumor_prob[4:12, 4:12, 1:5] = 1.0  # tumor with NO liver prediction
    ext = np.ones(shape, np.int16)
    out = postprocess.compose_labelmap(liver_prob, tumor_prob, ext)
    assert (out[4:12, 4:12, 2:4] == 2).all()


def test_liver_mask_extent():
    m = np.zeros((8, 8, 12), np.int16)
    m[2:5, 2:5, 3:7] = 2  # label-2 counts as liver (test.py:59)
    _, lo, hi = postprocess.liver_mask_extent(m)
    assert lo <= 3 and hi >= 6  # dilation can only widen


# ---------------------------------------------------------------------------
# metrics
# ---------------------------------------------------------------------------


def test_dice_basic():
    a = np.zeros((4, 4), bool)
    b = np.zeros((4, 4), bool)
    a[:2] = True
    b[1:3] = True
    assert metrics.dice(a, b) == pytest.approx(0.5)
    assert metrics.dice(np.zeros(3), np.zeros(3)) == 1.0


def test_dice_per_class_lits_convention():
    pred = np.zeros((6, 6), np.int16)
    truth = np.zeros((6, 6), np.int16)
    pred[1:5, 1:5] = 1
    pred[2:4, 2:4] = 2
    truth[1:5, 1:5] = 1
    truth[2:4, 2:4] = 2
    d = metrics.dice_per_class(pred, truth)
    assert d["liver"] == 1.0 and d["tumor"] == 1.0  # liver includes tumor area


def test_voe_rvd_and_metric_bundle():
    a = np.zeros((4, 4), bool)
    b = np.zeros((4, 4), bool)
    a[:2] = True  # 8 voxels
    b[1:3] = True  # 8 voxels, overlap 4, union 12
    assert metrics.voe(a, b) == pytest.approx(1 - 4 / 12)
    assert metrics.rvd(a, b) == pytest.approx(0.0)  # equal volumes
    assert metrics.rvd(a, np.zeros((4, 4), bool)) == np.inf
    assert metrics.voe(np.zeros(3), np.zeros(3)) == 0.0

    pred = np.zeros((6, 6), np.int16)
    truth = np.zeros((6, 6), np.int16)
    pred[1:5, 1:5] = 1
    truth[1:4, 1:5] = 1  # pred liver = 16 voxels, truth = 12, overlap 12
    m = metrics.metrics_per_class(pred, truth)
    assert m["liver"]["dice"] == pytest.approx(2 * 12 / (16 + 12))
    assert m["liver"]["voe"] == pytest.approx(1 - 12 / 16)
    assert m["liver"]["rvd"] == pytest.approx((16 - 12) / 12)
    assert m["tumor"]["dice"] == 1.0  # both empty


# ---------------------------------------------------------------------------
# end-to-end volume path
# ---------------------------------------------------------------------------


def test_volume_predictor_end_to_end(tiny_hybrid):
    params, bn_state = tiny_hybrid
    cfg = Config()
    cfg.model.preset = "tiny"
    cfg.infer.input_size = 32
    cfg.infer.window_batch = 2
    rng = np.random.default_rng(2)
    vol = rng.normal(0, 60, (32, 32, 24)).astype(np.float32)
    ext = np.zeros((32, 32, 24), np.int16)
    ext[8:24, 8:24, 6:18] = 1
    vp = VolumePredictor(params, bn_state, cfg, arch="end2end")
    out = vp.segment(vol, ext)
    assert out.shape == vol.shape
    assert out.dtype == np.uint8
    assert set(np.unique(out)) <= {0, 1, 2}


def test_window_predictor_sharded_over_mesh(tiny_hybrid):
    """Window batches sharded over an 8-device mesh give the same scores as
    single-device execution (multi-chip window parallelism)."""
    from hdenseunet_tpu.parallel import make_mesh

    params, bn_state = tiny_hybrid
    cfg = InferConfig(input_size=32, input_cols=8, window_batch=8)
    rng = np.random.default_rng(3)
    vol = np.random.default_rng(3).normal(0, 50, (32, 32, 28)).astype(np.float32)

    single = WindowPredictor(params, bn_state, cfg, preset="tiny")
    sharded = WindowPredictor(params, bn_state, cfg, preset="tiny", mesh=make_mesh())
    l1, t1 = single.predict_volume(vol, 2, 26)
    l2, t2 = sharded.predict_volume(vol, 2, 26)
    np.testing.assert_allclose(l1, l2, atol=1e-5)
    np.testing.assert_allclose(t1, t2, atol=1e-5)


# ---------------------------------------------------------------------------
# device-resident pipeline (infer/device_pipeline.py)
# ---------------------------------------------------------------------------


def test_device_pipeline_matches_host_path(tiny_hybrid):
    """One-jit device-resident scoring == the host-loop path exactly."""
    from hdenseunet_tpu.infer.device_pipeline import DeviceVolumeScorer

    params, bn_state = tiny_hybrid
    cfg = InferConfig(input_size=32, input_cols=8, window_batch=3)
    vol = np.random.default_rng(5).normal(0, 50, (32, 32, 21)).astype(np.float32)

    host = WindowPredictor(params, bn_state, cfg, preset="tiny")
    dev = DeviceVolumeScorer(params, bn_state, cfg, preset="tiny", z_bucket=16)
    l1, t1 = host.predict_volume(vol, 3, 19)
    l2, t2 = dev.predict_volume(vol, 3, 19)
    np.testing.assert_allclose(l1, l2, atol=1e-6)
    np.testing.assert_allclose(t1, t2, atol=1e-6)


def test_device_pipeline_packed_mask_semantics(tiny_hybrid):
    from hdenseunet_tpu.infer.device_pipeline import DeviceVolumeScorer

    params, bn_state = tiny_hybrid
    cfg = InferConfig(
        input_size=32, input_cols=8, window_batch=2,
        thres_liver=0.2, thres_tumor=0.3,  # low thresholds so bits fire
    )
    dev = DeviceVolumeScorer(params, bn_state, cfg, preset="tiny", z_bucket=16)
    vol = np.random.default_rng(6).normal(0, 50, (32, 32, 16)).astype(np.float32)
    packed = dev.labelmask(vol, 1, 14)
    liver_p, tumor_p = dev.predict_volume(vol, 1, 14)
    np.testing.assert_array_equal(packed >= 1, (liver_p >= 0.2) | (tumor_p >= 0.3))
    np.testing.assert_array_equal(packed >= 3, tumor_p >= 0.3)


def test_volume_predictor_device_mode_matches_host_mode(tiny_hybrid):
    params, bn_state = tiny_hybrid
    base = Config()
    base.model.preset = "tiny"
    base.infer.window_batch = 2
    vol = np.random.default_rng(7).normal(0, 60, (32, 32, 24)).astype(np.float32)
    ext = np.zeros((32, 32, 24), np.int16)
    ext[8:24, 8:24, 6:18] = 1

    import dataclasses

    cfg_host = Config(
        model=base.model, train=base.train, data=base.data,
        infer=dataclasses.replace(base.infer, device_resident=False),
    )
    cfg_dev = Config(
        model=base.model, train=base.train, data=base.data,
        infer=dataclasses.replace(base.infer, device_resident=True),
    )
    out_host = VolumePredictor(params, bn_state, cfg_host).segment(vol, ext)
    out_dev = VolumePredictor(params, bn_state, cfg_dev).segment(vol, ext)
    np.testing.assert_array_equal(out_host, out_dev)


def test_tiled_scorer_covers_all_voxels_and_is_probability(tiny_hybrid):
    """TPU equivalent of the reference's x/y/z-tiled variant
    (lib/funcs.py:54-129): every voxel covered, averaged probs sum to 1."""
    from hdenseunet_tpu.infer.device_pipeline import TiledVolumeScorer

    params, bn_state = tiny_hybrid
    cfg = InferConfig(input_size=32, input_cols=8, window_batch=2)
    ts = TiledVolumeScorer(params, bn_state, cfg, tile=32, preset="tiny")
    vol = np.random.default_rng(8).normal(0, 50, (48, 40, 14)).astype(np.float32)
    score = np.asarray(ts.score(vol))
    assert score.shape == vol.shape + (3,)
    np.testing.assert_allclose(score.sum(-1), 1.0, atol=1e-4)


def test_tile_origins_clamped_and_deduped():
    from hdenseunet_tpu.infer.device_pipeline import tile_origins

    assert tile_origins(96, 64, 42) == [0, 32]
    assert tile_origins(64, 64, 42) == [0]
    out = tile_origins(200, 64, 42)
    assert out[-1] == 136 and out == sorted(set(out))


def test_shared2d_single_window_exact(tiny_hybrid):
    """When the volume is exactly one window, window edges == volume edges so
    the shared-2D fast path reproduces the exact path bit-for-bit (mod float)."""
    from hdenseunet_tpu.infer.device_pipeline import DeviceVolumeScorer

    params, bn_state = tiny_hybrid
    cfg = InferConfig(input_size=32, input_cols=8, window_batch=2)
    vol = np.random.default_rng(9).normal(0, 50, (32, 32, 8)).astype(np.float32)
    ex = DeviceVolumeScorer(params, bn_state, cfg, preset="tiny", z_bucket=8, shared_2d=False)
    sh = DeviceVolumeScorer(params, bn_state, cfg, preset="tiny", z_bucket=8, shared_2d=True)
    l1, t1 = ex.predict_volume(vol, 0, 7)
    l2, t2 = sh.predict_volume(vol, 0, 7)
    np.testing.assert_allclose(l1, l2, atol=1e-5)
    np.testing.assert_allclose(t1, t2, atol=1e-5)


def test_shared2d_overlap_close_to_exact(tiny_hybrid):
    """With overlapping windows the fast path deviates only through the 3D
    receptive field at window edges — probabilities stay close."""
    from hdenseunet_tpu.infer.device_pipeline import DeviceVolumeScorer

    params, bn_state = tiny_hybrid
    cfg = InferConfig(input_size=32, input_cols=8, window_batch=2)
    vol = np.random.default_rng(10).normal(0, 50, (32, 32, 24)).astype(np.float32)
    ex = DeviceVolumeScorer(params, bn_state, cfg, preset="tiny", z_bucket=8, shared_2d=False)
    sh = DeviceVolumeScorer(params, bn_state, cfg, preset="tiny", z_bucket=8, shared_2d=True)
    l1, _ = ex.predict_volume(vol, 2, 22)
    l2, _ = sh.predict_volume(vol, 2, 22)
    assert np.abs(l1 - l2).max() < 0.05, np.abs(l1 - l2).max()


def test_device_scorer_sharded_over_mesh_matches_single(tiny_hybrid):
    """Device-resident scoring with window batches sharded over an 8-device
    'data' mesh reproduces single-device results (multi-chip serving path)."""
    from hdenseunet_tpu.core.mesh import make_mesh
    from hdenseunet_tpu.infer.device_pipeline import DeviceVolumeScorer

    params, bn_state = tiny_hybrid
    cfg = InferConfig(input_size=32, input_cols=8, window_batch=8)
    vol = np.random.default_rng(11).normal(0, 50, (32, 32, 28)).astype(np.float32)
    single = DeviceVolumeScorer(params, bn_state, cfg, preset="tiny", z_bucket=16)
    sharded = DeviceVolumeScorer(
        params, bn_state, cfg, preset="tiny", z_bucket=16, mesh=make_mesh()
    )
    l1, t1 = single.predict_volume(vol, 2, 26)
    l2, t2 = sharded.predict_volume(vol, 2, 26)
    np.testing.assert_allclose(l1, l2, atol=1e-5)
    np.testing.assert_allclose(t1, t2, atol=1e-5)


def test_dedup2d_exact_vs_no_dedup(tiny_hybrid):
    """In-batch 2D dedup over stride-aligned runs is EXACT (frozen 2D BNs
    make batch composition irrelevant) — bit-parity with the naive grid."""
    import dataclasses

    from hdenseunet_tpu.infer.device_pipeline import DeviceVolumeScorer

    params, bn_state = tiny_hybrid
    base = InferConfig(input_size=32, input_cols=8, window_batch=4)
    vol = np.random.default_rng(13).normal(0, 50, (32, 32, 30)).astype(np.float32)
    on = DeviceVolumeScorer(params, bn_state, base, preset="tiny", z_bucket=16)
    off_cfg = dataclasses.replace(base, dedup_2d=False)
    off = DeviceVolumeScorer(params, bn_state, off_cfg, preset="tiny", z_bucket=16)
    l1, t1 = on.predict_volume(vol, 3, 27)
    l2, t2 = off.predict_volume(vol, 3, 27)
    np.testing.assert_allclose(l1, l2, atol=1e-6)
    np.testing.assert_allclose(t1, t2, atol=1e-6)


def test_make_grid_structured_invariants():
    from hdenseunet_tpu.core.config import InferConfig
    from hdenseunet_tpu.infer.device_pipeline import make_grid_structured
    from hdenseunet_tpu.infer.sliding_window import window_starts

    cfg = InferConfig()
    for z, lo, hi, wb in [(192, 38, 153, 8), (40, 0, 39, 4), (33, 5, 30, 3), (100, 90, 99, 2)]:
        sl = window_starts(z, lo, hi, cfg)
        base = min(sl)
        shifted = [s - base for s in sl]
        st, w = make_grid_structured(shifted, wb, cfg.window_stride)
        # arithmetic runs
        for r in range(len(st)):
            for j in range(wb - 1):
                assert st[r, j + 1] - st[r, j] == cfg.window_stride
        # weights reproduce multiplicities exactly once
        got = {}
        for r in range(len(st)):
            for j in range(wb):
                got[int(st[r, j])] = got.get(int(st[r, j]), 0) + w[r, j]
        want = {s: shifted.count(s) for s in set(shifted)}
        assert all(got.get(s, 0) == want[s] for s in want)
        assert all(v == 0 or k in want for k, v in got.items())
        assert st.min() >= 0


def test_dedup_grid_run_count_bucketed():
    """Two volumes in the same (x, y, z-bucket) whose liver z-extents differ
    by more than wb*stride slices must still produce identical
    `starts.shape`: the dedup grid pads its run count to a bucket of 4
    weight-0 runs, so the DEFAULT serving path compiles once per shape
    bucket instead of once per liver extent."""
    from hdenseunet_tpu.infer.device_pipeline import DeviceVolumeScorer

    cfg = InferConfig(input_size=512, input_cols=8, window_batch=8)
    sc = DeviceVolumeScorer(None, None, cfg)  # plan() never touches params
    shape = (512, 512, 192)
    # liver extents 20 vs 40 slices (> wb*stride = 16 apart), both in zp=64
    pa = sc.plan(shape, 40, 60)
    pb = sc.plan(shape, 20, 60)
    assert pa["zp"] == pb["zp"] == 64
    assert pa["starts"].shape == pb["starts"].shape
    assert pa["starts"].shape[0] % 4 == 0
    # weight-0 padding runs change nothing: multiplicities intact
    for p, (lo, hi) in ((pa, (40, 60)), (pb, (20, 60))):
        from hdenseunet_tpu.infer.sliding_window import window_starts

        sl = window_starts(shape[2], lo, hi, cfg)
        got = {}
        for r in range(p["starts"].shape[0]):
            for j in range(p["starts"].shape[1]):
                s = int(p["starts"][r, j])
                got[s] = got.get(s, 0) + p["weights"][r, j]
        assert {k: v for k, v in got.items() if v} == {
            s - min(sl): float(sl.count(s)) for s in set(sl)
        }


def test_batch_unroll_identical_labelmask(tiny_hybrid):
    """batch_unroll > 1 (lax.scan-unrolled window-batch loop) must be
    byte-identical to the serial fori_loop path — it only reorders
    independent work for the scheduler."""
    from hdenseunet_tpu.infer.device_pipeline import DeviceVolumeScorer

    params, bn_state = tiny_hybrid
    rng = np.random.default_rng(7)
    vol = rng.normal(0, 50, (32, 32, 30)).astype(np.float32)

    def run(unroll):
        cfg = InferConfig(
            input_size=32, input_cols=8, window_batch=2, batch_unroll=unroll
        )
        s = DeviceVolumeScorer(params, bn_state, cfg, preset="tiny")
        return s.labelmask(vol, 3, 27)

    np.testing.assert_array_equal(run(1), run(2))
    np.testing.assert_array_equal(run(1), run(4))


def test_predict_directory_pipelined_matches_segment(tiny_hybrid, tmp_path):
    """The pipelined serving loop (volume i+1's h2d + dispatch enqueued before
    volume i's fetch, predictor.dispatch/collect) must write labelmaps
    identical to the synchronous segment() path for every volume."""
    from hdenseunet_tpu.core.config import Config
    from hdenseunet_tpu.data import nifti
    from hdenseunet_tpu.infer.predictor import VolumePredictor, predict_directory

    params, bn_state = tiny_hybrid
    cfg = Config()
    cfg.model.preset = "tiny"
    cfg.model.input_size = 32
    cfg.infer.input_size = 32
    cfg.infer.input_cols = 8
    cfg.infer.window_batch = 2
    assert cfg.infer.device_resident  # the pipelined path is the default

    rng = np.random.default_rng(13)
    vols, masks = [], []
    data_dir, mask_dir, out_dir = tmp_path / "d", tmp_path / "m", tmp_path / "o"
    data_dir.mkdir(), mask_dir.mkdir()
    for i in range(3):
        vol = rng.normal(0, 50, (32, 32, 24 + 2 * i)).astype(np.float32)
        mask = np.zeros(vol.shape, np.uint8)
        mask[8:24, 8:24, 4 : vol.shape[2] - 4] = 1
        nifti.write(data_dir / f"test-volume-{i}.nii", vol)
        nifti.write(mask_dir / f"test-volume-{i}-ori.nii", mask)
        vols.append(vol), masks.append(mask)

    predict_directory(
        params, bn_state, cfg,
        data_dir=data_dir, liver_mask_dir=mask_dir, save_dir=out_dir,
        num_volumes=3, log=lambda *a, **k: None,
    )
    ref = VolumePredictor(params, bn_state, cfg)
    for i in range(3):
        got, _ = nifti.read(out_dir / f"test-segmentation-{i}.nii")
        np.testing.assert_array_equal(
            np.asarray(got), ref.segment(vols[i], masks[i]), err_msg=f"vol {i}"
        )


def test_layout3d_dhwc_matches_canonical(tiny_hybrid):
    """layout3d='dhwc' (d-major 3D branch, models/dmajor.py) is a pure XLA
    layout change: scored probabilities must match the canonical layout to
    conv-reassociation tolerance and labelmasks must agree."""
    from hdenseunet_tpu.infer.device_pipeline import DeviceVolumeScorer

    params, bn_state = tiny_hybrid
    rng = np.random.default_rng(11)
    vol = rng.normal(0, 50, (32, 32, 30)).astype(np.float32)

    def run(layout):
        cfg = InferConfig(
            input_size=32, input_cols=8, window_batch=2, layout3d=layout
        )
        s = DeviceVolumeScorer(params, bn_state, cfg, preset="tiny")
        return s.predict_volume(vol, 3, 27)

    l_a, t_a = run("hwdc")
    l_b, t_b = run("dhwc")
    np.testing.assert_allclose(l_a, l_b, atol=1e-5)
    np.testing.assert_allclose(t_a, t_b, atol=1e-5)


def test_stem_s2d_scoring_matches_direct(tiny_hybrid):
    """infer.stem_s2d (space-to-depth 3D stem) scores must match the direct
    stem to float-reassociation tolerance through the full serving kernel."""
    from hdenseunet_tpu.infer.device_pipeline import DeviceVolumeScorer

    params, bn_state = tiny_hybrid
    rng = np.random.default_rng(12)
    vol = rng.normal(0, 50, (32, 32, 30)).astype(np.float32)

    def run(flag):
        cfg = InferConfig(
            input_size=32, input_cols=8, window_batch=2, stem_s2d=flag
        )
        s = DeviceVolumeScorer(params, bn_state, cfg, preset="tiny")
        return s.predict_volume(vol, 3, 27)

    l_a, t_a = run(False)
    l_b, t_b = run(True)
    np.testing.assert_allclose(l_a, l_b, atol=1e-5)
    np.testing.assert_allclose(t_a, t_b, atol=1e-5)


def test_compute_seconds_smoke(tiny_hybrid):
    """compute_seconds runs the k-rep program and returns a positive float
    (the relay-immune bench protocol; numerics must stay finite)."""
    from hdenseunet_tpu.infer.device_pipeline import DeviceVolumeScorer

    params, bn_state = tiny_hybrid
    cfg = InferConfig(input_size=32, input_cols=8, window_batch=2)
    s = DeviceVolumeScorer(params, bn_state, cfg, preset="tiny")
    rng = np.random.default_rng(3)
    vol = rng.normal(0, 50, (32, 32, 24)).astype(np.float32)
    dt = s.compute_seconds(vol, 2, 20, k_small=1, k_big=2, reps=1)
    assert dt > 0 and np.isfinite(dt)


def test_wire_zcrop_matches_full_pad(tiny_hybrid):
    """Shipping only the real z-crop (device-side pad to the bucket) must not
    change any probability: score with a z-extent far from the bucket edge
    equals the host-path reference."""
    from hdenseunet_tpu.infer.device_pipeline import DeviceVolumeScorer

    params, bn_state = tiny_hybrid
    cfg = InferConfig(input_size=32, input_cols=8, window_batch=2)
    rng = np.random.default_rng(9)
    # z=70 with a narrow liver range: z-crop ~26 slices, bucket pads to 64
    vol = rng.normal(0, 50, (32, 32, 70)).astype(np.float32)
    dev = DeviceVolumeScorer(params, bn_state, cfg, preset="tiny")
    host = WindowPredictor(params, bn_state, cfg, preset="tiny")
    l_d, t_d = dev.predict_volume(vol, 30, 50)
    l_h, t_h = host.predict_volume(vol, 30, 50)
    np.testing.assert_allclose(l_d, l_h, atol=1e-5)
    np.testing.assert_allclose(t_d, t_h, atol=1e-5)


def test_wire_bits2_labelmask_byte_identical(tiny_hybrid):
    """The 2-bit packed labelmask wire (InferConfig.wire_bits=2, default) must
    unpack to the exact uint8 labelmask of the plain wire — for the default
    kernel, the no-dedup kernel, and the shared-2D path — including the
    host-side z-crop restore (labelmask_async/labelmask_collect)."""
    from hdenseunet_tpu.infer.device_pipeline import DeviceVolumeScorer

    params, bn_state = tiny_hybrid
    rng = np.random.default_rng(23)
    vol = rng.normal(0, 50, (32, 32, 30)).astype(np.float32)

    def run(bits, **cfg_kw):
        cfg = InferConfig(
            input_size=32, input_cols=8, window_batch=2, wire_bits=bits, **cfg_kw
        )
        s = DeviceVolumeScorer(params, bn_state, cfg, preset="tiny")
        return s.labelmask(vol, 3, 27)

    for kw in ({}, {"dedup_2d": False}, {"shared_2d": True}):
        a, b = run(2, **kw), run(8, **kw)
        assert a.dtype == np.uint8 and a.shape == vol.shape
        np.testing.assert_array_equal(a, b, err_msg=str(kw))
    # and against the legacy score(output='packed') device-restore path
    from hdenseunet_tpu.infer.device_pipeline import DeviceVolumeScorer as DVS

    cfg = InferConfig(input_size=32, input_cols=8, window_batch=2)
    s = DVS(params, bn_state, cfg, preset="tiny")
    legacy = np.asarray(s.score(vol, 3, 27, output="packed"))
    np.testing.assert_array_equal(run(2), legacy)


def test_pack2bits_roundtrip():
    """_pack2bits ∘ _unpack2bits is the identity on {0,1,3} masks, with and
    without the z-crop."""
    from hdenseunet_tpu.infer.device_pipeline import _pack2bits, _unpack2bits

    rng = np.random.default_rng(5)
    mask = rng.choice(np.array([0, 1, 3], np.uint8), size=(6, 7, 16))
    got = _unpack2bits(np.asarray(_pack2bits(jax.numpy.asarray(mask))))
    np.testing.assert_array_equal(got, mask)
    got = _unpack2bits(np.asarray(_pack2bits(jax.numpy.asarray(mask), pack_z=8)))
    np.testing.assert_array_equal(got, mask[:, :, :8])
