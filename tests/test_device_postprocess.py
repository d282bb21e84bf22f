"""Byte-parity of the device postprocess vs the host scipy pipeline.

infer/device_postprocess.py reimplements the reference's connected-component
postprocess (test.py:70-115) as XLA programs. Every op is integer/boolean, so
the requirement is BIT-identical results against infer/postprocess.py (the
transcribed scipy pipeline) — these tests check each primitive against its
scipy original and the full compose against compose_from_masks, across random
densities and the adversarial cases that distinguish connectivities, tie
rules, and crop/padding handling.
"""
import jax
import numpy as np
import pytest
from scipy import ndimage

from hdenseunet_tpu.infer import device_postprocess as dpp
from hdenseunet_tpu.infer import postprocess


def _rand_mask(seed, shape, p):
    return np.random.default_rng(seed).random(shape) < p


SHAPES = [(16, 16, 12), (24, 20, 16)]
DENSITIES = [0.08, 0.35, 0.55, 0.85]


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("p", DENSITIES)
def test_largest_component_matches_scipy(shape, p):
    m = _rand_mask(hash((shape, p)) % 2**31, shape, p)
    got = np.asarray(dpp.largest_component(m))
    want = postprocess.largest_component(m)
    np.testing.assert_array_equal(got, want)


def test_largest_component_merges_diagonal_touch():
    # two blocks touching only at a corner: 26-conn merges them into ONE
    # component (the reference's skimage default); orthogonal-only would not
    m = np.zeros((8, 8, 8), bool)
    m[0:2, 0:2, 0:2] = True
    m[2:4, 2:4, 2:4] = True
    m[6:7, 0:1, 0:1] = True  # a 1-voxel rival far away
    got = np.asarray(dpp.largest_component(m))
    want = postprocess.largest_component(m)
    np.testing.assert_array_equal(got, want)
    assert got[0, 0, 0] and got[3, 3, 3]  # merged across the corner


def test_largest_component_tie_picks_raster_first():
    # two equal-size components: scipy's argmax(bincount) keeps the one whose
    # first voxel comes earliest in raster order — ours must match
    m = np.zeros((10, 10, 6), bool)
    m[0, 0, 0:2] = True  # size 2, raster-first
    m[7, 7, 2:4] = True  # size 2
    got = np.asarray(dpp.largest_component(m))
    want = postprocess.largest_component(m)
    np.testing.assert_array_equal(got, want)
    assert got[0, 0, 0] and not got[7, 7, 2]


def test_largest_component_empty_mask():
    m = np.zeros((6, 6, 6), bool)
    got = np.asarray(dpp.largest_component(m))
    assert not got.any()


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("p", DENSITIES)
def test_fill_holes_matches_scipy(shape, p):
    m = _rand_mask(hash(("fill", shape, p)) % 2**31, shape, p)
    got = np.asarray(dpp.fill_holes(m))
    want = ndimage.binary_fill_holes(m)
    np.testing.assert_array_equal(got, want)


def test_fill_holes_connectivity_is_cross():
    # hollow cube with a DIAGONAL-only breach: scipy's default structure is
    # connectivity-1, so the cavity cannot escape diagonally -> filled
    m = np.zeros((9, 9, 9), bool)
    m[2:7, 2:7, 2:7] = True
    m[3:6, 3:6, 3:6] = False  # cavity
    m[2, 2, 2] = False  # corner breach: cavity<->outside only via diagonal
    got = np.asarray(dpp.fill_holes(m))
    want = ndimage.binary_fill_holes(m)
    np.testing.assert_array_equal(got, want)
    assert got[4, 4, 4]  # cavity is filled despite the diagonal breach

    # now a face-adjacent channel: cavity escapes -> NOT filled
    m2 = m.copy()
    m2[2, 4, 4] = False  # face hole connecting cavity to outside
    got2 = np.asarray(dpp.fill_holes(m2))
    want2 = ndimage.binary_fill_holes(m2)
    np.testing.assert_array_equal(got2, want2)
    assert not got2[3, 4, 4]


def test_fill_holes_full_and_empty():
    full = np.ones((5, 5, 5), bool)
    empty = np.zeros((5, 5, 5), bool)
    np.testing.assert_array_equal(np.asarray(dpp.fill_holes(full)), full)
    np.testing.assert_array_equal(np.asarray(dpp.fill_holes(empty)), empty)


@pytest.mark.parametrize("p", DENSITIES)
def test_dilate_cross_matches_scipy(p):
    m = _rand_mask(hash(("dil", p)) % 2**31, (14, 13, 11), p)
    got = np.asarray(dpp.dilate_cross(m))
    want = ndimage.binary_dilation(m, iterations=1)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("p", [0.08, 0.35, 0.85])
def test_chunked_primitives_match_single_dispatch(p):
    """The bounded-dispatch (chunked) propagation reaches the identical
    fixpoint — tiny chunk/burst sizes force several host convergence checks
    (the crash-proof serving form, BENCH_NOTES 'Round-5 device-postprocess
    verdict')."""
    m = _rand_mask(hash(("chunk", p)) % 2**31, (20, 18, 14), p)
    np.testing.assert_array_equal(
        np.asarray(dpp.largest_component_chunked(m, chunk_iters=1, burst=2)),
        np.asarray(dpp.largest_component(m)),
    )
    np.testing.assert_array_equal(
        np.asarray(dpp.fill_holes_chunked(m, chunk_iters=1, burst=2)),
        ndimage.binary_fill_holes(m),
    )


def test_compose_final_chunked_matches_single_dispatch():
    import jax.numpy as jnp

    shape = (16, 16, 16)
    rng = np.random.default_rng(19)
    liver = rng.random(shape) < 0.3
    tumor = rng.random(shape) < 0.1
    packed = ((liver | tumor).astype(np.uint8) + 2 * tumor.astype(np.uint8))
    ext = np.zeros(shape, bool)
    ext[2:14, 2:14, 2:13] = True
    ext_bits = np.packbits(ext.astype(np.uint8), axis=2)
    want_out, want_bb = dpp.compose_final(
        jnp.asarray(packed), jnp.asarray(ext_bits), pack_z=16
    )
    got_out, got_bb = dpp.compose_final_chunked(
        jnp.asarray(packed), jnp.asarray(ext_bits), pack_z=16,
        chunk_iters=1, burst=2,
    )
    np.testing.assert_array_equal(np.asarray(got_out), np.asarray(want_out))
    np.testing.assert_array_equal(np.asarray(got_bb), np.asarray(want_bb))


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_compose_matches_host_random(seed):
    rng = np.random.default_rng(seed)
    shape = (18, 16, 12)
    liver = rng.random(shape) < 0.3
    tumor = rng.random(shape) < 0.1
    ext = np.zeros(shape, bool)
    ext[3:14, 3:13, 2:10] = rng.random((11, 10, 8)) < 0.7
    got = np.asarray(dpp.compose_labels(liver, tumor, ext))
    want = postprocess.compose_from_masks(liver, tumor, ext)
    np.testing.assert_array_equal(got, want)


def test_compose_matches_host_structured():
    # a liver-like blob + enclosed tumor + a small rival component that the
    # largest-CC step must discard
    shape = (24, 24, 16)
    liver = np.zeros(shape, bool)
    liver[4:20, 4:20, 3:13] = True
    liver[16, 16, 10] = False  # internal hole -> filled in the final map
    liver[1, 1, 1] = True  # rival speck
    tumor = np.zeros(shape, bool)
    tumor[8:12, 8:12, 5:9] = True
    ext = np.zeros(shape, bool)
    ext[3:21, 3:21, 2:14] = True
    got = np.asarray(dpp.compose_labels(liver, tumor, ext))
    want = postprocess.compose_from_masks(liver, tumor, ext)
    np.testing.assert_array_equal(got, want)
    assert got[16, 16, 10] == 1  # hole filled
    assert got[9, 9, 6] == 2  # tumor overlaid
    assert got[1, 1, 1] == 0  # speck dropped by largest-CC


def test_compose_on_padded_crop_equals_full_volume():
    """The serving pipeline runs compose on an xy-padded z-crop; equivalence
    requires that phantom padding and crop borders change nothing (the
    device_postprocess.py module docstring's crop/padding argument)."""
    full_shape = (20, 20, 32)
    rng = np.random.default_rng(7)
    liver = np.zeros(full_shape, bool)
    tumor = np.zeros(full_shape, bool)
    ext = np.zeros(full_shape, bool)
    # nonzero content confined to z in [8, 24) — the crop with margin;
    # content deliberately touches the x/y borders (padding-leak case)
    liver[:, :, 8:24] = rng.random((20, 20, 16)) < 0.3
    tumor[:, :, 9:22] = rng.random((20, 20, 13)) < 0.08
    ext[0:20, 0:20, 9:23] = rng.random((20, 20, 14)) < 0.6
    want = postprocess.compose_from_masks(liver, tumor, ext)

    z_lo, zw = 7, 24  # crop [7, 31): covers content + >=1 margin up, clamped
    pad = 4  # xy padding to a larger compute shape, zeros
    crop = (slice(None), slice(None), slice(z_lo, z_lo + zw))
    pads = ((0, pad), (0, pad), (0, 0))
    got_crop = np.asarray(
        dpp.compose_labels(
            np.pad(liver[crop], pads),
            np.pad(tumor[crop], pads),
            np.pad(ext[crop], pads),
        )
    )[:20, :20]
    got = np.zeros(full_shape, np.uint8)
    got[:, :, z_lo : z_lo + zw] = got_crop
    np.testing.assert_array_equal(got, want)


def test_compose_packed_wire_roundtrip():
    """compose_packed: packed {0,1,3} scores + packbits ext -> 2-bit wire
    that unpacks to exactly the host compose result."""
    import jax.numpy as jnp

    from hdenseunet_tpu.infer.device_pipeline import _unpack2bits

    shape = (16, 16, 16)
    rng = np.random.default_rng(11)
    liver = rng.random(shape) < 0.3
    tumor = rng.random(shape) < 0.1
    packed_scores = (
        (liver | tumor).astype(np.uint8) + 2 * tumor.astype(np.uint8)
    )
    # z-bucket padding beyond pack_z must be ignored
    packed_padded = np.zeros((16, 16, 24), np.uint8)
    packed_padded[:, :, :16] = packed_scores
    ext = np.zeros(shape, bool)
    ext[2:14, 2:14, 2:13] = True
    ext_bits = np.packbits(ext.astype(np.uint8), axis=2)
    wire = np.asarray(
        dpp.compose_packed(jnp.asarray(packed_padded), jnp.asarray(ext_bits), pack_z=16)
    )
    got = _unpack2bits(wire)
    want = postprocess.compose_from_masks(liver, tumor, ext)
    np.testing.assert_array_equal(got, want)


def test_compose_packed_ignores_xy_compute_padding():
    """The scoring kernel's xy padding region carries real thresholded model
    output (the model ran on the zero-padded volume); the host path crops it
    away before compose, so compose_packed must zero it — otherwise phantom
    labels join 26-conn components and can flip the largest-CC pick."""
    import jax.numpy as jnp

    from hdenseunet_tpu.infer.device_pipeline import _unpack2bits

    x0, y0, z = 12, 10, 16
    xp, yp = 16, 16  # compute shape (rounded up)
    rng = np.random.default_rng(3)
    liver = rng.random((x0, y0, z)) < 0.25
    tumor = rng.random((x0, y0, z)) < 0.05
    packed = np.zeros((xp, yp, z), np.uint8)
    packed[:x0, :y0] = (liver | tumor).astype(np.uint8) + 2 * tumor.astype(np.uint8)
    # junk "model output" in the padding region, adjacent to real voxels —
    # a giant phantom component that would win largest-CC if not masked
    packed[x0:, :, :] = 1
    packed[:, y0:, :] = 1
    ext = np.zeros((x0, y0, z), bool)
    ext[2:10, 2:8, 2:14] = True
    ext_bits = np.packbits(ext.astype(np.uint8), axis=2)
    wire = np.asarray(
        dpp.compose_packed(jnp.asarray(packed), jnp.asarray(ext_bits), pack_z=z)
    )
    got = _unpack2bits(wire)[:x0, :y0]
    want = postprocess.compose_from_masks(liver, tumor, ext)
    np.testing.assert_array_equal(got, want)


def test_predictor_device_postprocess_matches_host(tmp_path):
    """End-to-end: VolumePredictor with device_postprocess on vs off produces
    byte-identical labelmaps on the tiny hybrid."""
    from hdenseunet_tpu.core.config import Config
    from hdenseunet_tpu.infer.predictor import VolumePredictor
    from hdenseunet_tpu.models import hybrid

    params, bn_state = hybrid.init(
        jax.random.key(0), input_size=32, input_cols=8, batch=1, preset="tiny"
    )
    cfg = Config()
    cfg.model.preset = "tiny"
    cfg.infer.input_size = 32
    cfg.infer.window_batch = 2
    rng = np.random.default_rng(2)
    vol = rng.normal(0, 60, (32, 32, 24)).astype(np.float32)
    ext = np.zeros((32, 32, 24), np.int16)
    ext[8:24, 8:24, 6:18] = 1

    cfg.infer.device_postprocess = False
    host_out = VolumePredictor(params, bn_state, cfg, arch="end2end").segment(vol, ext)
    cfg.infer.device_postprocess = True
    cfg.infer.sparse_wire = False
    cfg.infer.postprocess_chunk_iters = 0  # single-dispatch compose
    dev_out = VolumePredictor(params, bn_state, cfg, arch="end2end").segment(vol, ext)
    np.testing.assert_array_equal(dev_out, host_out)
    assert dev_out.dtype == np.uint8
    # sparse bbox wire: same labelmap, byte for byte
    cfg.infer.sparse_wire = True
    sparse_out = VolumePredictor(params, bn_state, cfg, arch="end2end").segment(vol, ext)
    np.testing.assert_array_equal(sparse_out, host_out)
    # chunked (bounded-dispatch) compose, dense + sparse wires
    cfg.infer.postprocess_chunk_iters = 2
    chunk_sparse = VolumePredictor(params, bn_state, cfg, arch="end2end").segment(vol, ext)
    np.testing.assert_array_equal(chunk_sparse, host_out)
    cfg.infer.sparse_wire = False
    chunk_dense = VolumePredictor(params, bn_state, cfg, arch="end2end").segment(vol, ext)
    np.testing.assert_array_equal(chunk_dense, host_out)


def test_sparse_wire_collect_geometry():
    """_collect_sparse handles empty maps, edge-hugging bboxes, and bucket
    overhang past the true xy extent (paste clipped to x0/y0)."""
    from hdenseunet_tpu.core.config import InferConfig
    from hdenseunet_tpu.infer.device_pipeline import DeviceVolumeScorer

    scorer = DeviceVolumeScorer.__new__(DeviceVolumeScorer)  # geometry only

    import jax.numpy as jnp

    def run(final_np, x0, y0, z, z_lo, z_full):
        nz = np.argwhere(final_np)
        if nz.size:
            lo, hi = nz.min(axis=0), nz.max(axis=0)
            bb = np.array([lo[0], hi[0], lo[1], hi[1], lo[2], hi[2]], np.int32)
        else:
            n = final_np.size
            bb = np.array([n, -1, n, -1, n, -1], np.int32)
        meta = dict(x0=x0, y0=y0, z=z, z_lo=z_lo, z_full=z_full)
        return scorer._collect_sparse((jnp.asarray(final_np), jnp.asarray(bb)), meta)

    # empty
    final = np.zeros((32, 32, 16), np.uint8)
    out = run(final, 30, 28, 16, 4, 40)
    assert out.shape == (30, 28, 40) and not out.any()

    # blob hugging the far corner, with xy compute padding (x0<xp)
    final = np.zeros((32, 32, 16), np.uint8)
    final[27:30, 25:28, 13:16] = 2
    out = run(final, 30, 28, 16, 4, 40)
    want = np.zeros((30, 28, 40), np.uint8)
    want[27:30, 25:28, 17:20] = 2
    np.testing.assert_array_equal(out, want)

    # blob at origin
    final = np.zeros((32, 32, 16), np.uint8)
    final[0:2, 0:3, 0:2] = 1
    out = run(final, 30, 28, 16, 0, 16)
    want = np.zeros((30, 28, 16), np.uint8)
    want[0:2, 0:3, 0:2] = 1
    np.testing.assert_array_equal(out, want)
