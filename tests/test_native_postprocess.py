"""Byte-exactness of the native C++ postprocess core vs its scipy twins.

native/postprocess.cpp replaces the serving path's host postprocess hot ops
(infer/postprocess.py; reference pipeline test.py:70-115): 26-conn largest
component (ndimage.label(structure=full) + argmax tie-break), 6-conn hole
fill (binary_fill_holes default structure), 6-conn dilation (binary_dilation
iterations=1). Every case here asserts array_equal — "fast" is only legal if
byte-identical.
"""
from __future__ import annotations

import numpy as np
import pytest
from scipy import ndimage

from hdenseunet_tpu import native
from hdenseunet_tpu.infer import postprocess

pytestmark = pytest.mark.skipif(
    not native.pp_available(), reason="no C++ toolchain"
)


def _scipy_largest(mask):
    structure = ndimage.generate_binary_structure(mask.ndim, mask.ndim)
    labels, num = ndimage.label(mask, structure=structure)
    if num == 0:
        return np.zeros_like(mask, dtype=bool)
    sizes = np.bincount(labels.ravel())
    sizes[0] = 0
    return labels == int(sizes.argmax())


def _cases():
    rng = np.random.default_rng(7)
    # speckle at several densities (the bench's random-weight regime: tens of
    # thousands of components, worst case for CC)
    for p in (0.05, 0.3, 0.5, 0.7):
        yield rng.random((37, 29, 23)) < p
    # blob with a nested hole + an off-blob satellite (real-checkpoint regime)
    m = np.zeros((40, 41, 30), bool)
    m[5:30, 6:32, 4:24] = True
    m[12:20, 14:22, 9:16] = False  # interior cavity -> hole to fill
    m[34:38, 35:39, 25:29] = True  # smaller second component
    yield m
    # border-touching foreground (fill_holes must not treat the open face as
    # a hole; CC spans the border)
    b = np.zeros((16, 17, 18), bool)
    b[0:9, :, :] = True
    b[3:6, 4:9, 5:9] = False
    yield b
    # diagonal-only chain: 26-conn merges it into ONE component, 6-conn would
    # not — catches a wrong connectivity choice in largest_component
    d = np.zeros((12, 12, 12), bool)
    for i in range(10):
        d[i, i, i] = True
    d[11, 0, 0] = True  # size-1 second component
    yield d
    # empty and full
    yield np.zeros((9, 8, 7), bool)
    yield np.ones((9, 8, 7), bool)
    # exact size tie between two components: scipy's argmax picks the lower
    # label id = the component seen first in raster order
    t = np.zeros((10, 10, 10), bool)
    t[1:3, 1:3, 1:3] = True  # 8 voxels, first in raster order
    t[6:8, 6:8, 6:8] = True  # 8 voxels
    yield t
    # thin z=1 and x=1 slabs (degenerate dims exercise the bounds checks)
    s = rng.random((21, 19, 1)) < 0.4
    yield s
    yield (rng.random((1, 19, 21)) < 0.4)


@pytest.mark.parametrize("case", list(range(12)))
def test_ops_match_scipy(case):
    masks = list(_cases())
    m = masks[case]
    np.testing.assert_array_equal(
        native.pp_largest_component(m), _scipy_largest(m)
    )
    np.testing.assert_array_equal(
        native.pp_fill_holes(m), ndimage.binary_fill_holes(m)
    )
    np.testing.assert_array_equal(
        native.pp_dilate(m), ndimage.binary_dilation(m, iterations=1)
    )


def test_compose_from_masks_native_matches_scipy(monkeypatch):
    """The full serving compose (CC x2, dilate, fill x3) is byte-equal with
    the native core on vs forced off."""
    rng = np.random.default_rng(3)
    shape = (48, 45, 36)
    liver = np.zeros(shape, bool)
    liver[8:40, 7:38, 5:30] = rng.random((32, 31, 25)) < 0.85
    tumor = np.zeros(shape, bool)
    tumor[15:25, 14:24, 10:20] = rng.random((10, 10, 10)) < 0.5
    ext = np.zeros(shape, np.uint8)
    ext[10:36, 9:35, 6:28] = 1

    monkeypatch.setenv("HDENSEUNET_HOST_POSTPROCESS", "scipy")
    ref = postprocess.compose_from_masks(liver, tumor, ext)
    monkeypatch.delenv("HDENSEUNET_HOST_POSTPROCESS")
    fast = postprocess.compose_from_masks(liver, tumor, ext)
    np.testing.assert_array_equal(fast, ref)
    assert set(np.unique(ref)) <= {0, 1, 2}


def test_liver_mask_extent_native_matches_scipy(monkeypatch):
    mask = np.zeros((30, 31, 32), np.uint8)
    mask[5:20, 6:21, 7:22] = 1
    mask[10:14, 11:15, 12:16] = 2
    monkeypatch.setenv("HDENSEUNET_HOST_POSTPROCESS", "scipy")
    m_ref, lo_ref, hi_ref = postprocess.liver_mask_extent(mask)
    monkeypatch.delenv("HDENSEUNET_HOST_POSTPROCESS")
    m, lo, hi = postprocess.liver_mask_extent(mask)
    np.testing.assert_array_equal(m, m_ref)
    assert (lo, hi) == (lo_ref, hi_ref)


def test_2d_masks_stay_on_scipy():
    """largest_component accepts 2D masks (8-conn); the native core is
    3D-only and must not be consulted."""
    rng = np.random.default_rng(11)
    m = rng.random((33, 29)) < 0.4
    np.testing.assert_array_equal(
        postprocess.largest_component(m), _scipy_largest(m)
    )
