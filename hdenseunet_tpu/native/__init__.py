"""Native (C++) host-runtime cores with on-demand compilation + ctypes binding.

The framework's compute path is JAX/XLA/Pallas; this is the *host runtime*
side — two hot loops the reference leaves to python libraries:

* sampler.cpp — the training sampler's crop/augment/resize loop as one C call;
* postprocess.cpp — the serving CC/morphology pipeline (test.py:70-115) as
  O(N) passes, byte-exact vs the scipy twins (see its header).

Each falls back silently to the numpy/cv2/scipy path when no C++ toolchain is
present (`available()` / `pp_available()` -> False).
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from pathlib import Path

import numpy as np

_SRC = Path(__file__).parent / "sampler.cpp"
_PP_SRC = Path(__file__).parent / "postprocess.cpp"
_LIB = None
_TRIED = False
_PP_LIB = None
_PP_TRIED = False


def _build(src: Path, stem: str) -> Path | None:
    """Compile one .cpp -> cached .so keyed by source hash."""
    if not src.exists():
        return None
    tag = hashlib.sha256(src.read_bytes()).hexdigest()[:16]
    cache = Path(
        os.environ.get("HDENSEUNET_NATIVE_CACHE", Path(tempfile.gettempdir()) / "hdenseunet_native")
    )
    try:
        cache.mkdir(parents=True, exist_ok=True)
    except OSError:
        return None  # unusable cache location -> numpy/cv2 fallback
    so = cache / f"{stem}_{tag}.so"
    if so.exists():
        return so
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
        "-o", str(so), str(src),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except Exception:
        return None
    return so if so.exists() else None


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = _build(_SRC, "sampler")
    if so is None:
        return None
    lib = ctypes.CDLL(str(so))
    L = ctypes.c_long
    F = ctypes.c_float
    I = ctypes.c_int
    PF = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    PS = np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS")
    lib.crop_aug_resize.argtypes = [PF, PS, L, L, L, L, L, L, L, L, L, F, I, L, PF, PS]
    lib.crop_aug_resize.restype = None
    lib.crop_aug.argtypes = [PF, PS, L, L, L, L, L, L, L, L, L, F, I, PF, PS]
    lib.crop_aug.restype = None
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def crop_aug_resize(vol, seg, origin, size, *, mean, flip_case, out_size):
    """Fused crop+augment+resize. vol (X,Y,Z) f32 C-order; seg int16.

    Returns (image (out,out,cols) float32 mean-subtracted, labels int16).
    """
    lib = _load()
    assert lib is not None, "native sampler unavailable"
    vol = np.ascontiguousarray(vol, np.float32)
    seg = np.ascontiguousarray(seg, np.int16)
    a, b, c = (int(v) for v in origin)
    deps, rows, cols = (int(v) for v in size)
    out_img = np.empty((out_size, out_size, cols), np.float32)
    out_seg = np.empty((out_size, out_size, cols), np.int16)
    lib.crop_aug_resize(
        vol, seg, *vol.shape, a, b, c, deps, rows, cols,
        float(mean), int(flip_case), int(out_size), out_img, out_seg,
    )
    return out_img, out_seg


def _pp_load():
    global _PP_LIB, _PP_TRIED
    if _PP_TRIED:
        return _PP_LIB
    _PP_TRIED = True
    so = _build(_PP_SRC, "postprocess")
    if so is None:
        return None
    lib = ctypes.CDLL(str(so))
    L = ctypes.c_long
    PU8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    for fn in ("pp_largest_component", "pp_fill_holes", "pp_dilate"):
        getattr(lib, fn).argtypes = [PU8, L, L, L, PU8]
        getattr(lib, fn).restype = None
    _PP_LIB = lib
    return _PP_LIB


def pp_available() -> bool:
    return _pp_load() is not None


def _pp_call(fn_name: str, mask) -> "np.ndarray":
    lib = _pp_load()
    assert lib is not None, "native postprocess unavailable"
    m = np.ascontiguousarray(mask != 0, dtype=np.uint8)
    assert m.ndim == 3, m.shape
    out = np.empty_like(m)
    getattr(lib, fn_name)(m, *m.shape, out)
    return out


def pp_largest_component(mask):
    """Largest 26-connected component (bool). Exact scipy label+argmax twin."""
    return _pp_call("pp_largest_component", mask).astype(bool)


def pp_fill_holes(mask):
    """binary_fill_holes twin: 6-conn border flood on the complement."""
    return _pp_call("pp_fill_holes", mask).astype(bool)


def pp_dilate(mask):
    """binary_dilation(iterations=1) twin: one 6-conn cross dilation."""
    return _pp_call("pp_dilate", mask).astype(bool)


def crop_aug(vol, seg, origin, size, *, mean, flip_case):
    """Crop + flip/rot only (exact numpy-semantics oracle pair)."""
    lib = _load()
    assert lib is not None, "native sampler unavailable"
    vol = np.ascontiguousarray(vol, np.float32)
    seg = np.ascontiguousarray(seg, np.int16)
    a, b, c = (int(v) for v in origin)
    deps, rows, cols = (int(v) for v in size)
    h2, w2 = (rows, deps) if 3 <= flip_case <= 6 else (deps, rows)
    out_img = np.empty((h2, w2, cols), np.float32)
    out_seg = np.empty((h2, w2, cols), np.int16)
    lib.crop_aug(
        vol, seg, *vol.shape, a, b, c, deps, rows, cols,
        float(mean), int(flip_case), out_img, out_seg,
    )
    return out_img, out_seg
