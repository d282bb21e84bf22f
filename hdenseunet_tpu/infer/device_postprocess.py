"""Device-resident postprocess: the reference's CC pipeline as XLA programs.

The reference postprocesses every predicted volume on the host with
skimage/scipy morphology (test.py:70-115: threshold, largest connected
component of the predicted liver, a second dilation + largest-CC + hole-fill
of the external liver mask, tumor gating, hole-fills). Round-5 attribution
(BENCH_NOTES "Round-5 serving-path attribution") measured that host pipeline
at 38-64 s per 512x512x192 volume on a 1-core host — dominating the pipelined
serving loop. This module runs the SAME pipeline on the TPU, inside the
serving flow, so the host only ever touches the final uint8 labelmap.

Exactness: every operation here is integer/boolean — there is no float
reassociation — and each primitive is a bit-exact equivalent of the scipy
call it replaces (tests/test_device_postprocess.py checks byte-identical
labelmaps against infer/postprocess.py across randomized and adversarial
cases):

* ``largest_component``: 26-connected components via min-index label
  propagation (each voxel iteratively adopts the smallest flat index in its
  neighborhood, with pointer-jumping acceleration), then component sizes via
  sort + run-length (no scatter — TPU scatters serialize); ties on size pick
  the component whose first voxel comes earliest in raster order, which is
  exactly scipy's ``argmax(bincount)`` tie rule because ``ndimage.label``
  numbers components in raster-scan order.
* ``fill_holes``: scipy's default-structure (6-connected) background
  propagation from the array border. Border-connectivity rides the same
  min-index propagation with an offset trick: border background seeds get
  their flat index, interior background seeds flat index + N; a background
  component is border-connected iff its converged min id is < N.
* ``dilate_cross``: ``ndimage.binary_dilation`` with the default
  connectivity-1 (cross) structure, one iteration.

Crop/padding equivalence: the serving pipeline applies these ops to the
z-cropped, xy-padded score buffer rather than the full volume. That is exact
because every nonzero voxel of every intermediate lives strictly inside the
crop (the window grid's -5/+10 z margins around the liver extent,
funcs.py:19-20, cover the one extra dilation), the xy padding is zero, and a
zero margin — or the true volume border — preserves both component structure
and border-connectivity of the background (phantom padding voxels adjoin
exactly the in-volume voxels their values came from, so any path through
padding maps to an in-volume path).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_SENT = jnp.iinfo(jnp.int32).max  # "not a label": outside the propagated set


def _neighbor_min_full(ids):
    """Min over the 3x3x3 neighborhood (26-conn + center), SAME padding."""
    return lax.reduce_window(
        ids, _SENT, lax.min, (3, 3, 3), (1, 1, 1), "SAME"
    )


def _neighbor_min_cross(ids):
    """Min over the 6-connected cross (+ center), SAME padding."""
    a = lax.reduce_window(ids, _SENT, lax.min, (3, 1, 1), (1, 1, 1), "SAME")
    b = lax.reduce_window(ids, _SENT, lax.min, (1, 3, 1), (1, 1, 1), "SAME")
    c = lax.reduce_window(ids, _SENT, lax.min, (1, 1, 3), (1, 1, 1), "SAME")
    return jnp.minimum(jnp.minimum(a, b), c)


def _one_iteration(mask, neighbor_min, table_copies: int):
    """One propagation round: neighborhood-min, then two pointer jumps.

    Ids are int32 flat voxel indices (``_SENT`` outside ``mask``), optionally
    offset by +N (``table_copies=2``) for the border-connectivity trick. Ids
    only decrease and are bounded below by the per-component minimum, so
    iterating to fixpoint provably terminates at the exact component minima;
    pointer jumping (``ids[ids]``) makes the iteration count logarithmic in
    component diameter instead of linear. The +N offset is folded by index
    arithmetic rather than a doubled lookup table — the table concat would
    re-materialize a volume-sized buffer every jump.
    """
    shape = mask.shape
    n = mask.size

    def jump(ids):
        flat = ids.reshape(-1)
        idx = jnp.where(mask, ids, 0).reshape(-1)
        if table_copies == 2:
            idx = jnp.where(idx >= n, idx - n, idx)
        j = jnp.take(flat, idx, mode="clip").reshape(shape)
        return jnp.where(mask, jnp.minimum(ids, j), _SENT)

    def one(ids):
        new = jnp.minimum(ids, neighbor_min(ids))
        new = jnp.where(mask, new, _SENT)
        return jump(jump(new))

    return one


def _propagate_min(seed_ids, mask, neighbor_min, table_copies: int):
    """In-dispatch fixpoint of :func:`_one_iteration` (single XLA while loop).

    One dispatch, unbounded iteration count — the fastest form on
    direct-attached hosts, but on a backend that kills long dispatches
    (this host's stdio relay kills past ~90-130 s) use the chunked driver
    :func:`propagate_min_chunked` instead (BENCH_NOTES "Round-5
    device-postprocess verdict": the single-dispatch compose crashed the
    tunneled worker twice at 512x512x192).
    """
    one = _one_iteration(mask, neighbor_min, table_copies)

    def body(state):
        ids, _ = state
        new = one(ids)
        return new, jnp.any(new != ids)

    ids, _ = lax.while_loop(lambda s: s[1], body, (seed_ids, jnp.bool_(True)))
    return ids


@functools.partial(jax.jit, static_argnames=("kind", "table_copies", "iters"))
def _propagate_chunk(ids, mask, *, kind: str, table_copies: int, iters: int):
    """``iters`` propagation rounds as ONE bounded dispatch.

    Returns (new ids, did-the-LAST-round-change-anything). Ids decrease
    monotonically, so a round with no change is a fixpoint — the flag is an
    exact convergence test for the chunked driver.
    """
    nm = _neighbor_min_full if kind == "full" else _neighbor_min_cross
    one = _one_iteration(mask, nm, table_copies)

    def body(_, state):
        ids, _ = state
        new = one(ids)
        return new, jnp.any(new != ids)

    return lax.fori_loop(0, iters, body, (ids, jnp.bool_(True)))


def propagate_min_chunked(
    seed_ids, mask, *, kind: str, table_copies: int,
    chunk_iters: int = 2, burst: int = 12,
):
    """Host-orchestrated fixpoint: bounded dispatches, async-chained bursts.

    Each dispatch runs ``chunk_iters`` rounds (bounded on-chip time — crash-
    proof on dispatch-killing backends); ``burst`` dispatches are enqueued
    back-to-back WITHOUT host syncs (JAX async dispatch chains them on
    device), then ONE scalar fetch checks the convergence flag. Typical
    volumes converge within one burst, so the relay cost is a single extra
    round-trip per propagation. Exactness is untouched: the loop runs until
    the converged flag, identical fixpoint to :func:`_propagate_min`.
    """
    ids, changed = seed_ids, None
    while True:
        for _ in range(burst):
            ids, changed = _propagate_chunk(
                ids, mask, kind=kind, table_copies=table_copies,
                iters=chunk_iters,
            )
        if not bool(np.asarray(changed)):
            return ids


def connected_min_labels(mask):
    """Per-voxel min flat index of its 26-connected component (_SENT outside).

    Equivalent component structure to ``ndimage.label(mask,
    generate_binary_structure(3, 3))`` — the labeling the reference's
    ``skimage.measure.label`` default produces (postprocess.py:23-38).
    """
    n = mask.size
    flat_idx = jnp.arange(n, dtype=jnp.int32).reshape(mask.shape)
    seed = jnp.where(mask, flat_idx, _SENT)
    return _propagate_min(seed, mask, _neighbor_min_full, table_copies=1)


@jax.jit
def _cc_seed(mask):
    """Seed ids for 26-conn CC propagation: own flat index inside the mask."""
    flat_idx = jnp.arange(mask.size, dtype=jnp.int32).reshape(mask.shape)
    return jnp.where(mask, flat_idx, _SENT)


@jax.jit
def _largest_finish(mask, ids):
    """Converged min-ids -> boolean mask of the largest component.

    Component sizes via sort + run-length (no scatter — TPU scatters
    serialize); ties on size pick the component whose first voxel comes
    earliest in raster order, exactly scipy's ``argmax(bincount)`` tie rule
    because ``ndimage.label`` numbers components in raster-scan order.
    """
    flat = jnp.sort(ids.reshape(-1))  # _SENT (non-mask) sorts to the end
    n = flat.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    start = jnp.concatenate(
        [jnp.ones((1,), bool), flat[1:] != flat[:-1]]
    )
    last_start = lax.cummax(jnp.where(start, idx, 0))
    run_len = idx - last_start + 1
    valid = flat != _SENT
    best = jnp.argmax(jnp.where(valid, run_len, -1))
    root = flat[best]
    return mask & (ids == root)


def largest_component(mask):
    """Boolean mask of the largest 26-connected component (scipy tie rule)."""
    return _largest_finish(mask, connected_min_labels(mask))


def largest_component_chunked(mask, *, chunk_iters: int = 2, burst: int = 12):
    """:func:`largest_component` with bounded dispatches (same fixpoint)."""
    ids = propagate_min_chunked(
        _cc_seed(mask), mask, kind="full", table_copies=1,
        chunk_iters=chunk_iters, burst=burst,
    )
    return _largest_finish(mask, ids)


def _border_mask(shape):
    x, y, z = shape
    ix = jnp.arange(x)[:, None, None]
    iy = jnp.arange(y)[None, :, None]
    iz = jnp.arange(z)[None, None, :]
    return (
        (ix == 0) | (ix == x - 1)
        | (iy == 0) | (iy == y - 1)
        | (iz == 0) | (iz == z - 1)
    )


@jax.jit
def _fill_seed(mask):
    """(background mask, seed ids) for border-connectivity propagation.

    Background voxels seeded with flat index (border) or flat index + N
    (interior); after min-propagation over the background, a voxel's
    component touches the border iff its converged id is < N.
    """
    n = mask.size
    bg = ~mask
    flat_idx = jnp.arange(n, dtype=jnp.int32).reshape(mask.shape)
    border = _border_mask(mask.shape)
    seed = jnp.where(
        bg & border, flat_idx, jnp.where(bg, flat_idx + n, _SENT)
    )
    return bg, seed


@jax.jit
def _fill_finish(mask, bg, ids):
    n = mask.size
    return mask | (bg & (ids >= n))


def fill_holes(mask):
    """``ndimage.binary_fill_holes`` with the default (6-conn) structure."""
    bg, seed = _fill_seed(mask)
    ids = _propagate_min(seed, bg, _neighbor_min_cross, table_copies=2)
    return _fill_finish(mask, bg, ids)


def fill_holes_chunked(mask, *, chunk_iters: int = 2, burst: int = 12):
    """:func:`fill_holes` with bounded dispatches (same fixpoint)."""
    bg, seed = _fill_seed(mask)
    ids = propagate_min_chunked(
        seed, bg, kind="cross", table_copies=2,
        chunk_iters=chunk_iters, burst=burst,
    )
    return _fill_finish(mask, bg, ids)


def dilate_cross(mask):
    """``ndimage.binary_dilation`` default structure (connectivity 1), 1 iter."""
    m = mask.astype(jnp.uint8)
    a = lax.reduce_window(m, jnp.uint8(0), lax.max, (3, 1, 1), (1, 1, 1), "SAME")
    b = lax.reduce_window(m, jnp.uint8(0), lax.max, (1, 3, 1), (1, 1, 1), "SAME")
    c = lax.reduce_window(m, jnp.uint8(0), lax.max, (1, 1, 3), (1, 1, 1), "SAME")
    return (a | b | c).astype(bool)


def compose_labels(liver, tumor, ext_mask):
    """Device twin of ``postprocess.compose_from_masks`` (test.py:70-115).

    All inputs bool (X, Y, Z); returns uint8 labelmap {0 bg, 1 liver,
    2 tumor}. Order and structures match the host/scipy implementation
    line for line.
    """
    liver = liver | tumor
    liver_cc = largest_component(liver)

    ext = dilate_cross(ext_mask)
    ext_cc = fill_holes(largest_component(ext))

    tumor_final = fill_holes(tumor & ext_cc)

    out = fill_holes(liver_cc).astype(jnp.uint8)
    return jnp.where(tumor_final, jnp.uint8(2), out)


def _unpack_bits_z(buf, z: int):
    """(X, Y, z//8) uint8 -> (X, Y, z) bool (host packbits' bitorder='big')."""
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)  # np.packbits MSB-first
    bits = (buf[..., None] >> shifts) & 1
    x, y, q, _ = bits.shape
    return bits.reshape(x, y, q * 8)[:, :, :z].astype(bool)


@functools.partial(jax.jit, static_argnames=("pack_z",))
def _compose_prep(packed_scores, ext_bits, *, pack_z: int):
    """Shared front half: packed scores + packed ext -> (liver, tumor, ext).

    ``packed_scores``: the scoring kernel's 'packed' output, uint8
    (Xp, Yp, Zp) with values {0, 1, 3} (bit0 liver-or-tumor, bit1 tumor —
    device_pipeline._pack_labels). ``ext_bits``: the external liver mask's
    z-crop, np.packbits'd along z on the host ((X0, Y0, pack_z//8) — ~0.6% of
    the volume's h2d).
    """
    m = packed_scores[:, :, :pack_z]
    xp, yp = m.shape[0], m.shape[1]
    x0, y0 = ext_bits.shape[0], ext_bits.shape[1]
    if (x0, y0) != (xp, yp):
        # the xy compute-padding region carries REAL thresholded model output
        # (the model ran on the zero-padded volume), which the host path
        # discards by cropping to (x0, y0) BEFORE compose; phantom labels
        # must not join components or shift the largest-CC pick — zero them
        m = jnp.pad(m[:x0, :y0], ((0, xp - x0), (0, yp - y0), (0, 0)))
    liver = (m & 1).astype(bool)
    tumor = m >= 3
    ext = _unpack_bits_z(ext_bits, pack_z)
    if (x0, y0) != (xp, yp):
        ext = jnp.pad(ext, ((0, xp - x0), (0, yp - y0), (0, 0)))
    return liver, tumor, ext


@functools.partial(jax.jit, static_argnames=("pack_z",))
def compose_packed(packed_scores, ext_bits, *, pack_z: int):
    """One dispatch: thresholded score mask + packed ext mask -> 2-bit wire.

    Returns the final labelmap {0,1,2} 2-bit packed to the same wire shape
    labelmask_collect already consumes.
    """
    liver, tumor, ext = _compose_prep(packed_scores, ext_bits, pack_z=pack_z)
    out = compose_labels(liver, tumor, ext)
    from .device_pipeline import _pack2bits

    return _pack2bits(out, pack_z=pack_z)


def _axis_extent(nz, axis_pair):
    v = jnp.any(nz, axis=axis_pair)
    n = v.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    lo = jnp.min(jnp.where(v, idx, n))
    hi = jnp.max(jnp.where(v, idx, -1))
    return lo, hi


@functools.partial(jax.jit, static_argnames=("pack_z",))
def compose_final(packed_scores, ext_bits, *, pack_z: int):
    """Like :func:`compose_packed` but keeps the labelmap ON DEVICE and
    returns (final uint8 (Xp, Yp, pack_z), bbox int32[6]) for the sparse
    bbox-cropped wire (device_pipeline._crop_pack): after the largest-CC
    postprocess the nonzero extent is one liver-sized blob, so fetching only
    its bounding box cuts the dominant d2h by the bbox/volume ratio —
    losslessly, since everything outside the bbox is zero by definition.
    bbox = (x_lo, x_hi, y_lo, y_hi, z_lo, z_hi) inclusive; empty maps emit
    lo > hi (the host side detects this and writes an all-zero volume).
    """
    liver, tumor, ext = _compose_prep(packed_scores, ext_bits, pack_z=pack_z)
    out = compose_labels(liver, tumor, ext)
    return _bbox_finish(out)


@jax.jit
def _bbox_finish(out):
    """(labelmap) -> (labelmap, inclusive nonzero bbox int32[6])."""
    nz = out != 0
    xlo, xhi = _axis_extent(nz, (1, 2))
    ylo, yhi = _axis_extent(nz, (0, 2))
    zlo, zhi = _axis_extent(nz, (0, 1))
    bbox = jnp.stack([xlo, xhi, ylo, yhi, zlo, zhi]).astype(jnp.int32)
    return out, bbox


def compose_final_chunked(
    packed_scores, ext_bits, *, pack_z: int,
    chunk_iters: int = 2, burst: int = 12,
):
    """:func:`compose_final` with every dispatch bounded (crash-proof form).

    Identical fixpoints — byte-identical output — but the CC propagation
    loops run as chunked dispatches of ``chunk_iters`` rounds each
    (:func:`propagate_min_chunked`), so no single dispatch can exceed the
    relay backend's dispatch-kill threshold regardless of content. Costs one
    scalar round-trip per propagation stage (5 per volume) when each
    converges within ``burst`` chunks. Adversarial speckle content (the
    random-weight bench case: tens of thousands of components) converges in
    more rounds than real liver labelmaps — that costs extra bursts, never a
    crash.
    """
    liver, tumor, ext = _compose_prep(packed_scores, ext_bits, pack_z=pack_z)
    kw = dict(chunk_iters=chunk_iters, burst=burst)
    liver = liver | tumor
    liver_cc = largest_component_chunked(liver, **kw)
    ext_cc = fill_holes_chunked(
        largest_component_chunked(dilate_cross(ext), **kw), **kw
    )
    tumor_final = fill_holes_chunked(tumor & ext_cc, **kw)
    out = fill_holes_chunked(liver_cc, **kw).astype(jnp.uint8)
    return _bbox_finish(jnp.where(tumor_final, jnp.uint8(2), out))


def compose_packed_chunked(
    packed_scores, ext_bits, *, pack_z: int,
    chunk_iters: int = 2, burst: int = 12,
):
    """:func:`compose_packed` with every dispatch bounded (crash-proof form)."""
    out, _ = compose_final_chunked(
        packed_scores, ext_bits, pack_z=pack_z,
        chunk_iters=chunk_iters, burst=burst,
    )
    from .device_pipeline import _pack2bits

    return _pack2bits(out, pack_z=pack_z)
