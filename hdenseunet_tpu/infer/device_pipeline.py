"""Fully device-resident full-volume inference (one jit per volume shape).

The host-loop path (sliding_window.py) moves every window batch host→device
and every probability block device→host. On real deployments that is already
the long pole (PCIe/DCN); through a tunneled device it is catastrophic. This
module keeps the ENTIRE reference inference algorithm (lib/funcs.py:4-52) on
device:

  volume (one h2d) → [fori_loop: gather window batch → hybrid forward →
  softmax → edge-drop → weighted accumulate] → overlap-average →
  threshold → z-cropped 2-bit-packed labelmask (one small d2h; lossless —
  labels are {0,1,3}) — or scalar stats only.

Static shapes: volumes are z-padded to buckets (multiples of `z_bucket`) and
the window-batch grid is padded with weight-0 windows, so one compiled
program serves every volume in a bucket. The window math reproduces
window_starts()/multiplicity averaging exactly (tested against the host path).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..core.config import InferConfig
from ..core.module import Ctx
from ..models import hybrid
from .sliding_window import window_starts

Z_BUCKET = 64


def plan_windows(z_pad: int, cfg: InferConfig) -> int:
    """Max number of unique windows any volume in this z-bucket can need."""
    # starts range over [0, z - cols] with stride `window_stride`
    return (z_pad - cfg.input_cols) // cfg.window_stride + 1


def make_grid(starts_list: list[int], wb: int, n_batches: int):
    """(starts, weights) arrays of static shape (n_batches, wb).

    Unique reference windows get their multiplicity as weight; padding slots
    get weight 0 (their compute is masked out of the average).
    """
    uniq = sorted(set(starts_list))
    total = n_batches * wb
    assert len(uniq) <= total, (len(uniq), total)
    starts = np.zeros((total,), np.int32)
    weights = np.zeros((total,), np.float32)
    for i, s in enumerate(uniq):
        starts[i] = s
        weights[i] = starts_list.count(s)
    return starts.reshape(n_batches, wb), weights.reshape(n_batches, wb)


def _pad_vol(vol, pad_to):
    """Device-side zero-pad of the wire volume to the compute shape — the
    host link then carries only the real (x, y, z-crop) voxels instead of the
    full bucket-padded buffer (~30% less h2d for a median liver z-range)."""
    if pad_to is None or tuple(vol.shape) == tuple(pad_to):
        return vol
    return jnp.pad(vol, [(0, t - s) for s, t in zip(vol.shape, pad_to)])


def _batch_loop(n_batches, body, init, starts, weights, unroll):
    """Run body(carry, s_i, w_i) over window batches.

    unroll == 1: lax.fori_loop (lowest compile cost, strictly serial).
    unroll > 1: lax.scan(unroll=k) — the unrolled HLO exposes consecutive
    batches' independent work (batch i+1's 2D encoder vs batch i's
    3D/accumulate tail) to XLA's scheduler. Numerics identical: the carry
    (score/count accumulators) sequences the updates either way.
    """
    if unroll > 1 and n_batches > 1:
        def sbody(carry, sw):
            return body(carry, sw[0], sw[1]), None

        carry, _ = lax.scan(
            sbody, init, (starts, weights), unroll=min(unroll, n_batches)
        )
        return carry

    def fbody(i, carry):
        return body(carry, starts[i], weights[i])

    return lax.fori_loop(0, n_batches, fbody, init)


@functools.partial(
    jax.jit,
    static_argnames=(
        "arch", "preset", "compute_dtype", "num_classes", "cols", "output",
        "mesh", "pad_to", "unroll", "layout3d", "stem_s2d", "pack_z",
    ),
)
def _score_volume(
    params,
    bn_state,
    vol,
    starts,
    weights,
    thresholds,
    *,
    arch: str,
    preset: str,
    compute_dtype: str,
    num_classes: int,
    cols: int,
    output: str = "probs",
    mesh=None,
    pad_to=None,
    unroll: int = 1,
    layout3d: str = "hwdc",
    stem_s2d: bool = False,
    pack_z: int | None = None,
):
    """vol: (X, Y, Zwire) mean-subtracted (zero-padded on device to
    ``pad_to``); starts/weights: (n_batches, wb).

    ``output`` selects what the single compiled program returns — 'probs'
    (X, Y, Zpad, C) averaged probabilities, 'packed' thresholded uint8 mask,
    'packed2' the same mask 2-bit-packed and z-cropped to ``pack_z``
    (4x less d2h), or 'digest' 3 scalars — so thresholding/packing/digesting
    costs no extra jit dispatch (each dispatch round-trips the host link).
    """
    vol = _pad_vol(vol, pad_to)
    x, y, zp = vol.shape
    n_batches, wb = starts.shape
    dtype = jnp.dtype(compute_dtype)
    vol = vol.astype(dtype)
    inner = cols - 2  # window-edge z slices dropped (funcs.py:33)

    score0 = jnp.zeros((x, y, zp, num_classes), jnp.float32)
    count0 = jnp.zeros((zp,), jnp.float32)

    def body(carry, s_i, w_i):
        score, count = carry
        wins = jax.vmap(
            lambda s: lax.dynamic_slice(vol, (0, 0, s), (x, y, cols))
        )(s_i)[..., None]
        if mesh is not None:
            # shard the window batch over the 'data' axis: each chip scores
            # wb/n_chips windows; XLA all-gathers probs for the accumulation
            wins = lax.with_sharding_constraint(
                wins,
                jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data")),
            )
        ctx = Ctx(params, bn_state, train=False, compute_dtype=dtype)
        logits = hybrid.apply(
            ctx, wins, arch=arch, preset=preset, num_classes=num_classes,
            layout3d=layout3d, stem_s2d=stem_s2d,
        )
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[:, :, :, 1:-1, :]

        def acc(j, carry2):
            sc, cn = carry2
            sj = s_i[j] + 1
            pj = lax.dynamic_index_in_dim(probs, j, axis=0, keepdims=False)
            blk = lax.dynamic_slice(sc, (0, 0, sj, 0), (x, y, inner, num_classes))
            sc = lax.dynamic_update_slice(sc, blk + w_i[j] * pj, (0, 0, sj, 0))
            cblk = lax.dynamic_slice(cn, (sj,), (inner,))
            cn = lax.dynamic_update_slice(cn, cblk + w_i[j], (sj,))
            return sc, cn

        return lax.fori_loop(0, wb, acc, (score, count))

    score, count = _batch_loop(
        n_batches, body, (score0, count0), starts, weights, unroll
    )
    score = score / (count[None, None, :, None] + 1e-4)  # funcs.py:48
    if output in ("packed", "packed2"):
        mask = _pack_labels(
            score, thresholds[0], thresholds[1], num_classes=num_classes
        )
        return _pack2bits(mask, pack_z=pack_z) if output == "packed2" else mask
    if output == "digest":
        return _summarize(score)
    return score


@functools.partial(jax.jit, static_argnames=("num_classes",))
def _pack_labels(score, thres_liver, thres_tumor, *, num_classes: int = 3):
    """Threshold on device -> uint8 mask: bit0 liver, bit1 tumor (test.py:73-77)."""
    liver = score[..., num_classes - 2] >= thres_liver
    tumor = score[..., num_classes - 1] >= thres_tumor
    return (liver | tumor).astype(jnp.uint8) + 2 * tumor.astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("pack_z",))
def _pack2bits(mask, *, pack_z: int | None = None):
    """uint8 labelmask {0,1,3} -> 2-bit wire: 4 z-voxels per byte.

    The mask's value set is exactly 2 bits wide (bit0 liver-or-tumor, bit1
    tumor), so packing is lossless; it shrinks the labelmask d2h 4x — the
    dominant serving cost through thin host links. ``pack_z`` additionally
    crops the z axis to the wire bucket before packing (the score buffer's
    z-bucket padding is background by construction). Inverse: _unpack2bits.
    """
    if pack_z is not None:
        mask = mask[:, :, :pack_z]
    x, y, z = mask.shape
    assert z % 4 == 0, z
    m = mask.reshape(x, y, z // 4, 4).astype(jnp.uint8)
    return m[..., 0] + 4 * m[..., 1] + 16 * m[..., 2] + 64 * m[..., 3]


@functools.partial(jax.jit, static_argnames=("sx", "sy", "sz"))
def _crop_pack(final, x0, y0, z0, *, sx: int, sy: int, sz: int):
    """2-bit-pack a (sx, sy, sz) crop of the device-resident final labelmap.

    Starts are traced (no recompile per bbox position); sizes are static and
    bucketed by the caller so compiles stay rare. dynamic_slice clamps starts
    that would overrun — the caller passes pre-clamped starts so the host
    paste uses the same origin the device actually cropped."""
    crop = lax.dynamic_slice(final, (x0, y0, z0), (sx, sy, sz))
    return _pack2bits(crop)


def _unpack2bits(buf: np.ndarray) -> np.ndarray:
    """Host-side inverse of _pack2bits: (x, y, zq) uint8 -> (x, y, 4*zq)."""
    x, y, q = buf.shape
    out = np.empty((x, y, 4 * q), np.uint8)
    for i in range(4):
        out[:, :, i::4] = (buf >> (2 * i)) & 3
    return out


@jax.jit
def _summarize(score):
    """Tiny scalar digest for benchmarks (no volume-sized d2h)."""
    return jnp.stack(
        [jnp.sum(score[..., 1]), jnp.sum(score[..., 2]), jnp.max(score[..., 2])]
    )


class DeviceVolumeScorer:
    """Reusable compiled scorer; one program per (x, y, z-bucket)."""

    def __init__(
        self,
        params,
        bn_state,
        cfg: InferConfig,
        *,
        arch: str = "end2end",
        preset: str = "full",
        compute_dtype: str = "float32",
        num_classes: int = 3,
        z_bucket: int = Z_BUCKET,
        shared_2d: bool | None = None,
        mesh=None,
    ):
        """``mesh``: optional jax.sharding.Mesh with a 'data' axis — window
        batches shard across its chips (make window_batch a multiple of the
        axis size); params/state are replicated onto it."""
        if mesh is not None:
            from ..core.mesh import replicate

            params = replicate(mesh, params)
            bn_state = replicate(mesh, bn_state)
        self.mesh = mesh
        self.params = params
        self.bn_state = bn_state
        self.cfg = cfg
        self.arch = arch
        self.preset = preset
        self.compute_dtype = compute_dtype
        self.num_classes = num_classes
        self.z_bucket = z_bucket
        self.shared_2d = (
            getattr(cfg, "shared_2d", False) if shared_2d is None else shared_2d
        )
        self._krep_cache: dict = {}

    def _bucketed(self, z: int) -> int:
        need = max(z, self.cfg.input_cols)
        return -(-need // self.z_bucket) * self.z_bucket

    def plan(self, vol_shape, mini_z: int, maxi_z: int) -> dict:
        """Static execution plan for a volume shape + liver z-range.

        Shared by score() and estimate_flops() so the FLOP accounting can
        never drift from what actually executes.
        """
        x0, y0, z_full = vol_shape
        all_starts = window_starts(z_full, mini_z, maxi_z, self.cfg)
        z_lo = min(all_starts)
        z_hi = min(z_full, max(all_starts) + self.cfg.input_cols)
        z = z_hi - z_lo
        zp = self._bucketed(z)
        wb = max(1, self.cfg.window_batch)
        if self.shared_2d:
            # phase-B transients (window gathers of the stored 2D features +
            # 3D-branch activations) scale with wb; 4 fits HBM at 512^2 where
            # 8 does not, and the 2D work no longer depends on wb here
            wb = min(wb, 4)
        # the exact reference window grid, shifted into crop coordinates
        starts_list = [s - z_lo for s in all_starts]
        dedup = (
            getattr(self.cfg, "dedup_2d", True)
            and not self.shared_2d
            and self.cfg.window_stride > 0
        )
        if dedup:
            # cap = the z-bucket's theoretical run ceiling: every on-grid run
            # plus the possible off-grid (clamped final start) run
            cap = -(-plan_windows(zp, self.cfg) // wb) + 1
            starts, weights = make_grid_structured(
                starts_list, wb, self.cfg.window_stride, max_runs=cap
            )
        else:
            # batch count sized to the ACTUAL liver z-range, rounded up to a
            # bucket of 4 batches so recompiles stay rare but padding windows
            # (dead compute — weight 0) stay < wb*4 instead of filling the
            # whole z-bucket's theoretical window grid
            need = len(set(starts_list))
            n_batches = -(-max(1, -(-need // wb)) // 4) * 4
            n_batches = min(n_batches, -(-plan_windows(zp, self.cfg) // wb))
            starts, weights = make_grid(starts_list, wb, n_batches)
        return dict(
            z_lo=z_lo, z=z, zp=zp,
            xp=x0 + (-x0) % 32, yp=y0 + (-y0) % 32,
            wb=wb, dedup=dedup, starts=starts, weights=weights,
        )

    def estimate_flops(self, vol_shape, mini_z: int, maxi_z: int) -> float:
        """Analytic conv FLOPs the compiled program executes for this volume
        (includes weight-0 padding windows — they run on the hardware)."""
        from ..utils.flops import hybrid_window_batch_flops

        p = self.plan(vol_shape, mini_z, maxi_z)
        n_batches, wb = p["starts"].shape
        cols = self.cfg.input_cols
        if self.shared_2d:
            # phase A: one 2D pass per padded z slice; phase B: 3D+HFF per window
            per_batch = hybrid_window_batch_flops(
                x=p["xp"], y=p["yp"], cols=cols, wb=wb, n_stacks_2d=0,
                preset=self.preset, num_classes=self.num_classes, arch=self.arch,
            )
            f2d_all = hybrid_window_batch_flops(
                x=p["xp"], y=p["yp"], cols=cols, wb=1, n_stacks_2d=p["zp"],
                preset=self.preset, num_classes=self.num_classes, arch=self.arch,
            ) - hybrid_window_batch_flops(
                x=p["xp"], y=p["yp"], cols=cols, wb=1, n_stacks_2d=0,
                preset=self.preset, num_classes=self.num_classes, arch=self.arch,
            )
            return n_batches * per_batch + f2d_all
        n_stacks = (
            (wb - 1) * self.cfg.window_stride + cols - 2 + 2 * wb
            if p["dedup"]
            else wb * cols
        )
        return n_batches * hybrid_window_batch_flops(
            x=p["xp"], y=p["yp"], cols=cols, wb=wb, n_stacks_2d=n_stacks,
            preset=self.preset, num_classes=self.num_classes, arch=self.arch,
        )

    _WIRE_BUCKET = 16  # wire z rounds up to this (bounds recompiles to 4/zbucket)

    def _args(self, vol: np.ndarray, mini_z: int, maxi_z: int, output: str = "probs"):
        """Kernel + argument tuple for one volume: (kernel, arrays, static_kw,
        plan). Shared by score() and compute_seconds() so the timed program
        can never drift from the served one.

        The wire array carries only the real z-crop (the liver range plus the
        reference's -5/+10 margins, funcs.py:19-20), rounded up to
        _WIRE_BUCKET slices; the kernel zero-pads to the compute shape on
        device (_pad_vol) — h2d bytes track the volume's true z-extent, not
        the z-bucket.
        """
        x0, y0, _ = vol.shape
        p = self.plan(vol.shape, mini_z, maxi_z)
        z_lo, z, zp = p["z_lo"], p["z"], p["zp"]
        zw = min(zp, -(-z // self._WIRE_BUCKET) * self._WIRE_BUCKET)
        p["zw"] = zw
        vol_p = np.zeros((x0, y0, zw), np.float32)
        vol_p[:, :, :z] = vol[:, :, z_lo : z_lo + z]
        # cast host-side so the wire carries the compute dtype (bf16 = half
        # the bytes of f32; after HU clip [-200,250] and mean-48 subtraction
        # every integer value lies in [-248, 202], all exact in bf16)
        wire = jnp.asarray(vol_p.astype(jnp.dtype(self.compute_dtype)))
        common = dict(
            arch=self.arch,
            preset=self.preset,
            compute_dtype=self.compute_dtype,
            num_classes=self.num_classes,
            cols=self.cfg.input_cols,
            pad_to=(p["xp"], p["yp"], zp),
            layout3d=getattr(self.cfg, "layout3d", "hwdc"),
            stem_s2d=getattr(self.cfg, "stem_s2d", False),
        )
        if self.shared_2d:
            arrays = (
                self.params, self.bn_state, wire, jnp.int32(z),
                jnp.asarray(p["starts"]), jnp.asarray(p["weights"]),
            )
            kw = dict(chunk2d=4 if zp % 4 == 0 else self.cfg.input_cols, **common)
            return _score_volume_shared2d, arrays, kw, p
        kernel = _score_volume_dedup2d if p["dedup"] else _score_volume
        arrays = (
            self.params, self.bn_state, wire,
            jnp.asarray(p["starts"]), jnp.asarray(p["weights"]),
            jnp.asarray([self.cfg.thres_liver, self.cfg.thres_tumor], jnp.float32),
        )
        kw = dict(
            output=output,
            mesh=self.mesh,
            unroll=max(1, int(getattr(self.cfg, "batch_unroll", 1))),
            **common,
        )
        if output == "packed2":
            kw["pack_z"] = p["zw"]
        if p["dedup"]:
            kw["stride"] = self.cfg.window_stride
        return kernel, arrays, kw, p

    def score(self, vol: np.ndarray, mini_z: int, maxi_z: int, output: str = "probs"):
        """vol: (X, Y, Z) mean-subtracted -> device array (X, Y, Z, C) probs
        (or packed mask / scalar digest per ``output``, computed in the SAME
        compiled program — no extra dispatch).

        Only the z-range the window grid actually reads (the liver range plus
        the reference's -5/+10 margins, funcs.py:19-20) crosses the host link
        and lives in the on-device score buffer; everything outside is
        background by construction (the reference also never scores it).
        """
        x0, y0, z_full = vol.shape
        kernel, arrays, kw, p = self._args(vol, mini_z, maxi_z, output)
        z_lo, z = p["z_lo"], p["z"]
        out = kernel(*arrays, **kw)
        if self.shared_2d:
            if output == "packed":
                out = _pack_labels(
                    out,
                    jnp.float32(self.cfg.thres_liver),
                    jnp.float32(self.cfg.thres_tumor),
                    num_classes=self.num_classes,
                )
            elif output == "digest":
                return _summarize(out)
            return self._restore_z(out[:x0, :y0, :z], z_lo, z_full)
        if output == "digest":
            return out
        return self._restore_z(out[:x0, :y0, :z], z_lo, z_full)

    def compute_timer(self, vol: np.ndarray, mini_z: int, maxi_z: int):
        """``timed(k) -> wall seconds`` for k serving passes in ONE dispatch.

        The building block of :meth:`compute_seconds`, exposed so external
        harnesses (benchmarks/variant_sweep.py --interleave) can compile every
        variant's programs up front and then round-robin the timed calls
        across variants — sampling the same relay weather for each instead of
        confounding variant order with weather drift. The first call at a
        given ``k`` compiles; callers should warm every k they will time.
        """
        import time

        kernel, arrays, kw, _ = self._args(vol, mini_z, maxi_z, output="digest")
        vol_idx = 2  # the wire volume's position in `arrays`

        cache_key = (kernel, tuple(sorted(kw.items(), key=lambda it: it[0])))
        krep = self._krep_cache.get(cache_key)
        if krep is None:

            @functools.partial(jax.jit, static_argnames=("k",))
            def krep(*xs, k: int):
                def body(i, acc):
                    jittered = list(xs)
                    w = jittered[vol_idx]
                    jittered[vol_idx] = w + (acc * 1e-30).astype(w.dtype)
                    out = kernel(*jittered, **kw)
                    d = out if out.ndim == 1 else _summarize(out)
                    return acc + d[2].astype(jnp.float32) * 1e-6
                return lax.fori_loop(0, k, body, jnp.float32(0.0))

            self._krep_cache[cache_key] = krep

        def timed(k):
            t0 = time.perf_counter()
            val = float(krep(*arrays, k=k))  # scalar fetch = sync
            assert np.isfinite(val)
            return time.perf_counter() - t0

        return timed

    def compute_seconds(
        self,
        vol: np.ndarray,
        mini_z: int,
        maxi_z: int,
        *,
        k_small: int = 1,
        k_big: int = 3,
        reps: int = 2,
        detail: bool = False,
    ):
        """Relay-immune per-volume device compute seconds.

        Runs the EXACT serving program k times inside ONE dispatch with a
        loop-carried dependence (rep i+1's input volume depends on rep i's
        digest, so XLA can neither hoist nor elide the repeated work — the
        perturbation magnitude ~1e-36 rounds away against HU-scale voxels, so
        numerics are unchanged) and returns the slope
        (t(k_big) - t(k_small)) / (k_big - k_small), each endpoint min over
        ``reps`` dispatches. Per-dispatch relay latency and the volume h2d
        appear in BOTH endpoints and cancel in the slope — the protocol
        benchmarks/profile_inference.py proved out per-op, applied to the
        full serving program.
        """
        timed = self.compute_timer(vol, mini_z, maxi_z)
        timed(k_small), timed(k_big)  # compile both programs
        t_small = sorted(timed(k_small) for _ in range(reps))
        t_big = sorted(timed(k_big) for _ in range(reps))
        slopes = [
            max((tb - ts) / (k_big - k_small), 1e-9)
            for ts, tb in zip(t_small, t_big)
        ]
        if detail:
            return {
                "seconds": slopes[0],
                "slopes": slopes,
                "t_small": t_small,
                "t_big": t_big,
            }
        return slopes[0]

    @staticmethod
    def _restore_z(arr, z_lo: int, z_full: int):
        """Pad the scored z-crop back to the full volume's z extent (the
        uncovered region is background/zero — the reference never scores it
        either, funcs.py:21-24)."""
        z = arr.shape[2]
        if z_lo == 0 and z == z_full:
            return arr
        cfg = [(0, 0), (0, 0), (z_lo, z_full - z_lo - z)] + [(0, 0)] * (arr.ndim - 3)
        return jnp.pad(arr, cfg)

    def predict_volume(self, vol: np.ndarray, mini_z: int, maxi_z: int):
        """Host-compatible API: (liver_prob, tumor_prob) numpy arrays."""
        score = np.asarray(self.score(vol, mini_z, maxi_z))
        return score[..., self.num_classes - 2], score[..., self.num_classes - 1]

    def labelmask(self, vol: np.ndarray, mini_z: int, maxi_z: int):
        """uint8 (X,Y,Z): bit0 = liver-or-tumor, bit1 = tumor. ONE small d2h,
        ONE dispatch (thresholding — and, at the default ``wire_bits=2``,
        2-bit packing — fused into the scoring program)."""
        return self.labelmask_collect(self.labelmask_async(vol, mini_z, maxi_z))

    def labelmask_async(
        self, vol: np.ndarray, mini_z: int, maxi_z: int, ext_mask=None
    ):
        """Upload + enqueue one volume's scoring program; defer all d2h.

        Returns an opaque handle for :meth:`labelmask_collect`. JAX dispatch
        is asynchronous, so the caller can overlap the next volume's h2d +
        dispatch with this one's device execution (predict_directory's
        pipelined serving loop). The mask crosses the link z-cropped to the
        scored range and — at ``InferConfig.wire_bits=2`` (default) — 2-bit
        packed (labels are {0,1,3}: lossless), 4x less d2h than the plain
        uint8 wire; the full-extent restore happens on host in collect.

        ``ext_mask``: the (once-dilated) external liver mask, full extent,
        bool/uint8 — its nonzero z range must lie inside [mini_z, maxi_z]
        (which :func:`postprocess.liver_mask_extent` guarantees). When given
        and ``InferConfig.device_postprocess`` is on, the reference's whole
        CC postprocess (test.py:70-115) runs as a second device dispatch
        (infer/device_postprocess.py) and the wire carries the FINAL
        {0,1,2} labelmap — collect then needs no host morphology at all.
        """
        x0, y0, z_full = vol.shape
        bits = int(getattr(self.cfg, "wire_bits", 2))
        dpp = (
            ext_mask is not None
            and bool(getattr(self.cfg, "device_postprocess", False))
        )
        output = "packed" if dpp else ("packed2" if bits == 2 else "packed")
        kernel, arrays, kw, p = self._args(vol, mini_z, maxi_z, output)
        if self.shared_2d:
            # the shared-2D kernel always emits the probs buffer; threshold +
            # pack ride two more (cheap, device-side) dispatches
            mask = _pack_labels(
                kernel(*arrays, **kw),
                jnp.float32(self.cfg.thres_liver),
                jnp.float32(self.cfg.thres_tumor),
                num_classes=self.num_classes,
            )
            if not dpp:
                out = _pack2bits(mask, pack_z=p["zw"]) if bits == 2 else mask
        else:
            out = kernel(*arrays, **kw)
            mask = out  # 'packed' uint8 scores when dpp
        sparse = dpp and bool(getattr(self.cfg, "sparse_wire", False))
        chunked = 0
        if dpp:
            from .device_postprocess import compose_final, compose_packed

            zw = p["zw"]
            z_avail = min(zw, z_full - p["z_lo"])
            ext_crop = np.zeros((x0, y0, zw), np.uint8)
            ext_crop[:, :, :z_avail] = np.asarray(
                ext_mask[:, :, p["z_lo"] : p["z_lo"] + z_avail], bool
            )
            ext_bits = np.packbits(ext_crop, axis=2)  # zw % 8 == 0 (_WIRE_BUCKET)
            chunked = int(getattr(self.cfg, "postprocess_chunk_iters", 0))
            if chunked > 0:
                # crash-proof form: the compose's CC propagation loops run as
                # bounded chunked dispatches driven from labelmask_collect
                # (host convergence checks would block dispatch() otherwise);
                # the scoring output stays device-resident in the handle
                out = (mask, jnp.asarray(ext_bits))
            elif sparse:
                # labelmap stays device-resident; collect fetches the 6-int
                # bbox, then only the bbox crop crosses the wire
                out = compose_final(mask, jnp.asarray(ext_bits), pack_z=zw)
            else:
                out = compose_packed(mask, jnp.asarray(ext_bits), pack_z=zw)
        return out, dict(
            bits=2 if dpp else bits,
            final=dpp,
            sparse=sparse,
            chunked=chunked,
            zw=p["zw"],
            x0=x0, y0=y0, z=p["z"], z_lo=p["z_lo"], z_full=z_full,
        )

    _SPARSE_BUCKET = (64, 64, 16)  # bbox crop sizes round up to these

    def labelmask_collect(self, handle) -> np.ndarray:
        """Fetch a labelmask_async handle -> uint8 (X, Y, Z) labelmask."""
        dev, m = handle
        if m.get("chunked"):
            from .device_postprocess import (
                compose_final_chunked, compose_packed_chunked,
            )

            mask_dev, ext_dev = dev
            kw = dict(pack_z=m["zw"], chunk_iters=m["chunked"])
            if m.get("sparse"):
                dev = compose_final_chunked(mask_dev, ext_dev, **kw)
            else:
                dev = compose_packed_chunked(mask_dev, ext_dev, **kw)
        if m.get("sparse"):
            return self._collect_sparse(dev, m)
        buf = np.asarray(dev)
        if m["bits"] == 2:
            buf = _unpack2bits(buf)
        out = np.zeros((m["x0"], m["y0"], m["z_full"]), np.uint8)
        out[:, :, m["z_lo"] : m["z_lo"] + m["z"]] = buf[
            : m["x0"], : m["y0"], : m["z"]
        ]
        return out

    def _collect_sparse(self, dev, m) -> np.ndarray:
        """Sparse-wire collect: fetch the 6-int bbox, then only the bbox crop.

        After the largest-CC postprocess the labelmap's nonzero extent is one
        liver-sized blob, so this replaces the (X*Y*zw/4)-byte wire with a
        bbox-sized one — lossless (outside the bbox is zero by definition).
        Costs one extra scalar-fetch round-trip + one crop dispatch; crop
        sizes bucket to _SPARSE_BUCKET so compiles stay rare."""
        final, bbox_dev = dev
        out = np.zeros((m["x0"], m["y0"], m["z_full"]), np.uint8)
        bb = np.asarray(bbox_dev)
        if bb[0] > bb[1]:  # empty labelmap
            return out
        xp, yp, zw = final.shape
        bx, by, bz = self._SPARSE_BUCKET

        def plan_axis(lo, hi, dim, bucket):
            size = min(dim, -(-(int(hi) - int(lo) + 1) // bucket) * bucket)
            start = min(int(lo), dim - size)
            return start, size
        xs, sx = plan_axis(bb[0], bb[1], xp, bx)
        ys, sy = plan_axis(bb[2], bb[3], yp, by)
        zs, sz = plan_axis(bb[4], bb[5], zw, bz)
        wire = np.asarray(
            _crop_pack(
                final, jnp.int32(xs), jnp.int32(ys), jnp.int32(zs),
                sx=sx, sy=sy, sz=sz,
            )
        )
        crop = _unpack2bits(wire)
        # paste, clipped to the true volume extent (the crop can reach into
        # xy compute padding — zero there — or past the scored z range)
        gx = min(xs + sx, m["x0"])
        gy = min(ys + sy, m["y0"])
        gz_lo = m["z_lo"] + zs
        gz = min(gz_lo + sz, m["z_lo"] + m["z"], m["z_full"])
        if gx > xs and gy > ys and gz > gz_lo:
            out[xs:gx, ys:gy, gz_lo:gz] = crop[
                : gx - xs, : gy - ys, : gz - gz_lo
            ]
        return out

    def summarize(self, vol: np.ndarray, mini_z: int, maxi_z: int):
        """Scalar digest only — for benchmarking through thin host links."""
        return np.asarray(self.score(vol, mini_z, maxi_z, output="digest"))


# ---------------------------------------------------------------------------
# x/y/z-tiled inference (reference lib/funcs.py:54-129 predict_window_mulgpu)
# ---------------------------------------------------------------------------


def tile_origins(dim: int, win: int, step: int) -> list[int]:
    """Tile start offsets along one axis: stride `step`, clamped to dim-win.

    The reference walks range(0, dim-win+step, step) and clamps late inside a
    broken elif chain (funcs.py:74-96) and can double-count or crash on
    remainder batches; here clamped duplicates are deduped (overlap-average
    semantics are unchanged — identical windows carry identical probs).
    """
    assert dim >= win, (dim, win)
    out = sorted({min(s, dim - win) for s in range(0, dim - win + step, step)})
    return out


@functools.partial(
    jax.jit,
    static_argnames=("arch", "preset", "compute_dtype", "num_classes", "win", "layout3d", "stem_s2d"),
)
def _score_tiles(
    params,
    bn_state,
    vol,
    origins,
    weights,
    *,
    arch: str,
    preset: str,
    compute_dtype: str,
    num_classes: int,
    win: tuple,
    layout3d: str = "hwdc",
    stem_s2d: bool = False,
):
    """3D-tiled scoring: full-window softmax accumulate (no edge-slice drop,
    matching the reference variant). origins: (n_batches, wb, 3) int32."""
    x, y, zp = vol.shape
    wx, wy, wz = win
    n_batches, wb = origins.shape[:2]
    dtype = jnp.dtype(compute_dtype)
    vol = vol.astype(dtype)

    score0 = jnp.zeros((x, y, zp, num_classes), jnp.float32)
    count0 = jnp.zeros((x, y, zp), jnp.float32)

    def body(i, carry):
        score, count = carry
        org = origins[i]
        w_i = weights[i]
        wins = jax.vmap(
            lambda o: lax.dynamic_slice(vol, (o[0], o[1], o[2]), (wx, wy, wz))
        )(org)[..., None]
        ctx = Ctx(params, bn_state, train=False, compute_dtype=dtype)
        logits = hybrid.apply(
            ctx, wins, arch=arch, preset=preset, num_classes=num_classes,
            layout3d=layout3d, stem_s2d=stem_s2d,
        )
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

        def acc(j, carry2):
            sc, cn = carry2
            o = org[j]
            pj = lax.dynamic_index_in_dim(probs, j, axis=0, keepdims=False)
            blk = lax.dynamic_slice(sc, (o[0], o[1], o[2], 0), (wx, wy, wz, num_classes))
            sc = lax.dynamic_update_slice(sc, blk + w_i[j] * pj, (o[0], o[1], o[2], 0))
            cblk = lax.dynamic_slice(cn, (o[0], o[1], o[2]), (wx, wy, wz))
            cn = lax.dynamic_update_slice(cn, cblk + w_i[j], (o[0], o[1], o[2]))
            return sc, cn

        return lax.fori_loop(0, wb, acc, (score, count))

    score, count = lax.fori_loop(0, n_batches, body, (score0, count0))
    return score / jnp.maximum(count, 1e-4)[..., None]


class TiledVolumeScorer:
    """TPU equivalent of the reference's x/y/z-tiled multi-GPU inference:
    windows of (tile, tile, input_cols) stepping 2/3 of their size in every
    axis, batched through one compiled program. For volumes whose in-plane
    extent exceeds what a full-frame window batch can hold."""

    def __init__(
        self,
        params,
        bn_state,
        cfg: InferConfig,
        *,
        tile: int = 256,
        arch: str = "end2end",
        preset: str = "full",
        compute_dtype: str = "float32",
        num_classes: int = 3,
    ):
        assert tile % 32 == 0, f"tile must be divisible by 32 (got {tile})"
        self.params = params
        self.bn_state = bn_state
        self.cfg = cfg
        self.tile = tile
        self.arch = arch
        self.preset = preset
        self.compute_dtype = compute_dtype
        self.num_classes = num_classes

    def score(self, vol: np.ndarray):
        x0, y0, z0 = vol.shape
        wx = wy = self.tile
        wz = self.cfg.input_cols
        xp = max(x0, wx)
        yp = max(y0, wy)
        zp = max(z0, wz)
        vol_p = np.zeros((xp, yp, zp), np.float32)
        vol_p[:x0, :y0, :z0] = vol

        org = [
            (a, b, c)
            for a in tile_origins(xp, wx, (wx // 3) * 2)
            for b in tile_origins(yp, wy, (wy // 3) * 2)
            for c in tile_origins(zp, wz, max(1, (wz // 3) * 2))
        ]
        wb = max(1, self.cfg.window_batch)
        n_batches = -(-len(org) // wb)
        origins = np.zeros((n_batches * wb, 3), np.int32)
        weights = np.zeros((n_batches * wb,), np.float32)
        origins[: len(org)] = np.asarray(org, np.int32)
        weights[: len(org)] = 1.0
        wire = vol_p.astype(jnp.dtype(self.compute_dtype))
        score = _score_tiles(
            self.params,
            self.bn_state,
            jnp.asarray(wire),
            jnp.asarray(origins.reshape(n_batches, wb, 3)),
            jnp.asarray(weights.reshape(n_batches, wb)),
            arch=self.arch,
            preset=self.preset,
            compute_dtype=self.compute_dtype,
            num_classes=self.num_classes,
            win=(wx, wy, wz),
            layout3d=getattr(self.cfg, "layout3d", "hwdc"),
            stem_s2d=getattr(self.cfg, "stem_s2d", False),
        )
        return score[:x0, :y0, :z0]

    def predict_volume(self, vol: np.ndarray):
        score = np.asarray(self.score(vol))
        return score[..., self.num_classes - 2], score[..., self.num_classes - 1]


# ---------------------------------------------------------------------------
# shared-2D fast mode: dedupe the 2D branch across overlapping windows
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=(
        "arch", "preset", "compute_dtype", "num_classes", "cols", "chunk2d",
        "pad_to", "layout3d", "stem_s2d",
    ),
)
def _score_volume_shared2d(
    params,
    bn_state,
    vol,
    z_real,
    starts,
    weights,
    *,
    arch: str,
    preset: str,
    compute_dtype: str,
    num_classes: int,
    cols: int,
    chunk2d: int = 8,
    pad_to=None,
    layout3d: str = "hwdc",
    stem_s2d: bool = False,
):
    """Sliding-window scoring with the 2D branch computed ONCE per z-slice.

    The exact path (_score_volume) runs the 2D DenseUNet on every window's 8
    slice-stacks; with stride 2 each z-slice is re-processed by ~4 windows.
    Here phase A computes 2D features/logits for every slice of the volume
    (stacks clamped at the VOLUME boundary), phase B gathers 8 precomputed
    slices per window for the 3D branch + HFF head.

    Deviation from the reference: inside a window, the reference builds its
    two EDGE stacks with window-boundary replication (hybridnet.py:385-395);
    here those two stacks use the volume's true neighbors instead. Window-edge
    outputs are discarded either way; the difference reaches surviving
    interior outputs only through the 3D branch's receptive field. This is
    the documented fast mode (`InferConfig.shared_2d`), not the default.
    """
    from ..models import denseunet2d, denseunet3d
    from ..models.hybrid import LOGIT_AMPLIFICATION, hff_head

    vol = _pad_vol(vol, pad_to)
    x, y, zp = vol.shape
    n_batches, wb = starts.shape
    dtype = jnp.dtype(compute_dtype)
    vol = vol.astype(dtype)
    inner = cols - 2

    kw2d = dict(denseunet2d.PRESETS[preset])
    kw3d = dict(denseunet3d.PRESETS[preset], layout=layout3d, stem_s2d=stem_s2d)
    feat_width = kw2d.get("decoder_widths", (768, 384, 96, 96, 64))[-1]
    assert zp % chunk2d == 0, (zp, chunk2d)

    # ---- phase A: 2D branch over all z slices, chunked ------------------
    # channel-major storage (z, C, x, y): the minor-most dims are the clean
    # 512x512 plane, so TPU (8,128) tiling adds no padding. Feature-last
    # layouts here pad C=3 -> 128 lanes (42x memory blow-up -> HBM OOM).
    fea = jnp.zeros((zp, feat_width, x, y), dtype)
    res = jnp.zeros((zp, num_classes, x, y), dtype)

    def body_a(i, carry):
        fea, res = carry
        z0 = i * chunk2d
        idx = z0 + jnp.arange(chunk2d)
        prev = jnp.take(vol, jnp.maximum(idx - 1, 0), axis=2)
        cur = jnp.take(vol, jnp.minimum(idx, z_real - 1), axis=2)
        nxt = jnp.take(vol, jnp.minimum(idx + 1, z_real - 1), axis=2)
        stacks = jnp.stack([prev, cur, nxt], axis=-1)  # (x, y, c, 3)
        stacks = jnp.transpose(stacks, (2, 0, 1, 3))  # (c, x, y, 3)
        ctx = Ctx(params, bn_state, train=False, compute_dtype=dtype)
        f2, l2 = denseunet2d.apply(
            ctx, stacks, bn_frozen=True, decoder_dropout=0.0,
            num_classes=num_classes, **kw2d,
        )
        f2 = jnp.transpose(f2.astype(dtype), (0, 3, 1, 2))  # (c, F, x, y)
        l2 = jnp.transpose(l2.astype(dtype), (0, 3, 1, 2))  # (c, C, x, y)
        fea = lax.dynamic_update_slice(fea, f2, (z0, 0, 0, 0))
        res = lax.dynamic_update_slice(res, l2, (z0, 0, 0, 0))
        return fea, res

    fea, res = lax.fori_loop(0, zp // chunk2d, body_a, (fea, res))

    # ---- phase B: 3D branch + HFF per window, gathered from phase A -----
    score0 = jnp.zeros((x, y, zp, num_classes), jnp.float32)
    count0 = jnp.zeros((zp,), jnp.float32)

    def body_b(i, carry):
        score, count = carry
        s_i = starts[i]
        w_i = weights[i]
        vol_w = jax.vmap(lambda s: lax.dynamic_slice(vol, (0, 0, s), (x, y, cols)))(s_i)
        fea_w = jax.vmap(lambda s: lax.dynamic_slice(fea, (s, 0, 0, 0), (cols,) + fea.shape[1:]))(s_i)
        res_w = jax.vmap(lambda s: lax.dynamic_slice(res, (s, 0, 0, 0), (cols,) + res.shape[1:]))(s_i)
        # (wb, cols, C, x, y) -> (wb, x, y, cols, C)
        fea_w = jnp.transpose(fea_w, (0, 3, 4, 1, 2))
        res_w = jnp.transpose(res_w, (0, 3, 4, 1, 2))
        input3d = jnp.concatenate(
            [vol_w[..., None], res_w * LOGIT_AMPLIFICATION], axis=-1
        )
        ctx = Ctx(params, bn_state, train=False, compute_dtype=dtype)
        feat3d, _ = denseunet3d.apply(
            ctx, input3d, num_classes=num_classes,
            unfold_outputs=layout3d != "dhwc", **kw3d,
        )
        logits = hff_head(
            ctx, feat3d, fea_w, arch=arch, num_classes=num_classes, layout=layout3d
        )
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[:, :, :, 1:-1, :]

        def acc(j, carry2):
            sc, cn = carry2
            sj = s_i[j] + 1
            pj = lax.dynamic_index_in_dim(probs, j, axis=0, keepdims=False)
            blk = lax.dynamic_slice(sc, (0, 0, sj, 0), (x, y, inner, num_classes))
            sc = lax.dynamic_update_slice(sc, blk + w_i[j] * pj, (0, 0, sj, 0))
            cblk = lax.dynamic_slice(cn, (sj,), (inner,))
            cn = lax.dynamic_update_slice(cn, cblk + w_i[j], (sj,))
            return sc, cn

        return lax.fori_loop(0, wb, acc, (score, count))

    score, count = lax.fori_loop(0, n_batches, body_b, (score0, count0))
    return score / (count[None, None, :, None] + 1e-4)


# ---------------------------------------------------------------------------
# structured window grid: stride-aligned batches enabling in-batch 2D dedup
# ---------------------------------------------------------------------------


def make_grid_structured(
    starts_list: list[int],
    wb: int,
    stride: int,
    run_bucket: int = 4,
    max_runs: int | None = None,
):
    """(starts, weights) with EVERY batch an arithmetic run s0, s0+stride, ...

    Consecutive stride-aligned windows let the scoring kernel share interior
    slice-stacks across a batch (exact dedup). Construction:
    * the on-grid starts (left, left+stride, ...) chunk into runs; the last
      run is right-aligned and extended BACKWARD with weight-0 slots (their
      starts duplicate already-scored windows, weight 0 = no effect);
    * the reference's clamped final start (z-cols) can be off-grid
      (funcs.py:26-28) — it gets its own right-aligned run.
    Weights carry each unique start's multiplicity exactly once.

    The emitted run count pads up to a multiple of ``run_bucket`` with
    all-weight-0 copies of the first run (capped at ``max_runs``, the
    z-bucket's theoretical ceiling) so ``starts.shape`` — and therefore the
    compiled program — doesn't change every time a volume's liver z-extent
    crosses a wb*stride boundary; one program serves every volume whose
    padded run count lands in the same bucket (mirrors make_grid's batch-count
    bucketing on the non-dedup path).
    """
    uniq = sorted(set(starts_list))
    mult = {s: starts_list.count(s) for s in uniq}
    lo = uniq[0]
    on_grid = [s for s in uniq if (s - lo) % stride == 0]
    off_grid = [s for s in uniq if (s - lo) % stride != 0]
    assert len(off_grid) <= 1, off_grid  # only the final clamp can be off-grid

    runs: list[list[int]] = []

    def emit(seq_starts: list[int]):
        """Right-align a set of real starts into stride-runs of length wb."""
        for i in range(0, len(seq_starts), wb):
            chunk = seq_starts[i : i + wb]
            end = chunk[-1]
            run = [end - stride * (wb - 1 - j) for j in range(wb)]
            if run[0] < 0:  # left-shift impossible; pad forward from 0 instead
                run = [chunk[0] + stride * j for j in range(wb)]
            runs.append(run)

    emit(on_grid)
    if off_grid:
        emit(off_grid)

    # pad the run count to its bucket with weight-0 duplicates of run 0
    # (valid in-bounds starts; zero weight = no effect on the accumulators)
    n_runs = -(-len(runs) // run_bucket) * run_bucket
    if max_runs is not None:
        n_runs = min(n_runs, max(max_runs, len(runs)))
    while len(runs) < n_runs:
        runs.append(list(runs[0]))

    starts = np.zeros((len(runs), wb), np.int32)
    weights = np.zeros((len(runs), wb), np.float32)
    counted: set[int] = set()
    for r, run in enumerate(runs):
        for j, s in enumerate(run):
            starts[r, j] = s
            if s in mult and s not in counted:
                weights[r, j] = mult[s]
                counted.add(s)
    assert counted == set(uniq), (sorted(counted), uniq)
    return starts, weights


@functools.partial(
    jax.jit,
    static_argnames=(
        "arch", "preset", "compute_dtype", "num_classes", "cols", "stride",
        "output", "mesh", "pad_to", "unroll", "layout3d", "stem_s2d", "pack_z",
    ),
)
def _score_volume_dedup2d(
    params,
    bn_state,
    vol,
    starts,
    weights,
    thresholds,
    *,
    arch: str,
    preset: str,
    compute_dtype: str,
    num_classes: int,
    cols: int,
    stride: int,
    output: str = "probs",
    mesh=None,
    pad_to=None,
    unroll: int = 1,
    layout3d: str = "hwdc",
    stem_s2d: bool = False,
    pack_z: int | None = None,
):
    """Exact scoring with in-batch 2D dedup over stride-aligned window runs.

    Requires every batch row of ``starts`` to be an arithmetic run
    s0, s0+stride, ... (make_grid_structured). Consecutive windows then share
    their interior slice-stacks: positions 1..cols-2 of window j are the
    volume-neighbor stacks [z-1, z, z+1] regardless of the window, so one 2D
    pass over the run's union of interiors + each window's two edge stacks
    (window-boundary replication, hybridnet.py:385-395) covers the whole
    batch — (wb-1)*stride + cols - 2 + 2*wb stacks instead of wb*cols
    (36 vs 64 at wb=8: 44% less 2D compute). EXACT: the hybrid's 2D branch
    always runs with frozen BN statistics, so batch composition cannot change
    any value; assembly indices are static.
    """
    from ..models import denseunet2d, denseunet3d
    from ..models.hybrid import LOGIT_AMPLIFICATION, hff_head

    vol = _pad_vol(vol, pad_to)
    x, y, zp = vol.shape
    n_batches, wb = starts.shape
    dtype = jnp.dtype(compute_dtype)
    vol = vol.astype(dtype)
    inner = cols - 2

    kw2d = dict(denseunet2d.PRESETS[preset])
    kw3d = dict(denseunet3d.PRESETS[preset], layout=layout3d, stem_s2d=stem_s2d)

    NI = (wb - 1) * stride + cols - 2  # unique interior stack centers per run
    # static assembly map: window j, position p -> index into the 2D batch
    asm = np.zeros((wb, cols), np.int32)
    for j in range(wb):
        asm[j, 0] = NI + j  # first-edge stack of window j
        asm[j, cols - 1] = NI + wb + j  # last-edge stack
        for p in range(1, cols - 1):
            asm[j, p] = stride * j + p - 1
    asm = jnp.asarray(asm)

    score0 = jnp.zeros((x, y, zp, num_classes), jnp.float32)
    count0 = jnp.zeros((zp,), jnp.float32)

    def body(carry, s_i, w_i):
        score, count = carry
        s0 = s_i[0]

        # interior stacks: centers s0+1 .. s0+NI (volume neighbors).
        # mode='clip': padding (weight-0) windows in right-aligned runs can
        # index past the crop; jnp.take's default OOB mode fills NaN, and
        # 0 * NaN would poison the accumulator. Clipped reads only ever feed
        # weight-0 windows (real windows satisfy start <= z - cols).
        take = lambda idx: jnp.take(vol, idx, axis=2, mode="clip")
        c_idx = s0 + 1 + jnp.arange(NI)
        interior = jnp.stack(
            [take(c_idx - 1), take(c_idx), take(c_idx + 1)], axis=-1
        )  # (x, y, NI, 3)
        # edge stacks per window (reference z-boundary replication)
        first = jnp.stack(
            [take(s_i), take(s_i), take(s_i + 1)], axis=-1
        )  # (x, y, wb, 3)
        last = jnp.stack(
            [take(s_i + cols - 2), take(s_i + cols - 1), take(s_i + cols - 1)],
            axis=-1,
        )
        stacks = jnp.concatenate([interior, first, last], axis=2)
        stacks = jnp.transpose(stacks, (2, 0, 1, 3))  # (NI+2wb, x, y, 3)
        if mesh is not None:
            stacks = lax.with_sharding_constraint(
                stacks,
                jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data")),
            )

        ctx = Ctx(params, bn_state, train=False, compute_dtype=dtype)
        feat2d, logits2d = denseunet2d.apply(
            ctx, stacks, bn_frozen=True, decoder_dropout=0.0,
            num_classes=num_classes, **kw2d,
        )
        # assemble per-window volumes via the static index map
        res_w = jnp.transpose(logits2d[asm], (0, 2, 3, 1, 4))  # (wb,x,y,cols,C)
        fea_w = jnp.transpose(feat2d[asm], (0, 2, 3, 1, 4))  # (wb,x,y,cols,F)
        vol_w = jax.vmap(
            lambda s: lax.dynamic_slice(vol, (0, 0, s), (x, y, cols))
        )(s_i)[..., None]

        input3d = jnp.concatenate([vol_w, res_w * LOGIT_AMPLIFICATION], axis=-1)
        feat3d, _ = denseunet3d.apply(
            ctx, input3d, num_classes=num_classes,
            unfold_outputs=layout3d != "dhwc", **kw3d,
        )
        logits = hff_head(
            ctx, feat3d, fea_w, arch=arch, num_classes=num_classes, layout=layout3d
        )
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[:, :, :, 1:-1, :]

        def acc(j, carry2):
            sc, cn = carry2
            sj = s_i[j] + 1
            pj = lax.dynamic_index_in_dim(probs, j, axis=0, keepdims=False)
            blk = lax.dynamic_slice(sc, (0, 0, sj, 0), (x, y, inner, num_classes))
            sc = lax.dynamic_update_slice(sc, blk + w_i[j] * pj, (0, 0, sj, 0))
            cblk = lax.dynamic_slice(cn, (sj,), (inner,))
            cn = lax.dynamic_update_slice(cn, cblk + w_i[j], (sj,))
            return sc, cn

        return lax.fori_loop(0, wb, acc, (score, count))

    score, count = _batch_loop(
        n_batches, body, (score0, count0), starts, weights, unroll
    )
    score = score / (count[None, None, :, None] + 1e-4)
    if output in ("packed", "packed2"):
        mask = _pack_labels(
            score, thresholds[0], thresholds[1], num_classes=num_classes
        )
        return _pack2bits(mask, pack_z=pack_z) if output == "packed2" else mask
    if output == "digest":
        return _summarize(score)
    return score
