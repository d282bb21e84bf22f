"""3D DenseUNet branch: 3D DenseNet encoder + z-preserving decoder.

Re-implements the reference's DenseNet3D (denseunet3d.py:105-190, near-identical
copy at hybridnet.py:11-178): growth 32, blocks (3,4,12,8), 7x7x7 stride-2 stem,
transitions with AveragePooling3D (2,2,1) preserving z, decoder with three
(2,2,1) and two (2,2,2) nearest upsamples, returning both the 64-channel
feature map 'ac_up4' and 3-channel logits '3dclassifer'.

Input is (B, H, W, D, C) to match the reference's data layout (z last); the
compute layout handed to XLA is channels-last NDHWC with the spatial dims
(H, W, D).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.module import Ctx, init as module_init, maybe_remat
from . import dmajor
from . import layers as L
from . import s2d
from . import zfold

EPS_ENCODER = 1.1e-5  # reference denseunet3d.py:28
ENC_BLOCKS = (3, 4, 12, 8)  # reference denseunet3d.py:126
GROWTH_RATE = 32
INITIAL_FILTERS = 96

# 'full' is the reference layout; 'tiny' is a shrunk same-wiring test preset.
PRESETS = {
    "full": {},
    "tiny": {
        "blocks": (1, 1, 2, 2),
        "growth": 8,
        "decoder_widths": (16, 16, 16, 16, 16),
    },
}


class _DirectOps:
    """Op set running (B, H, W, D, C) tensors through layers.conv3d et al."""

    folded = False

    def conv(self, ctx, x, name, features, kernel, **kw):
        return L.conv3d(ctx, x, name, features, kernel, **kw)

    def max_pool(self, x, window, stride, pad=0):
        return L.max_pool(x, window, stride, pad=pad)

    def avg_pool(self, x, window, stride):
        return L.avg_pool(x, window, stride)

    def upsample(self, x, factors):
        return L.upsample_nearest(x, factors)

    def unfold(self, x):
        return x


class _DMajorOps:
    """Op set running (B, D, H, W, C) d-major tensors (models/dmajor.py).

    Keeps (W, C) in the memory tile's minor dims so the small-D mid-network
    stages don't pad the sublane dim. Per-op (BENCH_NOTES round-3 campaign):
    up to 1.7x faster on the big decoder 3x3x3 convs (up0/up1/up2), parity on
    the encoder and stem. Selected graph-wide via apply(layout='dhwc').
    Exact: same MACs, canonical parameter layout, only XLA layout differs.
    """

    folded = False

    def conv(self, ctx, x, name, features, kernel, **kw):
        return dmajor.conv3d(ctx, x, name, features, kernel, **kw)

    def max_pool(self, x, window, stride, pad=0):
        return dmajor.max_pool(x, window, stride, pad=pad)

    def avg_pool(self, x, window, stride):
        return dmajor.avg_pool(x, window, stride)

    def upsample(self, x, factors):
        return dmajor.upsample_nearest(x, factors)

    def unfold(self, x):
        return dmajor.unfold(x)


class _FoldedOps:
    """Op set running (B*D, H, W, C) z-folded tensors (models/zfold.py).

    Tracks the current depth as z-strided ops consume/produce it. Exact to
    float-sum reassociation vs _DirectOps — but measured ~1.8x SLOWER at
    model level (BENCH_NOTES.md round-2 levers: isolated conv microbenches
    favor the 2D lowering ~3x, yet the z-shift's extra kz*F-channel
    intermediates and the memory-bounding lax.map lose more than the lane
    gain wins in the composed graph). Kept as an opt-in (`fold_z`, default
    OFF) and as a documented negative result.
    """

    folded = True

    def __init__(self, batch, depth):
        self.b = batch
        self.d = depth

    def conv(self, ctx, x, name, features, kernel, **kw):
        y, self.d = zfold.conv3d(ctx, x, self.b, self.d, name, features, kernel, **kw)
        return y

    def max_pool(self, x, window, stride, pad=0):
        y, self.d = zfold.max_pool(x, self.b, self.d, window, stride, pad=pad)
        return y

    def avg_pool(self, x, window, stride):
        y, self.d = zfold.avg_pool(x, self.b, self.d, window, stride)
        return y

    def upsample(self, x, factors):
        y, self.d = zfold.upsample_nearest(x, self.b, self.d, factors)
        return y

    def unfold(self, x):
        return zfold.unfold(x, self.b, self.d)


def _conv_block3d(ctx, ops, x, stage, branch, growth, *, frozen, dropout_rate=0.0):
    """Reference denseunet3d.py:18-52."""
    base = f"3dconv{stage}_{branch}"
    inter = growth * 4
    x = L.bn_scale_relu(
        ctx, x, base + "_x1_bn", base + "_x1_scale", eps=EPS_ENCODER, frozen=frozen
    )
    x = ops.conv(ctx, x, base + "_x1", inter, 1, padding="valid", use_bias=False)
    x = L.dropout(ctx, x, dropout_rate)
    x = L.bn_scale_relu(
        ctx, x, base + "_x2_bn", base + "_x2_scale", eps=EPS_ENCODER, frozen=frozen
    )
    x = ops.conv(ctx, x, base + "_x2", growth, 3, padding=1, use_bias=False)
    x = L.dropout(ctx, x, dropout_rate)
    return x


def _dense_block3d(ctx, ops, x, stage, nb_layers, nb_filter, growth, *, frozen, dropout_rate=0.0):
    """Reference denseunet3d.py:53-77. Blocks remat-wrapped like the 2D path."""
    feat = x
    for i in range(nb_layers):
        branch = i + 1
        out = maybe_remat(
            ctx,
            lambda c, f, b=branch: _conv_block3d(
                c, ops, f, stage, b, growth, frozen=frozen, dropout_rate=dropout_rate
            ),
            feat,
        )
        feat = jnp.concatenate([feat, out], axis=-1)
        nb_filter += growth
    return feat, nb_filter


def _transition3d(ctx, ops, x, stage, nb_filter, compression, *, frozen, dropout_rate=0.0):
    """Reference denseunet3d.py:78-104 — z-preserving (2,2,1) average pool."""
    base = f"3dconv{stage}_blk"
    x = L.bn_scale_relu(
        ctx, x, base + "_bn", base + "_scale", eps=EPS_ENCODER, frozen=frozen
    )
    x = ops.conv(
        ctx, x, base, int(nb_filter * compression), 1, padding="valid", use_bias=False
    )
    x = L.dropout(ctx, x, dropout_rate)
    x = ops.avg_pool(x, (2, 2, 1), (2, 2, 1))
    return x


def _up_stage3d(ctx, ops, x, idx, features, up, *, frozen):
    """UpSample -> Conv3x3x3 -> BN -> ReLU (reference denseunet3d.py:158-186)."""
    x = ops.upsample(x, up)
    x = ops.conv(ctx, x, f"3dconv_up{idx}", features, 3, padding="same")
    x = L.batch_norm(ctx, x, f"3dbn_up{idx}", eps=1e-3, frozen=frozen)
    return L.relu(x)


def apply(
    ctx: Ctx,
    x,
    *,
    reduction: float = 0.5,
    num_classes: int = 3,
    bn_frozen: bool = False,
    block_dropout: float = 0.0,
    blocks: tuple = ENC_BLOCKS,
    growth: int = GROWTH_RATE,
    decoder_widths: tuple = (504, 224, 192, 96, 64),
    taps: dict | None = None,
    fold_z: bool = False,
    layout: str = "hwdc",
    unfold_outputs: bool = True,
    stem_s2d: bool = False,
):
    """Forward pass. x: (B, H, W, D, C) with H, W divisible by 32, D by 4.

    Returns (ac_up4 features (B,H,W,D,64), logits (B,H,W,D,num_classes)).
    ``taps``, when given a dict, collects block-boundary activations under the
    reference graph's names (parity audits, weights/parity.py).

    ``layout``: XLA activation layout for the branch — 'hwdc' (canonical,
    spatial=(H,W,D)) or 'dhwc' (d-major, spatial=(D,H,W), models/dmajor.py;
    transposed in/out here, parameters and outputs identical). See the
    BENCH_NOTES.md round-3 per-op table for when each wins.

    ``unfold_outputs=False`` (layout='dhwc' only) returns the feature map
    and logits still d-major (B,D,H,W,C) so a d-major consumer (the hybrid's
    HFF head) can fuse without a round-trip transpose; taps stay canonical.

    ``stem_s2d``: run the 7^3 stride-2 stem via space-to-depth parity
    decomposition (models/s2d.py) — same MAC set and parameters, measured
    5.9x faster at the real stem shape (Cin=4 starves the MXU contraction
    otherwise); exact modulo float-summation order.

    ``fold_z``: execute the whole branch z-folded — every op a native 2D op
    on (B*D, H, W, C) tensors (models/zfold.py), exact to float-summation
    order vs the default. Kept OFF: although isolated conv microbenches
    favored 2D lowering ~3x, at model level on v5e the folded branch
    measured ~1.8x SLOWER than XLA's in-context conv3d (the z-shift adds
    re-read 3x-channel intermediates and the memory-bounding lax.map
    serializes; BENCH_NOTES.md round-2 negative results)."""
    assert x.ndim == 5 and x.shape[1] % 32 == 0 and x.shape[2] % 32 == 0, x.shape
    assert x.shape[3] % 4 == 0, f"depth {x.shape[3]} must be divisible by 4"
    assert layout in ("hwdc", "dhwc"), layout
    assert not (fold_z and layout != "hwdc"), "fold_z and dhwc are exclusive"
    assert unfold_outputs or layout == "dhwc", "unfold_outputs=False needs dhwc"
    compression = 1.0 - reduction

    if fold_z:
        x, b0, d0 = zfold.fold(x)
        ops = _FoldedOps(b0, d0)
    elif layout == "dhwc":
        x = dmajor.fold(x)
        ops = _DMajorOps()
    else:
        ops = _DirectOps()

    if stem_s2d:
        assert not fold_z, "stem_s2d and fold_z are exclusive"
        x = s2d.conv3d_s2d(
            ctx, x, "3dconv1", INITIAL_FILTERS, 7, stride=2, padding=3,
            use_bias=False,
            kernel_perm=(2, 0, 1) if layout == "dhwc" else (0, 1, 2),
        )
    else:
        x = ops.conv(ctx, x, "3dconv1", INITIAL_FILTERS, 7, stride=2, padding=3, use_bias=False)
    x = L.bn_scale_relu(
        ctx, x, "3dconv1_bn", "3dconv1_scale", eps=EPS_ENCODER, frozen=bn_frozen
    )
    x = ops.max_pool(x, 3, 2, pad=1)

    nb_filter = INITIAL_FILTERS
    stage = 1
    for block_idx, nb_layers in enumerate(blocks[:-1]):
        stage = block_idx + 2
        x, nb_filter = _dense_block3d(
            ctx, ops, x, stage, nb_layers, nb_filter, growth,
            frozen=bn_frozen, dropout_rate=block_dropout,
        )
        if taps is not None:
            taps[f"3dconcat_{stage}_{nb_layers}"] = ops.unfold(x)
        x = _transition3d(ctx, ops, x, stage, nb_filter, compression, frozen=bn_frozen, dropout_rate=block_dropout)
        nb_filter = int(nb_filter * compression)

    final_stage = stage + 1
    x, nb_filter = _dense_block3d(
        ctx, ops, x, final_stage, blocks[-1], nb_filter, growth,
        frozen=bn_frozen, dropout_rate=block_dropout,
    )
    x = L.bn_scale_relu(
        ctx, x, f"3dconv{final_stage}_blk_bn", f"3dconv{final_stage}_blk_scale", eps=EPS_ENCODER, frozen=bn_frozen
    )
    if taps is not None:
        taps[f"3drelu{final_stage}_blk"] = ops.unfold(x)

    w0, w1, w2, w3, w4 = decoder_widths
    d = _up_stage3d(ctx, ops, x, 0, w0, (2, 2, 1), frozen=bn_frozen)
    d = _up_stage3d(ctx, ops, d, 1, w1, (2, 2, 1), frozen=bn_frozen)
    d = _up_stage3d(ctx, ops, d, 2, w2, (2, 2, 1), frozen=bn_frozen)
    d = _up_stage3d(ctx, ops, d, 3, w3, (2, 2, 2), frozen=bn_frozen)
    d = _up_stage3d(ctx, ops, d, 4, w4, (2, 2, 2), frozen=bn_frozen)

    logits = ops.conv(ctx, d, "3dclassifer", num_classes, 1, padding="same")
    if unfold_outputs:
        d = ops.unfold(d)
        logits = ops.unfold(logits)
    if taps is not None:
        taps["3dac_up4"] = d if unfold_outputs else ops.unfold(d)
        taps["3dclassifer"] = logits if unfold_outputs else ops.unfold(logits)
    return d, logits


def init(rng, *, input_size=224, input_cols=8, channels=1, batch=1, **kwargs):
    example = jnp.zeros((batch, input_size, input_size, input_cols, channels), jnp.float32)
    return module_init(apply, rng, example, **kwargs)
