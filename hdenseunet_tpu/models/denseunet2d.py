"""2D DenseUNet-167: DenseNet-161 encoder + 5-stage upsampling decoder.

Re-implements, TPU-first, both 2D model variants of the reference:

* the *current* model (reference densenet.py:10-101): no long skip connections,
  Dropout(0.3) before bn_up4, 3-channel logit head 'dense167classifer';
* the *legacy* variant (reference denseunet.py:130-227): adds encoder features
  into the decoder — 1x1 Conv(2208) 'line0' on box[3] + add (denseunet.py:190-191),
  then add([box[2], up1]) / add([box[1], up2]) / add([box[0], up3])
  (:197, :203, :209) — selected with ``skip_connections=True``;
* the hybrid-embedded variant (hybridnet.py:182-262 / denseunet3d.py:194-274):
  identical weights/topology but all BNs frozen and no decoder dropout —
  selected with ``bn_frozen=True, decoder_dropout=0.0``.

Unlike the reference, batch size and spatial size are NOT baked into the graph
(reference densenet.py:34 `batch_shape=(args.b, ...)`): the same jitted apply
serves any static shape, and XLA re-specializes per shape.

Layer names are byte-identical to the reference graph so converted HDF5
checkpoints map 1:1 (see hdenseunet_tpu/weights/convert.py).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.module import Ctx, init as module_init, maybe_remat
from . import layers as L

EPS_ENCODER = 1.1e-5  # reference densenet.py:25
ENC_BLOCKS = (6, 12, 36, 24)  # DenseNet-161 (densenet.py:41)
GROWTH_RATE = 48
INITIAL_FILTERS = 96

# Architecture presets: 'full' is the reference DenseNet-161 layout; 'tiny' is a
# shrunk stand-in with identical wiring used by fast tests and dry runs.
PRESETS = {
    "full": {},
    "tiny": {
        "blocks": (2, 2, 2, 2),
        "growth": 8,
        "decoder_widths": (32, 32, 16, 16, 16),
    },
}


def _conv_block(ctx, x, stage, branch, growth, *, frozen, dropout_rate=0.0):
    """BN-Scale-ReLU-Conv1x1 bottleneck, then BN-Scale-ReLU-Conv3x3
    (reference densenet.py:103-137)."""
    base = f"conv{stage}_{branch}"
    inter = growth * 4
    x = L.bn_scale_relu(
        ctx, x, base + "_x1_bn", base + "_x1_scale", eps=EPS_ENCODER, frozen=frozen
    )
    x = L.conv2d(ctx, x, base + "_x1", inter, 1, padding="valid", use_bias=False)
    x = L.dropout(ctx, x, dropout_rate)
    x = L.bn_scale_relu(
        ctx, x, base + "_x2_bn", base + "_x2_scale", eps=EPS_ENCODER, frozen=frozen
    )
    x = L.conv2d(ctx, x, base + "_x2", growth, 3, padding=1, use_bias=False)
    x = L.dropout(ctx, x, dropout_rate)
    return x


def _dense_block(ctx, x, stage, nb_layers, nb_filter, growth, *, frozen, dropout_rate=0.0):
    """Iteratively concat conv_block outputs (reference densenet.py:169-193).

    Each conv_block is rematerialization-wrapped (core.module.maybe_remat):
    dense blocks are where training activation memory concentrates."""
    feat = x
    for i in range(nb_layers):
        branch = i + 1
        out = maybe_remat(
            ctx,
            lambda c, f, b=branch: _conv_block(
                c, f, stage, b, growth, frozen=frozen, dropout_rate=dropout_rate
            ),
            feat,
        )
        feat = jnp.concatenate([feat, out], axis=-1)
        nb_filter += growth
    return feat, nb_filter


def _transition(ctx, x, stage, nb_filter, compression, *, frozen, dropout_rate=0.0):
    """BN-Scale-ReLU-Conv1x1(compressed)-AvgPool2 (reference densenet.py:140-166)."""
    base = f"conv{stage}_blk"
    x = L.bn_scale_relu(
        ctx, x, base + "_bn", base + "_scale", eps=EPS_ENCODER, frozen=frozen
    )
    x = L.conv2d(
        ctx, x, base, int(nb_filter * compression), 1, padding="valid", use_bias=False
    )
    x = L.dropout(ctx, x, dropout_rate)
    x = L.avg_pool(x, 2, 2)
    return x


def encoder(
    ctx: Ctx,
    x,
    *,
    reduction=0.5,
    frozen=False,
    dropout_rate=0.0,
    blocks=ENC_BLOCKS,
    growth=GROWTH_RATE,
    taps: dict | None = None,
):
    """DenseNet-161 feature extractor. Returns (final features, skip boxes).

    ``taps``, when given a dict, records the box activations under the
    reference graph's layer names (relu1, concat_{stage}_{n}, relu{S}_blk)
    for parity audits (weights/parity.py, tests/test_keras_oracle.py).
    """
    compression = 1.0 - reduction
    box = []

    def tap(name, t):
        if taps is not None:
            taps[name] = t

    x = L.conv2d(ctx, x, "conv1", INITIAL_FILTERS, 7, stride=2, padding=3, use_bias=False)
    x = L.bn_scale_relu(
        ctx, x, "conv1_bn", "conv1_scale", eps=EPS_ENCODER, frozen=frozen
    )
    box.append(x)
    tap("relu1", x)
    x = L.max_pool(x, 3, 2, pad=1)

    nb_filter = INITIAL_FILTERS
    stage = 1
    for block_idx, nb_layers in enumerate(blocks[:-1]):
        stage = block_idx + 2
        x, nb_filter = _dense_block(
            ctx, x, stage, nb_layers, nb_filter, growth,
            frozen=frozen, dropout_rate=dropout_rate,
        )
        box.append(x)
        tap(f"concat_{stage}_{nb_layers}", x)
        x = _transition(ctx, x, stage, nb_filter, compression, frozen=frozen, dropout_rate=dropout_rate)
        nb_filter = int(nb_filter * compression)

    final_stage = stage + 1
    x, nb_filter = _dense_block(
        ctx, x, final_stage, blocks[-1], nb_filter, growth,
        frozen=frozen, dropout_rate=dropout_rate,
    )
    x = L.bn_scale_relu(
        ctx, x, f"conv{final_stage}_blk_bn", f"conv{final_stage}_blk_scale", eps=EPS_ENCODER, frozen=frozen
    )
    box.append(x)
    tap(f"relu{final_stage}_blk", x)
    return x, box


def _up_stage(ctx, x, idx, features, *, frozen, skip=None, dropout_rate=0.0):
    """UpSample2x -> [+skip] -> Conv3x3 -> [dropout] -> BN -> ReLU
    (reference densenet.py:70-94; skip adds denseunet.py:189-218)."""
    x = L.upsample_nearest(x, 2)
    if skip is not None:
        x = skip + x
    x = L.conv2d(ctx, x, f"conv_up{idx}", features, 3, padding="same", init="normal")
    if dropout_rate:
        x = L.dropout(ctx, x, dropout_rate)
    x = L.batch_norm(ctx, x, f"bn_up{idx}", eps=1e-3, frozen=frozen)
    return L.relu(x)


def apply(
    ctx: Ctx,
    x,
    *,
    reduction: float = 0.5,
    num_classes: int = 3,
    bn_frozen: bool = False,
    skip_connections: bool = False,
    decoder_dropout: float = 0.3,
    block_dropout: float = 0.0,
    blocks: tuple = ENC_BLOCKS,
    growth: int = GROWTH_RATE,
    decoder_widths: tuple = (768, 384, 96, 96, 64),
    taps: dict | None = None,
):
    """Forward pass. x: (B, H, W, 3), H and W divisible by 32.

    ``blocks``/``growth``/``decoder_widths`` default to the reference
    DenseNet-161 configuration; smaller presets are used by tests and scaling
    studies (the reference hard-codes the 161 layout, densenet.py:40-41).

    Returns (ac_up4 features, logits (B,H,W,num_classes)).
    """
    assert x.ndim == 4 and x.shape[1] % 32 == 0 and x.shape[2] % 32 == 0, x.shape
    feat, box = encoder(
        ctx, x, reduction=reduction, frozen=bn_frozen, dropout_rate=block_dropout,
        blocks=blocks, growth=growth, taps=taps,
    )

    skips = [None] * 5
    if skip_connections:
        # legacy decoder (denseunet.py:190-209): project box[3] with 1x1 conv,
        # add box[2]/box[1]/box[0] directly; up4 has no skip.
        skips[0] = L.conv2d(
            ctx, box[3], "line0", int(feat.shape[-1]), 1, padding="same", init="normal"
        )
        skips[1], skips[2], skips[3] = box[2], box[1], box[0]

    w0, w1, w2, w3, w4 = decoder_widths
    d = _up_stage(ctx, feat, 0, w0, frozen=bn_frozen, skip=skips[0])
    d = _up_stage(ctx, d, 1, w1, frozen=bn_frozen, skip=skips[1])
    d = _up_stage(ctx, d, 2, w2, frozen=bn_frozen, skip=skips[2])
    d = _up_stage(ctx, d, 3, w3, frozen=bn_frozen, skip=skips[3])
    d = _up_stage(ctx, d, 4, w4, frozen=bn_frozen, dropout_rate=decoder_dropout)

    logits = L.conv2d(ctx, d, "dense167classifer", num_classes, 1, padding="same", init="normal")
    if taps is not None:
        taps["ac_up4"] = d
        taps["dense167classifer"] = logits
    return d, logits


def init(rng, *, input_size=224, batch=1, **kwargs):
    """Create (params, state). FLOP-free (shape tracing only)."""
    example = jnp.zeros((batch, input_size, input_size, 3), jnp.float32)
    return module_init(apply, rng, example, **kwargs)
