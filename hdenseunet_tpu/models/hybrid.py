"""H-DenseUNet: hybrid 2D/3D assembly with HFF (hybrid feature fusion).

Re-implements the reference's hybrid models (hybridnet.py:379-423
`dense_rnn_net`, the 'end2end' arch, and denseunet3d.py:393-439 `denseunet_3d`,
the '3dpart' arch) the TPU way:

* The reference builds 8 overlapping 3-slice stacks with a chain of Lambda
  slices + concatenate(axis=0) graph ops with edge replication at the z
  boundaries (hybridnet.py:385-396), and re-assembles the 2D outputs with
  per-element batch slicing + transpose Lambdas that only work for batch 1
  (hybridnet.py:359-364 `slice2d`). Here both directions are single
  gather/reshape/transpose expressions inside one jit, valid for any batch.
* The 2D logits (3 class channels) are amplified x250 and concatenated with
  the raw volume as a 4-channel 3D input (hybridnet.py:409-411); the 3D branch output feature map
  is fused additively with the z-stacked 2D features, then
  Conv3D(64) -> Dropout -> BN -> ReLU -> 1x1x1 Conv(3) '2d3dclassifer'
  (hybridnet.py:414-419). Dropout is 0.3 for end2end (hybridnet.py:416) and
  0.1 for 3dpart (denseunet3d.py:431).

Freeze semantics (applied via BN freeze flags here + the optimizer trainable
mask in hdenseunet_tpu/train/optimizer.py):
* both archs: every 2D-branch BatchNorm uses frozen statistics
  (momentum=1/training=False in the reference, hybridnet.py:211 et al.);
* '3dpart': the entire 2D branch takes no gradient (denseunet3d.py:222-224);
* 'end2end': 2D convs and Scales train, 2D BN gamma/beta do not
  (hybridnet.py:210-212).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.module import Ctx, init as module_init
from . import denseunet2d, denseunet3d, dmajor
from . import layers as L
from . import zfold

LOGIT_AMPLIFICATION = 250.0  # reference hybridnet.py:409


def stack_adjacent_slices(vol):
    """(B, H, W, D, 1) volume -> (B*D, H, W, 3) pseudo-batch of 3-slice stacks.

    Stack k = [z_{k-1}, z_k, z_{k+1}] with edge replication (clamp), exactly the
    reference's Lambda-slice construction: first stack [z0,z0,z1]
    (hybridnet.py:385-387), interior [z_i,z_{i+1},z_{i+2}] (:388-390), last
    [z_{D-2},z_{D-1},z_{D-1}] (:391-395). Pseudo-batch order is z-major per
    batch element, matching the reference at B=1 and generalizing beyond it.
    """
    b, h, w, d = vol.shape[:4]
    x = vol[..., 0]  # (B,H,W,D)
    idx = jnp.arange(d)
    prev = x[..., jnp.maximum(idx - 1, 0)]
    nxt = x[..., jnp.minimum(idx + 1, d - 1)]
    stacks = jnp.stack([prev, x, nxt], axis=-1)  # (B,H,W,D,3)
    stacks = jnp.transpose(stacks, (0, 3, 1, 2, 4))  # (B,D,H,W,3)
    return stacks.reshape(b * d, h, w, 3)


def unstack_to_volume(y, batch, depth):
    """(B*D, H, W, C) -> (B, H, W, D, C), inverse of the pseudo-batch fold
    (reference `slice2d` transpose chain, hybridnet.py:359-364)."""
    bd, h, w, c = y.shape
    assert bd == batch * depth, (y.shape, batch, depth)
    y = y.reshape(batch, depth, h, w, c)
    return jnp.transpose(y, (0, 2, 3, 1, 4))


def apply(
    ctx: Ctx,
    vol,
    *,
    arch: str = "end2end",
    num_classes: int = 3,
    preset: str = "full",
    taps: dict | None = None,
    layout3d: str = "hwdc",
    stem_s2d: bool = False,
):
    """Forward pass. vol: (B, H, W, D, 1); H, W divisible by 32; D by 4.

    Returns logits (B, H, W, D, num_classes). ``taps``, when given a dict,
    collects fusion-boundary activations for parity audits. ``layout3d``
    selects the 3D branch's XLA activation layout; ``stem_s2d`` the
    space-to-depth 3D stem (both denseunet3d.apply knobs).
    """
    assert arch in ("end2end", "3dpart"), arch
    b, h, w, d = vol.shape[:4]

    stacks = stack_adjacent_slices(vol)
    feat2d, logits2d = denseunet2d.apply(
        ctx,
        stacks,
        reduction=0.5,
        bn_frozen=True,  # both hybrid archs freeze all 2D BN statistics
        decoder_dropout=0.0,  # no decoder dropout inside the hybrid 2D branch
        num_classes=num_classes,
        **denseunet2d.PRESETS[preset],
    )
    res2d = unstack_to_volume(logits2d, b, d)  # (B,H,W,D,3)
    fea2d = unstack_to_volume(feat2d, b, d)  # (B,H,W,D,64)

    input3d = jnp.concatenate([vol, res2d * LOGIT_AMPLIFICATION], axis=-1)
    dhwc = layout3d == "dhwc"
    feat3d, _ = denseunet3d.apply(
        ctx, input3d, reduction=0.5, layout=layout3d, stem_s2d=stem_s2d,
        unfold_outputs=not dhwc, **denseunet3d.PRESETS[preset]
    )

    logits = hff_head(
        ctx, feat3d, fea2d, arch=arch, num_classes=num_classes, layout=layout3d
    )
    if taps is not None:
        taps.update({
            "res2d": res2d, "fea2d": fea2d,
            "feat3d": dmajor.unfold(feat3d) if dhwc else feat3d,
            "2d3dclassifer": logits,
        })
    return logits


def hff_head(
    ctx: Ctx, feat3d, fea2d, *, arch: str, num_classes: int = 3,
    fold_z: bool = False, layout: str = "hwdc",
):
    """HFF fusion head (hybridnet.py:414-419): add -> Conv3D(64) -> Dropout
    (0.3 end2end / 0.1 3dpart) -> BN -> ReLU -> 1x1x1 Conv '2d3dclassifer'.

    Factored out so the shared-2D inference path (infer/device_pipeline.py)
    applies the identical head without rebuilding the full hybrid graph.
    ``fold_z`` executes the head's convs z-folded (models/zfold.py) — exact
    to float-summation order; off by default (measured slower at model
    level on v5e, see denseunet3d.apply docstring).

    ``layout='dhwc'`` runs the head d-major (models/dmajor.py): ``feat3d``
    must then ALREADY be (B,D,H,W,C) (denseunet3d.apply with
    unfold_outputs=False); ``fea2d`` stays canonical and is folded here.
    The head's fianl_conv is an up4-class op (512^2 x D8, 3^3, 64ch = 0.5
    lane occupancy) so the same sublane win applies.
    """
    assert not (fold_z and layout != "hwdc"), "fold_z and dhwc are exclusive"
    if layout == "dhwc":
        fused = feat3d + dmajor.fold(fea2d)  # HFF (hybridnet.py:414)
        f = dmajor.conv3d(ctx, fused, "fianl_conv", 64, 3, padding="same")  # [sic]
        f = L.dropout(ctx, f, 0.3 if arch == "end2end" else 0.1)
        f = L.batch_norm(ctx, f, "final_bn", eps=1e-3)
        f = L.relu(f)
        out = dmajor.conv3d(ctx, f, "2d3dclassifer", num_classes, 1, padding="same")
        return dmajor.unfold(out)
    if fold_z:
        f3, b, d = zfold.fold(feat3d)
        f2, _, _ = zfold.fold(fea2d)
        fused = f3 + f2  # HFF (hybridnet.py:414)
        f, _ = zfold.conv3d(ctx, fused, b, d, "fianl_conv", 64, 3, padding="same")  # [sic]
        f = L.dropout(ctx, f, 0.3 if arch == "end2end" else 0.1)
        f = L.batch_norm(ctx, f, "final_bn", eps=1e-3)
        f = L.relu(f)
        out, _ = zfold.conv3d(ctx, f, b, d, "2d3dclassifer", num_classes, 1, padding="same")
        return zfold.unfold(out, b, d)
    fused = feat3d + fea2d  # HFF (hybridnet.py:414)
    f = L.conv3d(ctx, fused, "fianl_conv", 64, 3, padding="same")  # [sic] reference name
    f = L.dropout(ctx, f, 0.3 if arch == "end2end" else 0.1)
    f = L.batch_norm(ctx, f, "final_bn", eps=1e-3)
    f = L.relu(f)
    return L.conv3d(ctx, f, "2d3dclassifer", num_classes, 1, padding="same")


def init(rng, *, input_size=224, input_cols=8, batch=1, **kwargs):
    example = jnp.zeros((batch, input_size, input_size, input_cols, 1), jnp.float32)
    return module_init(apply, rng, example, **kwargs)


# ---------------------------------------------------------------------------
# trainable-parameter masks (staged freezing)
# ---------------------------------------------------------------------------


def is_2d_name(name: str) -> bool:
    """Layer names belonging to the 2D branch of the hybrid graph."""
    if name.startswith("3d"):
        return False
    return not name in ("fianl_conv", "final_bn", "2d3dclassifer")


def trainable_predicate(arch: str):
    """Return f(layer_name, leaf_name) -> bool for the given training stage.

    * '2d'      — everything trains (train_2ddense.py stage);
    * '3dpart'  — only the 3D branch + HFF head train (denseunet3d.py:222-224:
                  the whole 2D branch is `trainable=False`);
    * 'end2end' — 2D BN gamma/beta frozen, everything else trains
                  (hybridnet.py:210-212: convs/Scales `trainable=True`, BNs
                  `trainable=False`).
    """
    if arch == "2d":
        return lambda name, leaf: True
    if arch == "3dpart":
        return lambda name, leaf: not is_2d_name(name)
    if arch == "end2end":
        def pred(name, leaf):
            if not is_2d_name(name):
                return True
            return not (name.endswith("_bn") or name.startswith("bn_up"))
        return pred
    raise ValueError(f"unknown arch {arch!r}")
