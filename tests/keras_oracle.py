"""Independent pure-NumPy oracle of the vendored-Keras forward semantics.

This module re-derives, *from the reference sources only*, the exact math the
vendored Keras 2.0.8 stack performs at inference time, using a completely
different implementation substrate (NumPy im2col + matmul — no JAX, no XLA,
no code shared with `hdenseunet_tpu`):

* conv = ZeroPaddingND + VALID convolution / TF 'SAME' convolution
  (reference Keras-2.0.8/keras/backend/tensorflow_backend.py:3128 conv2d,
  :3277 conv3d; ZeroPadding2D/3D layers convolutional.py:1486/:1596);
* BatchNormalization inference path:
  `(x - moving_mean) / sqrt(moving_var + eps) * gamma + beta`
  (normalization.py:171-188 -> K.batch_normalization -> tf.nn.batch_normalization,
  tensorflow_backend.py:1667);
* Scale: per-channel `gamma * x + beta` (lib/custom_layers.py:63-69);
* MaxPooling = ZeroPadding(+0) + VALID max pool (pooling.py:166/:335);
* AveragePooling = VALID mean pool (pooling.py:221/:385);
* UpSampling = nearest-neighbor resize == repeat
  (tensorflow_backend.py:1739 resize_images / :1776 resize_volumes).

On top of the ops, the model graphs are transcribed line-by-line from the
reference model files (densenet.py:10-193, denseunet3d.py:18-190 and
:393-439, hybridnet.py:355-423), consuming the same flat
``{layer: {kernel|gamma|...: array}}`` pytree the TPU framework uses, so a
single set of (randomized) weights can be pushed through both stacks and
compared tap-by-tap (tests/test_keras_oracle.py; SURVEY.md §7 step 3).

Everything runs in float32, matching the TF1 execution dtype.
"""
from __future__ import annotations

import numpy as np
from numpy.lib.stride_tricks import sliding_window_view

F32 = np.float32

# ---------------------------------------------------------------------------
# backend ops (tensorflow_backend.py semantics, NumPy substrate)
# ---------------------------------------------------------------------------


def _tup(v, n):
    return (v,) * n if isinstance(v, int) else tuple(v)


def _same_pads(size, k, s):
    """TF 'SAME' pad split: extra pixel goes to the end (bottom/right)."""
    total = max(k - s, 0) if size % s == 0 else max(k - (size % s), 0)
    return (total // 2, total - total // 2)


def _dilate_kernel(w, dilation, nd):
    """Insert dilation-1 zeros between kernel taps (exact atrous conv)."""
    if all(d == 1 for d in dilation):
        return w
    k = w.shape[:nd]
    keff = tuple(k[i] + (k[i] - 1) * (dilation[i] - 1) for i in range(nd))
    out = np.zeros(keff + w.shape[nd:], w.dtype)
    out[tuple(slice(None, None, dilation[i]) for i in range(nd))] = w
    return out


def conv(x, w, b=None, *, stride=1, padding=0, dilation=1):
    """N-d channels-last convolution (N inferred from x).

    padding: int/tuple = symmetric explicit zero-pad (ZeroPaddingND + VALID
    conv, densenet.py:44/:131); 'same' = TF SAME rule (decoder convs,
    densenet.py:71 et al.); 'valid' = no pad (1x1 bottlenecks).
    dilation: atrous rate (dilated_resnet convs, hybridnet.py:473 et al.) —
    realized by zero-dilating the kernel, so the 'same' pad rule sees the
    effective kernel size exactly as Keras/TF does.
    """
    nd = x.ndim - 2
    w = _dilate_kernel(w, _tup(dilation, nd), nd)
    k = w.shape[:nd]
    stride = _tup(stride, nd)
    if padding == "same":
        pads = [_same_pads(x.shape[1 + i], k[i], stride[i]) for i in range(nd)]
    elif padding == "valid":
        pads = [(0, 0)] * nd
    else:
        pads = [(p, p) for p in _tup(padding, nd)]
    x = np.pad(x, [(0, 0)] + pads + [(0, 0)]).astype(F32)

    # im2col: window view is (B, *out_full, Cin, *k); stride-slice the spatial
    # dims, move Cin behind the kernel dims so the flattened patch ordering
    # (k0, k1, ..., Cin) matches w.reshape(-1, Cout)'s (HWIO / DHWIO) layout.
    v = sliding_window_view(x, k, axis=tuple(range(1, 1 + nd)))
    v = v[(slice(None),) + tuple(slice(None, None, s) for s in stride)]
    v = np.moveaxis(v, 1 + nd, -1)
    out_spatial = v.shape[1 : 1 + nd]
    cols = v.reshape(x.shape[0], *out_spatial, -1)
    y = cols @ w.reshape(-1, w.shape[-1]).astype(F32)
    if b is not None:
        y = y + b.astype(F32)
    return y.astype(F32)


def batch_norm(x, gamma, beta, mean, var, eps):
    """Inference BN (normalization.py:171-188 / tensorflow_backend.py:1667)."""
    inv = 1.0 / np.sqrt(var.astype(F32) + F32(eps))
    return ((x - mean.astype(F32)) * inv * gamma.astype(F32) + beta.astype(F32)).astype(F32)


def scale(x, gamma, beta):
    """Per-channel affine (lib/custom_layers.py:63-69)."""
    return (x * gamma.astype(F32) + beta.astype(F32)).astype(F32)


def relu(x):
    return np.maximum(x, 0)


def _pool_view(x, window, stride):
    nd = x.ndim - 2
    window, stride = _tup(window, nd), _tup(stride, nd)
    v = sliding_window_view(x, window, axis=tuple(range(1, 1 + nd)))
    return v[(slice(None),) + tuple(slice(None, None, s) for s in stride)], nd


def max_pool(x, window, stride, pad=0):
    """ZeroPaddingND (zeros!) + VALID max pool (densenet.py:50-51)."""
    nd = x.ndim - 2
    pads = _tup(pad, nd)
    if any(pads):
        x = np.pad(x, [(0, 0)] + [(p, p) for p in pads] + [(0, 0)])
    v, nd = _pool_view(x, window, stride)
    return v.max(axis=tuple(range(-nd, 0)))


def avg_pool(x, window, stride):
    v, nd = _pool_view(x, window, stride)
    return v.mean(axis=tuple(range(-nd, 0)), dtype=F32)


def upsample(x, factors):
    """Nearest-neighbor UpSamplingND (tensorflow_backend.py:1739/:1776)."""
    for axis, f in enumerate(_tup(factors, x.ndim - 2), start=1):
        if f != 1:
            x = np.repeat(x, f, axis=axis)
    return x


# ---------------------------------------------------------------------------
# parameter access
# ---------------------------------------------------------------------------


class P:
    """Flat {layer: {leaf: array}} pytree accessor (numpy-converting)."""

    def __init__(self, params, state):
        self.params, self.state = params, state

    def conv(self, x, name, *, stride=1, padding=0, dilation=1):
        leaves = self.params[name]
        w = np.asarray(leaves["kernel"], F32)
        b = np.asarray(leaves["bias"], F32) if "bias" in leaves else None
        return conv(x, w, b, stride=stride, padding=padding, dilation=dilation)

    def bn(self, x, name, eps):
        g = np.asarray(self.params[name]["gamma"], F32)
        b = np.asarray(self.params[name]["beta"], F32)
        m = np.asarray(self.state[name]["moving_mean"], F32)
        v = np.asarray(self.state[name]["moving_variance"], F32)
        return batch_norm(x, g, b, m, v, eps)

    def scale(self, x, name):
        return scale(
            x,
            np.asarray(self.params[name]["gamma"], F32),
            np.asarray(self.params[name]["beta"], F32),
        )


# ---------------------------------------------------------------------------
# 2D DenseUNet-167 graph (transcribed from reference densenet.py:10-193)
# ---------------------------------------------------------------------------

EPS = 1.1e-5  # densenet.py:25
BN_DEFAULT_EPS = 1e-3  # Keras 2.0.8 BatchNormalization default (normalization.py:12)


def _conv_block_2d(p, x, stage, branch, growth):
    """densenet.py:103-137 (inference: dropout off)."""
    base = f"conv{stage}_{branch}"
    x = p.bn(x, base + "_x1_bn", EPS)
    x = p.scale(x, base + "_x1_scale")
    x = relu(x)
    x = p.conv(x, base + "_x1", padding="valid")
    x = p.bn(x, base + "_x2_bn", EPS)
    x = p.scale(x, base + "_x2_scale")
    x = relu(x)
    return p.conv(x, base + "_x2", padding=1)


def dense_unet_2d(
    params,
    state,
    x,
    *,
    blocks=(6, 12, 36, 24),
    growth=48,
    reduction=0.5,
    decoder_widths=(768, 384, 96, 96, 64),
    num_classes=3,
    skip_connections=False,
):
    """Full inference forward; returns {tap_name: activation}.

    Tap names match the reference graph layers recorded by
    hdenseunet_tpu/weights/parity.py (relu1, concat_{s}_{last}, relu5_blk,
    ac_up4, dense167classifer).

    ``skip_connections=True`` transcribes the LEGACY decoder
    (denseunet.py:188-218): 1x1 Conv 'line0' on box[3] added to up0, and
    box[2]/box[1]/box[0] added to up1/up2/up3 (up4 has no skip).
    """
    p = P(params, state)
    taps = {}
    compression = 1.0 - reduction
    box = []  # [relu1, concat_2, concat_3, concat_4] (denseunet.py:168-177)

    x = np.asarray(x, F32)
    x = p.conv(x, "conv1", stride=2, padding=3)  # densenet.py:44-45
    x = p.bn(x, "conv1_bn", EPS)
    x = p.scale(x, "conv1_scale")
    x = relu(x)
    taps["relu1"] = x
    box.append(x)
    x = max_pool(x, 3, 2, pad=1)  # densenet.py:50-51

    stage = 1
    for block_idx, nb_layers in enumerate(blocks[:-1]):
        stage = block_idx + 2
        for i in range(nb_layers):  # dense_block, densenet.py:169-193
            out = _conv_block_2d(p, x, stage, i + 1, growth)
            x = np.concatenate([x, out], axis=-1)
        taps[f"concat_{stage}_{nb_layers}"] = x
        box.append(x)
        # transition_block, densenet.py:140-166
        base = f"conv{stage}_blk"
        t = p.bn(x, base + "_bn", EPS)
        t = p.scale(t, base + "_scale")
        t = relu(t)
        t = p.conv(t, base, padding="valid")
        x = avg_pool(t, 2, 2)

    final = stage + 1
    for i in range(blocks[-1]):
        out = _conv_block_2d(p, x, final, i + 1, growth)
        x = np.concatenate([x, out], axis=-1)
    x = p.bn(x, f"conv{final}_blk_bn", EPS)
    x = p.scale(x, f"conv{final}_blk_scale")
    x = relu(x)
    taps[f"relu{final}_blk"] = x

    # decoder (densenet.py:70-94); dropout before bn_up4 is inference-off.
    # Legacy skip adds: denseunet.py:189-191 (line0 + up0), :197/:203/:209.
    skips = [None] * 5
    if skip_connections:
        skips[0] = p.conv(box[3], "line0", padding="same")
        skips[1], skips[2], skips[3] = box[2], box[1], box[0]
    for idx in range(5):
        x = upsample(x, 2)
        if skips[idx] is not None:
            x = skips[idx] + x
        x = p.conv(x, f"conv_up{idx}", padding="same")
        x = p.bn(x, f"bn_up{idx}", BN_DEFAULT_EPS)
        x = relu(x)
    taps["ac_up4"] = x
    taps["dense167classifer"] = p.conv(x, "dense167classifer", padding="same")
    return taps


# ---------------------------------------------------------------------------
# 3D DenseNet branch graph (transcribed from reference denseunet3d.py:18-190)
# ---------------------------------------------------------------------------


def _conv_block_3d(p, x, stage, branch):
    base = f"3dconv{stage}_{branch}"
    x = p.bn(x, base + "_x1_bn", EPS)
    x = p.scale(x, base + "_x1_scale")
    x = relu(x)
    x = p.conv(x, base + "_x1", padding="valid")
    x = p.bn(x, base + "_x2_bn", EPS)
    x = p.scale(x, base + "_x2_scale")
    x = relu(x)
    return p.conv(x, base + "_x2", padding=1)


def dense_net_3d(
    params,
    state,
    x,
    *,
    blocks=(3, 4, 12, 8),
    growth=32,
    reduction=0.5,
    decoder_widths=(504, 224, 192, 96, 64),
    num_classes=3,
):
    """3D branch forward; returns {tap: act} incl. '3dac_up4' features and
    '3dclassifer' logits (denseunet3d.py:105-190)."""
    p = P(params, state)
    taps = {}

    x = np.asarray(x, F32)
    x = p.conv(x, "3dconv1", stride=2, padding=3)  # denseunet3d.py:129-130
    x = p.bn(x, "3dconv1_bn", EPS)
    x = p.scale(x, "3dconv1_scale")
    x = relu(x)
    x = max_pool(x, 3, 2, pad=1)

    stage = 1
    for block_idx, nb_layers in enumerate(blocks[:-1]):
        stage = block_idx + 2
        for i in range(nb_layers):
            out = _conv_block_3d(p, x, stage, i + 1)
            x = np.concatenate([x, out], axis=-1)
        taps[f"3dconcat_{stage}_{nb_layers}"] = x
        base = f"3dconv{stage}_blk"  # transition, denseunet3d.py:78-104
        t = p.bn(x, base + "_bn", EPS)
        t = p.scale(t, base + "_scale")
        t = relu(t)
        t = p.conv(t, base, padding="valid")
        x = avg_pool(t, (2, 2, 1), (2, 2, 1))  # z-preserving

    final = stage + 1
    for i in range(blocks[-1]):
        out = _conv_block_3d(p, x, final, i + 1)
        x = np.concatenate([x, out], axis=-1)
    x = p.bn(x, f"3dconv{final}_blk_bn", EPS)
    x = p.scale(x, f"3dconv{final}_blk_scale")
    x = relu(x)
    taps[f"3drelu{final}_blk"] = x

    # decoder: three (2,2,1) then two (2,2,2) upsamples (denseunet3d.py:158-186)
    ups = [(2, 2, 1), (2, 2, 1), (2, 2, 1), (2, 2, 2), (2, 2, 2)]
    for idx in range(5):
        x = upsample(x, ups[idx])
        x = p.conv(x, f"3dconv_up{idx}", padding="same")
        x = p.bn(x, f"3dbn_up{idx}", BN_DEFAULT_EPS)
        x = relu(x)
    taps["3dac_up4"] = x
    taps["3dclassifer"] = p.conv(x, "3dclassifer", padding="same")
    return taps


# ---------------------------------------------------------------------------
# hybrid H-DenseUNet graph (transcribed from reference hybridnet.py:355-423)
# ---------------------------------------------------------------------------


def hybrid(
    params,
    state,
    vol,
    *,
    arch="end2end",
    preset_2d=None,
    preset_3d=None,
    num_classes=3,
):
    """Hybrid forward on (B,H,W,D,1); returns taps incl. final logits.

    Slice stacking per hybridnet.py:385-396 ([z0,z0,z1] ... [zD-2,zD-1,zD-1]
    folded into the batch axis), x250 logit amplification + raw-volume concat
    (:409-411), HFF add -> Conv3D(64) -> BN -> ReLU -> '2d3dclassifer'
    (:414-419; dropout inference-off).
    """
    p = P(params, state)
    vol = np.asarray(vol, F32)
    b, h, w, d = vol.shape[:4]
    x = vol[..., 0]

    # the reference's Lambda-slice stack construction, vectorized
    idx = np.arange(d)
    stacks = np.stack(
        [x[..., np.maximum(idx - 1, 0)], x, x[..., np.minimum(idx + 1, d - 1)]],
        axis=-1,
    )  # (B,H,W,D,3)
    stacks = np.transpose(stacks, (0, 3, 1, 2, 4)).reshape(b * d, h, w, 3)

    taps2d = dense_unet_2d(params, state, stacks, **(preset_2d or {}))
    logits2d = taps2d["dense167classifer"]
    feat2d = taps2d["ac_up4"]

    def unstack(y):  # inverse fold (hybridnet.py:359-364 slice2d)
        return np.transpose(y.reshape(b, d, h, w, -1), (0, 2, 3, 1, 4))

    res2d = unstack(logits2d)
    fea2d = unstack(feat2d)
    taps = {"res2d": res2d, "fea2d": fea2d}

    input3d = np.concatenate([vol, res2d * F32(250.0)], axis=-1)  # :409-411
    taps3d = dense_net_3d(params, state, input3d, **(preset_3d or {}))
    feat3d = taps3d["3dac_up4"]
    taps["feat3d"] = feat3d

    f = feat3d + fea2d  # HFF add (:414)
    f = p.conv(f, "fianl_conv", padding="same")  # [sic] reference layer name
    f = p.bn(f, "final_bn", BN_DEFAULT_EPS)
    f = relu(f)
    taps["2d3dclassifer"] = p.conv(f, "2d3dclassifer", padding="same")
    return taps


# ---------------------------------------------------------------------------
# dilated residual encoder-decoder (transcribed from hybridnet.py:426-585)
# ---------------------------------------------------------------------------


def dilated_resnet(params, state, x, *, num_classes=2):
    """`dilated_resnet` forward (hybridnet.py:426-585): 3x3x3 stem, three
    (2,2,1)-pooled residual stages, dilation-2 residual blocks at the two
    deepest scales, and a decoder of (2,2,1) upsamples merged with BN'd 1x1
    projections of the skips. The reference leaves every layer auto-named; the
    deterministic `dr_*` names match hdenseunet_tpu/models/dilated_resnet.py.
    All adds follow the reference ordering: add([BN_shortcut, main]) -> relu
    for residual blocks, add([identity, BN_main]) -> relu for dilated blocks,
    add([BN_proj, upsample]) with NO relu for decoder merges.
    """
    p = P(params, state)

    def conv3(x, name, dilation=1):
        return p.conv(x, name, padding="same", dilation=dilation)

    def res_block(x, name):
        y = conv3(x, f"{name}_c1")
        y = relu(p.bn(y, f"{name}_bn1", BN_DEFAULT_EPS))
        y = conv3(y, f"{name}_c2")
        y = p.bn(y, f"{name}_bn2", BN_DEFAULT_EPS)
        s = p.conv(x, f"{name}_proj", padding="same")
        s = p.bn(s, f"{name}_bnp", BN_DEFAULT_EPS)
        return relu(s + y)

    def dilated_block(x, name):
        y = conv3(x, f"{name}_c1", dilation=2)
        y = relu(p.bn(y, f"{name}_bn1", BN_DEFAULT_EPS))
        y = conv3(y, f"{name}_c2", dilation=2)
        y = p.bn(y, f"{name}_bn2", BN_DEFAULT_EPS)
        return relu(x + y)

    def up_merge(x_up, x_skip, name):
        up = upsample(x_up, (2, 2, 1))
        pr = p.conv(x_skip, f"{name}_proj", padding="same")
        pr = p.bn(pr, f"{name}_bn", BN_DEFAULT_EPS)
        return pr + up

    x = np.asarray(x, F32)
    c1 = conv3(x, "dr_stem")
    ac0 = relu(p.bn(c1, "dr_stem_bn", BN_DEFAULT_EPS))
    p1 = max_pool(ac0, (2, 2, 1), (2, 2, 1))

    res1 = res_block(p1, "dr_res1")
    p2 = max_pool(res1, (2, 2, 1), (2, 2, 1))
    res2 = res_block(p2, "dr_res2")
    p3 = max_pool(res2, (2, 2, 1), (2, 2, 1))
    res3 = res_block(p3, "dr_res3")
    delres = dilated_block(res3, "dr_dil1")

    p4 = max_pool(delres, (2, 2, 1), (2, 2, 1))
    res3_4 = res_block(p4, "dr_res4")
    delres2 = dilated_block(res3_4, "dr_dil2")

    sum4 = up_merge(delres2, delres, "dr_up0")
    res4_1 = res_block(sum4, "dr_res5")
    delres3 = dilated_block(res4_1, "dr_dil3")

    sum4_1 = up_merge(delres3, res2, "dr_up1")
    res4 = res_block(sum4_1, "dr_res6")
    sum6 = up_merge(res4, res1, "dr_up2")
    res5 = res_block(sum6, "dr_res7")
    sum8 = up_merge(res5, ac0, "dr_up3")
    res6 = res_block(sum8, "dr_res8")
    return p.conv(res6, "dr_head", padding="same")
