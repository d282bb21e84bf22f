"""Model zoo: shape, wiring, and architecture-constant checks.

Verifies the re-implemented graphs against the reference's derivable facts:
channel progressions of DenseNet-161 (2D) / the 3D DenseNet, decoder widths,
head names, and the hybrid fold/unfold round trip.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hdenseunet_tpu.core.module import Ctx, param_count
from hdenseunet_tpu.models import denseunet2d, denseunet3d, hybrid, dilated_resnet


@pytest.fixture(scope="module")
def params2d():
    return denseunet2d.init(jax.random.key(0), input_size=64)


def test_denseunet2d_shapes_and_channels(params2d):
    params, state = params2d
    # encoder channel progression (DenseNet-161, growth 48, compression .5)
    assert params["conv1"]["kernel"].shape == (7, 7, 3, 96)
    assert params["conv2_1_x1"]["kernel"].shape == (1, 1, 96, 192)
    assert params["conv2_blk"]["kernel"].shape == (1, 1, 384, 192)
    assert params["conv3_blk"]["kernel"].shape == (1, 1, 768, 384)
    assert params["conv4_blk"]["kernel"].shape == (1, 1, 2112, 1056)
    assert params["conv5_blk_scale"]["gamma"].shape == (2208,)
    # decoder widths (reference densenet.py:70-96)
    assert params["conv_up0"]["kernel"].shape == (3, 3, 2208, 768)
    assert params["conv_up4"]["kernel"].shape == (3, 3, 96, 64)
    assert params["dense167classifer"]["kernel"].shape == (1, 1, 64, 3)
    # encoder convs have no bias; decoder convs do
    assert "bias" not in params["conv1"]
    assert "bias" in params["conv_up0"]

    x = jnp.ones((2, 64, 64, 3))
    feat, logits = denseunet2d.apply(Ctx(params, state), x)
    assert feat.shape == (2, 64, 64, 64)
    assert logits.shape == (2, 64, 64, 3)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_denseunet2d_param_count_is_167_style(params2d):
    params, _ = params2d
    n_conv = sum(1 for k in params if "kernel" in params[k])
    # DenseNet-161 encoder: 1 stem + 2*(6+12+36+24) bottleneck/3x3 + 3 transitions
    # = 160 convs; decoder: 5 conv_up + classifier = 6 -> 166 conv layers total.
    assert n_conv == 166
    assert param_count(params) > 4e7  # ~45M


def test_denseunet2d_legacy_skip_variant():
    params, state = denseunet2d.init(
        jax.random.key(0), input_size=64, skip_connections=True
    )
    assert params["line0"]["kernel"].shape == (1, 1, 2112, 2208)
    x = jnp.ones((1, 64, 64, 3))
    feat, logits = denseunet2d.apply(Ctx(params, state), x, skip_connections=True)
    assert logits.shape == (1, 64, 64, 3)


def test_denseunet2d_train_mode_updates_bn_state(params2d):
    params, state = params2d
    ctx = Ctx(params, state, train=True, rng=jax.random.key(1))
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 64, 64, 3)), jnp.float32)
    denseunet2d.apply(ctx, x)
    assert "conv1_bn" in ctx.new_state
    assert "bn_up4" in ctx.new_state
    # frozen mode produces no updates
    ctx_f = Ctx(params, state, train=True, rng=jax.random.key(1))
    denseunet2d.apply(ctx_f, x, bn_frozen=True, decoder_dropout=0.0)
    assert ctx_f.new_state == {}


@pytest.fixture(scope="module")
def params3d():
    return denseunet3d.init(jax.random.key(0), input_size=32, input_cols=4, channels=2)


def test_denseunet3d_shapes_and_channels(params3d):
    params, state = params3d
    assert params["3dconv1"]["kernel"].shape == (7, 7, 7, 2, 96)
    # channel progression: growth 32, blocks (3,4,12,8), compression .5
    assert params["3dconv2_blk"]["kernel"].shape == (1, 1, 1, 192, 96)
    assert params["3dconv3_blk"]["kernel"].shape == (1, 1, 1, 224, 112)
    assert params["3dconv4_blk"]["kernel"].shape == (1, 1, 1, 496, 248)
    assert params["3dconv_up0"]["kernel"].shape == (3, 3, 3, 504, 504)
    assert params["3dclassifer"]["kernel"].shape == (1, 1, 1, 64, 3)

    x = jnp.ones((1, 32, 32, 4, 2))
    feat, logits = denseunet3d.apply(Ctx(params, state), x)
    assert feat.shape == (1, 32, 32, 4, 64)
    assert logits.shape == (1, 32, 32, 4, 3)


def test_hybrid_stack_unstack_roundtrip():
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.standard_normal((2, 8, 8, 4, 1)), jnp.float32)
    stacks = hybrid.stack_adjacent_slices(vol)
    assert stacks.shape == (8, 8, 8, 3)
    v = np.asarray(vol)[..., 0]
    s = np.asarray(stacks)
    # stack 0 of batch 0: [z0, z0, z1] (edge replication, hybridnet.py:385-387)
    np.testing.assert_array_equal(s[0, :, :, 0], v[0, :, :, 0])
    np.testing.assert_array_equal(s[0, :, :, 1], v[0, :, :, 0])
    np.testing.assert_array_equal(s[0, :, :, 2], v[0, :, :, 1])
    # interior stack 2: [z1, z2, z3]
    np.testing.assert_array_equal(s[2, :, :, 0], v[0, :, :, 1])
    np.testing.assert_array_equal(s[2, :, :, 2], v[0, :, :, 3])
    # last stack of batch 1: [z2, z3, z3]
    np.testing.assert_array_equal(s[7, :, :, 0], v[1, :, :, 2])
    np.testing.assert_array_equal(s[7, :, :, 2], v[1, :, :, 3])
    # unstack inverts the center channel
    back = hybrid.unstack_to_volume(stacks, 2, 4)
    np.testing.assert_array_equal(np.asarray(back)[..., 1], v)


@pytest.mark.slow
def test_hybrid_forward():
    params, state = hybrid.init(jax.random.key(0), input_size=32, input_cols=4)
    # contains both branches + HFF head
    assert "conv1" in params and "3dconv1" in params
    assert "fianl_conv" in params and "2d3dclassifer" in params
    vol = jnp.ones((1, 32, 32, 4, 1))
    logits = hybrid.apply(Ctx(params, state), vol)
    assert logits.shape == (1, 32, 32, 4, 3)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_trainable_predicates():
    p2d = hybrid.trainable_predicate("2d")
    assert p2d("conv1", "kernel") and p2d("bn_up0", "gamma")

    p3 = hybrid.trainable_predicate("3dpart")
    assert not p3("conv1", "kernel")
    assert not p3("conv_up0", "kernel")
    assert not p3("dense167classifer", "kernel")
    assert p3("3dconv1", "kernel")
    assert p3("fianl_conv", "kernel") and p3("2d3dclassifer", "kernel")

    pe = hybrid.trainable_predicate("end2end")
    assert pe("conv1", "kernel")  # 2D convs train (hybridnet.py:210)
    assert pe("conv1_scale", "gamma")  # Scales train (:212)
    assert not pe("conv1_bn", "gamma")  # BNs frozen (:211)
    assert not pe("bn_up0", "gamma")  # decoder BNs frozen (:237)
    assert pe("3dbn_up0", "gamma")  # 3D BNs train
    assert pe("final_bn", "gamma")


def test_dilated_resnet_forward():
    params, state = dilated_resnet.init(
        jax.random.key(0), input_size=32, input_cols=4
    )
    x = jnp.ones((1, 32, 32, 4, 1))
    y = dilated_resnet.apply(Ctx(params, state), x)
    assert y.shape == (1, 32, 32, 4, 2)


# ---------------------------------------------------------------------------
# z-folded execution (models/zfold.py): exact vs the direct 3D path
# ---------------------------------------------------------------------------


def test_zfold_conv3d_matches_direct():
    """Tap-packed folded convs == layers.conv3d for every kernel/stride the
    3D graph uses (1x1x1, 3x3x3 s1 p1, 3x3x3 SAME, 7x7x7 s2 p3)."""
    from hdenseunet_tpu.models import layers as L
    from hdenseunet_tpu.models import zfold

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (2, 16, 16, 8, 6)).astype(np.float32))
    xf, b, d = zfold.fold(x)

    for kernel, stride, padding, feats in [
        (1, 1, "valid", 10),
        (3, 1, 1, 5),
        (3, 1, "same", 7),
        (7, 2, 3, 9),
    ]:
        params = {}

        class _Cap:
            compute_dtype = jnp.float32
            flops = None

            def param(self, name, leaf, shape, init):
                key = (name, leaf)
                if key not in params:
                    params[key] = jnp.asarray(
                        rng.normal(0, 0.3, shape).astype(np.float32)
                    )
                return params[key]

        ctx = _Cap()
        ref = L.conv3d(ctx, x, "w", feats, kernel, stride=stride, padding=padding)
        got_f, d_out = zfold.conv3d(
            ctx, xf, b, d, "w", feats, kernel, stride=stride, padding=padding
        )
        got = zfold.unfold(got_f, b, d_out)
        assert got.shape == ref.shape, (kernel, stride, padding, got.shape, ref.shape)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5,
            err_msg=f"kernel={kernel} stride={stride} padding={padding}",
        )

        # memory-bounded window-by-window path (lax.map) must agree too
        orig = zfold._MAX_PACK_BYTES
        try:
            zfold._MAX_PACK_BYTES = 1
            got_c, d_out_c = zfold.conv3d(
                ctx, xf, b, d, "w", feats, kernel, stride=stride, padding=padding
            )
        finally:
            zfold._MAX_PACK_BYTES = orig
        assert d_out_c == d_out
        np.testing.assert_allclose(
            np.asarray(zfold.unfold(got_c, b, d_out_c)), np.asarray(ref),
            atol=1e-5, rtol=1e-5,
            err_msg=f"chunked kernel={kernel} stride={stride} padding={padding}",
        )


def test_zfold_conv3d_batch1_bounded_and_tuple_padding():
    """The memory bound must hold for b == 1 too (z-chunked path, ADVICE r2)
    and zfold.conv3d must accept the same tuple-padding grammar as
    layers.conv3d."""
    from hdenseunet_tpu.models import layers as L
    from hdenseunet_tpu.models import zfold

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (1, 12, 12, 10, 4)).astype(np.float32))
    xf, b, d = zfold.fold(x)

    for kernel, stride, padding, feats in [
        (3, 1, 1, 5),
        (3, 1, (1, 1, 1), 5),  # tuple padding — previously a TypeError
        (7, 2, (3, 3, 3), 6),
        (3, (1, 1, 2), "same", 5),
    ]:
        params = {}

        class _Cap:
            compute_dtype = jnp.float32
            flops = None

            def param(self, name, leaf, shape, init):
                key = (name, leaf)
                if key not in params:
                    params[key] = jnp.asarray(
                        rng.normal(0, 0.3, shape).astype(np.float32)
                    )
                return params[key]

        ctx = _Cap()
        ref = L.conv3d(ctx, x, "w", feats, kernel, stride=stride, padding=padding)
        orig = zfold._MAX_PACK_BYTES
        try:
            zfold._MAX_PACK_BYTES = 1  # force the bounded (z-chunked) path
            got_f, d_out = zfold.conv3d(
                ctx, xf, b, d, "w", feats, kernel, stride=stride, padding=padding
            )
        finally:
            zfold._MAX_PACK_BYTES = orig
        got = zfold.unfold(got_f, b, d_out)
        assert got.shape == ref.shape, (kernel, stride, padding, got.shape, ref.shape)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5,
            err_msg=f"b=1 kernel={kernel} stride={stride} padding={padding}",
        )


def test_zfold_pool_and_upsample_match_direct():
    from hdenseunet_tpu.models import layers as L
    from hdenseunet_tpu.models import zfold

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (2, 16, 16, 8, 3)).astype(np.float32))
    xf, b, d = zfold.fold(x)

    ref = L.max_pool(x, 3, 2, pad=1)
    got, d_out = zfold.max_pool(xf, b, d, 3, 2, pad=1)
    np.testing.assert_allclose(
        np.asarray(zfold.unfold(got, b, d_out)), np.asarray(ref), atol=1e-6
    )

    ref = L.avg_pool(x, (2, 2, 1), (2, 2, 1))
    got, d_out = zfold.avg_pool(xf, b, d, (2, 2, 1), (2, 2, 1))
    np.testing.assert_allclose(
        np.asarray(zfold.unfold(got, b, d_out)), np.asarray(ref), atol=1e-6
    )

    for f in [(2, 2, 1), (2, 2, 2)]:
        ref = L.upsample_nearest(x, f)
        got, d_out = zfold.upsample_nearest(xf, b, d, f)
        np.testing.assert_allclose(
            np.asarray(zfold.unfold(got, b, d_out)), np.asarray(ref), atol=0
        )


def test_denseunet3d_fold_z_matches_direct():
    """Full 3D graph: fold_z=True (default) == fold_z=False to f32
    reassociation tolerance, inference AND train mode incl. BN state."""
    kw = denseunet3d.PRESETS["tiny"]
    params, bn = denseunet3d.init(
        jax.random.key(0), input_size=32, input_cols=8, channels=4, **kw
    )
    x = jnp.asarray(
        np.random.default_rng(2).normal(0, 1, (2, 32, 32, 8, 4)).astype(np.float32)
    )

    ctx_a = Ctx(params, bn, train=False, compute_dtype=jnp.float32)
    f_a, l_a = denseunet3d.apply(ctx_a, x, fold_z=False, **kw)
    ctx_b = Ctx(params, bn, train=False, compute_dtype=jnp.float32)
    f_b, l_b = denseunet3d.apply(ctx_b, x, fold_z=True, **kw)
    np.testing.assert_allclose(np.asarray(f_a), np.asarray(f_b), atol=1e-5)
    np.testing.assert_allclose(np.asarray(l_a), np.asarray(l_b), atol=1e-5)

    # train mode: live BN statistics must update identically (same element set)
    ctx_a = Ctx(params, bn, train=True, compute_dtype=jnp.float32, rng=jax.random.key(3))
    _ = denseunet3d.apply(ctx_a, x, fold_z=False, **kw)
    ctx_b = Ctx(params, bn, train=True, compute_dtype=jnp.float32, rng=jax.random.key(3))
    _ = denseunet3d.apply(ctx_b, x, fold_z=True, **kw)
    sa, sb = ctx_a.new_state, ctx_b.new_state
    assert set(sa) == set(sb)
    for layer in sa:
        for leaf in sa[layer]:
            np.testing.assert_allclose(
                np.asarray(sa[layer][leaf]), np.asarray(sb[layer][leaf]),
                atol=1e-5, err_msg=f"{layer}/{leaf}",
            )


def test_denseunet3d_dmajor_matches_direct():
    """layout='dhwc' (d-major, models/dmajor.py) == canonical 'hwdc': same
    parameter tree byte-for-byte at init (the kernel is stored canonically
    and transposed at trace time) and matching outputs / train-mode BN state
    to f32 conv-reassociation tolerance."""
    kw = denseunet3d.PRESETS["tiny"]
    p_a, s_a = denseunet3d.init(
        jax.random.key(0), input_size=32, input_cols=8, channels=4, **kw
    )
    p_b, s_b = denseunet3d.init(
        jax.random.key(0), input_size=32, input_cols=8, channels=4,
        layout="dhwc", **kw
    )
    assert jax.tree_util.tree_structure(p_a) == jax.tree_util.tree_structure(p_b)
    for la, lb in zip(jax.tree_util.tree_leaves(p_a), jax.tree_util.tree_leaves(p_b)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))

    x = jnp.asarray(
        np.random.default_rng(4).normal(0, 1, (2, 32, 32, 8, 4)).astype(np.float32)
    )
    ctx_a = Ctx(p_a, s_a, train=False, compute_dtype=jnp.float32)
    f_a, l_a = denseunet3d.apply(ctx_a, x, layout="hwdc", **kw)
    ctx_b = Ctx(p_a, s_a, train=False, compute_dtype=jnp.float32)
    f_b, l_b = denseunet3d.apply(ctx_b, x, layout="dhwc", **kw)
    assert f_b.shape == f_a.shape and l_b.shape == l_a.shape
    np.testing.assert_allclose(np.asarray(f_a), np.asarray(f_b), atol=1e-5)
    np.testing.assert_allclose(np.asarray(l_a), np.asarray(l_b), atol=1e-5)

    # train mode: BN statistics reduce the same element sets in either layout
    ctx_a = Ctx(p_a, s_a, train=True, compute_dtype=jnp.float32, rng=jax.random.key(5))
    _ = denseunet3d.apply(ctx_a, x, layout="hwdc", **kw)
    ctx_b = Ctx(p_a, s_a, train=True, compute_dtype=jnp.float32, rng=jax.random.key(5))
    _ = denseunet3d.apply(ctx_b, x, layout="dhwc", **kw)
    sa, sb = ctx_a.new_state, ctx_b.new_state
    assert set(sa) == set(sb)
    for layer in sa:
        for leaf in sa[layer]:
            np.testing.assert_allclose(
                np.asarray(sa[layer][leaf]), np.asarray(sb[layer][leaf]),
                atol=1e-5, err_msg=f"{layer}/{leaf}",
            )


def test_denseunet3d_stem_s2d_matches_direct():
    """stem_s2d=True (space-to-depth 7^3 stride-2 stem, models/s2d.py) ==
    direct conv to float-reassociation tolerance, in BOTH layouts, with the
    identical parameter tree — and gradients must flow through the in-trace
    phase packing (training uses the same code path)."""
    kw = denseunet3d.PRESETS["tiny"]
    params, bn = denseunet3d.init(
        jax.random.key(0), input_size=32, input_cols=8, channels=4, **kw
    )
    p_s2d, _ = denseunet3d.init(
        jax.random.key(0), input_size=32, input_cols=8, channels=4,
        stem_s2d=True, **kw
    )
    assert params["3dconv1"]["kernel"].shape == p_s2d["3dconv1"]["kernel"].shape

    x = jnp.asarray(
        np.random.default_rng(6).normal(0, 1, (2, 32, 32, 8, 4)).astype(np.float32)
    )
    ref, _ = denseunet3d.apply(
        Ctx(params, bn, train=False, compute_dtype=jnp.float32), x, **kw
    )
    for layout in ("hwdc", "dhwc"):
        got, _ = denseunet3d.apply(
            Ctx(params, bn, train=False, compute_dtype=jnp.float32),
            x, stem_s2d=True, layout=layout, **kw,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-5, err_msg=layout
        )

    def loss(p, flag):
        f, _ = denseunet3d.apply(
            Ctx(p, bn, train=False, compute_dtype=jnp.float32),
            x, stem_s2d=flag, **kw,
        )
        return jnp.sum(f ** 2)

    g_ref = jax.grad(lambda p: loss(p, False))(params)["3dconv1"]["kernel"]
    g_s2d = jax.grad(lambda p: loss(p, True))(params)["3dconv1"]["kernel"]
    np.testing.assert_allclose(
        np.asarray(g_s2d), np.asarray(g_ref), rtol=2e-4, atol=2e-4
    )


def test_hff_head_fold_z_matches_direct():
    params, bn = hybrid.init(
        jax.random.key(0), input_size=32, input_cols=8, batch=1,
        arch="3dpart", preset="tiny",
    )
    rng = np.random.default_rng(4)
    feat_w = hybrid.denseunet3d.PRESETS["tiny"]["decoder_widths"][-1]
    f3 = jnp.asarray(rng.normal(0, 1, (1, 32, 32, 8, feat_w)).astype(np.float32))
    f2 = jnp.asarray(rng.normal(0, 1, (1, 32, 32, 8, feat_w)).astype(np.float32))
    a = hybrid.hff_head(
        Ctx(params, bn, compute_dtype=jnp.float32), f3, f2, arch="3dpart", fold_z=False
    )
    b = hybrid.hff_head(
        Ctx(params, bn, compute_dtype=jnp.float32), f3, f2, arch="3dpart", fold_z=True
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
