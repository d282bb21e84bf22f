"""Numeric parity vs an independent pure-NumPy Keras-semantics oracle.

Closes SURVEY.md §7 step 3's golden-value gap without the (undownloadable)
released HDF5 weights: ``tests/keras_oracle.py`` re-implements the vendored
Keras 2.0.8 inference semantics from the reference sources on a completely
different substrate (NumPy im2col + matmul), and the same randomized weight
pytree is pushed through both stacks. Agreement at every block-boundary tap
(max-abs-err <= 1e-4, scaled by the tap's magnitude, f32) validates conv
padding rules, BN/Scale formulas and epsilons, pooling, nearest upsampling,
the dense-block concat wiring, the z slice-stacking, and the HFF fusion head
— independently of the JAX implementation under test.

Fast tests run the tiny presets through jit; slow-marked tests run the FULL
reference layout (DenseNet-167 at 224^2; full hybrid at 64^2 x 8).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import keras_oracle as oracle
from hdenseunet_tpu.core.module import Ctx
from hdenseunet_tpu.models import denseunet2d, denseunet3d, hybrid

TOL = 1e-4


def randomize(params, state, seed=0):
    """Non-degenerate weights: randomized affines and BN statistics.

    Conv kernels keep their (already random) glorot init; BN/Scale gammas,
    betas, biases, and moving statistics are re-drawn so identity affines
    can't mask formula errors (e.g. a wrong epsilon or mean sign).
    """
    rng = np.random.default_rng(seed)

    def rand_params(leaves):
        out = {}
        for leaf, arr in leaves.items():
            a = np.asarray(arr, np.float32)
            if leaf == "gamma":
                out[leaf] = rng.uniform(0.6, 1.4, a.shape).astype(np.float32)
            elif leaf in ("beta", "bias"):
                out[leaf] = rng.normal(0.0, 0.2, a.shape).astype(np.float32)
            else:
                out[leaf] = a
        return out

    def rand_state(leaves):
        return {
            "moving_mean": rng.normal(0.0, 0.3, leaves["moving_mean"].shape).astype(np.float32),
            "moving_variance": rng.uniform(0.5, 1.5, leaves["moving_variance"].shape).astype(np.float32),
        }

    return (
        {name: rand_params(l) for name, l in params.items()},
        {name: rand_state(l) for name, l in state.items()},
    )


def assert_taps_close(got: dict, want: dict, tol=TOL):
    assert set(got) >= set(want), sorted(set(want) - set(got))
    worst = ("", 0.0)
    for k in sorted(want):
        g, w = np.asarray(got[k]), np.asarray(want[k])
        assert g.shape == w.shape, (k, g.shape, w.shape)
        err = float(np.abs(g.astype(np.float64) - w.astype(np.float64)).max())
        scale = max(1.0, float(np.abs(w).max()))
        assert err <= tol * scale, (
            f"{k}: max abs err {err:.3e} exceeds {tol:.0e} x {scale:.3e}"
        )
        if err / scale > worst[1]:
            worst = (k, err / scale)
    print(f"worst tap: {worst[0]} scaled err {worst[1]:.2e}")


def run_model(apply_fn, params, state, x, *, use_jit=True, **kw):
    def f(p, s, xx):
        taps = {}
        ctx = Ctx(p, s, train=False)
        apply_fn(ctx, xx, taps=taps, **kw)
        return taps

    if use_jit:
        f = jax.jit(f)
    out = f(params, state, jnp.asarray(x))
    return {k: np.asarray(v) for k, v in out.items()}


def test_oracle_2d_tiny():
    kw = denseunet2d.PRESETS["tiny"]
    params, state = denseunet2d.init(jax.random.key(0), input_size=64, batch=2, **kw)
    params, state = randomize(params, state, seed=1)
    x = np.random.default_rng(2).normal(0, 1, (2, 64, 64, 3)).astype(np.float32)

    got = run_model(denseunet2d.apply, params, state, x, **kw)
    want = oracle.dense_unet_2d(params, state, x, blocks=kw["blocks"])
    assert_taps_close(got, want)


def test_oracle_3d_tiny():
    kw = denseunet3d.PRESETS["tiny"]
    params, state = denseunet3d.init(
        jax.random.key(0), input_size=32, input_cols=4, channels=2, batch=1, **kw
    )
    params, state = randomize(params, state, seed=3)
    x = np.random.default_rng(4).normal(0, 1, (1, 32, 32, 4, 2)).astype(np.float32)

    got = run_model(denseunet3d.apply, params, state, x, **kw)
    want = oracle.dense_net_3d(params, state, x, blocks=kw["blocks"])
    assert_taps_close(got, want)


@pytest.mark.parametrize("arch", ["end2end", "3dpart"])
def test_oracle_hybrid_tiny(arch):
    params, state = hybrid.init(
        jax.random.key(0), input_size=32, input_cols=8, batch=1,
        arch=arch, preset="tiny",
    )
    params, state = randomize(params, state, seed=5)
    x = np.random.default_rng(6).normal(0, 1, (1, 32, 32, 8, 1)).astype(np.float32)

    got = run_model(hybrid.apply, params, state, x, arch=arch, preset="tiny")
    want = oracle.hybrid(
        params, state, x, arch=arch,
        preset_2d={"blocks": denseunet2d.PRESETS["tiny"]["blocks"]},
        preset_3d={"blocks": denseunet3d.PRESETS["tiny"]["blocks"]},
    )
    assert_taps_close(got, want)


@pytest.mark.slow
def test_oracle_2d_full_224():
    """The judge-specified configuration: full DenseNet-167 layout at 224^2.

    Validates the exact production graph (densenet.py:10-193) tap-by-tap —
    all 161 encoder layers, the 5-stage decoder, and the logit head.
    """
    params, state = denseunet2d.init(jax.random.key(0), input_size=224, batch=1)
    params, state = randomize(params, state, seed=7)
    x = np.random.default_rng(8).normal(0, 1, (1, 224, 224, 3)).astype(np.float32)

    # eager on the model side: one-shot full-layout jit compile on CPU costs
    # more than it saves here
    got = run_model(denseunet2d.apply, params, state, x, use_jit=False)
    want = oracle.dense_unet_2d(params, state, x)
    assert set(want) == {
        "relu1", "concat_2_6", "concat_3_12", "concat_4_36", "relu5_blk",
        "ac_up4", "dense167classifer",
    }
    assert_taps_close(got, want)


@pytest.mark.slow
def test_oracle_hybrid_full():
    """Full-preset hybrid (both branches + HFF) at 64^2 x 8 incl. x250 fusion."""
    params, state = hybrid.init(
        jax.random.key(0), input_size=64, input_cols=8, batch=1,
        arch="end2end", preset="full",
    )
    params, state = randomize(params, state, seed=9)
    x = np.random.default_rng(10).normal(0, 1, (1, 64, 64, 8, 1)).astype(np.float32)

    got = run_model(hybrid.apply, params, state, x, use_jit=False, arch="end2end", preset="full")
    want = oracle.hybrid(params, state, x, arch="end2end")
    assert_taps_close(got, want)


def test_oracle_2d_legacy_skips():
    """Legacy skip-add decoder (reference denseunet.py:188-218): 1x1 'line0'
    projection of box[3] added to up0, box[2]/box[1]/box[0] added to
    up1/up2/up3 — oracle-verified tap-by-tap at the tiny preset."""
    # skip adds constrain the decoder widths to the encoder box channels
    # (the reference's full layout satisfies this by construction:
    # 768/384/96 == concat_3/concat_2/relu1); a tiny skip-compatible config:
    # blocks (2,2,2,2) growth 8 -> box channels 96/112/72, relu5_blk 42.
    kw = dict(blocks=(2, 2, 2, 2), growth=8, decoder_widths=(72, 112, 96, 16, 16))
    params, state = denseunet2d.init(
        jax.random.key(0), input_size=64, batch=1, skip_connections=True, **kw
    )
    assert "line0" in params  # the legacy projection participates
    params, state = randomize(params, state, seed=7)
    x = np.random.default_rng(8).normal(0, 1, (1, 64, 64, 3)).astype(np.float32)

    got = run_model(denseunet2d.apply, params, state, x, skip_connections=True, **kw)
    want = oracle.dense_unet_2d(
        params, state, x, blocks=kw["blocks"], skip_connections=True
    )
    assert_taps_close(got, want)


def test_oracle_dilated_resnet():
    """Dilated residual encoder-decoder (reference hybridnet.py:426-585):
    dilation-2 atrous convs, BN'd projection shortcuts, (2,2,1) pool/upsample
    ladder — final logits oracle-verified (the reference leaves all layers
    auto-named, so the logit map is the graph's only stable tap)."""
    from hdenseunet_tpu.models import dilated_resnet

    widths = (8, 16, 32, 64)
    params, state = dilated_resnet.init(
        jax.random.key(0), input_size=32, input_cols=4, batch=1, widths=widths
    )
    params, state = randomize(params, state, seed=9)
    x = np.random.default_rng(10).normal(0, 1, (1, 32, 32, 4, 1)).astype(np.float32)

    @jax.jit
    def f(p, s, xx):
        return dilated_resnet.apply(Ctx(p, s, train=False), xx, widths=widths)

    got = np.asarray(f(params, state, jnp.asarray(x)))
    want = oracle.dilated_resnet(params, state, x)
    assert_taps_close({"dr_head": got}, {"dr_head": want})
