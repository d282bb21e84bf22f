"""Pallas kernel tests (CPU interpret mode) vs their XLA fallbacks."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hdenseunet_tpu.ops import dispatch
from hdenseunet_tpu.ops.fused_affine import affine_relu, fold_bn_scale
from hdenseunet_tpu.ops.wce import _wce_xla, weighted_ce


@pytest.mark.parametrize("shape", [(2, 8, 8, 16), (3, 4, 4, 4, 24), (130, 7)])
@pytest.mark.parametrize("relu", [True, False])
def test_affine_relu_interpret_matches_xla(shape, relu):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    c = shape[-1]
    a = jnp.asarray(rng.normal(size=c).astype(np.float32))
    b = jnp.asarray(rng.normal(size=c).astype(np.float32))
    got = affine_relu(x, a, b, relu=relu, interpret=True)
    want = x * a + b
    if relu:
        want = jnp.maximum(want, 0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_affine_relu_bfloat16():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 8, 8, 32)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    a = jnp.asarray(rng.normal(size=32).astype(np.float32))
    b = jnp.asarray(rng.normal(size=32).astype(np.float32))
    got = affine_relu(x, a, b, interpret=True)
    assert got.dtype == jnp.bfloat16
    want = jnp.maximum(x * a.astype(jnp.bfloat16) + b.astype(jnp.bfloat16), 0)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=1e-2
    )


@pytest.mark.parametrize("relu", [True, False])
def test_affine_relu_grad_matches_xla(relu):
    """The Pallas kernel's custom VJP (grads for x AND the folded scale/shift)
    must equal autodiff through the plain XLA formulation — this is the
    gradient path of hybrid 3dpart/end2end training, where the 2D branch runs
    with frozen BN stats through the fused kernel (ADVICE round-1 high)."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(6, 5, 16)).astype(np.float32))
    a = jnp.asarray(rng.normal(size=16).astype(np.float32))
    b = jnp.asarray(rng.normal(size=16).astype(np.float32))

    def f_pallas(x, a, b):
        return jnp.sum(affine_relu(x, a, b, relu=relu, interpret=True) ** 2)

    def f_xla(x, a, b):
        y = x * a + b
        if relu:
            y = jnp.maximum(y, 0)
        return jnp.sum(y**2)

    g_got = jax.grad(f_pallas, argnums=(0, 1, 2))(x, a, b)
    g_ref = jax.grad(f_xla, argnums=(0, 1, 2))(x, a, b)
    for got, ref in zip(g_got, g_ref):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_bn_scale_relu_frozen_grad_through_pallas(monkeypatch):
    """End-to-end: grads flow through bn_scale_relu's fused frozen path into
    the raw BN/Scale parameters (via fold_bn_scale) with the Pallas kernel
    forced on (interpret mode on CPU) — matching the XLA-fallback gradients.
    Guards the hybrid-training-on-TPU trace failure from the round-1 review."""
    import functools

    from hdenseunet_tpu.core.module import Ctx
    from hdenseunet_tpu.models.layers import bn_scale_relu
    from hdenseunet_tpu.ops import fused_affine

    rng = np.random.default_rng(8)
    c = 12
    x = jnp.asarray(rng.normal(size=(2, 4, 4, c)).astype(np.float32))
    params = {
        "bn": {
            "gamma": jnp.asarray(rng.normal(size=c), jnp.float32),
            "beta": jnp.asarray(rng.normal(size=c), jnp.float32),
        },
        "sc": {
            "gamma": jnp.asarray(rng.normal(size=c), jnp.float32),
            "beta": jnp.asarray(rng.normal(size=c), jnp.float32),
        },
    }
    state = {
        "bn": {
            "moving_mean": jnp.asarray(rng.normal(size=c), jnp.float32),
            "moving_variance": jnp.asarray(rng.uniform(0.5, 2, c), jnp.float32),
        }
    }

    def loss(p):
        ctx = Ctx(p, state, train=True, rng=None)
        return jnp.sum(bn_scale_relu(ctx, x, "bn", "sc", frozen=True) ** 2)

    g_ref = jax.grad(loss)(params)  # XLA fallback path
    monkeypatch.setattr(
        fused_affine, "affine_relu",
        functools.partial(fused_affine.affine_relu, interpret=True),
    )
    g_got = jax.grad(loss)(params)  # Pallas kernel (interpret) path
    for lname in params:
        for leaf in params[lname]:
            np.testing.assert_allclose(
                np.asarray(g_got[lname][leaf]),
                np.asarray(g_ref[lname][leaf]),
                atol=1e-4,
                err_msg=f"{lname}/{leaf}",
            )


def test_fold_bn_scale_equals_sequential():
    rng = np.random.default_rng(2)
    c = 12
    g1, b1 = rng.normal(size=c), rng.normal(size=c)
    mean, var = rng.normal(size=c), rng.uniform(0.5, 2, c)
    g2, b2 = rng.normal(size=c), rng.normal(size=c)
    x = rng.normal(size=(5, c)).astype(np.float32)
    a, b = fold_bn_scale(*(jnp.asarray(v, jnp.float32) for v in (g1, b1, mean, var, g2, b2)), 1e-3)
    fused = x * np.asarray(a) + np.asarray(b)
    inv = g1 / np.sqrt(var + 1e-3)
    seq = ((x * inv + (b1 - mean * inv)) * g2) + b2
    np.testing.assert_allclose(fused, seq, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("n", [100, 2048, 5000])
def test_wce_pallas_matches_xla(n):
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 4)
    labels = jnp.asarray(rng.integers(0, 3, n).astype(np.int32))
    mask = jnp.asarray((rng.random(n) > 0.25).astype(np.float32))
    w = (0.78, 0.65, 8.57)
    got = weighted_ce(logits, labels, mask, w, True)
    s, cnt = _wce_xla(logits, labels, mask, w)
    np.testing.assert_allclose(float(got), float(-s / cnt), rtol=1e-5)


def test_wce_clip_active():
    """Pixels past the ln(1e-10) clip contribute the clip value and no grad."""
    logits = jnp.asarray([[60.0, 0.0, 0.0], [0.0, 1.0, 0.5]], jnp.float32)
    labels = jnp.asarray([1, 1], jnp.int32)  # class 1 of row 0 has logp ~ -60
    mask = jnp.ones(2, jnp.float32)
    w = (1.0, 1.0, 1.0)
    loss = float(weighted_ce(logits, labels, mask, w, True))
    # row 0 clipped to ln(1e-10)
    from hdenseunet_tpu.ops.wce import _LOG_CLIP

    row1 = float(jax.nn.log_softmax(logits[1])[1])
    assert loss == pytest.approx(-(_LOG_CLIP + row1) / 2, rel=1e-5)

    g = jax.grad(lambda lg: weighted_ce(lg, labels, mask, w, True))(logits)
    assert np.allclose(np.asarray(g)[0], 0.0)  # clipped row: zero gradient
    assert not np.allclose(np.asarray(g)[1], 0.0)


def test_wce_grad_matches_autodiff_of_xla():
    rng = np.random.default_rng(4)
    logits = jnp.asarray(rng.normal(size=(500, 3)).astype(np.float32) * 3)
    labels = jnp.asarray(rng.integers(0, 3, 500).astype(np.int32))
    mask = jnp.asarray((rng.random(500) > 0.5).astype(np.float32))
    w = (0.78, 0.65, 8.57)

    def f_ref(lg):
        s, cnt = _wce_xla(lg, labels, mask, w)
        return -s / cnt

    g_ref = jax.grad(f_ref)(logits)
    g_got = jax.grad(lambda lg: weighted_ce(lg, labels, mask, w, True))(logits)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref), atol=1e-6)


def test_dispatch_modes():
    assert dispatch.use_pallas() in (True, False)
    dispatch.set_backend("pallas")
    assert dispatch.use_pallas()
    dispatch.set_backend("xla")
    assert not dispatch.use_pallas()
    dispatch.set_backend("auto")
    with pytest.raises(AssertionError):
        dispatch.set_backend("cuda")


def test_loss_wrappers_dispatch_to_wce():
    """train.loss wrappers produce identical values through the ops path."""
    from hdenseunet_tpu.train.loss import (
        weighted_crossentropy_2d,
        weighted_crossentropy_hybrid,
    )

    rng = np.random.default_rng(5)
    logits = jnp.asarray(rng.normal(size=(2, 8, 8, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 3, (2, 8, 8)).astype(np.int32))
    l1 = float(weighted_crossentropy_2d(logits, labels))
    s, cnt = _wce_xla(
        logits.reshape(-1, 3), labels.reshape(-1), jnp.ones(128, jnp.float32),
        (0.78, 0.65, 8.57),
    )
    assert l1 == pytest.approx(float(-s / cnt), rel=1e-6)

    logits3 = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 3)).astype(np.float32))
    labels3 = jnp.asarray(rng.integers(0, 3, (1, 8, 8, 8)).astype(np.int32))
    lh = float(weighted_crossentropy_hybrid(logits3, labels3))
    zmask = np.zeros((1, 8, 8, 8), np.float32)
    zmask[:, :, :, 1:7] = 1
    s, cnt = _wce_xla(
        logits3.reshape(-1, 3), labels3.reshape(-1),
        jnp.asarray(zmask.reshape(-1)), (0.78, 0.65, 8.57),
    )
    assert lh == pytest.approx(float(-s / cnt), rel=1e-6)
