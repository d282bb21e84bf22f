"""Layer-kit numerics vs independent numpy references.

Mirrors the reference's backend-parity strategy
(Keras-2.0.8/tests/keras/backend/backend_test.py): each op is checked against
a straightforward numpy implementation.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hdenseunet_tpu.core.module import Ctx, init as module_init
from hdenseunet_tpu.models import layers as L


def _np_conv2d_valid(x, w, stride):
    b, h, ww, cin = x.shape
    kh, kw, _, cout = w.shape
    oh = (h - kh) // stride + 1
    ow = (ww - kw) // stride + 1
    out = np.zeros((b, oh, ow, cout), np.float32)
    for i in range(oh):
        for j in range(ow):
            patch = x[:, i * stride : i * stride + kh, j * stride : j * stride + kw, :]
            out[:, i, j, :] = np.tensordot(patch, w, axes=([1, 2, 3], [0, 1, 2]))
    return out


def test_conv2d_explicit_padding_matches_numpy(rng_np):
    x = rng_np.standard_normal((2, 9, 9, 3)).astype(np.float32)
    params = {"c": {"kernel": jnp.asarray(rng_np.standard_normal((3, 3, 3, 4)).astype(np.float32))}}
    ctx = Ctx(params)
    y = L.conv2d(ctx, jnp.asarray(x), "c", 4, 3, stride=2, padding=1, use_bias=False)
    xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    ref = _np_conv2d_valid(xp, np.asarray(params["c"]["kernel"]), 2)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5, atol=1e-5)


def test_conv2d_same_padding_odd_and_even():
    # TF SAME: stride 2 on even size pads asymmetrically (extra at end)
    x = jnp.ones((1, 8, 8, 1))
    params = {"c": {"kernel": jnp.ones((3, 3, 1, 1))}}
    y = L.conv2d(Ctx(params), x, "c", 1, 3, stride=2, padding="same", use_bias=False)
    assert y.shape == (1, 4, 4, 1)
    # interior windows see 9 ones; corner (0,0) sees 4 (pad only top/left=0 for
    # even input under TF rule: total pad = 1 -> (0,1))
    np.testing.assert_allclose(np.asarray(y)[0, 1, 1, 0], 9.0)
    np.testing.assert_allclose(np.asarray(y)[0, 0, 0, 0], 9.0)  # pad (0,1): window full
    np.testing.assert_allclose(np.asarray(y)[0, 3, 3, 0], 4.0)  # bottom-right padded


def test_batch_norm_inference_affine():
    c = 5
    params = {
        "bn": {
            "gamma": jnp.asarray(np.linspace(0.5, 1.5, c), jnp.float32),
            "beta": jnp.asarray(np.linspace(-1, 1, c), jnp.float32),
        }
    }
    state = {
        "bn": {
            "moving_mean": jnp.asarray(np.linspace(-2, 2, c), jnp.float32),
            "moving_variance": jnp.asarray(np.linspace(0.5, 2.0, c), jnp.float32),
        }
    }
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 4, 4, c)), jnp.float32)
    y = L.batch_norm(Ctx(params, state, train=False), x, "bn", eps=1.1e-5)
    g, b = np.asarray(params["bn"]["gamma"]), np.asarray(params["bn"]["beta"])
    m, v = np.asarray(state["bn"]["moving_mean"]), np.asarray(state["bn"]["moving_variance"])
    ref = (np.asarray(x) - m) / np.sqrt(v + 1.1e-5) * g + b
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5, atol=1e-5)


def test_batch_norm_train_updates_stats_biased_variance():
    c = 3
    params = {"bn": {"gamma": jnp.ones((c,)), "beta": jnp.zeros((c,))}}
    state = {"bn": {"moving_mean": jnp.zeros((c,)), "moving_variance": jnp.ones((c,))}}
    x = jnp.asarray(np.random.default_rng(2).standard_normal((4, 2, 2, c)), jnp.float32)
    ctx = Ctx(params, state, train=True)
    y = L.batch_norm(ctx, x, "bn", eps=1e-3, momentum=0.9)
    xn = np.asarray(x)
    mean = xn.mean((0, 1, 2))
    var = xn.var((0, 1, 2))  # biased
    np.testing.assert_allclose(
        np.asarray(ctx.new_state["bn"]["moving_mean"]), 0.1 * mean, rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(ctx.new_state["bn"]["moving_variance"]),
        0.9 * 1.0 + 0.1 * var,
        rtol=1e-5,
        atol=1e-6,
    )
    ref = (xn - mean) / np.sqrt(var + 1e-3)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-4, atol=1e-5)


def test_batch_norm_frozen_ignores_train_flag():
    c = 2
    params = {"bn": {"gamma": jnp.ones((c,)), "beta": jnp.zeros((c,))}}
    state = {"bn": {"moving_mean": jnp.zeros((c,)), "moving_variance": jnp.ones((c,))}}
    x = jnp.asarray(np.random.default_rng(3).standard_normal((2, 2, 2, c)) * 5, jnp.float32)
    ctx = Ctx(params, state, train=True)
    y = L.batch_norm(ctx, x, "bn", eps=1e-3, frozen=True)
    assert ctx.new_state == {}  # momentum=1/training=False semantics: no updates
    ref = np.asarray(x) / np.sqrt(1.0 + 1e-3)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5, atol=1e-5)


def test_scale_affine():
    params = {"s": {"gamma": jnp.asarray([2.0, 3.0]), "beta": jnp.asarray([1.0, -1.0])}}
    x = jnp.ones((1, 2, 2, 2))
    y = L.scale(Ctx(params), x, "s")
    np.testing.assert_allclose(np.asarray(y)[0, 0, 0], [3.0, 2.0])


def test_max_pool_zero_padding_semantics():
    # Keras pads with ZEROS before VALID pooling; with all-negative input the
    # padded entries would win under -inf padding confusion. Our layer pads
    # zeros explicitly, so edge windows return 0 here.
    x = -jnp.ones((1, 4, 4, 1))
    y = L.max_pool(x, 3, 2, pad=1)
    # windows touching the zero padding return 0; the interior window is all -1
    np.testing.assert_allclose(
        np.asarray(y)[0, :, :, 0], np.array([[0.0, 0.0], [0.0, -1.0]])
    )


def test_avg_pool_matches_numpy(rng_np):
    x = rng_np.standard_normal((2, 6, 6, 3)).astype(np.float32)
    y = L.avg_pool(jnp.asarray(x), 2, 2)
    ref = x.reshape(2, 3, 2, 3, 2, 3).mean((2, 4))
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5, atol=1e-6)


def test_upsample_nearest_2d_3d(rng_np):
    x = rng_np.standard_normal((1, 2, 3, 2)).astype(np.float32)
    y = np.asarray(L.upsample_nearest(jnp.asarray(x), 2))
    assert y.shape == (1, 4, 6, 2)
    np.testing.assert_allclose(y, x.repeat(2, 1).repeat(2, 2))
    v = rng_np.standard_normal((1, 2, 2, 3, 1)).astype(np.float32)
    yv = np.asarray(L.upsample_nearest(jnp.asarray(v), (2, 2, 1)))
    assert yv.shape == (1, 4, 4, 3, 1)
    np.testing.assert_allclose(yv, v.repeat(2, 1).repeat(2, 2))


def test_dropout_train_and_eval():
    x = jnp.ones((4, 8, 8, 4))
    ctx_eval = Ctx({}, train=False)
    np.testing.assert_array_equal(np.asarray(L.dropout(ctx_eval, x, 0.5)), np.asarray(x))
    ctx_train = Ctx({}, train=True, rng=jax.random.key(0))
    y = np.asarray(L.dropout(ctx_train, x, 0.5))
    assert set(np.unique(y)).issubset({0.0, 2.0})  # inverted dropout scaling
    assert (y == 0).mean() == pytest.approx(0.5, abs=0.1)


def test_module_init_records_and_materializes():
    def net(ctx, x):
        x = L.conv2d(ctx, x, "c1", 4, 3, padding=1, use_bias=False)
        x = L.batch_norm(ctx, x, "c1_bn", eps=1e-3)
        x = L.scale(ctx, x, "c1_scale")
        return L.relu(x)

    params, state = module_init(net, jax.random.key(0), jnp.zeros((1, 8, 8, 2)))
    assert params["c1"]["kernel"].shape == (3, 3, 2, 4)
    assert params["c1_bn"]["gamma"].shape == (4,)
    assert state["c1_bn"]["moving_variance"].shape == (4,)
    assert float(state["c1_bn"]["moving_variance"][0]) == 1.0
    # apply with materialized params works
    y = net(Ctx(params, state), jnp.ones((1, 8, 8, 2)))
    assert y.shape == (1, 8, 8, 4)
