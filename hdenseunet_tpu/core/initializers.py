"""Parameter initializers.

Functionally matches the initializers the reference actually exercises
(reference Keras-2.0.8/keras/initializers.py): Conv default 'glorot_uniform',
decoder convs 'normal' (RandomNormal stddev=0.05, densenet.py:71-96), BN/Scale
'one'/'zero'.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _conv_fans(shape):
    """fan_in/fan_out for conv kernels shaped (*spatial, cin, cout) or dense (cin, cout)."""
    if len(shape) < 2:
        return (int(shape[0]), int(shape[0]))
    receptive = 1
    for d in shape[:-2]:
        receptive *= int(d)
    return int(shape[-2]) * receptive, int(shape[-1]) * receptive


def glorot_uniform(key, shape, dtype=jnp.float32):
    fan_in, fan_out = _conv_fans(shape)
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def he_normal(key, shape, dtype=jnp.float32):
    fan_in, _ = _conv_fans(shape)
    std = math.sqrt(2.0 / fan_in)
    return std * jax.random.normal(key, shape, dtype)


def normal05(key, shape, dtype=jnp.float32):
    """Keras-2 'normal': RandomNormal(mean=0, stddev=0.05)."""
    return 0.05 * jax.random.normal(key, shape, dtype)


def zeros(key, shape, dtype=jnp.float32):
    del key
    return jnp.zeros(shape, dtype)


def ones(key, shape, dtype=jnp.float32):
    del key
    return jnp.ones(shape, dtype)


_REGISTRY = {
    "glorot_uniform": glorot_uniform,
    "he_normal": he_normal,
    "normal": normal05,
    "zeros": zeros,
    "ones": ones,
}


def get(name: str):
    return _REGISTRY[name]
