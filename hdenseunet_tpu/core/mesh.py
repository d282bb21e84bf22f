"""Device mesh + sharding helpers.

TPU-native replacement for the reference's in-graph GPU tower replication
(Keras-2.0.8/keras/utils2/multi_gpu.py:7-71 `make_parallel`: per-GPU
`tf.device` + Lambda slices, outputs re-concatenated on /cpu:0). Here data
parallelism is a named mesh axis: the global batch is sharded over 'data',
parameters are replicated, and XLA inserts the gradient all-reduce (psum over
ICI) automatically from the sharding annotations — no checkpoint-nesting hack
(topology.py:3171 `model_1` subgroup loader) is ever needed.

The mesh is DCN-ready: axes beyond 'data' (e.g. 'model') can be added for
multi-slice topologies without touching the train step.
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices=None, axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch_pytree):
    """Place a host batch onto the mesh, sharded along the leading axis."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch_pytree)


def replicate(mesh: Mesh, pytree):
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), pytree)


def check_batch_divisible(global_batch: int, mesh: Mesh, axis_name: str = DATA_AXIS):
    n = mesh.shape[axis_name]
    if global_batch % n != 0:
        raise ValueError(
            f"global batch {global_batch} not divisible by mesh axis "
            f"'{axis_name}' size {n}"
        )
