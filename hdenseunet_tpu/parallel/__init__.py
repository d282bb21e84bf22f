"""Parallelism utilities over jax.sharding.Mesh.

Thin, named-axis layer the rest of the framework builds on (SURVEY.md §2c):

* data parallelism: batch sharded over the 'data' ICI axis, parameters
  replicated, gradient psum inserted by XLA from sharding annotations —
  replacing the reference's in-graph GPU tower replication
  (Keras-2.0.8/keras/utils2/multi_gpu.py);
* inference window parallelism (the reference's z-axis analog of sequence
  parallelism): batches of sliding windows sharded over the same axis, each
  chip scoring a slab of windows per device step (lib/funcs.py walked them
  one at a time on one GPU).

* multi-host: :mod:`.multihost` joins the JAX distributed runtime
  (``jax.distributed.initialize``) and feeds each process's LOCAL batch shard
  into the global mesh (``jax.make_array_from_process_local_data``) — the
  train step is identical single- and multi-host.

DCN-ready: meshes with more axes can be passed anywhere a mesh is taken;
only the 'data' axis name is load-bearing.
"""
from ..core.mesh import (  # noqa: F401
    DATA_AXIS,
    batch_sharding,
    check_batch_divisible,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)
from .multihost import (  # noqa: F401
    global_batch_from_local,
    initialize,
    is_primary,
    local_batch_size,
    put_batch,
)
