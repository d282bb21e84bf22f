"""Multi-host (multi-process) runtime entry points.

The reference is strictly single-host: its only parallelism is in-graph GPU
tower replication (Keras-2.0.8/keras/utils2/multi_gpu.py), so nothing here has
a 1:1 counterpart — this is the piece that takes the framework from
"single-host DP" to a real TPU-pod program:

* :func:`initialize` joins the JAX distributed runtime
  (``jax.distributed.initialize``) so ``jax.devices()`` becomes the GLOBAL
  device set; meshes built over it span all hosts and XLA collectives ride
  ICI/DCN exactly as on one host;
* :func:`global_batch_from_local` assembles a globally-sharded batch from
  each process's LOCAL numpy data (``jax.make_array_from_process_local_data``)
  — every host feeds only its own shard, no host ever materializes the global
  batch;
* :func:`local_batch_size` splits the global batch across processes.

Works under multi-process CPU simulation (gloo collectives): see
tests/test_multihost.py, which spawns real worker processes and checks a
cross-process DP train step end-to-end.
"""
from __future__ import annotations

import os

import jax
import numpy as np

from ..core.mesh import DATA_AXIS, batch_sharding

# opt-in marker for jax.distributed.initialize() self-configuration on TPU
# pods / Slurm / MPI launchers. Deliberately NOT inferred from TPU_* env vars:
# single-chip PJRT plugins also set TPU_WORKER_HOSTNAMES et al.
_AUTO_ENV = "HDU_DISTRIBUTED"


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids=None,
) -> bool:
    """Join the distributed runtime; returns True when multi-process.

    Arguments fall back to JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID; alternatively set HDU_DISTRIBUTED=1 on TPU-pod / Slurm /
    MPI launchers to let jax auto-detect everything. A plain single-host
    invocation (nothing configured) is a no-op returning False, so every
    entry point can call this unconditionally.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])

    auto = os.environ.get(_AUTO_ENV, "").lower() in ("1", "true", "auto")
    if coordinator_address is None and num_processes is None and not auto:
        return False

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    return jax.process_count() > 1


def is_primary() -> bool:
    """True on the process that should own logging/console output."""
    return jax.process_index() == 0


def local_batch_size(global_batch: int) -> int:
    """Per-process share of the GLOBAL batch (validated)."""
    n = jax.process_count()
    if global_batch % n != 0:
        raise ValueError(
            f"global batch {global_batch} not divisible by process count {n}"
        )
    return global_batch // n


def global_batch_from_local(mesh, local_pytree):
    """Process-local numpy batch -> globally sharded jax.Arrays over 'data'.

    Each process passes only its own rows; the result behaves exactly like a
    host-global array device_put with the same sharding (single-process
    included), so the train step is identical either way.
    """
    sharding = batch_sharding(mesh)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        local_pytree,
    )


def put_batch(batch_pytree, sharding):
    """Sharding-aware batch placement: device_put single-process, process-local
    assembly multi-process. The trainer's single feed primitive."""
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            ),
            batch_pytree,
        )
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch_pytree)
