"""Worker process for tests/test_multihost.py.

Joins the JAX distributed runtime (CPU + gloo), builds a GLOBAL mesh, feeds a
process-LOCAL shard of a deterministic synthetic batch through
parallel.multihost.put_batch, runs ONE jitted DP train step, and writes a
digest (loss + parameter checksums) to --out for the parent test to compare
against a single-process run of the identical global batch.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def make_global_batch(global_batch: int, input_size: int) -> dict:
    rng = np.random.default_rng(123)
    return {
        "image": rng.normal(0, 1, (global_batch, input_size, input_size, 3)).astype(np.float32),
        "label": rng.integers(0, 3, (global_batch, input_size, input_size), dtype=np.int32),
    }


def digest(ts) -> dict:
    leaves = jax.tree.leaves(ts.params)
    return {
        "step": int(ts.step),
        "param_sum": float(sum(np.float64(np.asarray(x)).sum() for x in leaves)),
        "conv1_head": np.asarray(ts.params["conv1"]["kernel"]).ravel()[:4].tolist(),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--global-batch", type=int, default=4)
    args = ap.parse_args()

    from hdenseunet_tpu.core.config import Config
    from hdenseunet_tpu.core.mesh import batch_sharding, make_mesh
    from hdenseunet_tpu.parallel import multihost
    from hdenseunet_tpu.train import trainer

    # coordinator/process env set by the parent (JAX_COORDINATOR_ADDRESS etc.)
    assert multihost.initialize(), "expected a multi-process configuration"
    assert jax.process_count() == 2
    assert jax.device_count() == 4 and len(jax.local_devices()) == 2

    cfg = Config()
    cfg.model.preset = "tiny"
    cfg.model.input_size = 32
    cfg.train.batch = args.global_batch
    cfg.train.remat = False

    mesh = make_mesh()  # GLOBAL devices
    ts, tx, _ = trainer.create_train_state(None, cfg, "2d")
    step = trainer.make_train_step(tx, cfg, mesh, "2d")

    # each process feeds only its rows of the global batch
    n = multihost.local_batch_size(args.global_batch)
    lo = jax.process_index() * n
    local = {k: v[lo : lo + n] for k, v in make_global_batch(args.global_batch, 32).items()}
    db = multihost.put_batch(local, batch_sharding(mesh))
    for leaf in jax.tree.leaves(db):
        assert leaf.shape[0] == args.global_batch, leaf.shape  # global view

    ts, loss = step(ts, db)
    out = digest(ts)
    out["loss"] = float(loss)
    out["process"] = jax.process_index()
    out["primary"] = multihost.is_primary()
    Path(args.out).write_text(json.dumps(out))
    print(f"proc {jax.process_index()} done: loss={out['loss']:.6f}", flush=True)


if __name__ == "__main__":
    main()
