"""Multi-host semantics under multi-process CPU simulation (SURVEY §2c
multi-host row; the reference has no multi-host story at all).

Spawns two REAL worker processes that join the JAX distributed runtime (gloo
collectives), each feeding only its process-local shard of a deterministic
global batch through parallel.multihost, and asserts:

* both processes see the global device set and agree bit-for-bit on the
  post-step state (the gradient all-reduce spans processes);
* the 2-process result equals a single-process run of the SAME global batch
  (process-local feeding is semantically invisible).
"""
from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_dp_step_matches_single_process(tmp_path):
    port = _free_port()
    procs, outs = [], []
    for pid in range(2):
        out = tmp_path / f"digest-{pid}.json"
        outs.append(out)
        env = dict(
            os.environ,
            JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
        )
        env.pop("PYTHONPATH", None)  # breaks PJRT registration (CLAUDE.md)
        procs.append(
            subprocess.Popen(
                [sys.executable, str(REPO / "tests" / "_multihost_worker.py"),
                 "--out", str(out)],
                env=env, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    logs = [p.communicate(timeout=600)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]

    a, b = (json.loads(o.read_text()) for o in outs)
    assert a["primary"] and not b["primary"]
    # all processes hold the same replicated post-step state
    assert a["loss"] == b["loss"]
    assert a["param_sum"] == b["param_sum"]
    assert a["conv1_head"] == b["conv1_head"]
    assert a["step"] == 1

    # single-process reference on the identical GLOBAL batch
    import jax

    from hdenseunet_tpu.core.config import Config
    from hdenseunet_tpu.core.mesh import batch_sharding, make_mesh
    from hdenseunet_tpu.train import trainer

    sys.path.insert(0, str(REPO / "tests"))
    import _multihost_worker as worker

    cfg = Config()
    cfg.model.preset = "tiny"
    cfg.model.input_size = 32
    cfg.train.batch = 4
    cfg.train.remat = False
    mesh = make_mesh(jax.devices()[:4])
    ts, tx, _ = trainer.create_train_state(None, cfg, "2d")
    step = trainer.make_train_step(tx, cfg, mesh, "2d")
    batch = worker.make_global_batch(4, 32)
    db = {k: jax.device_put(v, batch_sharding(mesh)) for k, v in batch.items()}
    ts, loss = step(ts, db)
    want = worker.digest(ts)

    np.testing.assert_allclose(a["loss"], float(loss), rtol=1e-5)
    np.testing.assert_allclose(a["param_sum"], want["param_sum"], rtol=1e-6)
    np.testing.assert_allclose(a["conv1_head"], want["conv1_head"], rtol=1e-5)
