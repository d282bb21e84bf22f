"""Jitted training steps + host-side training loop.

TPU-native replacement for the reference training system (SURVEY.md §3.2-3.3):
Keras `Model.compile`/`fit_generator`/`train_on_batch`
(Keras-2.0.8/keras/engine/training.py:570/:1831/:1715, one `sess.run` per
step) becomes ONE jitted, donated, data-parallel train step: forward + backward
+ SGD update + BN-state merge fused into a single XLA program. The global
batch is sharded over the mesh 'data' axis; parameters/optimizer state are
replicated and XLA inserts the gradient all-reduce (psum over ICI) — replacing
the reference's in-graph tower replication (utils2/multi_gpu.py).

Stages (reference recipes):
  '2d'      — train_2ddense.py: DenseUNet-2D on (B,H,W,3) slabs, per-center-slice
              labels, weighted CE, everything trainable.
  '3dpart'  — train_hybrid.py -arch 3dpart: hybrid with the whole 2D branch
              frozen; boundary z-slices masked from the loss.
  'end2end' — train_hybrid.py -arch end2end: hybrid with 2D convs/Scales
              training, all 2D BNs frozen.
"""
from __future__ import annotations

import time
from pathlib import Path
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from jax.sharding import NamedSharding, PartitionSpec

from ..core.config import Config
from ..core.mesh import (
    DATA_AXIS,
    batch_sharding,
    check_batch_divisible,
    make_mesh,
    replicated,
)
from ..core.module import Ctx, merge_state
from ..models import denseunet2d, hybrid
from ..parallel.multihost import put_batch
from . import checkpoint as ckpt_lib
from .loss import weighted_crossentropy_2d, weighted_crossentropy_hybrid
from .optimizer import make_optimizer


class TrainState(NamedTuple):
    step: jnp.ndarray  # scalar int32
    params: Any
    bn_state: Any
    opt_state: Any
    rng: Any  # PRNG key, split per step for dropout


def create_train_state(rng, cfg: Config, arch: str | None = None):
    """Initialize model + optimizer for the given stage."""
    arch = arch or cfg.train.arch
    init_rng, loop_rng = jax.random.split(jax.random.key(cfg.train.seed) if rng is None else rng)
    if arch == "2d":
        params, bn_state = denseunet2d.init(
            init_rng,
            input_size=cfg.model.input_size,
            reduction=cfg.model.reduction,
            **denseunet2d.PRESETS[cfg.model.preset],
        )
    else:
        params, bn_state = hybrid.init(
            init_rng,
            input_size=cfg.model.input_size,
            input_cols=cfg.model.input_cols,
            arch=arch,
            preset=cfg.model.preset,
        )
    tx, labels = make_optimizer(
        params, arch, cfg.train.lr, cfg.train.momentum, cfg.train.nesterov
    )
    opt_state = tx.init(params)
    ts = TrainState(jnp.zeros((), jnp.int32), params, bn_state, opt_state, loop_rng)
    return ts, tx, labels


def _forward_loss(params, bn_state, batch, rng, *, arch, cfg: Config, train=True):
    dtype = jnp.dtype(cfg.model.compute_dtype)
    ctx = Ctx(
        params,
        bn_state,
        train=train,
        rng=rng,
        compute_dtype=dtype,
        remat=cfg.train.remat and train,
        remat_policy=getattr(cfg.train, "remat_policy", "full"),
    )
    image = batch["image"].astype(dtype)
    if arch == "2d":
        _, logits = denseunet2d.apply(
            ctx,
            image,
            reduction=cfg.model.reduction,
            num_classes=cfg.model.num_classes,
            **denseunet2d.PRESETS[cfg.model.preset],
        )
        loss = weighted_crossentropy_2d(logits, batch["label"], cfg.train.loss_weights)
    else:
        logits = hybrid.apply(
            ctx,
            image,
            arch=arch,
            num_classes=cfg.model.num_classes,
            preset=cfg.model.preset,
            layout3d=getattr(cfg.model, "layout3d", "hwdc"),
            stem_s2d=getattr(cfg.model, "stem_s2d", False),
        )
        if cfg.train.mask_boundary_slices:
            loss = weighted_crossentropy_hybrid(
                logits, batch["label"], cfg.train.loss_weights
            )
        else:
            loss = weighted_crossentropy_2d(
                logits.reshape(-1, logits.shape[-1]),
                batch["label"].reshape(-1),
                cfg.train.loss_weights,
            )
    return loss, ctx.new_state


def make_train_step(tx, cfg: Config, mesh, arch: str | None = None):
    """Build the jitted DP train step: (TrainState, batch) -> (TrainState, loss)."""
    arch = arch or cfg.train.arch

    def step_fn(ts: TrainState, batch):
        rng, next_rng = jax.random.split(ts.rng)
        grad_fn = jax.value_and_grad(
            lambda p: _forward_loss(p, ts.bn_state, batch, rng, arch=arch, cfg=cfg),
            has_aux=True,
        )
        (loss, new_bn), grads = grad_fn(ts.params)
        updates, opt_state = tx.update(grads, ts.opt_state, ts.params)
        params = optax.apply_updates(ts.params, updates)
        bn_state = merge_state(ts.bn_state, new_bn)
        return (
            TrainState(ts.step + 1, params, bn_state, opt_state, next_rng),
            loss,
        )

    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(rep, bsh),
        out_shardings=(rep, rep),
        donate_argnums=(0,) if cfg.train.donate_state else (),
    )


def make_multi_step(tx, cfg: Config, mesh, arch: str | None = None, *, k: int = 8):
    """K train steps per dispatch: lax.scan over a stacked batch.

    One device dispatch executes K optimizer steps over ``batch`` arrays with
    a leading (K, global_batch, ...) layout. Amortizes per-dispatch host
    latency (ms on direct-attached hosts, ~2 s through tunneled devices) and
    lets XLA overlap the inter-step boundaries. Numerically identical to K
    sequential `make_train_step` calls (tested).
    """
    arch = arch or cfg.train.arch

    def one_step(ts: TrainState, batch):
        rng, next_rng = jax.random.split(ts.rng)
        grad_fn = jax.value_and_grad(
            lambda p: _forward_loss(p, ts.bn_state, batch, rng, arch=arch, cfg=cfg),
            has_aux=True,
        )
        (loss, new_bn), grads = grad_fn(ts.params)
        updates, opt_state = tx.update(grads, ts.opt_state, ts.params)
        params = optax.apply_updates(ts.params, updates)
        bn_state = merge_state(ts.bn_state, new_bn)
        return TrainState(ts.step + 1, params, bn_state, opt_state, next_rng), loss

    def multi(ts: TrainState, batches):
        return jax.lax.scan(one_step, ts, batches)

    rep = replicated(mesh)
    bsh = NamedSharding(mesh, PartitionSpec(None, DATA_AXIS))
    return jax.jit(
        multi,
        in_shardings=(rep, bsh),
        out_shardings=(rep, rep),
        donate_argnums=(0,) if cfg.train.donate_state else (),
    )


def stack_batches(batches: list) -> dict:
    """[{k: (B, ...)}] * K -> {k: (K, B, ...)} for make_multi_step."""
    keys = batches[0].keys()
    return {k: np.stack([b[k] for b in batches]) for k in keys}


def make_eval_step(cfg: Config, mesh, arch: str | None = None):
    """Jitted forward-only loss (no dropout, inference BN stats)."""
    arch = arch or cfg.train.arch

    def eval_fn(params, bn_state, batch):
        loss, _ = _forward_loss(
            params, bn_state, batch, None, arch=arch, cfg=cfg, train=False
        )
        return loss

    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    return jax.jit(eval_fn, in_shardings=(rep, rep, bsh), out_shardings=rep)


class MetricsLogger:
    """Epoch/batch loss logs + throughput counters.

    Writes `history/lossepoch.txt` like the reference's modified ProgbarLogger
    (Keras-2.0.8/keras/callbacks.py:311-314) but without the hardcoded global
    path, plus `history/lossbatch.txt` (referenced by train_2ddense.py:197 but
    missing from the vendored code) and slices/sec/chip.
    """

    def __init__(self, save_path: str, slices_per_sample: int = 1):
        self.dir = Path(save_path) / "history"
        self.dir.mkdir(parents=True, exist_ok=True)
        self.slices_per_sample = slices_per_sample
        self._epoch_losses: list[float] = []
        self._last_epoch_loss: float | None = None
        self._t0 = time.perf_counter()
        self._samples = 0

    def last_loss(self) -> float | None:
        """Monitored value for checkpoint-best (reference ModelCheckpoint
        monitors the running epoch loss, callbacks.py:335-430): mean loss of
        the epoch in progress, else the completed epoch's mean."""
        if self._epoch_losses:
            return float(np.mean(self._epoch_losses))
        return self._last_epoch_loss

    def log_step(self, loss: float, batch_size: int):
        self._epoch_losses.append(float(loss))
        self._samples += batch_size
        with open(self.dir / "lossbatch.txt", "a") as f:
            f.write(f"{float(loss):.6f}\n")

    def end_epoch(self) -> dict:
        dt = max(time.perf_counter() - self._t0, 1e-9)
        n_dev = jax.device_count()
        self._last_epoch_loss = (
            float(np.mean(self._epoch_losses)) if self._epoch_losses else None
        )
        stats = {
            "loss": self._last_epoch_loss if self._last_epoch_loss is not None else float("nan"),
            "samples_per_sec": self._samples / dt,
            "slices_per_sec_per_chip": self._samples * self.slices_per_sample / dt / n_dev,
        }
        with open(self.dir / "lossepoch.txt", "a") as f:
            f.write(f"{stats['loss']:.6f}\n")
        self._epoch_losses.clear()
        self._t0 = time.perf_counter()
        self._samples = 0
        return stats


def train(
    cfg: Config,
    batch_iterator,
    *,
    mesh=None,
    max_steps: int | None = None,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    init_weights: dict | None = None,
    log_fn=print,
):
    """Host training loop: prefetched host batches -> sharded device steps.

    `batch_iterator` yields dicts with 'image' and 'label' numpy arrays whose
    leading dim is the GLOBAL batch on a single host, or this process's LOCAL
    shard (global/process_count rows) under a multi-host runtime
    (parallel.multihost.initialize; the feed primitive put_batch assembles
    the global array either way). Replaces fit_generator
    (training.py:1831-2089) + GeneratorEnqueuer (data_utils.py:530).
    """
    mesh = mesh or make_mesh()
    arch = cfg.train.arch
    check_batch_divisible(cfg.train.batch, mesh)
    ts, tx, _ = create_train_state(None, cfg, arch)

    if init_weights is not None:
        # cross-stage warm start (reference: by-name/subgroup HDF5 loaders,
        # topology.py:3107/:3171/:3250, run offline by weights/convert.py)
        from ..weights.convert import match_to_model

        params, bn_state, report = match_to_model(
            init_weights, ts.params, ts.bn_state, strict_shapes=False
        )
        ts = ts._replace(params=params, bn_state=bn_state)
        log_fn(
            f"warm start: {len(report['loaded'])} layers loaded, "
            f"{len(report['skipped'])} skipped, "
            f"{len(report['mismatched'])} shape-mismatched"
        )

    ckpt = None
    if checkpoint_dir is not None:
        ckpt = ckpt_lib.Checkpointer(checkpoint_dir)
        if resume:
            restored = ckpt.restore_latest(ts)
            if restored is not None:
                ts = restored
                log_fn(f"resumed from step {int(ts.step)}")

    k = max(1, cfg.train.steps_per_dispatch)
    if k > 1:
        multi_fn = make_multi_step(tx, cfg, mesh, arch, k=k)
        multi_bsh = NamedSharding(mesh, PartitionSpec(None, DATA_AXIS))
    single_fn = None  # built lazily: only needed for k==1 or a partial tail

    def get_single():
        nonlocal single_fn
        if single_fn is None:
            single_fn = make_train_step(tx, cfg, mesh, arch)
        return single_fn

    bsh = batch_sharding(mesh)
    slices = cfg.model.input_cols if arch != "2d" else 1
    metrics = MetricsLogger(cfg.train.save_path, slices_per_sample=slices)

    from ..utils.guards import NaNGuard

    nan_guard = NaNGuard()
    steps_per_epoch = cfg.train.resolved_steps_per_epoch()
    total = max_steps if max_steps is not None else steps_per_epoch * cfg.train.epochs
    pending: list = []  # device loss scalars; drained at the log cadence so the
    # host never syncs per step (async dispatch stays ahead of the TPU)

    def batch_groups():
        """Yield lists of <=k host batches; a trailing partial group is kept."""
        if k == 1:
            for batch in batch_iterator:
                yield [batch]
            return
        group: list = []
        for batch in batch_iterator:
            group.append(batch)
            if len(group) == k:
                yield group
                group = []
        if group:
            yield group

    def drain(at_step: int):
        """Sync + NaN-check every pending loss. Called at the log cadence and
        ALWAYS before a checkpoint save, so a poisoned state can never be
        persisted no matter how the cadences align (SURVEY §5 failure
        detection; a NaN raises here before the save below runs)."""
        for val in pending:
            v = float(val)
            nan_guard.check(v, at_step)
            metrics.log_step(v, cfg.train.batch)
        pending.clear()

    step = 0
    for group in batch_groups():
        if step >= total:
            break
        remaining = total - step
        if k > 1 and len(group) == k and remaining >= k:
            stacked = stack_batches(group)
            ts, loss = multi_fn(ts, put_batch(stacked, multi_bsh))
            pending.extend(jnp.atleast_1d(loss))
            n_steps = k
        else:
            # partial tail group, or a full group that would overshoot
            # max_steps: run clamped single steps so `step` never exceeds
            # `total` and no sampled batch is silently dropped.
            fn = get_single()
            n_steps = 0
            for batch in group[:remaining]:
                ts, loss = fn(ts, put_batch(batch, bsh))
                pending.append(loss)
                n_steps += 1
        prev, step = step, step + n_steps

        def crossed(n: int) -> bool:
            # fires iff a multiple of n lies in (prev, step] — robust to
            # k-step jumps where `step % n == 0` may never hold
            return step // n > prev // n

        if crossed(cfg.train.log_every_steps) or step >= total or crossed(steps_per_epoch):
            drain(step)
        if crossed(steps_per_epoch):
            stats = metrics.end_epoch()
            log_fn(
                f"epoch {step // steps_per_epoch}: loss={stats['loss']:.4f} "
                f"({stats['slices_per_sec_per_chip']:.1f} slices/s/chip)"
            )
        if ckpt is not None and crossed(cfg.train.checkpoint_every_steps):
            drain(step)
            ckpt.save(int(ts.step), ts, metric=metrics.last_loss())
    if ckpt is not None:
        drain(step)
        ckpt.save(int(ts.step), ts, metric=metrics.last_loss())
        ckpt.wait()
    return ts
