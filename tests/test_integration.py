"""End-to-end integration: train on synthetic LiTS-like data until the model
actually segments, then run the full inference + postprocess + Dice path.

The reference has nothing like this (SURVEY.md §4: zero application-level
tests; validation went through the LiTS leaderboard). Pattern follows the
vendored Keras suite's integration_tests: tiny task, few steps, accuracy
threshold.
"""
import numpy as np
import pytest

import jax

from hdenseunet_tpu.core.config import Config
from hdenseunet_tpu.core.mesh import batch_sharding, make_mesh
from hdenseunet_tpu.data import preprocess
from hdenseunet_tpu.data.sampler import CropSampler
from hdenseunet_tpu.infer import metrics
from hdenseunet_tpu.train import trainer


@pytest.mark.slow
def test_2d_stage_learns_and_dice_improves(tmp_path):
    root = preprocess.synthesize(
        tmp_path / "prep", num_volumes=2, shape=(64, 64, 24), seed=11
    )
    ds = preprocess.PreparedDataset(root)

    cfg = Config()
    cfg.model.preset = "tiny"
    cfg.model.input_size = 64
    cfg.train.arch = "2d"
    cfg.train.batch = 8
    cfg.train.lr = 0.01
    cfg.train.remat = False

    sampler = CropSampler(ds, cfg.data, mode="2d", input_size=64, seed=0)
    mesh = make_mesh()
    ts, tx, _ = trainer.create_train_state(None, cfg, "2d")
    step = trainer.make_train_step(tx, cfg, mesh, "2d")
    bsh = batch_sharding(mesh)

    losses = []
    for i in range(60):
        batch = sampler.sample_batch(cfg.train.batch)
        db = {k: jax.device_put(v, bsh) for k, v in batch.items()}
        ts, loss = step(ts, db)
        losses.append(float(loss))

    assert np.mean(losses[-10:]) < 0.5 * np.mean(losses[:5]), (
        losses[:5],
        losses[-10:],
    )

    # eval on a full training slab: per-pixel argmax should beat chance by far
    from hdenseunet_tpu.core.module import Ctx
    from hdenseunet_tpu.models import denseunet2d

    vol = np.asarray(ds.volume(0))
    seg = np.asarray(ds.segmentation(0))
    z = vol.shape[2] // 2
    slab = np.stack([vol[:, :, z - 1], vol[:, :, z], vol[:, :, z + 1]], -1)
    slab = (slab - cfg.data.mean)[None].astype(np.float32)
    # evaluate with batch statistics: 60 steps of momentum-0.99 moving
    # averages are still ~half initialization, which would swamp the signal
    # this test is after (dropout disabled explicitly)
    ctx = Ctx(ts.params, ts.bn_state, train=True, rng=jax.random.key(9))
    _, logits = denseunet2d.apply(
        ctx,
        jax.numpy.asarray(slab),
        decoder_dropout=0.0,
        **denseunet2d.PRESETS["tiny"],
    )
    pred = np.asarray(logits)[0].argmax(-1)
    truth = seg[:, :, z]
    d = metrics.dice_per_class(pred, truth)
    assert d["liver"] > 0.6, d  # random init scores ~0.0-0.2 here


@pytest.mark.slow
def test_hybrid_3dpart_stage_loss_decreases(tmp_path):
    """Hybrid fine-tune stage: frozen 2D branch, boundary-masked loss — the
    loss must fall on synthetic data (train_hybrid.py recipe end-to-end)."""
    root = preprocess.synthesize(
        tmp_path / "prep", num_volumes=2, shape=(64, 64, 24), seed=21
    )
    ds = preprocess.PreparedDataset(root)

    cfg = Config()
    cfg.model.preset = "tiny"
    cfg.model.input_size = 64
    cfg.model.input_cols = 8
    cfg.train.arch = "3dpart"
    cfg.train.batch = 8
    cfg.train.lr = 0.01
    cfg.train.remat = False

    sampler = CropSampler(
        ds, cfg.data, mode="hybrid", input_size=64, input_cols=8, seed=3
    )
    mesh = make_mesh()
    ts, tx, _ = trainer.create_train_state(None, cfg, "3dpart")
    frozen_2d = jax.tree.map(lambda x: np.asarray(x), ts.params["conv1"])
    step = trainer.make_train_step(tx, cfg, mesh, "3dpart")
    bsh = batch_sharding(mesh)

    losses = []
    for _ in range(25):
        batch = sampler.sample_batch(cfg.train.batch)
        db = {k: jax.device_put(v, bsh) for k, v in batch.items()}
        ts, loss = step(ts, db)
        losses.append(float(loss))

    assert np.mean(losses[-5:]) < np.mean(losses[:5]), (losses[:5], losses[-5:])
    # the 2D branch must not have moved (3dpart freezes it entirely)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(a, np.asarray(b)),
        frozen_2d,
        ts.params["conv1"],
    )
