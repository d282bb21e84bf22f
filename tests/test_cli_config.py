"""CLI parser / Config / utils / pipeline coverage."""
import json

import numpy as np
import pytest

import jax

from hdenseunet_tpu.cli import build_parser, _load_config
from hdenseunet_tpu.core.config import Config


# ---------------------------------------------------------------------------
# config
# ---------------------------------------------------------------------------


def test_config_json_roundtrip(tmp_path):
    cfg = Config()
    cfg.train.batch = 16
    cfg.model.preset = "tiny"
    cfg.infer.thres_tumor = 0.8
    p = tmp_path / "cfg.json"
    cfg.save(p)
    back = Config.load(p)
    assert back.train.batch == 16
    assert back.model.preset == "tiny"
    assert back.infer.thres_tumor == 0.8
    assert back.data.tumor_free_volumes == cfg.data.tumor_free_volumes  # tuple


def test_config_rejects_unknown_key():
    with pytest.raises(KeyError, match="nope"):
        Config.from_json(json.dumps({"train": {"nope": 1}}))


def test_load_config_overrides_cast_types():
    cfg = _load_config(None, {"train.batch": "32", "train.remat": "false",
                              "model.preset": "tiny", "train.lr": "0.01"})
    assert cfg.train.batch == 32 and cfg.train.remat is False
    assert cfg.model.preset == "tiny" and cfg.train.lr == 0.01


def test_load_config_unknown_key_exits():
    with pytest.raises(SystemExit):
        _load_config(None, {"model.bogus": "1"})


def test_steps_per_epoch_derivation():
    cfg = Config()
    cfg.train.batch = 10
    cfg.train.arch = "2d"
    assert cfg.train.resolved_steps_per_epoch() == 27386 // 10
    cfg.train.arch = "3dpart"
    assert cfg.train.resolved_steps_per_epoch() == 27386 // 60  # b*6 divisor


# ---------------------------------------------------------------------------
# CLI parser
# ---------------------------------------------------------------------------


def test_parser_subcommands_exist():
    p = build_parser()
    for cmd in ["preprocess", "synth-data", "train", "test", "convert-weights",
                "export-weights", "evaluate"]:
        args = None
        try:
            if cmd == "preprocess":
                args = p.parse_args([cmd, "--raw", "a", "--out", "b"])
            elif cmd == "synth-data":
                args = p.parse_args([cmd, "--out", "x"])
            elif cmd == "train":
                args = p.parse_args([cmd, "--arch", "3dpart", "--set", "k", "v"])
            elif cmd == "test":
                args = p.parse_args([cmd, "--data", "d", "--livermask", "m", "--tiled", "256"])
            elif cmd == "convert-weights":
                args = p.parse_args([cmd, "s.h5", "d.npz", "--submodel", "denseu161"])
            elif cmd == "export-weights":
                args = p.parse_args([cmd, "ckpt", "out.h5", "--arch", "end2end"])
            elif cmd == "evaluate":
                args = p.parse_args([cmd, "--pred", "p", "--truth", "t", "--num-volumes", "3"])
        except SystemExit as e:  # argparse error
            pytest.fail(f"{cmd}: {e}")
        assert args is not None and callable(args.fn)


def test_parser_rejects_bad_arch():
    with pytest.raises(SystemExit):
        build_parser().parse_args(["train", "--arch", "4d"])


# ---------------------------------------------------------------------------
# utils: guards + profiling
# ---------------------------------------------------------------------------


def test_nan_guard_raises_with_context():
    from hdenseunet_tpu.utils.guards import NaNGuard

    g = NaNGuard()
    for i in range(5):
        g.check(1.0 - i * 0.1, i)
    with pytest.raises(FloatingPointError, match="0.6000"):
        g.check(float("nan"), 5)


def test_check_pytree_finite_names_offenders():
    from hdenseunet_tpu.utils.guards import check_pytree_finite

    ok = {"a": {"w": np.ones(3)}}
    check_pytree_finite(ok)
    bad = {"a": {"w": np.array([1.0, np.inf])}}
    with pytest.raises(FloatingPointError, match="w"):
        check_pytree_finite(bad)


def test_step_timer_stats():
    from hdenseunet_tpu.utils.profiling import StepTimer

    t = StepTimer()
    assert t.stats() == {}
    for _ in range(5):
        t.tick()
    s = t.stats(samples_per_step=8)
    assert s["steps_per_sec"] > 0 and s["p95_ms"] >= s["p50_ms"] >= 0


def test_profiler_trace_writes_files(tmp_path):
    from hdenseunet_tpu.utils.profiling import annotate, trace

    with trace(str(tmp_path)):
        with annotate("unit-test-region"):
            jax.numpy.ones(8).sum().block_until_ready()
    assert any(tmp_path.rglob("*")), "no trace output written"


# ---------------------------------------------------------------------------
# device prefetch pipeline
# ---------------------------------------------------------------------------


def test_device_prefetch_shards_batches():
    from hdenseunet_tpu.core.mesh import make_mesh
    from hdenseunet_tpu.data.pipeline import device_prefetch

    mesh = make_mesh()
    batches = [{"image": np.full((8, 4), float(i), np.float32)} for i in range(5)]
    out = list(device_prefetch(iter(batches), mesh, depth=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        arr = b["image"]
        assert arr.sharding.num_devices == 8 or arr.sharding.is_fully_replicated is False
        np.testing.assert_array_equal(np.asarray(arr), batches[i]["image"])


def test_input_pipeline_end_to_end(tmp_path):
    from hdenseunet_tpu.core.mesh import make_mesh
    from hdenseunet_tpu.data import preprocess
    from hdenseunet_tpu.data.pipeline import input_pipeline
    from hdenseunet_tpu.data.sampler import CropSampler

    root = preprocess.synthesize(tmp_path / "p", num_volumes=1, shape=(64, 64, 16), seed=4)
    ds = preprocess.PreparedDataset(root)
    s = CropSampler(ds, mode="2d", input_size=32, seed=0)
    it = input_pipeline(s, 8, make_mesh(), host_depth=2, device_depth=2)
    batch = next(it)
    assert batch["image"].shape == (8, 32, 32, 3)
