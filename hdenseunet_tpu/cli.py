"""Unified CLI — replaces the reference's four entry scripts.

    python -m hdenseunet_tpu preprocess --raw data/TrainingData --out data/prepared
    python -m hdenseunet_tpu train --arch 2d --data data/prepared [--config cfg.json]
    python -m hdenseunet_tpu train --arch 3dpart --init-from ckpt_2d
    python -m hdenseunet_tpu test --data data/myTestData --livermask livermask --weights ckpt
    python -m hdenseunet_tpu convert-weights model_best.hdf5 out.npz --submodel denseu161
    python -m hdenseunet_tpu synth-data --out /tmp/lits-tiny   (synthetic smoke dataset)

One typed Config (core/config.py) serialized as JSON replaces the reference's
three inconsistent argparse blocks (train_2ddense.py:21-34, train_hybrid.py:23-36,
test.py:20-36) and its hardcoded globals.
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np


def _load_config(path, overrides):
    from .core.config import Config

    import json

    cfg = Config.load(path) if path else Config()
    for key, value in overrides.items():
        section, name = key.split(".", 1)
        obj = getattr(cfg, section)
        if not hasattr(obj, name):
            raise SystemExit(f"unknown config key {key}")
        current = getattr(obj, name)
        if isinstance(current, str):
            parsed = value
        else:
            try:
                parsed = json.loads(value)  # int/float/bool/null/lists
            except (ValueError, TypeError):
                parsed = value
        setattr(obj, name, tuple(parsed) if isinstance(parsed, list) else parsed)
    return cfg


def cmd_preprocess(args):
    from .core.config import DataConfig
    from .data import preprocess

    preprocess.run(
        args.raw, args.out, num_volumes=args.num_volumes,
        with_seg=not args.no_seg, cfg=DataConfig(),
    )


def cmd_synth_data(args):
    from .data import preprocess

    shape = tuple(int(s) for s in args.shape.split(","))
    preprocess.synthesize(
        args.out, num_volumes=args.num_volumes, shape=shape, seed=args.seed, log=print
    )
    print(f"synthetic dataset at {args.out}")


def cmd_train(args):
    from .core.mesh import make_mesh
    from .data.pipeline import PrefetchIterator
    from .data.preprocess import PreparedDataset
    from .data.sampler import CropSampler, synthetic_batches
    from .parallel import multihost
    from .train import trainer
    from .weights import convert as wconv

    multihost.initialize()  # no-op unless a multi-process env is configured
    import jax

    cfg = _load_config(args.config, dict(args.set or []))
    cfg.train.arch = args.arch
    if args.batch:
        cfg.train.batch = args.batch
    mode = "2d" if args.arch == "2d" else "hybrid"
    # each process samples only its shard of the global batch, with a
    # process-disjoint RNG stream; put_batch assembles the global array
    feed_batch = multihost.local_batch_size(cfg.train.batch)
    feed_seed = cfg.train.seed + jax.process_index()
    log = print if multihost.is_primary() else (lambda *_a, **_k: None)

    if args.data:
        ds = PreparedDataset(args.data)
        sampler = CropSampler(
            ds,
            cfg.data,
            mode=mode,
            input_size=cfg.model.input_size,
            input_cols=cfg.model.input_cols,
            seed=feed_seed,
        )
        batches = PrefetchIterator(
            sampler.batches(feed_batch, threads=cfg.data.crop_threads),
            depth=cfg.data.prefetch_depth,
        )
    else:
        log("no --data given: using synthetic batches (smoke mode)")
        batches = synthetic_batches(
            mode=mode,
            batch=feed_batch,
            input_size=cfg.model.input_size,
            input_cols=cfg.model.input_cols,
            seed=feed_seed,
        )

    init_params = None
    if args.init_from:
        init_params = wconv.load_init_weights(args.init_from)
    trainer.train(
        cfg,
        batches,
        mesh=make_mesh(),
        max_steps=args.max_steps,
        checkpoint_dir=args.checkpoint_dir,
        resume=args.resume,
        init_weights=init_params,
        log_fn=log,
    )


def cmd_test(args):
    from .core.config import Config
    from .infer import predictor
    from .train import checkpoint as ckpt_lib
    from .train import trainer

    cfg = _load_config(args.config, dict(args.set or []))
    arch = args.arch
    cfg.train.arch = arch
    ts, _, _ = trainer.create_train_state(None, cfg, arch)
    params, bn_state = ts.params, ts.bn_state
    if args.weights:
        from .weights import convert as wconv

        if args.weights.endswith(".npz"):
            raw = wconv.load_npz_checkpoint(args.weights)
            params, bn_state, report = wconv.match_to_model(raw, params, bn_state)
            print(
                f"weights: {len(report['loaded'])} layers loaded, "
                f"{len(report['skipped'])} skipped"
            )
        else:
            ckpt = ckpt_lib.Checkpointer(args.weights)
            try:
                restored = (
                    ckpt.restore_best(ts) if args.restore == "best"
                    else ckpt.restore_latest(ts)
                )
                if restored is None:
                    raise SystemExit(
                        f"no {args.restore} checkpoint under {args.weights}"
                    )
                params, bn_state = restored.params, restored.bn_state
            except ValueError as e:
                # cross-stage checkpoint (e.g. a 2D-stage state driving hybrid
                # inference): merge by layer name, like the reference's
                # load_weights(by_name=True) (topology.py:3107). A corrupt or
                # wrong-config SAME-stage checkpoint also lands here — detect
                # it by the merge loading suspiciously few layers and surface
                # the original restore error instead of silently running with
                # mostly-random weights.
                raw = wconv.load_init_weights(
                    args.weights, best=args.restore == "best"
                )
                merged_params, merged_bn, report = wconv.match_to_model(
                    raw, params, bn_state
                )
                if not report["loaded"] or (
                    len(report["loaded"]) < len(report["skipped"])
                ):
                    raise SystemExit(
                        f"checkpoint restore failed ({e}); by-name merge "
                        f"would load only {len(report['loaded'])} layers and "
                        f"skip {len(report['skipped'])} — refusing partial "
                        f"load of a non-cross-stage checkpoint"
                    ) from e
                params, bn_state = merged_params, merged_bn
                print(
                    f"weights (by-name, cross-stage): "
                    f"{len(report['loaded'])} layers loaded, "
                    f"{len(report['skipped'])} skipped"
                )
    predictor.predict_directory(
        params,
        bn_state,
        cfg,
        data_dir=args.data,
        liver_mask_dir=args.livermask,
        save_dir=args.save_path,
        num_volumes=args.num_volumes,
        arch=arch,
        tiled=args.tiled,
    )


def cmd_convert_weights(args):
    from .weights import convert as wconv

    keys = wconv.convert_checkpoint(args.src, args.dst, submodel=args.submodel)
    print(f"converted {len(keys)} weight arrays -> {args.dst}")


def cmd_export_weights(args):
    """Orbax checkpoint -> Keras-2.0.8 by-name HDF5 (take a TPU-trained model
    back to the reference stack)."""
    from .core.config import Config
    from .train import checkpoint as ckpt_lib
    from .train import trainer
    from .weights import convert as wconv

    cfg = _load_config(args.config, dict(args.set or []))
    cfg.train.arch = args.arch
    ts, _, _ = trainer.create_train_state(None, cfg, args.arch)
    ckpt = ckpt_lib.Checkpointer(args.checkpoint)
    restored = (
        ckpt.restore_best(ts) if args.restore == "best" else ckpt.restore_latest(ts)
    )
    if restored is None:
        raise SystemExit(f"no {args.restore} checkpoint under {args.checkpoint}")
    wconv.save_keras_hdf5(args.dst, restored.params, restored.bn_state)
    n = sum(len(v) for v in restored.params.values())
    print(f"exported {n} weight arrays (+BN stats) -> {args.dst}")


def cmd_evaluate(args):
    from .data import nifti
    from .infer import metrics

    per_case = []
    preds, truths = [], []
    for i in range(args.num_volumes):
        pred, _ = nifti.read(Path(args.pred) / f"test-segmentation-{i}.nii")
        truth, _ = nifti.read(Path(args.truth) / f"segmentation-{i}.nii")
        pred, truth = np.asarray(pred), np.asarray(truth)
        d = metrics.dice_per_class(pred, truth)
        per_case.append(d)
        if args.global_dice:
            preds.append(pred)
            truths.append(truth)
        line = f"volume {i}: liver {d['liver']:.4f} tumor {d['tumor']:.4f}"
        if args.all_metrics:
            m = metrics.metrics_per_class(pred, truth)
            line += (
                f"  [liver voe {m['liver']['voe']:.4f} rvd {m['liver']['rvd']:+.4f}"
                f" | tumor voe {m['tumor']['voe']:.4f} rvd {m['tumor']['rvd']:+.4f}]"
            )
        print(line)
    mean = {
        k: float(np.mean([c[k] for c in per_case])) for k in ("liver", "tumor")
    }
    print(f"mean per-case Dice: liver {mean['liver']:.4f} tumor {mean['tumor']:.4f}")
    if args.global_dice:
        g = metrics.global_dice(preds, truths)
        print(f"global Dice: liver {g['liver']:.4f} tumor {g['tumor']:.4f}")


def build_parser():
    p = argparse.ArgumentParser(prog="hdenseunet_tpu", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("preprocess", help="HU-clip volumes + extract coords/boxes")
    sp.add_argument("--raw", required=True)
    sp.add_argument("--out", required=True)
    sp.add_argument("--num-volumes", type=int, default=None)
    sp.add_argument("--no-seg", action="store_true")
    sp.set_defaults(fn=cmd_preprocess)

    sp = sub.add_parser("synth-data", help="generate a synthetic smoke dataset")
    sp.add_argument("--out", required=True)
    sp.add_argument("--num-volumes", type=int, default=3)
    sp.add_argument("--shape", default="96,96,48")
    sp.add_argument("--seed", type=int, default=0)
    sp.set_defaults(fn=cmd_synth_data)

    sp = sub.add_parser("train", help="train a stage: 2d | 3dpart | end2end")
    sp.add_argument("--arch", choices=["2d", "3dpart", "end2end"], default="2d")
    sp.add_argument("--data", default=None, help="prepared dataset dir")
    sp.add_argument("--config", default=None, help="Config JSON path")
    sp.add_argument("--batch", type=int, default=None)
    sp.add_argument("--max-steps", type=int, default=None)
    sp.add_argument("--checkpoint-dir", default=None)
    sp.add_argument("--resume", action="store_true")
    sp.add_argument("--init-from", default=None,
                    help="warm-start weights: converted .npz OR an orbax "
                         "checkpoint dir from a previous stage")
    sp.add_argument("--set", nargs=2, action="append", metavar=("KEY", "VAL"),
                    help="config override, e.g. --set model.preset tiny")
    sp.set_defaults(fn=cmd_train)

    sp = sub.add_parser("test", help="segment test volumes")
    sp.add_argument("--data", required=True)
    sp.add_argument("--livermask", required=True)
    sp.add_argument("--save-path", default="results")
    sp.add_argument("--weights", default=None, help=".npz or checkpoint dir")
    sp.add_argument("--restore", choices=["latest", "best"], default="latest",
                    help="which checkpoint to restore from a checkpoint dir")
    sp.add_argument("--config", default=None)
    sp.add_argument("--arch", choices=["3dpart", "end2end"], default="end2end")
    sp.add_argument("--num-volumes", type=int, default=None)
    sp.add_argument("--tiled", type=int, default=None, metavar="TILE",
                    help="x/y/z-tiled inference with TILE^2 in-plane windows "
                         "(reference predict_window_mulgpu equivalent)")
    sp.add_argument("--set", nargs=2, action="append", metavar=("KEY", "VAL"))
    sp.set_defaults(fn=cmd_test)

    sp = sub.add_parser("convert-weights", help="Keras HDF5 -> npz pytree")
    sp.add_argument("src")
    sp.add_argument("dst")
    sp.add_argument("--submodel", default=None,
                    choices=[None, "model_1", "denseu161", "auto3d_residual_conv"])
    sp.set_defaults(fn=cmd_convert_weights)

    sp = sub.add_parser("export-weights", help="orbax checkpoint -> Keras HDF5")
    sp.add_argument("checkpoint", help="checkpoint directory")
    sp.add_argument("dst", help="output .h5 path")
    sp.add_argument("--restore", choices=["latest", "best"], default="latest")
    sp.add_argument("--arch", choices=["2d", "3dpart", "end2end"], default="2d")
    sp.add_argument("--config", default=None)
    sp.add_argument("--set", nargs=2, action="append", metavar=("KEY", "VAL"))
    sp.set_defaults(fn=cmd_export_weights)

    sp = sub.add_parser("evaluate", help="Dice of predicted vs truth labelmaps")
    sp.add_argument("--pred", required=True)
    sp.add_argument("--truth", required=True)
    sp.add_argument("--num-volumes", type=int, required=True)
    sp.add_argument("--global-dice", action="store_true",
                    help="also report Dice over the union of all cases")
    sp.add_argument("--all-metrics", action="store_true",
                    help="also report VOE and RVD per case (LiTS secondary metrics)")
    sp.set_defaults(fn=cmd_evaluate)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
