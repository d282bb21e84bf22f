"""Block-level activation parity harness (converted weights vs reference).

SURVEY §7 step 3 calls for golden-value tests of the converter against the
released Keras checkpoints. The released weights are not obtainable in this
environment (no egress), so this module provides the two halves that make the
comparison a one-command job once they are:

* ``dump``  — run the (converted) model on a fixed input and record the
  activation at every encoder stage boundary (the ``box`` taps, i.e. relu1
  and each dense-block output — densenet.py:60/:189), the decoder feature
  map, and the logits, into an npz;
* ``compare`` — diff two dumps tensor-by-tensor with per-tensor max/mean
  absolute error and a pass/fail verdict.

Reference-side dump (run under the reference's python2 + Keras-2.0.8 env):

    import numpy as np
    from densenet import DenseUNet          # reference repo root on sys.path
    from keras.models import Model
    model = DenseUNet(reduction=0.5, args=args)
    model.load_weights('densenet161_weights_tf.h5', by_name=True)
    x = np.load('parity_input.npy')         # written by `dump` below
    taps = ['relu1', 'concat_2_6', 'concat_3_12', 'concat_4_36', 'relu5_blk',
            'ac_up4', 'dense167classifer']
    probe = Model(model.input, [model.get_layer(n).output for n in taps])
    outs = probe.predict(x, batch_size=x.shape[0])
    np.savez('reference_acts.npz', **dict(zip(taps, outs)))

Usage here:

    python -m hdenseunet_tpu.weights.parity dump --weights conv.npz --out tpu_acts.npz
    python -m hdenseunet_tpu.weights.parity compare tpu_acts.npz reference_acts.npz
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

# names matching the reference graph's tap layers, in encoder order
TAPS = ("relu1", "concat_2_6", "concat_3_12", "concat_4_36", "relu5_blk")


def dump_activations(params, bn_state, x, *, reduction=0.5, preset="full"):
    """Run DenseUNet-2D and return {tap_name: activation} including decoder
    feature map ('ac_up4') and logits ('dense167classifer')."""
    import jax.numpy as jnp

    from ..core.module import Ctx
    from ..models import denseunet2d

    ctx = Ctx(params, bn_state, train=False)
    taps: dict = {}
    denseunet2d.apply(
        ctx, jnp.asarray(x), reduction=reduction, taps=taps,
        **denseunet2d.PRESETS[preset],
    )
    return {name: np.asarray(t) for name, t in taps.items()}


def dump_activations_3d(params, bn_state, x, *, preset="full"):
    """3D-branch taps: per-dense-block concats, final relu, 'ac_up4' features,
    '3dclassifer' logits (reference denseunet3d.py graph names)."""
    import jax.numpy as jnp

    from ..core.module import Ctx
    from ..models import denseunet3d

    ctx = Ctx(params, bn_state, train=False)
    taps: dict = {}
    denseunet3d.apply(ctx, jnp.asarray(x), taps=taps, **denseunet3d.PRESETS[preset])
    return {name: np.asarray(t) for name, t in taps.items()}


def dump_activations_hybrid(params, bn_state, vol, *, arch="end2end", preset="full"):
    """Hybrid fusion-boundary taps: res2d/fea2d (z-stacked 2D outputs), feat3d,
    and the '2d3dclassifer' logits (reference hybridnet.py:409-419)."""
    import jax.numpy as jnp

    from ..core.module import Ctx
    from ..models import hybrid

    ctx = Ctx(params, bn_state, train=False)
    taps: dict = {}
    hybrid.apply(ctx, jnp.asarray(vol), arch=arch, preset=preset, taps=taps)
    return {name: np.asarray(t) for name, t in taps.items()}


def compare_dumps(a_path, b_path, *, rtol=1e-3, atol=1e-3, log=print) -> bool:
    ok = True
    with np.load(a_path) as a, np.load(b_path) as b:
        keys = sorted(set(a.files) & set(b.files))
        missing = sorted(set(a.files) ^ set(b.files))
        if missing:
            log(f"WARNING: tensors only on one side: {missing}")
        for k in keys:
            x, y = a[k], b[k]
            if x.shape != y.shape:
                log(f"FAIL {k}: shape {x.shape} vs {y.shape}")
                ok = False
                continue
            err = np.abs(x.astype(np.float64) - y.astype(np.float64))
            scale = np.maximum(np.abs(y).max(), 1e-9)
            passed = err.max() <= atol + rtol * scale
            ok &= passed
            log(
                f"{'PASS' if passed else 'FAIL'} {k}: max {err.max():.3e} "
                f"mean {err.mean():.3e} (|ref|max {scale:.3e})"
            )
    return ok


def main(argv=None):
    ap = argparse.ArgumentParser(prog="parity", description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("dump")
    d.add_argument("--weights", required=True, help="converted .npz checkpoint")
    d.add_argument("--out", required=True)
    d.add_argument("--input", default=None, help="npy input; random if absent")
    d.add_argument("--input-size", type=int, default=224)
    d.add_argument("--model", choices=["2d", "3d", "hybrid"], default="2d")
    d.add_argument("--arch", choices=["end2end", "3dpart"], default="end2end")
    d.add_argument("--input-cols", type=int, default=8)
    d.add_argument("--seed", type=int, default=0)

    c = sub.add_parser("compare")
    c.add_argument("a")
    c.add_argument("b")
    c.add_argument("--rtol", type=float, default=1e-3)
    c.add_argument("--atol", type=float, default=1e-3)

    args = ap.parse_args(argv)
    if args.cmd == "compare":
        ok = compare_dumps(args.a, args.b, rtol=args.rtol, atol=args.atol)
        raise SystemExit(0 if ok else 1)

    import jax

    from ..models import denseunet2d, denseunet3d, hybrid
    from .convert import load_npz_checkpoint, match_to_model

    if args.model == "2d":
        params, bn_state = denseunet2d.init(jax.random.key(0), input_size=args.input_size)
        in_shape = (1, args.input_size, args.input_size, 3)
    elif args.model == "3d":
        params, bn_state = denseunet3d.init(
            jax.random.key(0), input_size=args.input_size,
            input_cols=args.input_cols, channels=4,
        )
        in_shape = (1, args.input_size, args.input_size, args.input_cols, 4)
    else:
        params, bn_state = hybrid.init(
            jax.random.key(0), input_size=args.input_size,
            input_cols=args.input_cols, arch=args.arch,
        )
        in_shape = (1, args.input_size, args.input_size, args.input_cols, 1)
    raw = load_npz_checkpoint(args.weights)
    params, bn_state, report = match_to_model(raw, params, bn_state, strict_shapes=False)
    print(f"loaded {len(report['loaded'])} layers, skipped {len(report['skipped'])}")

    if args.input:
        x = np.load(args.input)
    else:
        x = np.random.default_rng(args.seed).normal(0, 60, in_shape).astype(np.float32)
        np.save(Path(args.out).with_name("parity_input.npy"), x)
    if args.model == "2d":
        acts = dump_activations(params, bn_state, x)
    elif args.model == "3d":
        acts = dump_activations_3d(params, bn_state, x)
    else:
        acts = dump_activations_hybrid(params, bn_state, x, arch=args.arch)
    np.savez_compressed(args.out, **acts)
    print(f"wrote {args.out}: {sorted(acts)}")


if __name__ == "__main__":
    main()
