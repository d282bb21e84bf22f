"""Bisect the full-size device-postprocess crash (r5 campaign, 2026-08-19).

The first full-size ``compose_final`` dispatch crashed the tunneled TPU
worker twice (once mid-campaign pre-sparse-wire, once in the r5 campaign's
pipeline warmup). This probe times each device_postprocess primitive as its
OWN dispatch at escalating sizes, printing before each enqueue, so the
crashing/slow op identifies itself. Inputs are synthetic speckle at the
bench's random-weight density — the adversarial case for min-index CC
propagation (many components) — plus a solid blob (the real-checkpoint
case). No model init needed: compose consumes packed score masks directly.

Usage: python benchmarks/postprocess_probe.py [--sizes 64,128,192] [--cpu]
"""
from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="32,64,192")
    ap.add_argument("--xy", type=int, default=512)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--density", type=float, default=0.35)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from hdenseunet_tpu.infer import device_postprocess as dpp

    print(f"devices: {jax.devices()}", flush=True)

    def timed(name, fn, *xs):
        t0 = time.perf_counter()
        print(f"  [{time.strftime('%H:%M:%S')}] {name}: enqueue", flush=True)
        out = fn(*xs)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = np.asarray(leaf.reshape(-1)[0])  # sync (block_until_ready no-op)
        dt = time.perf_counter() - t0
        print(f"  [{time.strftime('%H:%M:%S')}] {name}: {dt:.2f}s", flush=True)
        return out

    rng = np.random.default_rng(0)
    xy = args.xy
    for z in (int(s) for s in args.sizes.split(",")):
        print(f"=== {xy}x{xy}x{z} ===", flush=True)
        speck = rng.random((xy, xy, z)) < args.density
        blob = np.zeros((xy, xy, z), bool)
        blob[xy // 4 : -xy // 4, xy // 4 : -xy // 4, z // 4 : -z // 4] = True
        blob &= rng.random((xy, xy, z)) < 0.98  # holes to fill
        for name, m in (("speckle", speck), ("blob", blob)):
            md = jnp.asarray(m)
            timed(f"dilate_cross/{name}", jax.jit(dpp.dilate_cross), md)
            timed(f"largest_component/{name}", jax.jit(dpp.largest_component), md)
            timed(f"fill_holes/{name}", jax.jit(dpp.fill_holes), md)
        # full compose at this size (bench-like packed scores {0,1,3})
        packed = (
            speck.astype(np.uint8)
            + 2 * (rng.random((xy, xy, z)) < 0.1 * args.density) * speck
        ).astype(np.uint8)
        ext = np.zeros((xy, xy, z), np.uint8)
        ext[64:-64, 64:-64, :] = 1
        ext_bits = np.packbits(ext, axis=2)
        if z % 8 == 0:
            from hdenseunet_tpu.infer.device_postprocess import (
                compose_final, compose_final_chunked,
            )

            pd, ed = jnp.asarray(packed), jnp.asarray(ext_bits)
            if z * xy * xy <= 512 * 512 * 64:
                # the single-dispatch compose crashed the tunneled worker
                # twice at z=192 (BENCH_NOTES) — only probe it at sizes with
                # a survival record
                timed(
                    f"compose_final/z{z}",
                    lambda p, e: compose_final(p, e, pack_z=z), pd, ed,
                )
            for ci in (2, 4):
                timed(
                    f"compose_final_chunked{ci}/z{z}",
                    lambda p, e, ci=ci: compose_final_chunked(
                        p, e, pack_z=z, chunk_iters=ci
                    ),
                    pd, ed,
                )
            # blob-content compose: the real-checkpoint case (one liver blob)
            bl = np.zeros((xy, xy, z), np.uint8)
            bl[xy // 4 : -xy // 4, xy // 4 : -xy // 4, z // 4 : -z // 4] = 1
            bl[xy // 3 : xy // 2, xy // 3 : xy // 2, z // 3 : z // 2] |= 2
            timed(
                f"compose_chunked2_blob/z{z}",
                lambda p, e: compose_final_chunked(p, e, pack_z=z, chunk_iters=2),
                jnp.asarray(bl), ed,
            )


if __name__ == "__main__":
    main()
