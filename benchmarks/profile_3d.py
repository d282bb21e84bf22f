"""Per-op roofline campaign for the 3D DenseNet branch (VERDICT r2 item 2).

For every FLOP-carrying conv of the 3D branch at REAL inference shapes
(512^2 windows, wb window batch), measures achieved TF/s via the in-program
slope protocol (the only signal that survives this host's multi-second relay
noise) and compares against a per-op analytic roofline:

    roofline = min(peak * lane_frac * sublane_frac,  HBM_BW * intensity)

* lane_frac: MXU output-lane occupancy = Cout / ceil128(Cout) — growth-32
  encoder convs run at 25%, the up4 decoder conv at 50%;
* sublane_frac: memory-tile occupancy of the second-minor dim. The branch's
  (B,H,W,D,C) layout puts D second-minor, and mid-stage D is 2 or 4 against
  the (8,128) f32 / (16,128) bf16 tile — a 4-8x pad on every activation
  byte. This is what the 'dmajor' lever attacks (D outermost, W second-minor).
* intensity: FLOPs / HBM bytes (in + weights + out), ridge at peak/BW.

Lever variants per op (--levers):
  base     (B,H,W,D,C) spatial=(H,W,D) — the shipped layout
  dmajor   (B,D,H,W,C) spatial=(D,H,W) — no sublane padding (W second-minor)
  packed   zfold tap-packing: kz z-taps as output channels of one 2D conv
           (raises lane occupancy kz*Cout/128, known-negative at model level)
  cout128  same op with Cout raised to 128 (confirms the lane cap, not a
           semantics-preserving option)
  s2d      space-to-depth phase decomposition of a stride-2 conv: the 7^3
           stride-2 stem becomes a stride-1 4^3 conv over the 2^3 parity
           subgrids stacked into channels (Cin 4 -> 32, contraction 1372 ->
           2048 MXU-aligned). Exact modulo float reassociation; only valid
           for stride-2 ops (the stem).

Usage: python benchmarks/profile_3d.py [--wb 8] [--size 512] [--ops stem,up4]
       [--levers base,dmajor] [--reps 3] [--k 8]
Run EXCLUSIVELY (1-core host drives the relay).
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

HBM_GBPS = {"v5 lite": 819.0, "v5e": 819.0, "v4": 1228.0, "v5p": 2765.0, "v6": 1640.0}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--wb", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--ops", default="stem,b2x1,b2x2,b4x1,b4x2,up0,up1,up2,up3,up4")
    ap.add_argument("--levers", default="base,dmajor")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from hdenseunet_tpu.utils.flops import peak_flops_per_chip

    dtype = jnp.dtype(args.dtype)
    peak = peak_flops_per_chip()
    kind = jax.devices()[0].device_kind.lower()
    bw = next((v for s, v in HBM_GBPS.items() if s in kind), 819.0) * 1e9
    itemsize = dtype.itemsize
    sublane = 8 * (4 // max(1, itemsize))  # f32 tile (8,128); bf16 (16,128)
    wb, S = args.wb, args.size

    # (name, (H, W, D, Cin), Cout, kernel k^3, stride) at real inference
    # shapes — H/W/D per window, batch = wb windows. Sources:
    # denseunet3d.py:189 (stem), :96-110 (block convs), :144-149 (decoder).
    OPS = {
        "stem":  ((S,        S,        8, 4),   96,  7, 2),
        "b2x1":  ((S // 4,   S // 4,   2, 192), 128, 1, 1),
        "b2x2":  ((S // 4,   S // 4,   2, 128), 32,  3, 1),
        "b4x1":  ((S // 16,  S // 16,  2, 400), 128, 1, 1),
        "b4x2":  ((S // 16,  S // 16,  2, 128), 32,  3, 1),
        "up0":   ((S // 16,  S // 16,  2, 504), 504, 3, 1),
        "up1":   ((S // 8,   S // 8,   2, 504), 224, 3, 1),
        "up2":   ((S // 4,   S // 4,   2, 224), 192, 3, 1),
        "up3":   ((S // 2,   S // 2,   4, 192), 96,  3, 1),
        "up4":   ((S,        S,        8, 96),  64,  3, 1),
    }

    def _runner(scalar_fn, inputs, k):
        """Compile the k-rep loop-carried program; return a timing closure."""
        @jax.jit
        def g(*xs):
            def body(i, acc):
                return acc + scalar_fn(*xs, jitter=acc * 1e-30)
            return lax.fori_loop(0, k, body, jnp.float32(0.0))

        def run():
            t0 = time.perf_counter()
            _ = float(g(*inputs))
            return time.perf_counter() - t0

        return run

    def slope_time(scalar_fn, inputs, k_big=args.k, k_small=1, reps=args.reps):
        run_s = _runner(scalar_fn, inputs, k_small)
        run_b = _runner(scalar_fn, inputs, k_big)
        run_s(), run_b()  # compile + warm
        ts = min(run_s() for _ in range(reps))
        tb = min(run_b() for _ in range(reps))
        return max((tb - ts) / (k_big - k_small), 1e-9), ts, tb

    def slope_time_auto(scalar_fn, inputs, reps=args.reps, target_s=1.5):
        """slope_time with k sized so the slope signal (~target_s of work)
        dwarfs the relay's 0.1-2 s dispatch noise — ms-scale ops at k=8 sit
        below that floor and measure as garbage (round-3 campaign lesson #1).

        The per-iteration estimate is floored at t8/48 (overhead cannot
        exceed ~6x the whole k=8 wall time), which bounds the k_big endpoint
        to <= ~9 s of chip work even when relay noise zeroes the calibration
        slope — without the floor a zeroed slope clamped k_big to 16384 and
        turned a 58 ms op into a 75-minute probe (campaign lesson #2)."""
        est, _, t8 = slope_time(scalar_fn, inputs, k_big=8, k_small=1, reps=1)
        per_iter = max(est, t8 / 48.0, 1e-7)
        k_big = int(np.clip(np.ceil(target_s / per_iter), 16, 16384))
        k_small = max(1, k_big // 8)
        sl, _, _ = slope_time(scalar_fn, inputs, k_big=k_big, k_small=k_small, reps=reps)
        return sl

    rng = np.random.default_rng(0)

    def probe(name, lever):
        (h, w, d, cin), cout, kk, st = OPS[name]
        if lever == "cout128":
            cout = 128
        pad = kk // 2
        x = jnp.asarray(rng.normal(0, 1, (wb, h, w, d, cin)).astype(np.float32), dtype)
        kern = jnp.asarray(
            rng.normal(0, 0.05, (kk, kk, kk, cin, cout)).astype(np.float32), dtype
        )
        out_sp = [(s + 2 * pad - kk) // st + 1 for s in (h, w, d)]
        fl = 2.0 * wb * float(np.prod(out_sp)) * cout * (kk ** 3) * cin

        if lever in ("base", "cout128"):
            def f(x, kern, *, jitter):
                y = lax.conv_general_dilated(
                    x + jitter.astype(dtype), kern,
                    window_strides=(st, st, st),
                    padding=[(pad, pad)] * 3,
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                )
                return jnp.sum(y.astype(jnp.float32))
            inputs = (x, kern)
            d_minor = d  # second-minor dim of every tensor is D
        elif lever == "dmajor":
            xd = jnp.transpose(x, (0, 3, 1, 2, 4))  # (wb, D, H, W, C)
            kd = jnp.transpose(kern, (2, 0, 1, 3, 4))  # (kz, kh, kw, ci, co)
            def f(xd, kd, *, jitter):
                y = lax.conv_general_dilated(
                    xd + jitter.astype(dtype), kd,
                    window_strides=(st, st, st),
                    padding=[(pad, pad)] * 3,
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                )
                return jnp.sum(y.astype(jnp.float32))
            inputs = (xd, kd)
            d_minor = None  # W is second-minor: no pad at these sizes
        elif lever == "packed":
            # zfold tap-packing: (wb*D, H, W, C) 2D conv, kz taps in out-chans
            from hdenseunet_tpu.models import zfold
            from hdenseunet_tpu.core.module import Ctx

            params = {}

            class _Cap:
                compute_dtype = dtype
                flops = None

                def param(self, n, leaf, shape, init):
                    if (n, leaf) not in params:
                        params[(n, leaf)] = jnp.asarray(
                            rng.normal(0, 0.05, shape).astype(np.float32)
                        )
                    return params[(n, leaf)]

            xf = jnp.reshape(jnp.transpose(x, (0, 3, 1, 2, 4)), (wb * d, h, w, cin))

            def f(xf, *, jitter):
                y, _ = zfold.conv3d(
                    _Cap(), xf + jitter.astype(dtype), wb, d, "k", cout, kk,
                    stride=st, padding=pad, use_bias=False,
                )
                return jnp.sum(y.astype(jnp.float32))
            inputs = (xf,)
            d_minor = None
        elif lever == "s2d":
            assert st == 2, f"s2d lever needs stride 2, {name} has {st}"
            kq = (kk + 1) // 2  # taps per parity phase (7 -> 4)
            # pad so index u = st*o + p covers [0, st*(out-1)+kk-1], length even
            lens = []
            xp = x
            for ax, s_in in enumerate((h, w, d)):
                o_n = (s_in + 2 * pad - kk) // st + 1
                need = st * (o_n - 1) + kk  # max u + 1
                # phase subgrid m-range needs o_n - 1 + kq - 1 < need_half
                half = max(-(-need // st), o_n - 1 + kq)
                total = half * st
                cfg = [(0, 0)] * 5
                cfg[1 + ax] = (pad, total - s_in - pad)
                xp = jnp.pad(xp, cfg)
                lens.append(half)
            # stack the st^3 parity subgrids into channels: order r = (rh,rw,rd)
            phases = [
                xp[:, rh::st, rw::st, rd::st, :]
                for rh in range(st) for rw in range(st) for rd in range(st)
            ]
            xs = jnp.concatenate(phases, axis=-1)  # (wb, half_h, half_w, half_d, st^3*cin)
            # matching kernel: ks[qh,qw,qd, r*cin+c, f] = w[st*qh+rh, ...]
            kern_np = np.asarray(kern, np.float32)
            ks = np.zeros((kq, kq, kq, st ** 3 * cin, cout), np.float32)
            ri = 0
            for rh in range(st):
                for rw in range(st):
                    for rd in range(st):
                        for qh in range(kq):
                            for qw in range(kq):
                                for qd in range(kq):
                                    ph, pw_, pd = st * qh + rh, st * qw + rw, st * qd + rd
                                    if ph < kk and pw_ < kk and pd < kk:
                                        ks[qh, qw, qd, ri * cin : (ri + 1) * cin, :] = (
                                            kern_np[ph, pw_, pd]
                                        )
                        ri += 1
            ks = jnp.asarray(ks, dtype)
            o_sp = out_sp

            def f(xs, ks, *, jitter):
                y = lax.conv_general_dilated(
                    xs + jitter.astype(dtype), ks,
                    window_strides=(1, 1, 1), padding="VALID",
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                )
                # VALID over the padded phase grid can overshoot out_sp by a
                # couple of positions; crop to the true output
                y = y[:, : o_sp[0], : o_sp[1], : o_sp[2], :]
                return jnp.sum(y.astype(jnp.float32))
            inputs = (xs, ks)
            d_minor = None
        else:
            raise SystemExit(f"unknown lever {lever}")

        t = slope_time_auto(f, inputs)

        # fraction of kernel z-taps that read real (non-pad) input planes:
        # at D=2 with a 3-tap kernel only 2/3 of the analytic FLOPs are useful
        # work (XLA may or may not skip the padded planes; >100% pct_peak on
        # the analytic count means it did)
        d_out_z = (d + 2 * pad - kk) // st + 1
        z_eff = sum(
            1 for oz in range(d_out_z) for tt in range(kk)
            if 0 <= oz * st + tt - pad < d
        ) / max(1, d_out_z * kk)

        lane = cout / (-(-cout // 128) * 128)
        sub = 1.0
        if d_minor is not None and d_minor < sublane:
            sub = d_minor / sublane
        bytes_ = itemsize * (
            wb * h * w * d * cin + (kk ** 3) * cin * cout
            + wb * float(np.prod(out_sp)) * cout
        )
        intensity = fl / bytes_
        roof = min(peak * lane, bw * intensity)
        print(
            json.dumps(
                {
                    "op": name, "lever": lever,
                    "ms": round(t * 1e3, 2),
                    "tflops": round(fl / t / 1e12, 1),
                    "pct_peak": round(100 * fl / t / peak, 1),
                    "lane_frac": round(lane, 3),
                    "sublane_frac": round(sub, 3),
                    "intensity_f_per_b": round(intensity, 0),
                    "roof_tflops": round(roof / 1e12, 1),
                    "pct_roof": round(100 * fl / t / roof, 1),
                    "gflop": round(fl / 1e9, 1),
                    "z_eff": round(z_eff, 3),
                    "tflops_useful": round(fl * z_eff / t / 1e12, 1),
                }
            ),
            flush=True,
        )

    for name in args.ops.split(","):
        for lever in args.levers.split(","):
            probe(name.strip(), lever.strip())


if __name__ == "__main__":
    main()
